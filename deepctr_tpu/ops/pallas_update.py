"""Fused Pallas row-update (RMW) kernel for the active-rows train step.

XLA's scatter runs at ~8 GB/s on big tables (measured, tools/
scatter_micro.py) — row-at-a-time and unpipelined — while row-gather DMAs
sustain tens of GB/s.  At vocab 1M the active-rows step spends ~16 of
19 ms in its 2 gathers + 2 scatters per table.  This kernel fuses the
WHOLE per-table update into one pass over the touched rows:

    (read acc[row])                      windowed async row DMAs
    g' = g + 2*l2*w                      lazy L2 on touched rows
    adagrad:  acc' = acc + g'^2 ;  w' = w - lr * g' / (sqrt(acc') + eps)
    (torch.optim.Adagrad form — eps OUTSIDE the sqrt; optax.adagrad
    differs and diverges for tiny grads, see basemodel._torch_adagrad)
    sgd:                           w' = w - lr * g'
    write w[row] (, write acc[row])

The OLD weight rows are NOT re-read from HBM: the active-rows transform
already gathered them (the substituted ``small`` slice) and passes them
in as a VMEM operand — DMA issue rate is the bottleneck (window depth 8
vs 64 measured identical), so every skipped per-row DMA is ~25%% of the
kernel.  adagrad: 3 DMAs/row; sgd: 1.

Rows are the transform's dedup output: sorted, unique, VALID-PREFIX (the
first ``n_valid`` entries are in-bounds; the tail is out-of-bounds
padding) — the kernel loops j < n_valid per block, so no per-row
masking, no in-kernel iota (a documented Mosaic miscompile), and no
possibility of a padding write landing in the table.

Tables are updated in place via input_output_aliases (the train step
donates params/table_state).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
_ROWS_PER_STEP = 1024
_WINDOW = int(_os.environ.get("DEEPCTR_UPDATE_WINDOW", "16"))


def _make_kernel(lr, eps, adagrad):
    def kernel(rows_smem, nvalid_smem, g_ref, l2_ref, wrows_ref, *refs):
        if adagrad:
            _w_in, _a_in, w_out, a_out, w_scr, a_scr, sems = refs
        else:
            _w_in, w_out, w_scr, sems = refs
            a_out = a_scr = None
        base = pl.program_id(0) * _ROWS_PER_STEP
        count = jnp.clip(nvalid_smem[0] - base, 0, _ROWS_PER_STEP)

        def rd(j):
            return [pltpu.make_async_copy(
                a_out.at[pl.ds(rows_smem[base + j], 1), :],
                a_scr.at[pl.ds(j, 1), :], sems.at[1, j % _WINDOW])]

        def wr(j):
            copies = [pltpu.make_async_copy(
                w_scr.at[pl.ds(j, 1), :],
                w_out.at[pl.ds(rows_smem[base + j], 1), :],
                sems.at[2, j % _WINDOW])]
            if adagrad:
                copies.append(pltpu.make_async_copy(
                    a_scr.at[pl.ds(j, 1), :],
                    a_out.at[pl.ds(rows_smem[base + j], 1), :],
                    sems.at[3, j % _WINDOW]))
            return copies

        def phase(make):
            def warm(j, _):
                for c in make(j):
                    c.start()
                return 0

            def drain(j, _):
                for c in make(j):
                    c.wait()
                @pl.when(j + _WINDOW < count)
                def _():
                    for c in make(j + _WINDOW):
                        c.start()
                return 0

            jax.lax.fori_loop(0, jnp.minimum(count, _WINDOW), warm, 0)
            jax.lax.fori_loop(0, count, drain, 0)

        if adagrad:
            phase(rd)

        g = g_ref[:].astype(jnp.float32)
        w = wrows_ref[:].astype(jnp.float32)   # old rows, gathered by the
        g = g + 2.0 * l2_ref[:] * w            # transform (no HBM re-read)
        if adagrad:
            a = a_scr[:] + g * g
            a_scr[:] = a
            w_scr[:] = w - lr * g / (jnp.sqrt(a) + eps)
        else:
            w_scr[:] = w - lr * g

        phase(wr)

    return kernel


def _pad_to_block(rows, arrs, L=1, fill=0, axis=0):
    """Pad a slot-index vector (or [G, n] matrix) and its per-slot value
    arrays to a _ROWS_PER_STEP multiple along the slot axis.

    The kernels' grids need whole blocks, but callers should NOT pad
    their id vectors that far: every padding slot the TRANSFORM carries
    is a clip-mode gather of an out-of-bounds row, and those reads
    measured ~1.1ms/step at vocab 1M (tools/subgather_micro.py,
    26x[5120] vs 26x[4104]: 1.757 vs 0.639ms).  Padding here instead
    costs one [pad*L, 128] concatenate that never leaves the kernel
    call.  Padding slots are never issued (j >= n_valid)."""
    n = rows.shape[axis]
    pad = (-n) % _ROWS_PER_STEP
    if not pad:
        return rows, arrs
    if rows.ndim == 1:
        rows = jnp.concatenate([rows, jnp.full((pad,), fill, rows.dtype)])
    else:   # [G, n] along axis 1
        rows = jnp.concatenate(
            [rows, jnp.full(rows.shape[:1] + (pad,), fill, rows.dtype)],
            axis=1)
    padded = []
    for a in arrs:
        if a.ndim == 3:   # [G, n*L, 128]
            padv = jnp.zeros((a.shape[0], pad * L, 128), a.dtype)
            padded.append(jnp.concatenate([a, padv], axis=1))
        else:             # [n*L, 128]
            padded.append(jnp.concatenate(
                [a, jnp.zeros((pad * L, 128), a.dtype)]))
    return rows, padded


def row_update_supported(w, g, rows):
    return (w.ndim == 2 and w.shape[1] == 128 and w.dtype == jnp.float32
            and g.shape[1] == 128 and rows.ndim == 1
            and rows.shape[0] == g.shape[0])


def fused_row_update(w, acc, g, rows, n_valid, l2_vec, lr, eps=1e-10,
                     w_rows=None):
    """Fused touched-rows update; ``acc=None`` selects sgd, else adagrad.

    w (, acc): [R, 128] float32; g: [n, 128] gradient rows; rows: [n]
    int32 sorted unique, first ``n_valid`` in-bounds; l2_vec: [128]
    per-lane lazy-L2 strengths; w_rows: [n, 128] the CURRENT values of
    ``w`` at ``rows`` (from the transform's gather — skips a per-row
    read).  Returns (new_w, new_acc_or_None) — the same buffers, updated
    in place via aliasing when donated.
    """
    adagrad = acc is not None
    if w_rows is None:
        w_rows = w.at[rows].get(mode="clip", indices_are_sorted=True)
    rows, (g, w_rows) = _pad_to_block(rows, [g, w_rows], L=1,
                                      fill=w.shape[0])
    n = g.shape[0]
    grid = (n // _ROWS_PER_STEP,)
    kernel = _make_kernel(float(lr), float(eps), adagrad)
    l2 = jnp.broadcast_to(l2_vec.astype(jnp.float32), (1, 128))
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)

    tensor_ins = [w, acc] if adagrad else [w]
    # operand order incl. scalar prefetch: 0=rows 1=nvalid 2=g 3=l2
    # 4=w_rows then the tables; alias tables onto outputs (in-place)
    aliases = {5: 0, 6: 1} if adagrad else {5: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS_PER_STEP, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),          # g
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # l2
            pl.BlockSpec((_ROWS_PER_STEP, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),          # w_rows
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(tensor_ins),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(tensor_ins),
        scratch_shapes=(
            [pltpu.VMEM((_ROWS_PER_STEP, 128), jnp.float32)]
            * (2 if adagrad else 1)
            + [pltpu.SemaphoreType.DMA((4, _WINDOW))]),
    )
    out_shape = [jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tensor_ins]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, nv, g.astype(jnp.float32), l2, w_rows.astype(jnp.float32),
      *tensor_ins)
    if adagrad:
        return outs[0], outs[1]
    return outs[0], None


# ---------------------------------------------------------------------------
# Combined-storage variant: the engine keeps adagrad tables as ONE
# INTERLEAVED [2R, 128] buffer — logical row r's weights at physical row
# 2r, its accumulator at 2r+1 — so each touched row costs exactly 1 read
# + 1 write DMA of a [2, 128] pair (vs 3 row DMAs with separate buffers;
# DMA issue rate is the measured bound, tools/update_micro.py).
#
# Why not one [R, 256] buffer: Mosaic rejects dynamic single-row slices
# of a 2-tile-wide HBM memref ("Slice shape along dimension 0 must be
# aligned to tiling (8)") — per-row DMAs only lower for 128-lane rows.
# The interleaved layout keeps the row width at one tile and gets the
# same 2-DMA cost.  In-kernel, weights/accumulators are separated not by
# lane-splitting (unsupported) but by a parity mask + pltpu.roll over
# the interleaved scratch block.
# ---------------------------------------------------------------------------

def _make_kernel_combined(lr, eps):
    def kernel(rows_smem, nvalid_smem, g_ref, l2_ref, _c_in, c_out, scr,
               sems):
        base = pl.program_id(0) * _ROWS_PER_STEP
        count = jnp.clip(nvalid_smem[0] - base, 0, _ROWS_PER_STEP)

        def rd(j):
            return [pltpu.make_async_copy(
                c_out.at[pl.ds(rows_smem[base + j] * 2, 2), :],
                scr.at[pl.ds(j * 2, 2), :], sems.at[0, j % _WINDOW])]

        def wr(j):
            return [pltpu.make_async_copy(
                scr.at[pl.ds(j * 2, 2), :],
                c_out.at[pl.ds(rows_smem[base + j] * 2, 2), :],
                sems.at[1, j % _WINDOW])]

        def phase(make):
            def warm(j, _):
                for c in make(j):
                    c.start()
                return 0

            def drain(j, _):
                for c in make(j):
                    c.wait()
                @pl.when(j + _WINDOW < count)
                def _():
                    for c in make(j + _WINDOW):
                        c.start()
                return 0

            jax.lax.fori_loop(0, jnp.minimum(count, _WINDOW), warm, 0)
            jax.lax.fori_loop(0, count, drain, 0)

        phase(rd)

        two_n = 2 * _ROWS_PER_STEP
        P = scr[:]                      # interleaved (w, acc) row pairs
        g = g_ref[:].astype(jnp.float32)   # rows duplicated x2 by caller
        row_id = jax.lax.broadcasted_iota(jnp.int32, (two_n, 128), 0)
        even = (row_id % 2) == 0
        W = jnp.where(even, P, pltpu.roll(P, 1, 0))          # w everywhere
        A = jnp.where(even, pltpu.roll(P, two_n - 1, 0), P)  # acc everywhere
        gp = g + 2.0 * l2_ref[:] * W
        anew = A + gp * gp
        wnew = W - lr * gp / (jnp.sqrt(anew) + eps)
        scr[:] = jnp.where(even, wnew, anew)

        phase(wr)

    return kernel


def _make_scatter_kernel(L):
    def kernel(starts_smem, nvalid_smem, vals_ref, _t_in, t_out, sems):
        base = pl.program_id(0) * _ROWS_PER_STEP
        count = jnp.clip(nvalid_smem[0] - base, 0, _ROWS_PER_STEP)

        def wr(j):
            return pltpu.make_async_copy(
                vals_ref.at[pl.ds(j * L, L), :],
                t_out.at[pl.ds(starts_smem[base + j], L), :],
                sems.at[j % _WINDOW])

        def warm(j, _):
            wr(j).start()
            return 0

        def drain(j, _):
            wr(j).wait()
            @pl.when(j + _WINDOW < count)
            def _():
                wr(j + _WINDOW).start()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(count, _WINDOW), warm, 0)
        jax.lax.fori_loop(0, count, drain, 0)

    return kernel


def _make_scatter_kernel_unrolled(L, unroll):
    """Issue loop with a manual ``unroll``-fold drain: the per-DMA
    scalar-loop overhead is the measured bound of the write-only
    scatter (28.1 ns/DMA dynamic vs 23.3 unrolled,
    tools/scatter_issue_micro.py), and Mosaic's fori_loop only lowers
    unroll=1 — so the drain body is ``unroll`` manual wait+start pairs
    and the trip count is CEILED to a multiple of ``unroll``.  The
    caller guarantees slots in [n_valid, ceil(n_valid)) carry slot 0's
    (start, vals) — the over-issued DMAs then rewrite slot 0's
    destination with identical bytes, which is race-free."""
    assert _WINDOW % unroll == 0

    def kernel(starts_smem, nvalid_smem, vals_ref, _t_in, t_out, sems):
        base = pl.program_id(0) * _ROWS_PER_STEP
        count = jnp.clip(nvalid_smem[0] - base, 0, _ROWS_PER_STEP)
        countc = ((count + unroll - 1) // unroll) * unroll

        def wr(j):
            return pltpu.make_async_copy(
                vals_ref.at[pl.ds(j * L, L), :],
                t_out.at[pl.ds(starts_smem[base + j], L), :],
                sems.at[j % _WINDOW])

        def warm(j, _):
            wr(j).start()
            return 0

        def drain(t, _):
            j0 = t * unroll
            for u in range(unroll):
                wr(j0 + u).wait()
                wr(j0 + u + _WINDOW).start()
            return 0

        def tail(j, _):
            wr(j).wait()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(countc, _WINDOW), warm, 0)
        jax.lax.fori_loop(0, jnp.maximum(countc - _WINDOW, 0) // unroll,
                          drain, 0)
        jax.lax.fori_loop(jnp.maximum(countc - _WINDOW, 0), countc,
                          tail, 0)

    return kernel


def scatter_rows_supported(table, vals, starts, L):
    return (table.ndim == 2 and table.shape[1] == 128
            and table.dtype == jnp.float32
            and vals.ndim == 2 and vals.shape[1] == 128
            and starts.ndim == 1
            and vals.shape[0] == starts.shape[0] * L
            and starts.shape[0] % _ROWS_PER_STEP == 0)


def scatter_rows(table, vals, starts, n_valid, L=1):
    """Write-only row scatter: for j < n_valid, one async DMA copies
    ``vals[L*j : L*j+L]`` into ``table[starts[j] : starts[j]+L]``.

    The read/compute half of a row update is left to XLA (its row GATHER
    lowering is fast — only its scatter is the measured pathology, see
    tools/scatter_micro.py), so the kernel is pure DMA issue: no VMEM
    scratch, no in-kernel compute.  ``starts`` must be sorted and
    non-overlapping over the first ``n_valid`` entries (rows j >= n_valid
    are never written with the unroll=1 kernel; the default unrolled
    kernel may rewrite slot 0's destination with its own bytes — see
    _make_scatter_kernel_unrolled — so slots past n_valid are rewritten
    here to carry slot 0's start and vals).  DEEPCTR_SCATTER_UNROLL
    selects the drain unroll (1 = the dynamic-count kernel)."""
    unroll = int(_os.environ.get("DEEPCTR_SCATTER_UNROLL", "16"))
    if unroll > 1:
        # over-issue safety: slots in [n_valid, ceil_unroll(n_valid))
        # duplicate slot 0 (always valid: the transform's sentinel id 0
        # pins row 0 into every update).  The selects are elementwise
        # epilogues on the update math — XLA fuses them.
        n0 = starts.shape[0]
        safe = jnp.arange(n0, dtype=jnp.int32) < n_valid
        starts = jnp.where(safe, starts, starts[:1])
        v3 = vals.reshape(n0, L, -1).astype(jnp.float32)
        vals = jnp.where(safe[:, None, None], v3, v3[:1]).reshape(
            n0 * L, -1)
        pad = (-n0) % _ROWS_PER_STEP
        if pad:
            starts = jnp.concatenate(
                [starts, jnp.broadcast_to(starts[:1], (pad,))])
            vals = jnp.concatenate(
                [vals, jnp.tile(vals[:L], (pad, 1))])
        kernel = _make_scatter_kernel_unrolled(L, unroll)
    else:
        starts, (vals,) = _pad_to_block(starts, [vals], L=L,
                                        fill=table.shape[0])
        kernel = _make_scatter_kernel(L)
    n = starts.shape[0]
    grid = (n // _ROWS_PER_STEP,)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS_PER_STEP * L, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),      # vals
            pl.BlockSpec(memory_space=pl.ANY),          # table
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((_WINDOW,))],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(table.shape, table.dtype)],
        # operands: 0=starts 1=nvalid 2=vals 3=table -> output 0
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, nv, vals.astype(jnp.float32), table)
    return out


def _make_multi_scatter_kernel(G, L, n):
    def kernel(starts_smem, nvalid_smem, vals_ref, *refs):
        t_outs = refs[G:2 * G]
        sems = refs[-1]
        t = pl.program_id(0)
        count = nvalid_smem[t]
        # refs are compile-time objects: dispatch the grid step's table
        # with G static pl.when branches (scalar-core compares — cheap)
        for tt in range(G):
            @pl.when(t == tt)
            def _(tt=tt):
                dst = t_outs[tt]

                def wr(j):
                    return pltpu.make_async_copy(
                        vals_ref.at[0, pl.ds(j * L, L), :],
                        dst.at[pl.ds(starts_smem[t, j], L), :],
                        sems.at[j % _WINDOW])

                def warm(j, _):
                    wr(j).start()
                    return 0

                def drain(j, _):
                    wr(j).wait()
                    @pl.when(j + _WINDOW < count)
                    def _():
                        wr(j + _WINDOW).start()
                    return 0

                jax.lax.fori_loop(0, jnp.minimum(count, _WINDOW), warm, 0)
                jax.lax.fori_loop(0, count, drain, 0)

    return kernel


def multi_scatter_rows(tables, vals, starts, n_valids, L=1):
    """One-launch row scatter across G tables (the per-table launch
    overhead of 26 separate ``scatter_rows`` calls is a measured ~2-3ms
    of the big-vocab step).

    tables: list of G [R_t, 128] f32 buffers (shapes may differ);
    vals: [G, n*L, 128] new row values; starts: [G, n] int32 physical
    start rows, sorted non-overlapping per table over the first
    ``n_valids[t]`` entries; n_valids: [G] int32.  Returns the G updated
    buffers (in place when donated).  Grid dim 0 is the table index —
    one grid step streams one table's vals block and issues its DMAs."""
    G = len(tables)
    starts, (vals,) = _pad_to_block(starts, [vals], L=L, fill=0, axis=1)
    n = starts.shape[1]
    nv = jnp.asarray(n_valids, jnp.int32).reshape(G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, n * L, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # vals
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * G,    # tables
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * G,
        scratch_shapes=[pltpu.SemaphoreType.DMA((_WINDOW,))],
    )
    outs = pl.pallas_call(
        _make_multi_scatter_kernel(G, L, n),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tables],
        # operands: 0=starts 1=nvalid 2=vals 3..3+G-1=tables -> outputs
        input_output_aliases={3 + k: k for k in range(G)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, nv, vals.astype(jnp.float32), *tables)
    return list(outs)


def _make_arena_scatter_kernel(L):
    def kernel(starts_smem, nvalid_smem, vals_ref, _t_in, t_out, sems):
        t = pl.program_id(0)
        base = pl.program_id(1) * _ROWS_PER_STEP
        count = jnp.clip(nvalid_smem[t] - base, 0, _ROWS_PER_STEP)

        def wr(j):
            return pltpu.make_async_copy(
                vals_ref.at[0, pl.ds(j * L, L), :],
                t_out.at[pl.ds(starts_smem[t, base + j], L), :],
                sems.at[j % _WINDOW])

        def warm(j, _):
            wr(j).start()
            return 0

        def drain(j, _):
            wr(j).wait()
            @pl.when(j + _WINDOW < count)
            def _():
                wr(j + _WINDOW).start()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(count, _WINDOW), warm, 0)
        jax.lax.fori_loop(0, count, drain, 0)

    return kernel


def arena_scatter_rows(arena, vals, starts, n_valids, L=1):
    """One-launch row scatter of G tables' updates into ONE shared arena
    buffer (all sparse tables' interleaved (w, acc) storage concatenated
    — see BaseModel._build_table_state).

    This is the shape the pooled per-table variant (multi_scatter_rows)
    could not reach: with separate table buffers the G vals blocks had to
    be jnp.stack'ed — a full extra HBM round trip that lost end-to-end —
    while here ``vals`` [G, n*L, 128] is the contiguous output of ONE
    batched update computation, so pooling the launches costs nothing.

    arena: [R, 128] f32; vals: [G, n*L, 128]; starts: [G, n] int32
    physical start rows into the arena, sorted non-overlapping per table
    over the first ``n_valids[t]`` entries (later entries may point
    anywhere — they are never read); n_valids: [G] int32.  Returns the
    updated arena (in place when donated)."""
    starts, (vals,) = _pad_to_block(starts, [vals], L=L, fill=0, axis=1)
    G, n = starts.shape
    nv = jnp.asarray(n_valids, jnp.int32).reshape(G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, n // _ROWS_PER_STEP),
        in_specs=[
            pl.BlockSpec((1, _ROWS_PER_STEP * L, 128),
                         lambda t, b, *_: (t, b, 0),
                         memory_space=pltpu.VMEM),      # vals
            pl.BlockSpec(memory_space=pl.ANY),          # arena
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((_WINDOW,))],
    )
    (out,) = pl.pallas_call(
        _make_arena_scatter_kernel(L),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(arena.shape, arena.dtype)],
        # operands: 0=starts 1=nvalid 2=vals 3=arena -> output 0
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, nv, vals.astype(jnp.float32), arena)
    return out


def combined_update_supported(combined, g, rows, L=2):
    """Shape gate for interleaved row-group storage: L=2 (w | acc)
    adagrad pairs, L=3 (w | m | v) adam triples."""
    return (combined.ndim == 2 and combined.shape[1] == 128
            and combined.shape[0] % L == 0
            and combined.dtype == jnp.float32 and g.shape[1] == 128
            and rows.ndim == 1 and rows.shape[0] == g.shape[0])


def fused_row_update_combined(combined, g, rows, n_valid, l2_vec, lr,
                              eps=1e-10):
    """Adagrad update on interleaved [2R, 128] (w, acc) row-pair storage.

    g: [n, 128] gradient of logical rows; rows: [n] int32 LOGICAL row
    ids, sorted unique, first ``n_valid`` in-bounds (< R).  Returns the
    updated combined buffer (in place when donated)."""
    rows, (g,) = _pad_to_block(rows, [g], L=1,
                               fill=combined.shape[0] // 2)
    n = g.shape[0]
    grid = (n // _ROWS_PER_STEP,)
    kernel = _make_kernel_combined(float(lr), float(eps))
    l2 = jnp.broadcast_to(l2_vec.astype(jnp.float32), (1, 128))
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    g2 = jnp.repeat(g.astype(jnp.float32), 2, axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * _ROWS_PER_STEP, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),          # g pairs
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # l2
            pl.BlockSpec(memory_space=pl.ANY),              # combined
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 * _ROWS_PER_STEP, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _WINDOW)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(combined.shape, combined.dtype)],
        # operands: 0=rows 1=nvalid 2=g 3=l2 4=combined -> output 0
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, nv, g2, l2, combined)
    return out
