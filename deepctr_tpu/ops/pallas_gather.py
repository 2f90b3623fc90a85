"""Pallas row-gather kernel for large embedding tables.

XLA's gather lowering collapses on big tables (measured ~1ms for 4096 rows
from a [260k, 16] table vs ~0.02ms from [10k, 16] tables); production CTR
tables are orders of magnitude larger.  This kernel keeps the table in
HBM and issues a rolling window of async row DMAs that overlap instead of
serializing.

TPU DMA slices must be 128-lane aligned, so a [V, W] table with W < 128 is
stored PACKED: ``pack = 128 // W`` consecutive vocab rows per aligned
[1, 128] tile row ([ceil(V/pack), 128]).  The kernel DMAs the whole
128-lane row containing the wanted id (pack-fold fetch amplification —
still far less traffic than XLA's big-table path), zeroes the other lane
groups with a precomputed per-row mask, and folds the 128 lanes onto the
first W with a circular-roll tree reduction.  (A one-hot matmul fold and
in-kernel iota/compare variants both MISCOMPILE on this Mosaic version —
verified against raw DMA dumps; rolls are the reliable primitive.)

Forward-only: the backward (scatter-add) stays on XLA via custom VJP.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_PER_STEP = 1024    # ids resolved per grid step
_WINDOW = 16             # outstanding row DMAs


def _gather_kernel(ids_smem, mask_ref, table_ref, out_ref, scratch, sems,
                   *, pack, width):
    base = pl.program_id(0) * _ROWS_PER_STEP

    def dma(j):
        prow = ids_smem[base + j] // pack
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(prow, 1), :],
            scratch.at[pl.ds(j, 1), :],
            sems.at[j % _WINDOW])

    for j in range(_WINDOW):
        dma(j).start()

    def body(j, _):
        dma(j).wait()
        @pl.when(j + _WINDOW < _ROWS_PER_STEP)
        def _():
            dma(j + _WINDOW).start()
        return 0

    jax.lax.fori_loop(0, _ROWS_PER_STEP, body, 0)

    if pack == 1:
        out_ref[:] = scratch[:]
        return
    # zero every lane group except the id's own, then fold the groups onto
    # lanes [0, W) with a circular-roll tree sum (exactly one group is
    # nonzero, so the sum is a select)
    acc = scratch[:] * mask_ref[:]
    shift = width
    while shift < 128:
        acc = acc + pltpu.roll(acc, 128 - shift, 1)
        shift *= 2
    out_ref[:] = acc


def pack_table(table):
    """[V, W] -> ([ceil(V/pack), 128], pack) with pack = 128 // W."""
    V, W = table.shape
    if 128 % W != 0:
        raise ValueError("gather kernel requires W dividing 128, got %d" % W)
    pack = 128 // W
    vpad = (-V) % pack
    padded = jnp.pad(table, ((0, vpad), (0, 0)))
    return padded.reshape((V + vpad) // pack, 128), pack


def gather_rows_supported(table, ids):
    return (ids.ndim == 1 and ids.shape[0] % _ROWS_PER_STEP == 0
            and table.ndim == 2 and 128 % table.shape[1] == 0)


def _gather_rows_pallas(packed, ids, width, pack):
    n = ids.shape[0]
    grid = (n // _ROWS_PER_STEP,)
    kernel = functools.partial(_gather_kernel, pack=pack, width=width)
    lane_group = (jnp.arange(128, dtype=jnp.int32) // width)[None, :]
    mask = (lane_group == (ids % pack).astype(jnp.int32)[:, None]
            ).astype(packed.dtype)                       # [n, 128]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS_PER_STEP, 128), lambda i, ids_ref: (i, 0),
                         memory_space=pltpu.VMEM),      # group mask per row
            pl.BlockSpec(memory_space=pltpu.HBM),       # packed table
        ],
        out_specs=pl.BlockSpec((_ROWS_PER_STEP, 128),
                               lambda i, ids_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_ROWS_PER_STEP, 128), packed.dtype),
            pltpu.SemaphoreType.DMA((_WINDOW,)),
        ],
    )
    wide = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 128), packed.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, mask, packed)
    return wide[:, :width]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_packed(packed, ids, width, pack):
    """Differentiable lookup on a PACKED table [Vp, 128] (the storage
    format of big tables in EmbeddingDict): ids refer to logical vocab
    rows; returns [n, width]."""
    return _gather_rows_pallas(packed, ids, width, pack)


def _gather_packed_fwd(packed, ids, width, pack):
    return _gather_rows_pallas(packed, ids, width, pack), (packed, ids)


def _gather_packed_bwd(width, pack, res, g):
    """Scatter-add directly in the packed layout: widen each [width] grad
    row to the [128] lane row it came from (tile + group mask — the same
    mask as the forward), then row-scatter at the packed row index.  A
    detour through an unpacked [V, width] buffer costs a full-table
    relayout per table per step (measured: slower than no packing)."""
    packed, ids = res
    prow = ids // pack
    lane_group = (jnp.arange(128, dtype=jnp.int32) // width)[None, :]
    mask = (lane_group == (ids % pack).astype(jnp.int32)[:, None]
            ).astype(packed.dtype)
    g_wide = jnp.tile(g.astype(packed.dtype), (1, pack)) * mask
    return jnp.zeros_like(packed).at[prow].add(g_wide), None


gather_rows_packed.defvjp(_gather_packed_fwd, _gather_packed_bwd)


@jax.custom_vjp
def gather_rows(table, ids):
    """table [V, W] (W divides 128), ids int32 [n] -> [n, W]."""
    packed, pack = pack_table(table)
    return _gather_rows_pallas(packed, ids, table.shape[1], pack)


def _gather_fwd(table, ids):
    packed, pack = pack_table(table)
    out = _gather_rows_pallas(packed, ids, table.shape[1], pack)
    # residuals must be JAX values; `table` is a live parameter anyway, so
    # saving it costs a reference, not a copy (only its shape is used)
    return out, (table, ids)


def _gather_bwd(res, g):
    table, ids = res
    dtable = jnp.zeros_like(table).at[ids].add(g.astype(table.dtype))
    return dtable, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
