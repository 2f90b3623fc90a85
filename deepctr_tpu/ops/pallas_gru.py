"""Fused Pallas (AU)GRU scan for DIEN/DIN sequence recurrences.

Why: the masked ``lax.scan`` GRU (layers/sequence.py MaskedGRU /
DynamicGRU — the TPU replacement for the reference's PackedSequence
python loop, deepctr_torch/layers/sequence.py:285-320) costs ~2/3 of a
DIEN training step at EVERY maxlen (tools/seq_train_bench.py).  The body
is a tiny [B,H]x[H,3H] matmul plus gates — ~12us per While iteration of
dispatch/copy overhead for <1us of math.  This kernel runs the WHOLE
recurrence inside one ``pallas_call``: the hoisted input gates
[T, B, 3H] stream through VMEM in double-buffered time chunks, the
carry h lives in a VMEM scratch across grid steps, and each timestep is
pure VPU gate math around one small MXU matmul.

Variants (one kernel family, static ``mode``):
  "gru"    h' = (1-z)*n + z*h                       (MaskedGRU, torch gates)
  "agru"   h' = (1-a)*h + a*n                       (DynamicGRU AGRU)
  "augru"  u = a*z ;  h' = (1-u)*h + u*n            (DynamicGRU AUGRU)
with r = sigmoid(i_r+h_r), z = sigmoid(i_z+h_z), n = tanh(i_n + r*h_n).

Masking: a PRECOMPUTED float mask m[B,T] in {0,1} (not in-kernel
iota/compare — a documented Mosaic miscompile class, see
ops/pallas_update.py):  h_next = h + m*(h' - h),  out_t = m*h'.

Training: custom VJP.  The forward additionally writes the carry
sequence h_{t-1} (the only residual the backward cannot recompute); the
backward is a second Pallas kernel running the time loop in REVERSE
grid order, recomputing the gates from (carry, gi) — the same
remat-over-saved-residuals trade the scan path uses
(DEEPCTR_SCAN_REMAT) — and accumulating dW_hh / db_hh in f32 scratch
across the whole grid.

Grid layout: grid = (B/B_blk, T/Tc); the time dimension is minor so the
carry scratch is sequential per batch block; both dims are "arbitrary"
(sequential) semantics.  ALL operands are time-major [T, B, *] so the
per-step read ``ref[k]`` is a contiguous major-dim index; per-step
scalars (mask, att) are carried as [T, B, 1] — a [B, T] layout's
(B_blk, Tc) blocks violate Mosaic's (8, 128)-divisibility rule on the
minor dim (found on first real-TPU compile; the interpreter does not
enforce it), while (Tc, B_blk, 1) blocks pass (minor dim equals the
full array dim) and ``ref[k]`` yields the [B_blk, 1] broadcast shape
the gate math wants with no relayout.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MODES = ("gru", "agru", "augru")
_VMEM_LIMIT = 64 * 1024 * 1024   # v5e has 128MB; the 16MB default OOMs


def _pick_block(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def gru_scan_supported(B, T, H, dtype):
    """Shape gate for the fused scan.  Returns (ok, B_blk, Tc)."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False, 0, 0
    B_blk = _pick_block(B, (256, 128, 64))
    if B_blk is None:
        return False, 0, 0
    Tc = 16 if T >= 64 else 8
    # VMEM estimate per grid step (double-buffered inputs + outputs):
    # gi + outs + carries + douts/dgi (bwd is the wider one)
    itemsize = jnp.dtype(dtype).itemsize
    per_chunk = Tc * B_blk * (3 * H + 3 * H + H + H + H) * itemsize
    # the backward's unrolled-Tc f32 gate intermediates measure ~2x this
    # estimate (the 16MB default scoped-vmem limit OOM'd at an estimated
    # 9.4MB on the first real-TPU augru bwd compile); both pallas_calls
    # raise vmem_limit_bytes to _VMEM_LIMIT, and this gate keeps the
    # estimate within a quarter of it
    if 2 * per_chunk + B_blk * H * 4 > _VMEM_LIMIT // 4:
        return False, 0, 0
    return True, B_blk, Tc


def _gates(gi_t, gh, H):
    # operands are f32 regardless of storage dtype: bf16 gate math hits
    # a Mosaic verifier bug (jax.nn.sigmoid's lowering broadcasts an f32
    # scalar into a bf16 vector — found on first real-TPU bf16 compile),
    # and f32 VPU ops run at the same rate anyway; only HBM traffic
    # (gi/outs/carry) stays in the storage dtype
    r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi_t[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gi_t[:, 2 * H:] + r * gh[:, 2 * H:])
    return r, z, n


def _make_fwd_kernel(mode, Tc, H, save_carry):
    has_att = mode != "gru"

    def kernel(gi_ref, m_ref, *refs):
        if has_att:
            a_ref, whh_ref, bhh_ref, outs_ref, hlast_ref, *rest = refs
        else:
            whh_ref, bhh_ref, outs_ref, hlast_ref, *rest = refs
        if save_carry:
            carry_ref, h_scr = rest
        else:
            carry_ref, (h_scr,) = None, rest

        @pl.when(pl.program_id(1) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)

        dt = gi_ref.dtype
        f32 = jnp.float32
        whh = whh_ref[:].astype(f32)
        bhh = bhh_ref[:].astype(f32)                       # [1, 3H]
        for k in range(Tc):
            h = h_scr[:]                                   # f32 scratch
            if save_carry:
                carry_ref[k] = h.astype(dt)
            gi_t = gi_ref[k].astype(f32)                   # [B_blk, 3H]
            gh = jnp.dot(h, whh, preferred_element_type=f32) + bhh
            r, z, n = _gates(gi_t, gh, H)
            if mode == "gru":
                h_new = (1.0 - z) * n + z * h
            else:
                a = a_ref[k].astype(f32)                   # [B_blk, 1]
                u = a * z if mode == "augru" else a
                h_new = (1.0 - u) * h + u * n
            m = m_ref[k].astype(f32)                       # [B_blk, 1]
            outs_ref[k] = (m * h_new).astype(dt)
            h_scr[:] = h + m * (h_new - h)
        hlast_ref[:] = h_scr[:].astype(dt)

    return kernel


def _make_bwd_kernel(mode, Tc, H):
    has_att = mode != "gru"

    def kernel(gi_ref, carry_ref, m_ref, *refs):
        if has_att:
            (a_ref, whh_ref, bhh_ref, douts_ref, dhl_ref,
             dgi_ref, dwhh_ref, dbhh_ref, datt_ref,
             dh_scr, dw_scr, db_scr) = refs
        else:
            (whh_ref, bhh_ref, douts_ref, dhl_ref,
             dgi_ref, dwhh_ref, dbhh_ref,
             dh_scr, dw_scr, db_scr) = refs

        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_scr[:] = dhl_ref[:].astype(jnp.float32)

        @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                 pl.program_id(1) == 0))
        def _():
            dw_scr[:] = jnp.zeros_like(dw_scr)
            db_scr[:] = jnp.zeros_like(db_scr)

        dt = gi_ref.dtype
        f32 = jnp.float32
        whh = whh_ref[:].astype(f32)
        bhh = bhh_ref[:].astype(f32)
        for k in reversed(range(Tc)):
            h = carry_ref[k].astype(f32)                   # h_{t-1}
            gi_t = gi_ref[k].astype(f32)
            gh = jnp.dot(h, whh, preferred_element_type=f32) + bhh
            r, z, n = _gates(gi_t, gh, H)
            m = m_ref[k].astype(f32)
            dh = dh_scr[:]                                 # f32 scratch
            g_new = m * (dh + douts_ref[k].astype(f32))
            if mode == "gru":
                dn = g_new * (1.0 - z)
                dz = g_new * (h - n)
                dh_direct = g_new * z
            else:
                a = a_ref[k].astype(f32)
                u = a * z if mode == "augru" else a
                dn = g_new * u
                du = g_new * (n - h)
                dh_direct = g_new * (1.0 - u)
                if mode == "augru":
                    da = jnp.sum(du * z, axis=1, keepdims=True)
                    dz = du * a
                else:
                    da = jnp.sum(du, axis=1, keepdims=True)
                    dz = jnp.zeros_like(du)
                datt_ref[k] = da.astype(dt)
            d_pre_n = dn * (1.0 - n * n)
            d_pre_z = dz * z * (1.0 - z)
            dr = d_pre_n * gh[:, 2 * H:]
            d_pre_r = dr * r * (1.0 - r)
            d_gh = jnp.concatenate(
                [d_pre_r, d_pre_z, d_pre_n * r], axis=1)   # [B_blk, 3H]
            dgi_ref[k] = jnp.concatenate(
                [d_pre_r, d_pre_z, d_pre_n], axis=1).astype(dt)
            dh_scr[:] = ((1.0 - m) * dh + dh_direct
                         + jax.lax.dot_general(
                             d_gh, whh, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32))
            dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
                h, d_gh, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)                # [H, 3H] f32
            db_scr[:] = db_scr[:] + jnp.sum(d_gh, axis=0, keepdims=True)
        dwhh_ref[:] = dw_scr[:]
        dbhh_ref[:] = db_scr[:]

    return kernel


def _fwd_call(cfg, gi, whh_t, bhh2, mask, att, save_carry=True):
    mode, B_blk, Tc, interpret = cfg
    T, B, H3 = gi.shape
    H = H3 // 3
    grid = (B // B_blk, T // Tc)
    dt = gi.dtype
    tmaj = lambda w: pl.BlockSpec((Tc, B_blk, w), lambda b, t: (t, b, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [tmaj(3 * H), tmaj(1)]
    args = [gi, mask]
    if mode != "gru":
        in_specs.append(tmaj(1))
        args.append(att)
    in_specs += [full((H, 3 * H)), full((1, 3 * H))]
    args += [whh_t, bhh2]
    out_specs = [tmaj(H),
                 pl.BlockSpec((B_blk, H), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T, B, H), dt),
                 jax.ShapeDtypeStruct((B, H), dt)]
    if save_carry:
        # h_{t-1} residuals for the backward; the primal/inference call
        # omits them (~1/3 of the forward's output bandwidth)
        out_specs.append(tmaj(H))
        out_shape.append(jax.ShapeDtypeStruct((T, B, H), dt))
    res = pl.pallas_call(
        _make_fwd_kernel(mode, Tc, H, save_carry),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((B_blk, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * H * 3 * H + 12 * B * T * H,
            bytes_accessed=gi.size * gi.dtype.itemsize
            + 3 * T * B * H * jnp.dtype(dt).itemsize,
            transcendentals=3 * B * T * H),
        interpret=interpret,
    )(*args)
    if save_carry:
        outs, hlast, carry = res
    else:
        (outs, hlast), carry = res, None
    return outs, hlast, carry


def _bwd_call(cfg, gi, carry, whh_t, bhh2, mask, att, douts, dhlast):
    mode, B_blk, Tc, interpret = cfg
    T, B, H3 = gi.shape
    H = H3 // 3
    grid = (B // B_blk, T // Tc)
    nT = T // Tc
    dt = gi.dtype
    tmaj_r = lambda w: pl.BlockSpec(
        (Tc, B_blk, w), lambda b, t: (nT - 1 - t, b, 0),
        memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [tmaj_r(3 * H), tmaj_r(H), tmaj_r(1)]
    args = [gi, carry, mask]
    if mode != "gru":
        in_specs.append(tmaj_r(1))
        args.append(att)
    in_specs += [full((H, 3 * H)), full((1, 3 * H)), tmaj_r(H),
                 pl.BlockSpec((B_blk, H), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)]
    args += [whh_t, bhh2, douts, dhlast]
    out_specs = [tmaj_r(3 * H), full((H, 3 * H)), full((1, 3 * H))]
    out_shape = [jax.ShapeDtypeStruct((T, B, 3 * H), dt),
                 jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
                 jax.ShapeDtypeStruct((1, 3 * H), jnp.float32)]
    if mode != "gru":
        out_specs.append(tmaj_r(1))
        out_shape.append(jax.ShapeDtypeStruct((T, B, 1), dt))
    res = pl.pallas_call(
        _make_bwd_kernel(mode, Tc, H),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((B_blk, H), jnp.float32),
                        pltpu.VMEM((H, 3 * H), jnp.float32),
                        pltpu.VMEM((1, 3 * H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * T * H * 3 * H + 24 * B * T * H,
            bytes_accessed=3 * gi.size * gi.dtype.itemsize,
            transcendentals=3 * B * T * H),
        interpret=interpret,
    )(*args)
    if mode != "gru":
        dgi, dwhh, dbhh, datt = res
    else:
        dgi, dwhh, dbhh = res
        datt = None
    return dgi, dwhh, dbhh, datt


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _scan_noatt(cfg, gi, whh_t, bhh2, mask):
    outs, hlast, _ = _fwd_call(cfg, gi, whh_t, bhh2, mask, None,
                               save_carry=False)
    return outs, hlast


def _scan_noatt_fwd(cfg, gi, whh_t, bhh2, mask):
    outs, hlast, carry = _fwd_call(cfg, gi, whh_t, bhh2, mask, None)
    return (outs, hlast), (gi, carry, whh_t, bhh2, mask)


def _scan_noatt_bwd(cfg, res, cts):
    gi, carry, whh_t, bhh2, mask = res
    douts, dhlast = cts
    dgi, dwhh, dbhh, _ = _bwd_call(cfg, gi, carry, whh_t, bhh2, mask,
                                   None, douts, dhlast)
    return (dgi, dwhh.astype(whh_t.dtype), dbhh.astype(bhh2.dtype),
            jnp.zeros_like(mask))


_scan_noatt.defvjp(_scan_noatt_fwd, _scan_noatt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _scan_att(cfg, gi, whh_t, bhh2, mask, att):
    outs, hlast, _ = _fwd_call(cfg, gi, whh_t, bhh2, mask, att,
                               save_carry=False)
    return outs, hlast


def _scan_att_fwd(cfg, gi, whh_t, bhh2, mask, att):
    outs, hlast, carry = _fwd_call(cfg, gi, whh_t, bhh2, mask, att)
    return (outs, hlast), (gi, carry, whh_t, bhh2, mask, att)


def _scan_att_bwd(cfg, res, cts):
    gi, carry, whh_t, bhh2, mask, att = res
    douts, dhlast = cts
    dgi, dwhh, dbhh, datt = _bwd_call(cfg, gi, carry, whh_t, bhh2, mask,
                                      att, douts, dhlast)
    return (dgi, dwhh.astype(whh_t.dtype), dbhh.astype(bhh2.dtype),
            jnp.zeros_like(mask), datt)


_scan_att.defvjp(_scan_att_fwd, _scan_att_bwd)


def gru_scan(gi, whh_t, bhh, mask, att=None, mode="gru", interpret=False):
    """Fused masked GRU scan over precomputed input gates.

    gi    [T, B, 3H]  input gates (x @ W_ih^T + b_ih, torch gate order)
    whh_t [H, 3H]     recurrent weight, transposed (gh = h @ whh_t + bhh)
    bhh   [3H]
    mask  [B, T]      float {0,1}: step t updates row b iff mask[b,t]
    att   [B, T]      attention scores (agru/augru only)
    Returns (outs [T, B, H] zero-masked, h_last [B, H]).
    (mask/att are re-laid out to [T, B, 1] internally — see module
    docstring on Mosaic block divisibility.)

    Pads T up to the chunk size internally (padded steps carry mask 0,
    so they pass the carry through and emit zero rows).

    Callers MUST pre-gate with :func:`gru_scan_supported` (B a multiple
    of 64, f32/bf16, VMEM budget) — unsupported shapes raise here; the
    dispatch layer (layers/sequence.py _gru_recurrence) enforces the
    gate and falls back to the masked ``lax.scan``.
    """
    if mode not in _MODES:
        raise ValueError(mode)
    T, B, H3 = gi.shape
    H = H3 // 3
    ok, B_blk, Tc = gru_scan_supported(B, T, H, gi.dtype)
    if not ok:
        raise ValueError("unsupported shape for gru_scan: %r"
                         % ((T, B, H, gi.dtype),))
    mask = jnp.swapaxes(mask, 0, 1)[:, :, None]            # [T, B, 1]
    if att is not None:
        att = jnp.swapaxes(att, 0, 1)[:, :, None]
    Tp = -(-T // Tc) * Tc
    if Tp != T:
        gi = jnp.pad(gi, ((0, Tp - T), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, Tp - T), (0, 0), (0, 0)))
        if att is not None:
            att = jnp.pad(att, ((0, Tp - T), (0, 0), (0, 0)))
    cfg = (mode, B_blk, Tc, interpret)
    bhh2 = bhh.reshape(1, -1)
    if mode == "gru":
        outs, hlast = _scan_noatt(cfg, gi, whh_t, bhh2, mask)
    else:
        outs, hlast = _scan_att(cfg, gi, whh_t, bhh2, mask, att)
    return outs[:T], hlast
