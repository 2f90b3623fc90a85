"""Pallas TPU kernels for the hot interaction ops.

The flagship kernel is the fused CIN layer (xDeepFM): the jnp form
materializes the [B, H*F, D] outer-interaction tensor in HBM every layer
(deepctr_torch/layers/interaction.py:216-224 does the same via einsum +
Conv1d); here the interaction tensor lives only in VMEM per batch tile and
feeds the channel-mix matmul directly — one HBM round-trip instead of
three.  Everything is D-major ([batch, emb_dim, feature_maps]) so the
contraction runs over the H*F axis with good MXU tiling.

Autodiff: `cin_mix` carries a custom VJP; the backward runs through the
einsum form (XLA's contraction scheduling beat a hand-rolled Pallas
backward by ~2x at bench shapes — measured, see _cin_mix_bwd).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch rows processed per grid step; 8 keeps z (bt*D*H*F) comfortably in
# VMEM at CIN-scale shapes while giving the MXU a [bt*D, HF] LHS
_BT = 8


def _cin_shapes(hidden_t, x0_t, w):
    B, D, H = hidden_t.shape
    F = x0_t.shape[2]
    O = w.shape[0]
    return B, D, H, F, O


def cin_mix_supported(hidden_t, x0_t, w):
    B, D, H, F, O = _cin_shapes(hidden_t, x0_t, w)
    if B % _BT != 0:
        return False
    # the interaction is built from F chunks of width H: only lane-aligned
    # H wins (measured: H=128 -> 1.8x faster than XLA; H=26 -> 7x slower)
    if H % 128 != 0:
        return False
    # per-tile VMEM estimate: z + inputs + weights + out (f32)
    z_bytes = _BT * D * H * F * 4
    fixed = (O * H * F + _BT * D * (H + F + O)) * 4
    return z_bytes + fixed < 12 * 1024 * 1024


def _interaction(h2, x2, H, F):
    """z2[(b,d), f*H+h] = x2[(b,d), f] * h2[(b,d), h].

    Built as F lane-aligned [*, H] chunks (a single 4-D reshape that merges
    the lane axis is not representable in Mosaic)."""
    return jnp.concatenate([x2[:, f:f + 1] * h2 for f in range(F)], axis=1)


def _fwd_kernel(h_ref, x_ref, wt_ref, out_ref):
    h = h_ref[:]                              # [bt, D, H] native dtype
    x = x_ref[:]                              # [bt, D, F]
    bt, D, H = h.shape
    F = x.shape[2]
    h2 = h.reshape(bt * D, H)
    x2 = x.reshape(bt * D, F)
    z2 = _interaction(h2, x2, H, F)           # [bt*D, K]
    out = jnp.dot(z2, wt_ref[:],
                  preferred_element_type=jnp.float32)   # [bt*D, O]
    out_ref[:] = out.reshape(bt, D, -1).astype(out_ref.dtype)


def _cin_pallas_fwd(hidden_t, x0_t, wt):
    B, D, H = hidden_t.shape
    F = x0_t.shape[2]
    K, O = wt.shape
    grid = (B // _BT,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BT, D, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, D, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BT, D, O), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, O), hidden_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * K * O,
            bytes_accessed=4 * (B * D * (H + F + O) + K * O),
            transcendentals=0),
    )(hidden_t, x0_t, wt)


@jax.custom_vjp
def _cin_mix_wt(hidden_t, x0_t, wt):
    """Fused CIN layer on the K-major weight: wt [H*F, O]."""
    return _cin_pallas_fwd(hidden_t, x0_t, wt)


def _cin_mix_fwd(hidden_t, x0_t, wt):
    return _cin_pallas_fwd(hidden_t, x0_t, wt), (hidden_t, x0_t, wt)


def _cin_mix_bwd(res, g):
    """Explicit einsum backward (XLA's contraction scheduling beat a
    hand-rolled Pallas backward ~2x at bench shapes).  Written directly —
    not via jax.vjp of an einsum forward, which would re-run the whole
    forward just to build residuals."""
    hidden_t, x0_t, wt = res
    B, D, H = hidden_t.shape
    F = x0_t.shape[2]
    dz = jnp.einsum("bdo,ko->bdk", g, wt).reshape(B, D, F, H)
    dh = jnp.einsum("bdfh,bdf->bdh", dz, x0_t)
    dx = jnp.einsum("bdfh,bdh->bdf", dz, hidden_t)
    z = jnp.einsum("bdf,bdh->bdfh", x0_t, hidden_t).reshape(B, D, F * H)
    dwt = jnp.einsum("bdk,bdo->ko", z, g)
    return dh, dx, dwt.astype(wt.dtype)


_cin_mix_wt.defvjp(_cin_mix_fwd, _cin_mix_bwd)


def cin_mix(hidden_t, x0_t, w3):
    """Fused CIN layer, D-major: hidden_t [B,D,H], x0_t [B,D,F],
    w3 [O,H,F] -> [B,D,O] with out[b,d,o] = sum_{h,f} w3[o,h,f] *
    hidden_t[b,d,h] * x0_t[b,d,f]."""
    F, H = x0_t.shape[2], hidden_t.shape[2]
    O = w3.shape[0]
    # kernel weight layout: wt[f*H+h, o]  (differentiable transpose/reshape)
    wt = jnp.transpose(w3, (2, 1, 0)).reshape(F * H, O)
    return _cin_mix_wt(hidden_t, x0_t, wt)
