"""Runtime dispatch between Pallas TPU kernels and jnp reference ops."""

from .. import config
from . import reference as _ref


def _pallas():
    if not config.use_pallas():
        return None
    try:
        from . import pallas as _p
        return _p
    except Exception:
        return None


def fm_cross(inputs):
    # no Pallas kernel: the FM reduction is far below the HBM roofline
    # already (tools/speed_of_light.py reports it under the measurement
    # floor) — XLA's fusion is the right tool here
    return _ref.fm_cross_ref(inputs)


def cin_layer(hidden, x0, w, b):
    return _ref.cin_layer_ref(hidden, x0, w, b)


def cin_mix(hidden_t, x0_t, w3, training=True, out_dtype=None):
    """Pallas CIN dispatch.

    Training: opt-in only (``set_use_pallas(True)``), not 'auto' — the
    kernel wins the isolated forward at lane-aligned shapes (1.8x at
    H=128) but measured slower inside the full jitted train step (custom
    VJP fusion barrier + layout conversions at the kernel boundary), so
    the XLA einsum path is the training default.

    Inference (``training=False``): the forward kernel IS the whole op —
    no VJP barrier exists — so it dispatches on 'auto' like the other
    inference kernels (see layers/sequence.py attention dispatch)."""
    if config.use_pallas_explicit() or (not training and config.use_pallas()):
        p = _pallas()
        if p is not None and p.cin_mix_supported(hidden_t, x0_t, w3):
            out = p.cin_mix(hidden_t, x0_t, w3)
            return out if out_dtype is None else out.astype(out_dtype)
    return _ref.cin_mix_ref(hidden_t, x0_t, w3, out_dtype=out_dtype)


def cross_net(x, kernels, bias, parameterization="vector"):
    return _ref.cross_net_ref(x, kernels, bias, parameterization)


def din_attention(scores, keys, keys_masks, weight_normalization,
                  return_score):
    return _ref.din_attention_ref(scores, keys, keys_masks,
                                  weight_normalization, return_score)
