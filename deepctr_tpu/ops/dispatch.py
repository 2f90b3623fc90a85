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
    p = _pallas()
    if p is not None and p.fm_cross_supported(inputs):
        return p.fm_cross(inputs)
    return _ref.fm_cross_ref(inputs)


def cin_layer(hidden, x0, w, b):
    p = _pallas()
    if p is not None and p.cin_layer_supported(hidden, x0, w):
        return p.cin_layer(hidden, x0, w, b)
    return _ref.cin_layer_ref(hidden, x0, w, b)


def cross_net(x, kernels, bias, parameterization="vector"):
    return _ref.cross_net_ref(x, kernels, bias, parameterization)


def din_attention(scores, keys, keys_masks, weight_normalization,
                  return_score):
    return _ref.din_attention_ref(scores, keys, keys_masks,
                                  weight_normalization, return_score)
