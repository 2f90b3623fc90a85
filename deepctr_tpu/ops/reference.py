"""Pure-jnp reference implementations of the hot interaction ops.

These are the correctness oracles for the Pallas kernels and the fallback
path off-TPU.  Shapes are static; everything lowers to fused XLA HLO.
"""

import jax
import jax.numpy as jnp


def fm_cross_ref(inputs):
    """FM order-2 interaction: [B, F, E] -> [B, 1].

    0.5 * sum_e((sum_f v)^2 - sum_f v^2).
    (reference math: deepctr_torch/layers/interaction.py:26-34)
    """
    square_of_sum = jnp.sum(inputs, axis=1, keepdims=True) ** 2
    sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
    cross = square_of_sum - sum_of_square
    return 0.5 * jnp.sum(cross, axis=2)


def cin_layer_ref(hidden, x0, w, b):
    """One CIN layer: outer interaction + 1x1 channel-mix.

    hidden [B,H,D], x0 [B,F,D], w [O, H*F], b [O] -> [B,O,D].
    Equivalent to einsum('bhd,bmd->bhmd') reshape + Conv1d(k=1)
    (reference math: deepctr_torch/layers/interaction.py:216-224).
    """
    B, H, D = hidden.shape
    F = x0.shape[1]
    z = jnp.einsum("bhd,bmd->bhmd", hidden, x0).reshape(B, H * F, D)
    return jnp.einsum("oc,bcd->bod", w, z) + b[None, :, None]


def cin_mix_ref(hidden_t, x0_t, w3, out_dtype=None):
    """D-major CIN layer: hidden_t [B,D,H], x0_t [B,D,F], w3 [O,H,F]
    -> [B,D,O].  Same math as :func:`cin_layer_ref` with the emb axis
    leading (out[b,d,o] = sum_{h,f} w3[o,h,f] h[b,d,h] x[b,d,f]).

    ``out_dtype`` requests the contraction's accumulation/output dtype
    (f32 under the CIN's f32-carry policy: bf16 operands run the MXU at
    bf16 rate while the layer output never rounds to bf16 — see
    layers/interaction.CIN)."""
    z = jnp.einsum("bdh,bdf->bdhf", hidden_t, x0_t)
    if out_dtype is None:
        return jnp.einsum("bdhf,ohf->bdo", z, w3)
    return jnp.einsum("bdhf,ohf->bdo", z, w3,
                      preferred_element_type=out_dtype)


def cross_net_ref(x, kernels, bias, parameterization="vector"):
    """DCN cross stack: x [B,n]; kernels [L,n,1] or [L,n,n]; bias [L,n,1].

    vector: x_{l+1} = x0 * (x_l . w_l) + b_l + x_l
    matrix: x_{l+1} = x0 * (W_l x_l + b_l) + x_l
    (reference math: deepctr_torch/layers/interaction.py:438-453)
    """
    L = kernels.shape[0]
    x0 = x
    xl = x0
    for i in range(L):
        if parameterization == "vector":
            xl_w = xl @ kernels[i]                       # [B,1]
            xl = x0 * xl_w + bias[i][:, 0][None] + xl
        else:
            xl_w = xl @ kernels[i].T                     # [B,n]
            xl = x0 * (xl_w + bias[i][:, 0][None]) + xl
    return xl


def din_attention_ref(scores, keys, keys_masks, weight_normalization,
                      return_score):
    """Masked (optionally softmax) attention readout over history.

    scores [B,1,T], keys [B,T,E], keys_masks [B,1,T] bool.
    (reference math: deepctr_torch/layers/sequence.py:133-154)
    """
    if weight_normalization:
        paddings = jnp.full_like(scores, (-2.0 ** 32 + 1))
    else:
        paddings = jnp.zeros_like(scores)
    outputs = jnp.where(keys_masks, scores, paddings)
    if weight_normalization:
        outputs = jax.nn.softmax(outputs, axis=-1)
    if not return_score:
        outputs = jnp.matmul(outputs, keys)              # [B,1,E]
    return outputs
