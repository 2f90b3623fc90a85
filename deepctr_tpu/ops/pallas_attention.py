"""Fused Pallas DIN attention-over-history kernel (inference path).

Fuses the whole AttentionSequencePoolingLayer readout — LocalActivationUnit
MLP over [q, k, q-k, q*k], padding mask, optional softmax, weighted sum —
into one kernel, so the [B, T, 4E] attention input and the [B, T, H]
activations never round-trip through HBM (reference math:
deepctr_torch/layers/core.py:10-64 + layers/sequence.py:133-154).

One grid step handles one sample: keys [T, E] stream through VMEM once,
the MLP runs on the MXU at [T, 4E] x [4E, H], softmax reduces over
sublanes, and the readout is a masked sum — no transposes, no lane-split
reshapes, no in-kernel iota (all documented Mosaic pitfalls; masks are
precomputed host-side like ops/pallas_gather.py does).

Forward-only: dispatched on the inference path (training falls back to
the jnp composition, which autodiff handles).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -2.0 ** 32 + 1.0   # reference mask constant (sequence.py:133-154)


def _act(name, x):
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "linear":
        return x
    raise ValueError(name)


def _kernel(q_ref, keys_ref, mask_ref, *refs, n_hidden,
            activation, weight_normalization, T, E):
    w_refs, out_ref = refs[:-1], refs[-1]
    q = q_ref[0].astype(jnp.float32)                      # [1, E]
    keys = keys_ref[0].astype(jnp.float32)                # [T, E]
    mask = mask_ref[0].astype(jnp.float32)                # [T, 1]
    qb = jnp.broadcast_to(q, (T, E))
    x = jnp.concatenate([qb, keys, qb - keys, qb * keys], axis=1)
    for i in range(n_hidden):
        w = w_refs[2 * i][...].astype(jnp.float32)
        b = w_refs[2 * i + 1][...].astype(jnp.float32)    # [1, H]
        x = _act(activation, jnp.dot(
            x, w, preferred_element_type=jnp.float32) + b)
    w_o = w_refs[-2][...].astype(jnp.float32)             # [H, 1]
    b_o = w_refs[-1][...].astype(jnp.float32)             # [1, 1]
    s = jnp.dot(x, w_o, preferred_element_type=jnp.float32) + b_o  # [T, 1]
    if weight_normalization:
        s = s * mask + (1.0 - mask) * _NEG
        s = s - jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s)
        s = e / jnp.sum(e, axis=0, keepdims=True)
    else:
        s = s * mask
    out_ref[0] = jnp.sum(s * keys, axis=0, keepdims=True).astype(
        out_ref.dtype)                                    # [1, E]


def din_attention_fused_supported(query, keys, hidden_units, activation):
    B, T, E = keys.shape
    return (query.shape == (B, 1, E) and T % 8 == 0 and E <= 512
            and len(hidden_units) >= 1
            and activation in ("sigmoid", "relu", "linear"))


def din_attention_fused(query, keys, mask, layer_params, activation,
                        weight_normalization):
    """query [B,1,E], keys [B,T,E], mask [B,T] (1=valid), layer_params =
    [(W, b), ...] hidden layers then the final (W_out [H,1], b_out [1]).
    Returns [B, 1, E]."""
    B, T, E = keys.shape
    n_hidden = len(layer_params) - 1
    mask3 = mask.astype(jnp.float32).reshape(B, T, 1)

    flat_params = []
    for w, b in layer_params:
        flat_params.append(w)
        flat_params.append(b.reshape(1, -1))

    kernel = functools.partial(
        _kernel, n_hidden=n_hidden, activation=activation,
        weight_normalization=weight_normalization, T=T, E=E)

    w_specs = [pl.BlockSpec(p.shape, lambda i, s=p.shape: (0,) * len(s),
                            memory_space=pltpu.VMEM)
               for p in flat_params]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, E), keys.dtype),
    )(query, keys, mask3, *flat_params)


def din_attention_fused_ref(query, keys, mask, layer_params, activation,
                            weight_normalization):
    """jnp oracle with identical math (golden-test counterpart)."""
    B, T, E = keys.shape
    qb = jnp.broadcast_to(query.astype(jnp.float32), (B, T, E))
    k = keys.astype(jnp.float32)
    x = jnp.concatenate([qb, k, qb - k, qb * k], axis=-1)
    for w, b in layer_params[:-1]:
        x = _act(activation, x @ w.astype(jnp.float32)
                 + b.astype(jnp.float32))
    w_o, b_o = layer_params[-1]
    s = (x @ w_o.astype(jnp.float32)
         + b_o.astype(jnp.float32))[..., 0]               # [B, T]
    m = mask.astype(jnp.float32)
    if weight_normalization:
        s = s * m + (1.0 - m) * _NEG
        s = jax.nn.softmax(s, axis=-1)
    else:
        s = s * m
    return jnp.einsum("bt,bte->be", s, k)[:, None, :].astype(keys.dtype)
