"""Golden tests: fused Pallas DIN attention vs the jnp oracle and vs the
layer composition (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from deepctr_tpu.ops.pallas_attention import (
    din_attention_fused, din_attention_fused_ref,
    din_attention_fused_supported)


def _setup(B=8, T=16, E=8, hidden=(80, 40), seed=0):
    rng = np.random.default_rng(seed)
    query = jnp.asarray(rng.normal(size=(B, 1, E)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T, E)), jnp.float32)
    lens = rng.integers(1, T + 1, B)
    mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None], jnp.float32)
    params = []
    d = 4 * E
    for h in hidden:
        params.append((jnp.asarray(rng.normal(size=(d, h)) * 0.1,
                                   jnp.float32),
                       jnp.asarray(rng.normal(size=(h,)) * 0.1,
                                   jnp.float32)))
        d = h
    params.append((jnp.asarray(rng.normal(size=(d, 1)) * 0.1, jnp.float32),
                   jnp.asarray(rng.normal(size=(1,)), jnp.float32)))
    return query, keys, mask, params


@pytest.mark.parametrize("weight_norm", [False, True])
@pytest.mark.parametrize("act", ["sigmoid", "relu"])
def test_fused_attention_interpret_matches_ref(weight_norm, act):
    query, keys, mask, params = _setup()
    assert din_attention_fused_supported(query, keys, (80, 40), act)
    ref = din_attention_fused_ref(query, keys, mask, params, act,
                                  weight_norm)
    with pltpu.force_tpu_interpret_mode():
        got = din_attention_fused(query, keys, mask, params, act,
                                  weight_norm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_ref_matches_layer_composition():
    """The oracle itself must equal LocalActivationUnit + din_attention
    (the layer path) given the same weights."""
    from deepctr_tpu.layers.sequence import AttentionSequencePoolingLayer

    B, T, E = 8, 16, 8
    query, keys, mask, params = _setup(B, T, E)
    lens = jnp.sum(mask, axis=1).astype(jnp.int32)[:, None]

    layer = AttentionSequencePoolingLayer(att_hidden_units=(80, 40),
                                          att_activation="sigmoid",
                                          weight_normalization=True)
    variables = layer.init(jax.random.PRNGKey(0), query, keys, lens)
    p = variables["params"]["local_att"]
    # overwrite with the fixture weights
    p = {"dnn": {"dense_0": {"kernel": params[0][0], "bias": params[0][1]},
                 "dense_1": {"kernel": params[1][0], "bias": params[1][1]}},
         "dense": {"kernel": params[2][0], "bias": params[2][1]}}
    out_layer = layer.apply({"params": {"local_att": p}}, query, keys, lens)
    out_ref = din_attention_fused_ref(query, keys, mask, params, "sigmoid",
                                      True)
    np.testing.assert_allclose(np.asarray(out_layer), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_layer_dispatch_fused_matches_jnp():
    """AttentionSequencePoolingLayer under set_use_pallas(True) (interpret
    mode) must match the jnp path exactly at inference."""
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.layers.sequence import AttentionSequencePoolingLayer

    B, T, E = 8, 16, 8
    query, keys, mask, _ = _setup(B, T, E)
    lens = jnp.sum(mask, axis=1).astype(jnp.int32)[:, None]
    layer = AttentionSequencePoolingLayer(att_hidden_units=(20, 12),
                                          att_activation="sigmoid",
                                          weight_normalization=True)
    variables = layer.init(jax.random.PRNGKey(0), query, keys, lens)
    ref = layer.apply(variables, query, keys, lens)
    try:
        dc_config.set_use_pallas(True)
        with pltpu.force_tpu_interpret_mode():
            got = layer.apply(variables, query, keys, lens)
    finally:
        dc_config.set_use_pallas("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
