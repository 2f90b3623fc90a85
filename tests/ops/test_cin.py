"""Golden tests for the CIN op: layout equivalence of the D-major form and
the [B,H,D] reference form, plus the Pallas kernel vs the jnp oracle in
interpreter mode (SURVEY.md §4: numeric golden tests per interaction
kernel, Pallas vs pure-jnp reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepctr_tpu.ops.reference import cin_layer_ref, cin_mix_ref


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def test_cin_mix_matches_cin_layer():
    B, H, F, D, O = 16, 12, 5, 8, 10
    hidden = _rand((B, H, D), 0)
    x0 = _rand((B, F, D), 1)
    w3 = _rand((O, H, F), 2) * 0.1
    ref = cin_layer_ref(hidden, x0, w3.reshape(O, H * F),
                        jnp.zeros((O,)))                    # [B, O, D]
    got = cin_mix_ref(jnp.transpose(hidden, (0, 2, 1)),
                      jnp.transpose(x0, (0, 2, 1)), w3)     # [B, D, O]
    np.testing.assert_allclose(np.asarray(ref),
                               np.asarray(jnp.transpose(got, (0, 2, 1))),
                               rtol=1e-5, atol=1e-5)


def test_cin_pallas_interpret_matches_ref():
    from jax.experimental.pallas import tpu as pltpu
    from deepctr_tpu.ops import pallas as P

    B, D, H, F, O = 16, 8, 12, 5, 10
    h = _rand((B, D, H), 0)
    x = _rand((B, D, F), 1)
    w = _rand((O, H, F), 2) * 0.1
    ref = cin_mix_ref(h, x, w)
    with pltpu.force_tpu_interpret_mode():
        got = P.cin_mix(h, x, w)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_cin_pallas_interpret_grads_match_ref():
    from jax.experimental.pallas import tpu as pltpu
    from deepctr_tpu.ops import pallas as P

    B, D, H, F, O = 16, 8, 12, 5, 10
    h = _rand((B, D, H), 0)
    x = _rand((B, D, F), 1)
    w = _rand((O, H, F), 2) * 0.1

    g_ref = jax.grad(lambda *a: jnp.sum(jnp.sin(cin_mix_ref(*a))),
                     argnums=(0, 1, 2))(h, x, w)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(lambda *a: jnp.sum(jnp.sin(P.cin_mix(*a))),
                         argnums=(0, 1, 2))(h, x, w)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
