"""Golden tests for the Pallas big-table row-gather kernel (interpret
mode on CPU; the real-TPU path is exercised by tools/ and measured in
PLAN.md/BASELINE.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from deepctr_tpu.ops import pallas_gather as PG


@pytest.mark.parametrize("W", [16, 32, 128])
def test_gather_rows_interpret_matches_take(W):
    V, n = 4096, 2048
    table = (jnp.arange(V * W, dtype=jnp.float32).reshape(V, W) % 997)
    ids = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, V)
    with pltpu.force_tpu_interpret_mode():
        out = PG.gather_rows(table, ids)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_grad_is_scatter_add():
    V, W, n = 512, 16, 1024
    table = jax.random.normal(jax.random.PRNGKey(1), (V, W))
    ids = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, V)

    def loss_k(t):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(jnp.sin(PG.gather_rows(t, ids)))

    def loss_ref(t):
        return jnp.sum(jnp.sin(jnp.take(t, ids, axis=0)))

    g_k = jax.grad(loss_k)(table)
    g_r = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-6, atol=1e-6)


def test_pack_table_roundtrip():
    V, W = 1000, 16
    table = jnp.arange(V * W, dtype=jnp.float32).reshape(V, W)
    packed, pack = PG.pack_table(table)
    assert pack == 8
    assert packed.shape == (125, 128)
    unpacked = packed.reshape(-1, W)[:V]
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(table))


def test_supported_predicate():
    t16 = jnp.zeros((1000, 16))
    t17 = jnp.zeros((1000, 17))
    ids_ok = jnp.zeros((2048,), jnp.int32)
    ids_bad = jnp.zeros((1000,), jnp.int32)
    assert PG.gather_rows_supported(t16, ids_ok)
    assert not PG.gather_rows_supported(t17, ids_ok)
    assert not PG.gather_rows_supported(t16, ids_bad)
