"""Explicit shard_map embedding exchanges vs a plain gather (8 virtual
CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepctr_tpu.parallel import make_mesh
from deepctr_tpu.parallel.embedding import psum_lookup, a2a_lookup


@pytest.fixture
def setup():
    mesh = make_mesh((1, 8))
    V, E, B = 64, 16, 40
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(V, E)).astype(np.float32))
    from jax.sharding import NamedSharding, PartitionSpec as P
    table = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, V, B),
                      jnp.int32)
    return mesh, table, ids


def test_psum_lookup_matches_take(setup):
    mesh, table, ids = setup
    out = psum_lookup(mesh, table, ids)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6)


def test_psum_lookup_2d_ids(setup):
    mesh, table, ids = setup
    ids2 = ids.reshape(8, 5)
    out = psum_lookup(mesh, table, ids2)
    assert out.shape == (8, 5, 16)
    np.testing.assert_allclose(
        np.asarray(out).reshape(40, 16),
        np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6)


def test_a2a_lookup_matches_take(setup):
    mesh, table, ids = setup
    out = a2a_lookup(mesh, table, ids, slack=8.0)  # generous capacity
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6)


def test_psum_lookup_grads_flow(setup):
    mesh, table, ids = setup

    def loss(t):
        return jnp.sum(jnp.sin(psum_lookup(mesh, t, ids)))

    def loss_ref(t):
        return jnp.sum(jnp.sin(jnp.take(t, ids, axis=0)))

    g = jax.grad(loss)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_a2a_overflow_drops_without_corruption(setup):
    """Capacity overflow must (a) be countable and (b) never clobber a
    valid id's slot: dropped ids return zero rows, everything else is
    exact (round-1 bug: overflow writes clamped INTO slot cap-1,
    corrupting its legitimate occupant)."""
    mesh, table, _ = setup
    V = table.shape[0]
    # all 40 ids owned by shard 0 -> bucket needs 40 slots; slack=1.0 gives
    # cap = ceil(40/8) = 5 -> 35 overflow ids
    ids = jnp.asarray(np.arange(40) % (V // 8), jnp.int32)
    out, n_dropped = a2a_lookup(mesh, table, ids, slack=1.0,
                                return_overflow=True)
    assert int(n_dropped) == 35
    ref = np.asarray(jnp.take(table, ids, axis=0))
    out = np.asarray(out)
    # first `cap` occurrences are exact, the rest are zero rows
    np.testing.assert_allclose(out[:5], ref[:5], rtol=1e-6)
    np.testing.assert_array_equal(out[5:], 0.0)


def test_a2a_no_overflow_count_zero(setup):
    mesh, table, ids = setup
    out, n_dropped = a2a_lookup(mesh, table, ids, slack=8.0,
                                return_overflow=True)
    assert int(n_dropped) == 0
