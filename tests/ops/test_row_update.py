"""Golden tests: fused Pallas row-update kernel vs the jnp update math
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from deepctr_tpu.ops.pallas_update import fused_row_update, _ROWS_PER_STEP


def _setup(R=4096, n=_ROWS_PER_STEP * 2, n_valid=1500, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    acc = jnp.asarray(rng.random((R, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(n, 128)), jnp.float32)
    rows_valid = np.sort(rng.choice(R, n_valid, replace=False))
    rows = np.concatenate([rows_valid, R + np.arange(n - n_valid)])
    l2 = jnp.asarray(rng.random(128) * 0.1, jnp.float32)
    return w, acc, g, jnp.asarray(rows, jnp.int32), n_valid, l2


def _ref(w, acc, g, rows, n_valid, l2, lr, eps, adagrad):
    w = np.asarray(w).copy()
    acc = np.asarray(acc).copy() if acc is not None else None
    g = np.asarray(g)
    l2 = np.asarray(l2)
    for j in range(n_valid):
        r = int(rows[j])
        gj = g[j] + 2.0 * l2 * w[r]
        if adagrad:
            acc[r] = acc[r] + gj * gj
            w[r] = w[r] - lr * gj / np.sqrt(acc[r] + eps)
        else:
            w[r] = w[r] - lr * gj
    return w, acc


@pytest.mark.parametrize("n_valid", [1500, _ROWS_PER_STEP * 2, 7])
def test_fused_update_adagrad_matches_ref(n_valid):
    w, acc, g, rows, _, l2 = _setup(n_valid=n_valid)
    lr, eps = 0.05, 1e-10
    ref_w, ref_acc = _ref(w, acc, g, rows, n_valid, l2, lr, eps, True)
    with pltpu.force_tpu_interpret_mode():
        new_w, new_acc = fused_row_update(w, acc, g, rows, n_valid, l2,
                                          lr, eps)
    np.testing.assert_allclose(np.asarray(new_w), ref_w, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_acc), ref_acc, rtol=1e-5,
                               atol=1e-6)


def test_fused_update_sgd_matches_ref():
    w, acc, g, rows, n_valid, l2 = _setup()
    lr = 0.01
    ref_w, _ = _ref(w, None, g, rows, n_valid, l2, lr, 0, False)
    with pltpu.force_tpu_interpret_mode():
        new_w, none = fused_row_update(w, None, g, rows, n_valid, l2, lr)
    assert none is None
    np.testing.assert_allclose(np.asarray(new_w), ref_w, rtol=1e-5,
                               atol=1e-6)


def test_untouched_rows_identical():
    w, acc, g, rows, n_valid, l2 = _setup()
    touched = set(np.asarray(rows[:n_valid]).tolist())
    with pltpu.force_tpu_interpret_mode():
        new_w, new_acc = fused_row_update(w, acc, g, rows, n_valid, l2,
                                          0.05)
    untouched = np.asarray([r for r in range(w.shape[0])
                            if r not in touched])
    np.testing.assert_array_equal(np.asarray(new_w)[untouched],
                                  np.asarray(w)[untouched])
    np.testing.assert_array_equal(np.asarray(new_acc)[untouched],
                                  np.asarray(acc)[untouched])


def test_end_to_end_training_with_kernel_matches_jnp(monkeypatch):
    """A full fit() with the fused update kernel active (interpret mode,
    packed table so width==128) must match the jnp row-update path."""
    from deepctr_tpu import config as dc_config
    from deepctr_tpu import inputs as dc_inputs
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 512)
    # pin the PER-TABLE combined path (the default 'arena' mode moves
    # combined tables into the shared arena buffer instead)
    monkeypatch.setenv("DEEPCTR_UPDATE_MODE", "scatter")
    rng = np.random.default_rng(0)
    N, V = 128, 2048
    x = {"big": rng.integers(0, V, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]

    def run(pallas):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
        try:
            if pallas:
                # set BEFORE compile: adagrad tables then use the combined
                # (w | acc) storage + the fused update kernel
                dc_config.set_use_pallas(True)
                m.compile("adagrad", "binary_crossentropy",
                          sparse_table_updates=True)
                assert m._sparse_specs
                st = m.table_state["embedding_dict/big"]
                assert isinstance(st, dict) and "combined" in st
                with pltpu.force_tpu_interpret_mode():
                    m.fit(x, y, batch_size=64, epochs=1, verbose=0,
                          shuffle=False)
                # params leaf lags until a read syncs it
                p = m.predict(x, 64)
                assert np.all(np.isfinite(p))
            else:
                m.compile("adagrad", "binary_crossentropy",
                          sparse_table_updates=True)
                assert m._sparse_specs
                m.fit(x, y, batch_size=64, epochs=1, verbose=0,
                      shuffle=False)
        finally:
            dc_config.set_use_pallas("auto")
        return np.asarray(m.get_weights()["params"]["embedding_dict"]["big"])

    w_jnp = run(False)
    w_kernel = run(True)
    np.testing.assert_allclose(w_kernel, w_jnp, atol=1e-6)


@pytest.mark.parametrize("L", [1, 2])
def test_scatter_rows_matches_ref(L):
    from deepctr_tpu.ops.pallas_update import scatter_rows
    rng = np.random.default_rng(1)
    R, n, n_valid = 4096, _ROWS_PER_STEP * 2, 1500
    table = jnp.asarray(rng.normal(size=(R * L, 128)), jnp.float32)
    starts_valid = np.sort(rng.choice(R, n_valid, replace=False)) * L
    starts = np.concatenate(
        [starts_valid, (R + np.arange(n - n_valid)) * L]).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(n * L, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = scatter_rows(table, vals, jnp.asarray(starts), n_valid, L)
    want = np.asarray(table).copy()
    v = np.asarray(vals)
    for j in range(n_valid):
        want[starts[j]:starts[j] + L] = v[L * j:L * j + L]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_multi_scatter_rows_matches_ref():
    """One-launch scatter across tables of different sizes (the pooled
    default of the big-vocab active-rows update)."""
    from deepctr_tpu.ops.pallas_update import multi_scatter_rows
    rng = np.random.default_rng(2)
    L, n = 2, _ROWS_PER_STEP
    sizes = [3000, 4096, 5000]
    tables = [jnp.asarray(rng.normal(size=(R * L, 128)), jnp.float32)
              for R in sizes]
    starts, nvs, vals = [], [], []
    for R in sizes:
        nv = rng.integers(100, n)
        s = np.sort(rng.choice(R, nv, replace=False)) * L
        s = np.concatenate([s, (R + np.arange(n - nv)) * L])
        starts.append(s.astype(np.int32))
        nvs.append(nv)
        vals.append(rng.normal(size=(n * L, 128)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        outs = multi_scatter_rows(
            tables, jnp.asarray(np.stack(vals)),
            jnp.asarray(np.stack(starts)), np.asarray(nvs), L=L)
    for t, out, s, nv, v in zip(tables, outs, starts, nvs, vals):
        want = np.asarray(t).copy()
        for j in range(nv):
            want[s[j]:s[j] + L] = v[L * j:L * j + L]
        np.testing.assert_array_equal(np.asarray(out), want)


def test_arena_scatter_rows_matches_ref():
    """One-launch scatter of G tables' row updates into the SHARED arena
    buffer (the default big-vocab update path — vals come in contiguous,
    no per-table stacking)."""
    from deepctr_tpu.ops.pallas_update import arena_scatter_rows
    rng = np.random.default_rng(3)
    L, n = 2, _ROWS_PER_STEP
    sizes = [3000, 4096, 5000]          # pair-rows per table
    P = sum(sizes)
    arena = jnp.asarray(rng.normal(size=(P * L, 128)), jnp.float32)
    bases = np.cumsum([0] + sizes[:-1])
    starts, nvs, vals = [], [], []
    for base, R in zip(bases, sizes):
        nv = rng.integers(100, n)
        s = np.sort(rng.choice(R, nv, replace=False))
        # dedup-padding sentinels: distinct rows past the table's end
        s = np.concatenate([s, R + np.arange(n - nv)])
        starts.append(((base + s) * L).astype(np.int32))
        nvs.append(nv)
        vals.append(rng.normal(size=(n * L, 128)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        out = arena_scatter_rows(
            arena, jnp.asarray(np.stack(vals)),
            jnp.asarray(np.stack(starts)), np.asarray(nvs), L=L)
    want = np.asarray(arena).copy()
    for s, nv, v in zip(starts, nvs, vals):
        for j in range(nv):
            want[s[j]:s[j] + L] = v[L * j:L * j + L]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_fused_update_combined_matches_ref():
    """Interleaved [2R, 128] (w, acc) row-pair storage (the layout the
    engine uses on the TPU adagrad path — see _use_combined_state)."""
    from deepctr_tpu.ops.pallas_update import fused_row_update_combined
    w, acc, g, rows, n_valid, l2 = _setup()
    lr, eps = 0.05, 1e-10
    ref_w, ref_acc = _ref(w, acc, g, rows, n_valid, l2, lr, eps, True)
    R = w.shape[0]
    combined = jnp.stack([w, acc], axis=1).reshape(2 * R, 128)
    with pltpu.force_tpu_interpret_mode():
        out = fused_row_update_combined(combined, g, rows, n_valid, l2,
                                        lr, eps)
    np.testing.assert_allclose(np.asarray(out[::2]), ref_w,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1::2]), ref_acc,
                               rtol=1e-5, atol=1e-6)
