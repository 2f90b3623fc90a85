"""Golden tests: ops.onehot_lookup vs the jnp.take oracle.

Forward must equal take(table.astype(bf16), ids) exactly (one bf16
rounding); the backward must sum duplicate-id cotangents in f32 (the
whole point vs the cast-before-take variant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.ops.onehot_lookup import onehot_lookup


def test_forward_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((640, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 640, 512), jnp.int32)
    got = onehot_lookup(table, ids)
    want = jnp.take(table.astype(jnp.bfloat16), ids, axis=0)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_grad_accumulates_duplicates_in_f32():
    rng = np.random.default_rng(1)
    R, W, n = 64, 4, 4096
    table = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)
    ids = jnp.zeros((n,), jnp.int32)          # every sample hits row 0
    cot = jnp.full((n, W), 1e-3, jnp.float32)

    def loss(t):
        return jnp.sum(onehot_lookup(t, ids).astype(jnp.float32) * cot)

    g = jax.grad(loss)(table)
    assert g.dtype == jnp.float32
    # f32 accumulation: n * bf16(1e-3) summed exactly (each term is the
    # same bf16 value; only the SUM precision is under test)
    per = np.float32(jnp.asarray(jnp.float32(1e-3)).astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(g[0]), per * n, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(g[1:]), 0.0)


def test_grad_matches_take_oracle_random():
    rng = np.random.default_rng(2)
    R, W, n = 96, 8, 1000
    table = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, R, n), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((n, W)), jnp.float32)

    def loss_onehot(t):
        return jnp.sum(onehot_lookup(t, ids).astype(jnp.float32) * cot)

    g1 = jax.grad(loss_onehot)(table)
    # oracle: per-element bf16 rounding of the cotangent (what the op's
    # bwd does), then exact f32 segment-sum over duplicate ids
    cot_b = np.asarray(jnp.asarray(cot).astype(jnp.bfloat16), np.float32)
    g2 = np.zeros((R, W), np.float32)
    np.add.at(g2, np.asarray(ids), cot_b)
    np.testing.assert_allclose(np.asarray(g1), g2, rtol=1e-4, atol=1e-5)


def test_onehot_mode_trains_close_to_default(monkeypatch):
    """2 epochs of bf16 training under DEEPCTR_GATHER_MODE=onehot must
    track the default path's losses (same bf16 forward values; grads
    differ only by f32-vs-f32 accumulation of bf16-rounded cotangents)."""
    import numpy as np
    from deepctr_tpu import config
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM

    rng = np.random.default_rng(5)
    N = 256
    x = {"C1": rng.integers(0, 30, N), "C2": rng.integers(0, 50, N)}
    y = (np.asarray(x["C1"]) % 2).astype("float32")
    cols = [SparseFeat("C1", 30, 8), SparseFeat("C2", 50, 8)]
    config.set_compute_dtype("bfloat16")
    try:
        losses = {}
        for mode in ("off", "onehot"):
            monkeypatch.setenv("DEEPCTR_GATHER_MODE", mode)
            m = DeepFM(cols, cols, seed=7)
            m.compile("adagrad", "binary_crossentropy")
            h = m.fit(x, y, batch_size=64, epochs=2, verbose=0,
                      shuffle=False)
            losses[mode] = h.history["loss"]
    finally:
        config.set_compute_dtype("float32")
    np.testing.assert_allclose(losses["onehot"], losses["off"],
                               rtol=0.05)


def test_embedding_dict_dispatch(monkeypatch):
    """DEEPCTR_GATHER_MODE=onehot must flow through a real model forward
    (bf16 compute) and match the default path to bf16 tolerance."""
    monkeypatch.setenv("DEEPCTR_GATHER_MODE", "off")
    import numpy as np
    from deepctr_tpu import config
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM

    rng = np.random.default_rng(3)
    x = {"C1": rng.integers(0, 40, 64)}
    cols = [SparseFeat("C1", 40, 8)]
    config.set_compute_dtype("bfloat16")
    try:
        m = DeepFM(cols, cols)
        m.compile("adagrad", "binary_crossentropy")
        base = m.predict(x, 64)
        monkeypatch.setenv("DEEPCTR_GATHER_MODE", "onehot")
        m2 = DeepFM(cols, cols)
        m2.compile("adagrad", "binary_crossentropy")
        m2.set_weights(m.get_weights())
        m2._predict_fn = None      # force retrace under the new mode
        got = m2.predict(x, 64)
    finally:
        config.set_compute_dtype("float32")
    np.testing.assert_allclose(got, base, atol=5e-3)


def test_full_packed_tables_bypass_onehot(monkeypatch):
    """A FULL packed big table must keep its real gather even under
    gather-mode onehot (a [B, 30k+] one-hot would be a regression);
    small unpacked tables and active-rows substituted slices do route
    through the op."""
    import jax.numpy as jnp
    from deepctr_tpu import config, inputs as dc_inputs
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.ops import onehot_lookup as mod

    calls = []
    real = mod.onehot_lookup

    def spy(table, ids):
        calls.append(tuple(table.shape))
        return real(table, ids)

    monkeypatch.setattr(mod, "onehot_lookup", spy)
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    monkeypatch.setenv("DEEPCTR_GATHER_MODE", "onehot")
    rng = np.random.default_rng(0)
    x = {"big": rng.integers(0, 2048, 64), "small": rng.integers(0, 30, 64)}
    cols = [SparseFeat("big", 2048, 16), SparseFeat("small", 30, 16)]
    config.set_compute_dtype("bfloat16")
    try:
        m = DeepFM(cols, cols)
        m.compile("adagrad", "binary_crossentropy")
        m.predict(x, 64)
        # only the small table's full rows went through onehot; the
        # packed big table (2048/7 -> ~293 physical rows, under the cap)
        # must NOT appear
        assert calls, "small table should route through onehot"
        assert all(s[0] <= 31 for s in calls), calls
    finally:
        config.set_compute_dtype("float32")


def test_gather_mode_env_validation(monkeypatch):
    from deepctr_tpu import config
    monkeypatch.setenv("DEEPCTR_GATHER_MODE", "one-hot")
    with pytest.raises(ValueError, match="DEEPCTR_GATHER_MODE"):
        config.gather_mode()
    monkeypatch.setenv("DEEPCTR_GATHER_MODE", "onehot")
    assert config.gather_mode() == "onehot"
    monkeypatch.delenv("DEEPCTR_GATHER_MODE")
    monkeypatch.setenv("DEEPCTR_GATHER_CAST", "1")   # legacy knob
    assert config.gather_mode() == "cast"


def test_onehot_mode_with_active_rows_packed(monkeypatch):
    """The production combination queued for TPU A/B: bf16 compute +
    packed big table + active-rows sparse updates + gather-mode onehot.
    The substituted [n,128] slices route through the op (spy) and the
    2-epoch loss trajectory tracks the mode=off leg."""
    from deepctr_tpu import config, inputs as dc_inputs
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.ops import onehot_lookup as mod

    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(6)
    N, V = 256, 2048
    x = {"big": rng.integers(0, V, N)}
    y = (np.asarray(x["big"]) % 2).astype("float32")
    cols = [SparseFeat("big", V, 16)]
    config.set_compute_dtype("bfloat16")
    calls = []
    real = mod.onehot_lookup
    real_fact = mod.onehot_lookup_factorized

    def spy(table, ids):
        calls.append(tuple(table.shape))
        return real(table, ids)

    def spy_fact(table, ids):   # default "all" routes training here
        calls.append(tuple(table.shape))
        return real_fact(table, ids)

    try:
        losses = {}
        for mode in ("off", "onehot"):
            if mode == "onehot":
                monkeypatch.setattr(mod, "onehot_lookup", spy)
                monkeypatch.setattr(mod, "onehot_lookup_factorized",
                                    spy_fact)
            monkeypatch.setenv("DEEPCTR_GATHER_MODE", mode)
            m = DeepFM(cols, cols, seed=7)
            m.compile("adagrad", "binary_crossentropy",
                      sparse_table_updates=True)
            assert m._sparse_specs
            h = m.fit(x, y, batch_size=64, epochs=2, verbose=0,
                      shuffle=False)
            losses[mode] = h.history["loss"]
    finally:
        config.set_compute_dtype("float32")
    # substituted slices (row count != the declared packed table's) were
    # routed through the op during training; at this tiny vocab the
    # padded slice is LARGER than the full table (1024 vs 293)
    full_rows = -(-V // 7)
    assert calls and all(s[0] != full_rows for s in calls), (
        calls[:3], full_rows)
    np.testing.assert_allclose(losses["onehot"], losses["off"], rtol=0.05)


def test_gather_mode_auto_per_regime_resolution(monkeypatch):
    """Pin 'auto's measured per-regime winners (TPU A/B 2026-08-19 +
    round-2 advisor finding): cast ONLY for substituted slices of BIG
    (packed) tables; off for full small tables AND substituted slices
    of small tables (duplicate-id bf16 accumulation is dense at small
    vocab); env override beats every flag."""
    from deepctr_tpu import config

    monkeypatch.delenv("DEEPCTR_GATHER_MODE", raising=False)
    monkeypatch.delenv("DEEPCTR_GATHER_CAST", raising=False)
    monkeypatch.delenv("DEEPCTR_ONEHOT_MIN_IDS", raising=False)
    config.set_gather_mode("auto")
    assert config.gather_mode() == "off"
    assert config.gather_mode(substituted=True) == "off"
    assert config.gather_mode(substituted=True, big=True) == "cast"
    assert config.gather_mode(substituted=False, big=True) == "off"
    # sequence-scale id counts flip full small tables to the explicit
    # bf16 one-hot matmul (f32 dup accumulation) — DIN/DIEN A/B
    # 2026-08-19: onehot wins 14-37% at B*maxlen >= ~51k ids, off wins
    # at <= 16k; conservative crossover pinned at 32768
    assert config.gather_mode(n_ids=4096) == "off"
    assert config.gather_mode(n_ids=16384) == "off"
    assert config.gather_mode(n_ids=32768) == "onehot"
    assert config.gather_mode(substituted=True, n_ids=262144) == "off"
    assert config.gather_mode(substituted=True, big=True,
                              n_ids=262144) == "cast"
    monkeypatch.setenv("DEEPCTR_ONEHOT_MIN_IDS", "100000")
    assert config.gather_mode(n_ids=32768) == "off"
    monkeypatch.delenv("DEEPCTR_ONEHOT_MIN_IDS")
    monkeypatch.setenv("DEEPCTR_GATHER_MODE", "onehot")
    assert config.gather_mode(substituted=True, big=True) == "onehot"


# --------------------------------------------------------------------------
# factorized inference forward (round 5)
# --------------------------------------------------------------------------

def test_factorized_forward_matches_take():
    from deepctr_tpu.ops.onehot_lookup import (onehot_lookup_factorized,
                                               factorized_supported)
    rng = np.random.default_rng(3)
    for R, W in ((640, 8), (10000, 32), (97, 16), (1000, 4)):
        if not factorized_supported(R, W):
            continue
        table = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, R, 2048), jnp.int32)
        got = onehot_lookup_factorized(table, ids)
        want = jnp.take(table.astype(jnp.bfloat16), ids, axis=0)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32),
                                      err_msg="R=%d W=%d" % (R, W))


def test_factorized_grad_equals_direct():
    """The custom_vjp pairs the factorized forward with the DIRECT
    backward — gradients must be bit-equal to onehot_lookup's."""
    from deepctr_tpu.ops.onehot_lookup import onehot_lookup_factorized
    rng = np.random.default_rng(4)
    R, W, n = 512, 8, 4096
    table = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, R, n), jnp.int32)
    C = jnp.asarray(rng.standard_normal((n, W)), jnp.float32)

    g_fact = jax.grad(lambda t: jnp.sum(
        onehot_lookup_factorized(t, ids).astype(jnp.float32) * C))(table)
    g_dir = jax.grad(lambda t: jnp.sum(
        onehot_lookup(t, ids).astype(jnp.float32) * C))(table)
    np.testing.assert_array_equal(np.asarray(g_fact), np.asarray(g_dir))


def test_factorized_dispatch_modes(monkeypatch):
    """Default ("all"): both train and predict traces take the
    factorized FORWARD (its custom_vjp keeps the direct backward, so
    numerics are bit-equal and both directions measured faster).
    DEEPCTR_FACTORIZED_ONEHOT=1 restricts it to inference traces."""
    import deepctr_tpu.ops.onehot_lookup as ol
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat, VarLenSparseFeat
    from deepctr_tpu.models import DIN

    calls = {"fact": 0, "direct": 0}
    orig_fact = ol.onehot_lookup_factorized
    orig_dir = ol.onehot_lookup

    def spy_fact(table, ids):
        calls["fact"] += 1
        return orig_fact(table, ids)

    def spy_dir(table, ids):
        calls["direct"] += 1
        return orig_dir(table, ids)

    monkeypatch.setattr(ol, "onehot_lookup_factorized", spy_fact)
    monkeypatch.setattr(ol, "onehot_lookup", spy_dir)
    monkeypatch.setattr(dc_config, "_ONEHOT_MIN_IDS", 1)
    dc_config.set_compute_dtype("bfloat16")
    try:
        T = 8
        cols = [SparseFeat("item", 300, 8),
                VarLenSparseFeat(SparseFeat("hist_item", 300, 8,
                                            embedding_name="item"),
                                 maxlen=T, length_name="seq_length")]
        m = DIN(cols, ["item"], dnn_hidden_units=(8,),
                att_activation="relu")
        x = {"item": np.random.randint(0, 300, 32),
             "hist_item": np.random.randint(0, 300, (32, T)),
             "seq_length": np.random.randint(1, T + 1, 32)}
        y = np.random.randint(0, 2, 32).astype(np.float32)
        m.compile("adagrad", "binary_crossentropy")
        m.fit(x, y, batch_size=32, epochs=1, verbose=0)
        assert calls["fact"] > 0 and calls["direct"] == 0, calls

        # inference-only mode: a fresh model's train trace goes direct
        monkeypatch.setenv("DEEPCTR_FACTORIZED_ONEHOT", "1")
        calls["fact"] = calls["direct"] = 0
        m2 = DIN(cols, ["item"], dnn_hidden_units=(8,),
                 att_activation="relu")
        m2.compile("adagrad", "binary_crossentropy")
        m2.fit(x, y, batch_size=32, epochs=1, verbose=0)
        assert calls["direct"] > 0 and calls["fact"] == 0, calls
        m2.predict(x, 32)
        assert calls["fact"] > 0, calls
    finally:
        dc_config.set_compute_dtype("float32")


def test_auto_rule_formula_matches_factorized_supported():
    """config.gather_mode inlines the factorization-support formula
    (importing ops from config would cycle); it must stay in lockstep
    with ops.onehot_lookup.factorized_supported or auto would route
    tables to a lowering the op then refuses (silent direct fallback —
    wrong perf, right numerics — this pins the intent)."""
    from deepctr_tpu.ops.onehot_lookup import factorized_supported

    def config_formula(rows, width):
        v2 = min(rows, max(1, 1024 // max(width, 1)))
        return v2 > 1 and rows // v2 >= 2

    for rows in (2, 3, 24, 100, 305, 1460, 10000, 93145, 4104):
        for width in (1, 4, 8, 17, 32, 128):
            assert (config_formula(rows, width)
                    == factorized_supported(rows, width)), (rows, width)
