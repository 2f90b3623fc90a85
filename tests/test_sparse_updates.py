"""Sparse (touched-rows-only) embedding-table updates.

Correctness contract: with regularization off, the sparse path must give
the EXACT same trajectory as the dense optax path (the scatter update is
algebraically identical when every touched row's gradient is applied
once).  With reg on, untouched rows must stay frozen (lazy L2), while the
dense path decays every row every step.
"""

import numpy as np
import pytest

from deepctr_tpu.features import SparseFeat, DenseFeat
from deepctr_tpu.models import DeepFM


def _data(N=256):
    rng = np.random.default_rng(0)
    x = {"c0": rng.integers(0, 50, N), "c1": rng.integers(0, 30, N),
         "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 50, 4), SparseFeat("c1", 30, 4),
            DenseFeat("d0", 1)]
    return x, y, cols


@pytest.mark.parametrize("opt", ["adagrad", "sgd"])
def test_sparse_matches_dense_without_reg(opt):
    x, y, cols = _data()

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile(opt, "binary_crossentropy",
                  sparse_table_updates=sparse)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64), m.params

    p_dense, _ = run(False)
    p_sparse, _ = run(True)
    np.testing.assert_allclose(p_dense, p_sparse, atol=2e-5)


def test_untouched_rows_frozen():
    rng = np.random.default_rng(0)
    N = 256
    # ids only in [0, 500): rows >= 500 are never touched
    x = {"c0": rng.integers(0, 500, N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 1000, 4)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m.compile("adagrad", "binary_crossentropy", sparse_table_updates=True)
    before = np.asarray(m.params["embedding_dict"]["c0"][500:]).copy()
    m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    after = np.asarray(m.params["embedding_dict"]["c0"][500:])
    np.testing.assert_array_equal(before, after)
    # touched region did move
    touched = np.asarray(m.params["embedding_dict"]["c0"][:500])
    assert np.abs(touched - 0).sum() > 0


def test_auto_mode_off_for_small_tables():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    m.compile("adagrad", "binary_crossentropy")   # auto
    assert m._sparse_specs == []
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_sparse_custom_lr_matches_dense():
    """compile(learning_rate=...) must drive the sparse table path too —
    round-1 hardcoded the name-default lr on the sparse side."""
    x, y, cols = _data()

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("sgd", "binary_crossentropy", learning_rate=0.05,
                  sparse_table_updates=sparse)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_sparse_adam_exact_when_all_rows_touched():
    """Lazy adam == dense adam exactly while every row is touched every
    step (per-row t equals the global step count, no skipped moment
    decay). ids cycle so each 64-batch covers the whole vocab."""
    N, V = 256, 8
    rng = np.random.default_rng(0)
    x = {"c0": np.arange(N) % V, "d0": rng.random(N)}
    y = ((np.arange(N) % V) % 2).astype(np.float64)
    cols = [SparseFeat("c0", V, 4), DenseFeat("d0", 1)]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adam", "binary_crossentropy",
                  sparse_table_updates=sparse)
        m.fit(x, y, batch_size=64, epochs=3, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=3e-5)


def test_sparse_adam_untouched_rows_frozen():
    rng = np.random.default_rng(0)
    N = 256
    x = {"c0": rng.integers(0, 500, N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 1000, 4)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
               l2_reg_embedding=0, l2_reg_linear=0)
    m.compile("adam", "binary_crossentropy", sparse_table_updates=True)
    before = np.asarray(m.params["embedding_dict"]["c0"][500:]).copy()
    m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    after = np.asarray(m.params["embedding_dict"]["c0"][500:])
    np.testing.assert_array_equal(before, after)


def test_sparse_with_varlen_zero_mask():
    """The proxy-id rewrite must preserve `id != 0` varlen masking:
    proxy == 0 iff id == 0 (row 0 is pinned to slot 0)."""
    from deepctr_tpu.features import VarLenSparseFeat
    rng = np.random.default_rng(0)
    N, V, maxlen = 256, 40, 5
    seq = rng.integers(1, V, (N, maxlen))
    lens = rng.integers(1, maxlen + 1, N)
    seq[np.arange(maxlen)[None, :] >= lens[:, None]] = 0
    x = {"c0": rng.integers(0, 30, N), "seq": seq}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 30, 4),
            VarLenSparseFeat(SparseFeat("seq", V, 4), maxlen=maxlen,
                             combiner="mean")]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=sparse)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_sparse_packed_fused_matches_dense(monkeypatch):
    """A packed+fused big table (single consumer per span thanks to
    wide-column fusion) on the active-rows path must match the dense
    trajectory exactly (reg off)."""
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    x = {"big": rng.integers(0, V, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=sparse)
        if sparse:
            paths = [s[0] for s in m._sparse_specs]
            assert paths == ["embedding_dict/big"], paths
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_sparse_packed_varlen_matches_dense(monkeypatch):
    """DIN-style production shape: a VarLenSparseFeat history over a
    PACKED big table (item vocabs are multi-million in production) with
    sparse updates must match the dense trajectory, including the
    `id != 0` padding mask under proxy-id rewrite + packed lane select."""
    from deepctr_tpu import inputs as dc_inputs
    from deepctr_tpu.features import VarLenSparseFeat
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(1)
    N, V, maxlen = 256, 2048, 4
    seq = rng.integers(1, V, (N, maxlen))
    lens = rng.integers(1, maxlen + 1, N)
    seq[np.arange(maxlen)[None, :] >= lens[:, None]] = 0
    x = {"item": rng.integers(0, V, N), "hist_item": seq,
         "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("item", V, 16), DenseFeat("d0", 1),
            VarLenSparseFeat(SparseFeat("hist_item", V, 16,
                                        embedding_name="item"),
                             maxlen=maxlen, combiner="mean")]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=sparse)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_arena_update_matches_dense(monkeypatch):
    """The arena path (all combined-storage tables in ONE buffer, one
    pair-gather + one batched adagrad + one grid-G Pallas scatter) must
    reproduce the dense trajectory exactly (reg off).  Runs the real
    kernels in Mosaic interpret mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    from deepctr_tpu import config as dc_config
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    monkeypatch.setenv("DEEPCTR_UPDATE_MODE", "arena")
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    x = {"b0": rng.integers(0, V, N), "b1": rng.integers(0, V, N),
         "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("b0", V, 16), SparseFeat("b1", V, 16),
            DenseFeat("d0", 1)]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        if sparse:
            dc_config.set_use_pallas(True)
            try:
                with pltpu.force_tpu_interpret_mode():
                    m.compile("adagrad", "binary_crossentropy",
                              sparse_table_updates=True)
                    assert len(m._arena_layout) == 2, m._arena_layout
                    assert "__arena__" in m.table_state
                    m.fit(x, y, batch_size=64, epochs=2, verbose=0,
                          shuffle=False)
                    return m.predict(x, 64)
            finally:
                dc_config.set_use_pallas("auto")
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=False)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_arena_untouched_rows_frozen_and_lazy_l2(monkeypatch):
    """With reg ON, the arena path must (a) leave never-touched rows
    bit-identical and (b) apply L2 to touched rows (weights differ from
    the reg-off run)."""
    from jax.experimental.pallas import tpu as pltpu
    from deepctr_tpu import config as dc_config
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    monkeypatch.setenv("DEEPCTR_UPDATE_MODE", "arena")
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    # ids only in [0, 512): packed rows >= 64 never touched
    x = {"b0": rng.integers(0, 512, N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("b0", V, 16)]

    def run(l2):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=l2, l2_reg_linear=l2)
        dc_config.set_use_pallas(True)
        try:
            with pltpu.force_tpu_interpret_mode():
                m.compile("adagrad", "binary_crossentropy",
                          sparse_table_updates=True)
                assert "__arena__" in m.table_state
                pack = m._sparse_specs[0][3]
                # arena tables keep only a [0, width] placeholder in
                # params after compile — sync to read
                m._sync_params()
                before = np.asarray(
                    m.params["embedding_dict"]["b0"]).copy()
                m.fit(x, y, batch_size=64, epochs=2, verbose=0,
                      shuffle=False)
                # get_weights syncs the lagging params leaf from the arena
                after = np.asarray(
                    m.get_weights()["params"]["embedding_dict"]["b0"])
                return pack, before, after
        finally:
            dc_config.set_use_pallas("auto")

    pack, before, after_reg = run(1e-2)
    _, _, after_noreg = run(0)
    lo = -(-512 // pack)    # first packed row no id < 512 can reach
    # packed rows past every touched id: frozen even with reg (lazy L2)
    np.testing.assert_array_equal(before[lo:], after_reg[lo:])
    assert np.abs(after_reg[:lo] - before[:lo]).max() > 1e-7
    # touched rows: L2 changed the trajectory
    assert np.abs(after_reg[:lo] - after_noreg[:lo]).max() > 1e-7


def test_sparse_true_with_optax_instance_warns_and_falls_back():
    import optax
    import warnings as _w
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    with pytest.warns(UserWarning, match="falling back to DENSE"):
        m.compile(optax.sgd(0.01), "binary_crossentropy",
                  sparse_table_updates=True)
    assert m._sparse_specs == []
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_sparse_contested_span_falls_back_dense():
    """When one id span genuinely feeds two table params (vocab-mismatched
    shared name prevents fusion), every table on that span must stay on
    the dense path — rewriting the span for one would corrupt the other's
    ids — and a warning says so."""
    rng = np.random.default_rng(0)
    N = 256
    x = {"a": rng.integers(0, 50, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    lin_cols = [SparseFeat("a", 100, 4), DenseFeat("d0", 1)]
    dnn_cols = [SparseFeat("a", 50, 4), DenseFeat("d0", 1)]
    m = DeepFM(lin_cols, dnn_cols, dnn_hidden_units=(8,))
    with pytest.warns(UserWarning, match="share id columns"):
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=True)
    assert m._sparse_specs == []
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_scatter_pair_update_matches_dense(monkeypatch):
    """scatter_pair mode (the transform fetches each combined table's
    (w, acc) rows with ONE pair-form gather; row_update skips its acc
    gather) must reproduce the dense trajectory exactly (reg off).  Runs
    the real write-only scatter kernel in Mosaic interpret mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    from deepctr_tpu import config as dc_config
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    monkeypatch.setenv("DEEPCTR_UPDATE_MODE", "scatter_pair")
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    x = {"b0": rng.integers(0, V, N), "b1": rng.integers(0, V, N),
         "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("b0", V, 16), SparseFeat("b1", V, 16),
            DenseFeat("d0", 1)]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        if sparse:
            dc_config.set_use_pallas(True)
            try:
                with pltpu.force_tpu_interpret_mode():
                    m.compile("adagrad", "binary_crossentropy",
                              sparse_table_updates=True)
                    assert any(
                        isinstance(st, dict) and "combined" in st
                        for st in m.table_state.values()), "no combined"
                    m.fit(x, y, batch_size=64, epochs=2, verbose=0,
                          shuffle=False)
                    return m.predict(x, 64)
            finally:
                dc_config.set_use_pallas("auto")
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=False)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_auto_mode_per_table_gate(monkeypatch):
    """auto mode keeps only tables with vocab >= DEEPCTR_SPARSE_MIN_ROWS
    (default 16384 — criteo_real sweep knee, basemodel.py) on the
    active-rows path once total rows engage it; small tables stay on
    the dense optax path; explicit True forces every table."""
    rng = np.random.default_rng(0)
    # 20 x 60k-vocab unpacked tables: total STORED rows 1.2M engages the
    # auto path, each is over the 16384 per-table gate; 'small' is under
    cols = ([SparseFeat("b%d" % i, 60_000, 4) for i in range(20)]
            + [SparseFeat("small", 50, 4)])
    x = {f.name: rng.integers(0, f.vocabulary_size, 64) for f in cols}
    y = rng.integers(0, 2, 64).astype("float32")

    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    m.compile("adagrad", "binary_crossentropy")   # auto
    paths = {s[0] for s in m._sparse_specs}
    assert any("b0" in p for p in paths), paths
    assert not any("small" in p for p in paths), paths
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)

    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,))
    m2.compile("adagrad", "binary_crossentropy",
               sparse_table_updates=True)          # forced: every table
    paths2 = {s[0] for s in m2._sparse_specs}
    assert any("small" in p for p in paths2), paths2

    monkeypatch.setenv("DEEPCTR_SPARSE_MIN_ROWS", "10")
    m3 = DeepFM(cols, cols, dnn_hidden_units=(8,))
    m3.compile("adagrad", "binary_crossentropy")   # auto, low gate
    paths3 = {s[0] for s in m3._sparse_specs}
    assert any("small" in p for p in paths3), paths3


def test_combined_layout_without_pallas_xla_fallback(monkeypatch):
    """DEEPCTR_FORCE_COMBINED=1 on the CPU backend (and any leaked
    set_use_pallas between state init and trace) must NOT reach a
    pallas_call: the unsharded combined path falls back to an XLA
    drop-scatter of the (w, acc) pair rows and matches the dense
    trajectory exactly (reg off)."""
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    x = {"big": rng.integers(0, V, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]

    def run(force):
        if force:
            monkeypatch.setenv("DEEPCTR_FORCE_COMBINED", "1")
        else:
            monkeypatch.delenv("DEEPCTR_FORCE_COMBINED", raising=False)
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=True)
        if force:
            st = m.table_state.get("embedding_dict/big")
            assert isinstance(st, dict) and "combined" in st
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


@pytest.mark.parametrize("impl", ["sorts", "scatter"])
def test_dedup_impl_variants_match_packed(monkeypatch, impl):
    """The packed single-int32-key dedup (default) must produce the same
    training trajectory as the two-array-sort and scatter forms — the
    three variants differ only in how (inv, urows) are realized."""
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    x = {"big": rng.integers(0, V, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]

    def run(dedup):
        monkeypatch.setenv("DEEPCTR_DEDUP_IMPL", dedup)
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=True)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_array_equal(run("packed"), run(impl))


def test_combined3_adam_layout_matches_separate_leaves(monkeypatch):
    """Adam's interleaved (w | m | v) triple storage (combined3 — the
    big-vocab layout whose writeback is one Pallas triple-DMA per row on
    TPU, XLA drop-scatter here) must reproduce the separate-m/v/t lazy
    adam trajectory exactly: same per-row t bias correction, same lazy
    moment decay (reg off)."""
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    x = {"big": rng.integers(0, V, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]

    def run(force):
        if force:
            monkeypatch.setenv("DEEPCTR_FORCE_COMBINED", "1")
        else:
            monkeypatch.delenv("DEEPCTR_FORCE_COMBINED", raising=False)
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adam", "binary_crossentropy",
                  sparse_table_updates=True)
        st = m.table_state.get("embedding_dict/big")
        if force:
            assert isinstance(st, dict) and "combined3" in st
        else:
            assert isinstance(st, dict) and "m" in st
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_combined3_adam_untouched_rows_frozen(monkeypatch):
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    monkeypatch.setenv("DEEPCTR_FORCE_COMBINED", "1")
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    # ids only in [0, 512): packed rows past 512//8 stay untouched
    x = {"big": rng.integers(0, 512, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
               l2_reg_embedding=0, l2_reg_linear=0)
    m.compile("adam", "binary_crossentropy", sparse_table_updates=True)
    st = m.table_state["embedding_dict/big"]
    assert "combined3" in st
    (pack,) = [s[3] for s in m._sparse_specs
               if s[0] == "embedding_dict/big"]
    boundary = (512 - 1) // pack + 1   # first packed row no id touches
    # combined tables keep only a [0, width] placeholder in params
    # after compile (_strip_combined_leaves) — sync to read
    m._sync_params()
    before = np.asarray(m.params["embedding_dict"]["big"]).copy()
    m.fit(x, y, batch_size=64, epochs=3, verbose=0, shuffle=False)
    m._sync_params()
    after = np.asarray(m.params["embedding_dict"]["big"])
    np.testing.assert_array_equal(before[boundary:], after[boundary:])
    assert np.abs(after[:boundary] - before[:boundary]).sum() > 0


@pytest.mark.parametrize("tmode", ["table", "rowwise"])
def test_adam_t_modes_exact_when_all_rows_touched(monkeypatch, tmode):
    """Both t forms (table: one per-table step counter — torch.optim.
    Adam's own state['step'] semantics, the default; rowwise: per-row
    timelines, SparseAdam-style) must equal dense adam while every row
    is touched every step."""
    monkeypatch.setenv("DEEPCTR_ADAM_T", tmode)
    N, V = 256, 8
    rng = np.random.default_rng(0)
    x = {"c0": np.arange(N) % V, "d0": rng.random(N)}
    y = ((np.arange(N) % V) % 2).astype(np.float64)
    cols = [SparseFeat("c0", V, 4), DenseFeat("d0", 1)]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adam", "binary_crossentropy",
                  sparse_table_updates=sparse)
        m.fit(x, y, batch_size=64, epochs=3, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=3e-5)


@pytest.mark.parametrize("tmode", ["table", "rowwise"])
def test_combined3_adam_t_modes_match_separate(monkeypatch, tmode):
    """combined3 == separate-leaves exactly, under BOTH t forms."""
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    monkeypatch.setenv("DEEPCTR_ADAM_T", tmode)
    rng = np.random.default_rng(0)
    N, V = 256, 2048
    x = {"big": rng.integers(0, V, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]

    def run(force):
        if force:
            monkeypatch.setenv("DEEPCTR_FORCE_COMBINED", "1")
        else:
            monkeypatch.delenv("DEEPCTR_FORCE_COMBINED", raising=False)
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adam", "binary_crossentropy",
                  sparse_table_updates=True)
        st = m.table_state.get("embedding_dict/big")
        assert st["t"].ndim == (0 if tmode == "table" else 1)
        m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)


def test_adam_t_env_validation(monkeypatch):
    monkeypatch.setenv("DEEPCTR_ADAM_T", "bogus")
    cols = [SparseFeat("c0", 50, 4)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    with pytest.raises(ValueError):
        m._adam_t_mode()


def test_sparse_rmsprop_exact_when_all_rows_touched():
    """Lazy rmsprop == dense rmsprop exactly while every row is touched
    every step.  Unlike adagrad (accumulate-only: untouched rows add
    g^2 = 0 — identical either way), rmsprop DECAYS the square-average,
    so dense decays untouched rows toward zero while lazy freezes them;
    equality therefore needs full coverage per batch (the lazy-moment
    divergence is the documented sparse semantics, as with adam)."""
    N, V = 256, 8
    rng = np.random.default_rng(0)
    x = {"c0": np.arange(N) % V, "d0": rng.random(N)}
    y = ((np.arange(N) % V) % 2).astype(np.float64)
    cols = [SparseFeat("c0", V, 4), DenseFeat("d0", 1)]

    def run(sparse):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("rmsprop", "binary_crossentropy",
                  sparse_table_updates=sparse)
        m.fit(x, y, batch_size=64, epochs=3, verbose=0, shuffle=False)
        return m.predict(x, 64)

    np.testing.assert_allclose(run(False), run(True), atol=3e-5)


def test_sparse_rmsprop_untouched_rows_frozen():
    rng = np.random.default_rng(0)
    N = 256
    x = {"c0": rng.integers(0, 500, N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 1000, 4)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
               l2_reg_embedding=0, l2_reg_linear=0)
    m.compile("rmsprop", "binary_crossentropy", sparse_table_updates=True)
    before = np.asarray(m.params["embedding_dict"]["c0"][500:]).copy()
    m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    after = np.asarray(m.params["embedding_dict"]["c0"][500:])
    np.testing.assert_array_equal(before, after)
