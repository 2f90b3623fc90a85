"""Orbax train-state checkpointing: exact resume incl. optimizer state."""

import os

import numpy as np

from deepctr_tpu.features import SparseFeat, DenseFeat
from deepctr_tpu.models import DeepFM
from .utils import get_test_data


def _model_and_data(seed=3):
    np.random.seed(0)
    x, y, cols = get_test_data(128, sparse_feature_num=2,
                               dense_feature_num=1, sequence_feature=())
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=seed)
    m.compile("adam", "binary_crossentropy")
    return m, x, y, cols


def test_checkpoint_exact_resume(tmp_path):
    m, x, y, cols = _model_and_data()
    m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    m.save_checkpoint(ckpt)

    # continue training the original
    m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False,
          initial_epoch=2)
    p_cont = m.predict(x, 64)

    # fresh model restored from the checkpoint, trained the same way
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m2.compile("adam", "binary_crossentropy")
    m2.load_checkpoint(ckpt)
    m2.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False,
           initial_epoch=2)
    p_resume = m2.predict(x, 64)

    # adam state restored => identical trajectory
    np.testing.assert_allclose(p_cont, p_resume, atol=1e-6)


def test_checkpoint_without_optimizer(tmp_path):
    m, x, y, cols = _model_and_data()
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
    ckpt = os.path.join(str(tmp_path), "ckpt2")
    m.save_checkpoint(ckpt, include_optimizer=False)
    p = m.predict(x, 64)
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m2.compile("adam", "binary_crossentropy")
    m2.load_checkpoint(ckpt)
    np.testing.assert_allclose(p, m2.predict(x, 64), atol=1e-6)


def test_checkpoint_exact_resume_sparse_adagrad(tmp_path):
    """Resume must also restore the sparse-update table state (adagrad
    accumulators live outside opt_state when sparse_table_updates is on)."""
    np.random.seed(0)
    rng = np.random.default_rng(0)
    N = 192
    x = {"c0": rng.integers(0, 50, N), "c1": rng.integers(0, 30, N),
         "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 50, 4), SparseFeat("c1", 30, 4),
            DenseFeat("d0", 1)]

    def build():
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=True)
        return m

    m = build()
    assert m._sparse_specs, "sparse path must be active for this test"
    m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    ckpt = os.path.join(str(tmp_path), "ckpt_sparse")
    m.save_checkpoint(ckpt)
    m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False,
          initial_epoch=2)
    p_cont = m.predict(x, 64)

    m2 = build()
    m2.load_checkpoint(ckpt)
    m2.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False,
           initial_epoch=2)
    np.testing.assert_allclose(p_cont, m2.predict(x, 64), atol=1e-6)


def test_checkpoint_rejects_mismatched_table_state_layout(tmp_path):
    """A sparse-state checkpoint saved under one optimizer layout must not
    silently seed a different layout (e.g. adagrad acc arrays restored as
    lazy-adam moments); the load raises instead."""
    import pytest

    rng = np.random.default_rng(0)
    N = 96
    x = {"c0": rng.integers(0, 50, N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 50, 4)]

    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m.compile("adagrad", "binary_crossentropy", sparse_table_updates=True)
    assert m._sparse_specs
    m.fit(x, y, batch_size=32, epochs=1, verbose=0)
    ckpt = os.path.join(str(tmp_path), "ckpt_layout")
    m.save_checkpoint(ckpt)

    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m2.compile("adam", "binary_crossentropy", sparse_table_updates=True)
    assert m2._sparse_specs
    with pytest.raises(ValueError, match="layout does not match"):
        m2.load_checkpoint(ckpt)


def test_checkpoint_exact_resume_adam_combined3(tmp_path, monkeypatch):
    """Exact resume of the adam TRIPLE storage (w | m | v interleaved
    [3R, 128] + per-table scalar step count, DEEPCTR_ADAM_T=table
    default) through Orbax: the moments AND the step counter must
    restore, or the post-resume bias correction diverges."""
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    monkeypatch.setenv("DEEPCTR_FORCE_COMBINED", "1")
    rng = np.random.default_rng(0)
    N, V = 192, 2048
    x = {"big": rng.integers(0, V, N), "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]

    def build():
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3,
                   l2_reg_embedding=0, l2_reg_linear=0)
        m.compile("adam", "binary_crossentropy",
                  sparse_table_updates=True)
        return m

    m = build()
    st = m.table_state.get("embedding_dict/big")
    assert isinstance(st, dict) and "combined3" in st and st["t"].ndim == 0
    m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    ckpt = os.path.join(str(tmp_path), "ckpt_combined3")
    m.save_checkpoint(ckpt)
    m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False,
          initial_epoch=2)
    p_cont = m.predict(x, 64)

    m2 = build()
    m2.load_checkpoint(ckpt)
    assert int(m2.table_state["embedding_dict/big"]["t"]) > 0
    m2.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False,
           initial_epoch=2)
    np.testing.assert_allclose(p_cont, m2.predict(x, 64), atol=1e-6)
