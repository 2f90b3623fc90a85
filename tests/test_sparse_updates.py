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
