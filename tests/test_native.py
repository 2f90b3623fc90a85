"""Native runtime (C++ batcher) tests: build, correctness vs numpy
fallback, and the end-to-end use_hash capability."""

import numpy as np
import pytest

from deepctr_tpu import native
from deepctr_tpu.features import SparseFeat
from deepctr_tpu.models import DeepFM


def test_native_builds():
    assert native.available(), "g++ build of the native batcher failed"


def test_assemble_matches_numpy():
    rng = np.random.default_rng(0)
    arrays = [rng.random((1000, w)).astype(np.float32)
              for w in (1, 3, 1, 7, 2)]
    got = native.assemble(arrays)
    np.testing.assert_array_equal(got, np.concatenate(arrays, axis=1))


def test_assemble_rejects_mismatched_rows():
    rng = np.random.default_rng(0)
    arrays = [rng.random((100, 2)).astype(np.float32),
              rng.random((99, 2)).astype(np.float32)]
    with pytest.raises(ValueError, match="same number of rows"):
        native.assemble(arrays)


def test_fit_rejects_mismatched_feature_lengths():
    # a short feature array used to reach the C++ batcher, which reads
    # rows[0] rows from EVERY source — out-of-bounds; must raise instead
    rng = np.random.default_rng(0)
    cols = [SparseFeat("C1", 10, 4), SparseFeat("C2", 10, 4)]
    m = DeepFM(cols, cols)
    m.compile("adagrad", "binary_crossentropy")
    x = {"C1": rng.integers(0, 10, 64), "C2": rng.integers(0, 10, 32)}
    y = rng.integers(0, 2, 64).astype("float32")
    with pytest.raises(ValueError, match="inconsistent sample counts"):
        m.fit(x, y, batch_size=32, epochs=1, verbose=0)


def test_take_rows_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.random((500, 17)).astype(np.float32)
    idx = rng.integers(0, 500, 123)
    np.testing.assert_array_equal(native.take_rows(m, idx), m[idx])


def test_hash_native_matches_python_fallback():
    vals = np.array(["apple", "banana", "", "apple", "0", "Ω"], object)
    nat = native.hash_to_bucket(vals, 1000)
    py = np.array([native._fnv1a(str(v).encode("utf-8")) % 1000
                   for v in vals])
    np.testing.assert_array_equal(nat, py)
    assert nat[0] == nat[3]  # stable

    ints = np.array([1, 2, 3, 1, 10**12], np.int64)
    nat_i = native.hash_to_bucket(ints, 997)
    py_i = np.array([native._fnv1a(np.int64(v).tobytes()) % 997
                     for v in ints])
    np.testing.assert_array_equal(nat_i, py_i)


def test_use_hash_end_to_end_with_strings():
    """SparseFeat(use_hash=True) trains directly on raw string ids —
    a capability the reference only stubs (inputs.py:31-33)."""
    rng = np.random.default_rng(0)
    N = 128
    cities = np.array(["nyc", "sfo", "ber", "tok", "par"])
    c0 = cities[rng.integers(0, 5, N)]
    y = (np.char.str_len(c0) + rng.random(N) * 0.1 > 3.05).astype(float)
    y = (c0 == "nyc").astype(np.float64)
    cols = [SparseFeat("city", 50, 4, use_hash=True),
            SparseFeat("other", 20, 4)]
    x = {"city": c0, "other": rng.integers(0, 20, N)}
    model = DeepFM(cols, cols, dnn_hidden_units=(8,))
    model.compile("adagrad", "binary_crossentropy", metrics=["auc"])
    h = model.fit(x, y, batch_size=64, epochs=30, validation_split=0.25,
                  verbose=0)
    assert h.history["val_auc"][-1] > 0.9
