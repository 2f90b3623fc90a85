"""Streaming fit: training from a chunk generator (datasets larger than
host memory) matches in-memory training."""

import numpy as np

from deepctr_tpu.features import SparseFeat
from deepctr_tpu.models import DeepFM


def _data(N=512):
    rng = np.random.default_rng(0)
    c0 = rng.integers(0, 8, N)
    x = {"c0": c0, "c1": rng.integers(0, 20, N)}
    y = (c0 >= 4).astype(np.float64)
    cols = [SparseFeat("c0", 8, 4), SparseFeat("c1", 20, 4)]
    return x, y, cols


def test_stream_matches_in_memory():
    x, y, cols = _data()

    def make_iter(chunk=128):
        def it():
            for lo in range(0, len(y), chunk):
                yield ({k: v[lo:lo + chunk] for k, v in x.items()},
                       y[lo:lo + chunk])
        return it

    m1 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m1.compile("adam", "binary_crossentropy")
    m1.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)

    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m2.compile("adam", "binary_crossentropy")
    m2.fit(make_iter(), batch_size=64, epochs=2, verbose=0)

    p1, p2 = m1.predict(x, 64), m2.predict(x, 64)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_stream_with_validation_and_steps_cap():
    x, y, cols = _data()

    def it():
        while True:   # infinite stream; steps_per_epoch bounds the epoch
            yield x, y

    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m.compile("adagrad", "binary_crossentropy", metrics=["auc"])
    h = m.fit(lambda: it(), batch_size=128, epochs=8, verbose=0,
              steps_per_epoch=4, validation_data=(x, y))
    assert len(h.history["val_auc"]) == 8
    assert h.history["val_auc"][-1] > 0.9
