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
    m2.fit(make_iter(), batch_size=64, epochs=2, verbose=0, shuffle=False)

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


def test_device_resident_fit_matches_host_fit():
    """fit(x=jax.Array) runs whole epochs inside one jitted fori_loop;
    with shuffle=False and no dropout the trajectory must equal the
    per-batch host loop exactly."""
    import jax.numpy as jnp
    import numpy as np
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    rng = np.random.default_rng(0)
    N = 200   # deliberately not a multiple of batch_size -> padded batch
    x = {"c0": rng.integers(0, 50, N), "c1": rng.integers(0, 30, N),
         "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 50, 4), SparseFeat("c1", 30, 4),
            DenseFeat("d0", 1)]

    def build():
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
        m.compile("adagrad", "binary_crossentropy", metrics=["auc"])
        return m

    m1 = build()
    h1 = m1.fit(x, y, batch_size=64, epochs=3, verbose=0, shuffle=False)

    m2 = build()
    Xd = m2.assemble_device_input(x)
    h2 = m2.fit(Xd, y, batch_size=64, epochs=3, verbose=0, shuffle=False)

    np.testing.assert_allclose(m1.predict(x, 64), m2.predict(x, 64),
                               atol=1e-6)
    np.testing.assert_allclose(h1.history["loss"], h2.history["loss"],
                               rtol=1e-5)
    # device predict path agrees with host predict path
    np.testing.assert_allclose(m2.predict(Xd, 64), m2.predict(x, 64),
                               atol=1e-7)


def test_device_resident_fit_validation_and_callbacks():
    import numpy as np
    from deepctr_tpu.callbacks import EarlyStopping
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM

    rng = np.random.default_rng(1)
    N = 256
    x = {"c0": rng.integers(0, 50, N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 50, 4)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m.compile("adam", "binary_crossentropy", metrics=["auc"])
    Xd = m.assemble_device_input(x)
    es = EarlyStopping(monitor="val_auc", patience=1, mode="max")
    h = m.fit(Xd, y, batch_size=64, epochs=4, verbose=0,
              validation_split=0.25, callbacks=[es])
    # train metrics are gated on verbose>0 (reference parity); val metrics
    # always flow to History for callback monitoring
    assert "val_auc" in h.history
    assert len(h.history["loss"]) <= 4


def test_device_resident_fit_with_train_metrics():
    """verbose>0 + metrics exercises the epoch-preds scatter variant of
    the device loop (need_preds=True); verbose=0 uses the scatter-free
    runner.  Both must train identically per-geometry-cache."""
    import numpy as np
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM

    rng = np.random.default_rng(2)
    N = 128
    x = {"c0": rng.integers(0, 50, N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("c0", 50, 4)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    m.compile("adam", "binary_crossentropy", metrics=["auc"])
    Xd = m.assemble_device_input(x)
    h = m.fit(Xd, y, batch_size=64, epochs=2, verbose=1, shuffle=False)
    assert "auc" in h.history and len(h.history["auc"]) == 2
    # and the metric-free runner (separate cache entry) still works after
    n_loss = len(m.history.history["loss"])
    h2 = m.fit(Xd, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    assert len(h2.history["loss"]) == n_loss + 1
