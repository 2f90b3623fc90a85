"""AOT serving exports: jax.export artifacts match model.predict, survive
serialize/deserialize, and serve any batch size via the symbolic batch
dim.  (TPU addition — the reference's only deployment path is torch.save
of the Python module, reference basemodel.py:311-352.)"""

import numpy as np
import pytest

from deepctr_tpu import serving
from deepctr_tpu.features import DenseFeat, SparseFeat, VarLenSparseFeat
from deepctr_tpu.models import DeepFM, MMOE


def _model_and_input(n=64):
    rng = np.random.default_rng(0)
    cols = [SparseFeat("C1", 20, 4), SparseFeat("C2", 9, 4),
            DenseFeat("I1", 1),
            VarLenSparseFeat(SparseFeat("hist", 30, 4), maxlen=5,
                             combiner="mean")]
    model = DeepFM(cols, cols)
    model.compile("adagrad", "binary_crossentropy")
    x = {"C1": rng.integers(0, 20, n), "C2": rng.integers(0, 9, n),
         "I1": rng.random(n).astype("float32"),
         "hist": rng.integers(0, 30, (n, 5)) * rng.integers(0, 2, (n, 5))}
    y = rng.integers(0, 2, n).astype("float32")
    model.fit(x, y, batch_size=32, epochs=1, verbose=0)
    return model, x


def test_export_fixed_batch_matches_predict(tmp_path):
    model, x = _model_and_input(64)
    want = model.predict(x, 64)
    exp = serving.export_predict(model, batch_size=64)
    X = model.assemble_device_input(x)
    got = np.asarray(exp.call(X))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # serialize -> deserialize -> identical results, no model needed
    path = tmp_path / "deepfm.stablehlo"
    serving.save_exported(exp, str(path))
    loaded = serving.load_exported(str(path))
    np.testing.assert_array_equal(np.asarray(loaded.call(X)), got)


def test_export_symbolic_batch_serves_any_size(tmp_path):
    model, x = _model_and_input(64)
    exp = serving.export_predict(model)          # symbolic batch dim
    path = tmp_path / "deepfm_any.stablehlo"
    serving.save_exported(exp, str(path))
    loaded = serving.load_exported(str(path))
    X = np.asarray(model.assemble_device_input(x))
    for b in (1, 7, 64):
        want = model.predict({k: np.asarray(v)[:b] for k, v in x.items()},
                             batch_size=64)
        got = np.asarray(loaded.call(X[:b]))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_multitask(tmp_path):
    rng = np.random.default_rng(1)
    n = 48
    cols = [SparseFeat("u", 10, 4), SparseFeat("i", 15, 4)]
    model = MMOE(cols, task_types=["binary", "binary"],
                 task_names=["finish", "like"])
    model.compile("adagrad", ["binary_crossentropy", "binary_crossentropy"])
    x = {"u": rng.integers(0, 10, n), "i": rng.integers(0, 15, n)}
    y = rng.integers(0, 2, (n, 2)).astype("float32")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    exp = serving.export_predict(model, batch_size=48)
    got = np.asarray(exp.call(model.assemble_device_input(x)))
    np.testing.assert_allclose(got, model.predict(x, 48), atol=1e-6)
    assert got.shape == (48, 2)


def test_export_requires_features():
    model = DeepFM([], [])
    with pytest.raises(ValueError):
        serving.export_predict(model, batch_size=4)


def test_export_syncs_combined_storage_tables(monkeypatch):
    """Regression: export_predict must _sync_params() first — with
    combined (w|acc) storage the params leaf lags table_state after
    fit(), and an export taken before any predict() call used to bake
    the stale rows into the artifact."""
    import jax.experimental.pallas.tpu as pltpu
    from deepctr_tpu import config as dc_config
    from deepctr_tpu import inputs as dc_inputs
    from deepctr_tpu.features import SparseFeat

    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(0)
    N, V = 128, 2048
    x = {"big": rng.integers(0, V, N)}
    y = rng.integers(0, 2, N).astype("float32")
    cols = [SparseFeat("big", V, 16)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
    dc_config.set_use_pallas(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            m.compile("adagrad", "binary_crossentropy",
                      sparse_table_updates=True)
            st = m.table_state.get("embedding_dict/big")
            assert (isinstance(st, dict) and "combined" in st) \
                or "__arena__" in m.table_state
            m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
            # export BEFORE any predict/get_weights (they would sync)
            exp = serving.export_predict(m, batch_size=128)
            got = np.asarray(exp.call(m.assemble_device_input(x)))
            want = m.predict(x, 128)
    finally:
        dc_config.set_use_pallas("auto")
    np.testing.assert_allclose(got, want, atol=1e-6)
