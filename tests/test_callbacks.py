"""Direct semantic tests for the native callbacks (beyond the incidental
coverage every model test gets via check_model).  Reference behavior:
tf.keras EarlyStopping/ModelCheckpoint as re-exported/subclassed by
deepctr_torch/callbacks.py."""

import os

import numpy as np

from deepctr_tpu import load_model
from deepctr_tpu.callbacks import EarlyStopping, History, ModelCheckpoint
from deepctr_tpu.features import SparseFeat
from deepctr_tpu.models import DeepFM


def _model():
    m = DeepFM([SparseFeat("c", 10, 4)], [SparseFeat("c", 10, 4)], seed=3)
    m.compile("adagrad", "binary_crossentropy")
    return m


def _bump(m, delta):
    import jax
    m.set_weights(jax.tree_util.tree_map(lambda a: a + delta,
                                         m.get_weights()))


def test_early_stopping_restores_best_weights():
    m = _model()
    es = EarlyStopping(monitor="val_auc", mode="max", patience=1,
                       restore_best_weights=True)
    es.set_model(m)
    m.stop_training = False
    es.on_train_begin()
    # epoch 0: auc 0.70 (best); epochs 1-2: worse -> stop after patience
    es.on_epoch_end(0, {"val_auc": 0.70})
    best = m.predict({"c": np.arange(10)}, 16)
    _bump(m, 0.5)
    es.on_epoch_end(1, {"val_auc": 0.60})
    _bump(m, 0.5)
    es.on_epoch_end(2, {"val_auc": 0.55})
    assert m.stop_training
    es.on_train_end()
    np.testing.assert_array_equal(m.predict({"c": np.arange(10)}, 16),
                                  best)


def test_early_stopping_baseline_and_min_delta():
    m = _model()
    es = EarlyStopping(monitor="val_auc", mode="max", patience=0,
                       min_delta=0.05)
    es.set_model(m)
    m.stop_training = False
    es.on_train_begin()
    es.on_epoch_end(0, {"val_auc": 0.70})
    # +0.03 < min_delta -> counts as no improvement -> patience 0 stops
    es.on_epoch_end(1, {"val_auc": 0.73})
    assert m.stop_training


def test_model_checkpoint_save_best_only(tmp_path):
    m = _model()
    path = os.path.join(str(tmp_path), "best.dctpu")
    ck = ModelCheckpoint(path, monitor="val_auc", mode="max",
                         save_best_only=True)
    ck.set_model(m)
    ck.on_epoch_end(0, {"val_auc": 0.60})
    assert os.path.exists(path)
    best_pred = m.predict({"c": np.arange(10)}, 16)
    saved_mtime = os.path.getmtime(path)
    # worse epoch: file must NOT be rewritten
    _bump(m, 0.5)
    ck.on_epoch_end(1, {"val_auc": 0.50})
    assert os.path.getmtime(path) == saved_mtime
    # the saved artifact reloads to the best epoch's predictions
    np.testing.assert_array_equal(
        load_model(path).predict({"c": np.arange(10)}, 16), best_pred)
    # better epoch: file rewritten
    ck.on_epoch_end(2, {"val_auc": 0.80})
    got = load_model(path).predict({"c": np.arange(10)}, 16)
    np.testing.assert_array_equal(got,
                                  m.predict({"c": np.arange(10)}, 16))


def test_history_accumulates():
    h = History()
    h.set_model(None)
    h.on_train_begin()
    h.on_epoch_end(0, {"loss": 1.0})
    h.on_epoch_end(1, {"loss": 0.5, "auc": 0.8})
    assert h.history["loss"] == [1.0, 0.5]
    assert h.history["auc"] == [0.8]
    assert h.epoch == [0, 1]


def test_check_version_env_pushed(monkeypatch, caplog):
    """Network-free version check (reference utils.py:19-44 parity with
    the transport inverted): the environment pushes the latest version;
    newer -> logged warning, same/older/absent -> silent no-op."""
    import logging
    from deepctr_tpu.utils.version import check_version

    monkeypatch.delenv("DEEPCTR_TPU_LATEST_VERSION", raising=False)
    assert check_version("0.1.0") is None
    monkeypatch.setenv("DEEPCTR_TPU_LATEST_VERSION", "0.2.0")
    with caplog.at_level(logging.WARNING):
        assert check_version("0.1.0") is True
    assert any("0.2.0 is available" in r.message for r in caplog.records)
    assert check_version("0.2.0") is False
    assert check_version("1.0.0") is False
