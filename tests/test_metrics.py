"""Metric parity: the local implementations must match the sklearn
functions the reference resolves to (deepctr_torch basemodel.py:496-512),
including the eps=1e-7 clip behavior newer sklearn removed."""

import numpy as np
import pytest

from deepctr_tpu.utils import metrics as M


def test_log_loss_matches_formula_with_eps():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200).astype(float)
    p = rng.random(200)
    eps = 1e-7
    pc = np.clip(p, eps, 1 - eps)
    want = -np.mean(y * np.log(pc) + (1 - y) * np.log(1 - pc))
    assert abs(M.log_loss(y, p) - want) < 1e-12
    # extreme predictions are clipped, not inf
    assert np.isfinite(M.log_loss([1.0, 0.0], [0.0, 1.0]))
    assert M.log_loss([1.0], [0.0]) == pytest.approx(-np.log(eps))


def test_metrics_match_sklearn():
    import sklearn.metrics as SK
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 300).astype(float)
    p = rng.random(300)
    assert M.roc_auc_score(y, p) == pytest.approx(SK.roc_auc_score(y, p))
    assert M.mean_squared_error(y, p) == pytest.approx(
        SK.mean_squared_error(y, p))
    assert M.accuracy_score(y, p) == pytest.approx(
        SK.accuracy_score(y, np.where(p > 0.5, 1, 0)))


def test_resolve_metrics_names_and_callables():
    def my_metric(y_true, y_pred):
        return 1.0
    out = M.resolve_metrics(["auc", "logloss", "binary_crossentropy",
                             "mse", "accuracy", my_metric])
    assert set(out) == {"auc", "logloss", "binary_crossentropy", "mse",
                        "accuracy", "my_metric"}
    assert out["logloss"] is M.log_loss
