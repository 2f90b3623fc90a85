"""Host-side evaluation metrics (sklearn protocol parity).

The reference resolves metric names to sklearn functions
(deepctr_torch/models/basemodel.py:496-512).  log_loss is implemented
locally (eps=1e-7) because newer sklearn removed the ``eps`` argument the
reference relies on.
"""

import numpy as np


def log_loss(y_true, y_pred, eps=1e-7):
    y_true = np.asarray(y_true, dtype=np.float64).reshape(-1)
    y_pred = np.clip(np.asarray(y_pred, dtype=np.float64).reshape(-1),
                     eps, 1.0 - eps)
    return float(-np.mean(y_true * np.log(y_pred) +
                          (1.0 - y_true) * np.log(1.0 - y_pred)))


def roc_auc_score(y_true, y_pred):
    from sklearn.metrics import roc_auc_score as _auc
    return float(_auc(y_true, y_pred))


def mean_squared_error(y_true, y_pred):
    y_true = np.asarray(y_true, dtype=np.float64).reshape(-1)
    y_pred = np.asarray(y_pred, dtype=np.float64).reshape(-1)
    return float(np.mean((y_true - y_pred) ** 2))


def accuracy_score(y_true, y_pred):
    y_true = np.asarray(y_true).reshape(-1)
    y_hat = np.where(np.asarray(y_pred).reshape(-1) > 0.5, 1, 0)
    return float(np.mean(y_true == y_hat))


def resolve_metrics(metrics):
    """Name list -> {name: fn(y_true, y_pred)}.
    (reference parity: basemodel.py:496-512)
    """
    out = {}
    if metrics:
        for metric in metrics:
            if metric in ("binary_crossentropy", "logloss"):
                out[metric] = log_loss
            elif metric == "auc":
                out[metric] = roc_auc_score
            elif metric == "mse":
                out[metric] = mean_squared_error
            elif metric in ("accuracy", "acc"):
                out[metric] = accuracy_score
            elif callable(metric):
                out[getattr(metric, "__name__", str(metric))] = metric
    return out
