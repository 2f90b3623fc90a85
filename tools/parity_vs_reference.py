"""AUC/LogLoss parity harness: this framework vs DeepCTR-Torch on the
sample Criteo recipe (identical preprocessing, split and hyperparameters).

The reference publishes no benchmark numbers (BASELINE.md), so parity is
established by running both frameworks side by side.  Sample datasets are
tiny, so expect run-to-run noise of a few AUC points; the check is that
both land in the same band over seeds.

Usage:  python tools/parity_vs_reference.py [epochs]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "examples"))

import numpy as np
import pandas as pd
from sklearn.metrics import log_loss, roc_auc_score
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import LabelEncoder, MinMaxScaler


def prepare():
    from data_utils import load_criteo_sample, sample_is_synthetic
    if sample_is_synthetic("criteo_sample.txt"):
        raise SystemExit(
            "criteo_sample.txt not found (examples/data/ or the reference "
            "checkout) — refusing to report parity numbers on synthetic "
            "stand-in data.")
    data = load_criteo_sample()
    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]
    data[sparse_features] = data[sparse_features].fillna("-1")
    data[dense_features] = data[dense_features].fillna(0)
    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])
    data[dense_features] = MinMaxScaler((0, 1)).fit_transform(
        data[dense_features])
    train, test = train_test_split(data, test_size=0.2, random_state=2020)
    return data, train, test, sparse_features, dense_features


MODEL_KWARGS = {
    "DeepFM": {},
    "WDL": {},
    "xDeepFM": dict(dnn_hidden_units=(64,), cin_layer_size=(16, 8)),
    "DCN": dict(cross_num=2),
    "AutoInt": dict(att_layer_num=2, dnn_hidden_units=(64,)),
    "NFM": {},
}


def _run(modname, model_name, data, train, test, sparse, dense, epochs,
         seed, torch_device=None):
    import importlib
    pkg = importlib.import_module(modname + ".models")
    feats = importlib.import_module(
        modname + (".inputs" if modname == "deepctr_torch" else ".features"))
    cols = ([feats.SparseFeat(f, data[f].max() + 1, 4) for f in sparse]
            + [feats.DenseFeat(f, 1) for f in dense])
    names = feats.get_feature_names(cols)
    kwargs = dict(MODEL_KWARGS[model_name])
    if torch_device is not None:
        kwargs["device"] = torch_device
    model = getattr(pkg, model_name)(cols, cols, task="binary",
                                     l2_reg_embedding=1e-5, seed=seed,
                                     **kwargs)
    model.compile("adagrad", "binary_crossentropy",
                  metrics=["binary_crossentropy"])
    model.fit({n: train[n] for n in names}, train["label"].values,
              batch_size=32, epochs=epochs, verbose=0, validation_split=0.2)
    pred = model.predict({n: test[n] for n in names}, 256)
    return (log_loss(test["label"].values, pred),
            roc_auc_score(test["label"].values, pred))


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/reference")
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    models = (sys.argv[2].split(",") if len(sys.argv) > 2
              else list(MODEL_KWARGS))
    data, train, test, sparse, dense = prepare()
    for model_name in models:
        for seed in (1024, 2020):
            ours = _run("deepctr_tpu", model_name, data, train, test,
                        sparse, dense, epochs, seed)
            ref = _run("deepctr_torch", model_name, data, train, test,
                       sparse, dense, epochs, seed, torch_device="cpu")
            print("%-8s seed %4d | ours  logloss %.4f auc %.4f | "
                  "reference logloss %.4f auc %.4f"
                  % (model_name, seed, ours[0], ours[1], ref[0], ref[1]))
