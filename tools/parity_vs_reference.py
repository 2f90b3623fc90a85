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


def _run_regression(modname, epochs, seed, torch_device=None):
    """MovieLens rating regression — mirrors the reference recipe
    (/root/reference/examples/run_regression_movielens.py: DeepFM
    task='regression', adam, mse, batch 256, validation_split 0.2)."""
    import importlib
    from sklearn.metrics import mean_squared_error
    from data_utils import load_movielens_sample
    pkg = importlib.import_module(modname + ".models")
    feats = importlib.import_module(
        modname + (".inputs" if modname == "deepctr_torch" else ".features"))
    data = load_movielens_sample()
    sparse = ["movie_id", "user_id", "gender", "age", "occupation", "zip"]
    for f in sparse:
        data[f] = LabelEncoder().fit_transform(data[f])
    cols = [feats.SparseFeat(f, data[f].nunique()) for f in sparse]
    names = feats.get_feature_names(cols + cols)
    train, test = train_test_split(data, test_size=0.2, random_state=2020)
    kwargs = {} if torch_device is None else {"device": torch_device}
    model = getattr(pkg, "DeepFM")(cols, cols, task="regression", seed=seed,
                                   **kwargs)
    model.compile("adam", "mse", metrics=["mse"])
    model.fit({n: train[n] for n in names}, train[["rating"]].values,
              batch_size=256, epochs=epochs, verbose=0, validation_split=0.2)
    pred = model.predict({n: test[n] for n in names}, 256)
    return mean_squared_error(test[["rating"]].values, pred)


def _run_mtl(modname, epochs, seed, torch_device=None):
    """byterec 2-task MMOE — mirrors the reference recipe
    (/root/reference/examples/run_multitask_learning.py: MMOE binary x2,
    adagrad, loss list, batch 32, 80/20 head/tail split, per-task AUC)."""
    import importlib
    from data_utils import load_byterec_sample
    pkg = importlib.import_module(modname + ".models")
    feats = importlib.import_module(
        modname + (".inputs" if modname == "deepctr_torch" else ".features"))
    data = load_byterec_sample()
    sparse = ["uid", "user_city", "item_id", "author_id", "item_city",
              "channel", "music_id", "device"]
    dense = ["duration_time"]
    target = ["finish", "like"]
    for f in sparse:
        data[f] = LabelEncoder().fit_transform(data[f])
    data[dense] = MinMaxScaler((0, 1)).fit_transform(data[dense])
    cols = ([feats.SparseFeat(f, int(data[f].max() + 1), 4) for f in sparse]
            + [feats.DenseFeat(f, 1) for f in dense])
    names = feats.get_feature_names(cols)
    split = int(data.shape[0] * 0.8)
    train, test = data[:split], data[split:]
    kwargs = {} if torch_device is None else {"device": torch_device}
    model = getattr(pkg, "MMOE")(cols, task_types=["binary", "binary"],
                                 l2_reg_embedding=1e-5, task_names=target,
                                 seed=seed, **kwargs)
    model.compile("adagrad",
                  loss=["binary_crossentropy", "binary_crossentropy"],
                  metrics=["binary_crossentropy"])
    model.fit({n: train[n] for n in names}, train[target].values,
              batch_size=32, epochs=epochs, verbose=0)
    pred = model.predict({n: test[n] for n in names}, 256)
    return [(log_loss(test[t].values, pred[:, i]),
             roc_auc_score(test[t].values, pred[:, i]))
            for i, t in enumerate(target)]


def main():
    sys.path.insert(0, "/root/reference")
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    models = (sys.argv[2].split(",") if len(sys.argv) > 2
              else list(MODEL_KWARGS) + ["regression", "mtl"])

    if any(m in MODEL_KWARGS for m in models):
        data, train, test, sparse, dense = prepare()
    for model_name in models:
        for seed in (1024, 2020):
            if model_name == "regression":
                from data_utils import sample_is_synthetic
                if sample_is_synthetic("movielens_sample.txt"):
                    raise SystemExit("movielens_sample.txt missing — "
                                     "refusing synthetic parity")
                ours = _run_regression("deepctr_tpu", epochs, seed)
                ref = _run_regression("deepctr_torch", epochs, seed,
                                      torch_device="cpu")
                print("movielens-regression seed %4d | ours MSE %.4f | "
                      "reference MSE %.4f" % (seed, ours, ref))
            elif model_name == "mtl":
                from data_utils import sample_is_synthetic
                if sample_is_synthetic("byterec_sample.txt"):
                    raise SystemExit("byterec_sample.txt missing — "
                                     "refusing synthetic parity")
                ours = _run_mtl("deepctr_tpu", epochs, seed)
                ref = _run_mtl("deepctr_torch", epochs, seed,
                               torch_device="cpu")
                for i, t in enumerate(["finish", "like"]):
                    print("mmoe-%s seed %4d | ours  logloss %.4f auc %.4f"
                          " | reference logloss %.4f auc %.4f"
                          % (t, seed, ours[i][0], ours[i][1],
                             ref[i][0], ref[i][1]))
            else:
                ours = _run("deepctr_tpu", model_name, data, train, test,
                            sparse, dense, epochs, seed)
                ref = _run("deepctr_torch", model_name, data, train, test,
                           sparse, dense, epochs, seed, torch_device="cpu")
                print("%-8s seed %4d | ours  logloss %.4f auc %.4f | "
                      "reference logloss %.4f auc %.4f"
                      % (model_name, seed, ours[0], ours[1], ref[0], ref[1]))


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    main()
