"""Canonical Criteo binary-classification recipe (DeepFM).

Flow parity with the reference's examples/run_classification_criteo.py:
fillna -> LabelEncoder / MinMaxScaler -> feature columns -> compile/fit ->
test LogLoss + AUC.  Runs on whatever accelerator JAX exposes (TPU here).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pandas as pd
from sklearn.metrics import log_loss, roc_auc_score
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from deepctr_tpu.features import SparseFeat, DenseFeat, get_feature_names
from deepctr_tpu.models import DeepFM

from data_utils import load_criteo_sample

if __name__ == "__main__":
    data = load_criteo_sample()

    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]

    data[sparse_features] = data[sparse_features].fillna("-1")
    data[dense_features] = data[dense_features].fillna(0)
    target = ["label"]

    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])
    data[dense_features] = MinMaxScaler((0, 1)).fit_transform(
        data[dense_features])

    fixlen_feature_columns = (
        [SparseFeat(feat, vocabulary_size=data[feat].max() + 1,
                    embedding_dim=4) for feat in sparse_features]
        + [DenseFeat(feat, 1) for feat in dense_features])
    linear_feature_columns = fixlen_feature_columns
    dnn_feature_columns = fixlen_feature_columns
    feature_names = get_feature_names(
        linear_feature_columns + dnn_feature_columns)

    train, test = train_test_split(data, test_size=0.2, random_state=2020)
    train_model_input = {name: train[name] for name in feature_names}
    test_model_input = {name: test[name] for name in feature_names}

    model = DeepFM(linear_feature_columns, dnn_feature_columns,
                   task="binary", l2_reg_embedding=1e-5)
    model.compile("adagrad", "binary_crossentropy",
                  metrics=["binary_crossentropy", "auc"])
    history = model.fit(train_model_input, train[target].values,
                        batch_size=32, epochs=10, verbose=2,
                        validation_split=0.2)
    pred_ans = model.predict(test_model_input, 256)
    print("")
    print("test LogLoss", round(log_loss(test[target].values, pred_ans), 4))
    print("test AUC", round(roc_auc_score(test[target].values, pred_ans), 4))
