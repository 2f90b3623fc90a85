"""Multi-task recipe on the byterec sample (MMOE over finish/like).

Flow parity with the reference's examples/run_multitask_learning.py.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sklearn.metrics import log_loss, roc_auc_score
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from deepctr_tpu.features import SparseFeat, DenseFeat, get_feature_names
from deepctr_tpu.models import MMOE

from data_utils import load_byterec_sample

if __name__ == "__main__":
    data = load_byterec_sample()
    sparse_features = ["uid", "user_city", "item_id", "author_id",
                       "item_city", "channel", "music_id", "device"]
    dense_features = ["duration_time"]
    target = ["finish", "like"]

    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])
    data[dense_features] = MinMaxScaler((0, 1)).fit_transform(
        data[dense_features])

    fixlen_feature_columns = (
        [SparseFeat(feat, vocabulary_size=data[feat].max() + 1,
                    embedding_dim=4) for feat in sparse_features]
        + [DenseFeat(feat, 1) for feat in dense_features])
    dnn_feature_columns = fixlen_feature_columns
    feature_names = get_feature_names(fixlen_feature_columns)

    split_boundary = int(data.shape[0] * 0.8)
    train, test = data[:split_boundary], data[split_boundary:]
    train_model_input = {name: train[name] for name in feature_names}
    test_model_input = {name: test[name] for name in feature_names}

    model = MMOE(dnn_feature_columns, task_types=["binary", "binary"],
                 l2_reg_embedding=1e-5, task_names=target)
    model.compile("adagrad",
                  loss=["binary_crossentropy", "binary_crossentropy"],
                  metrics=["binary_crossentropy"])
    history = model.fit(train_model_input, train[target].values,
                        batch_size=32, epochs=10, verbose=2)
    pred_ans = model.predict(test_model_input, 256)
    print("")
    for i, target_name in enumerate(target):
        print("%s test LogLoss" % target_name,
              round(log_loss(test[target[i]].values, pred_ans[:, i]), 4))
        print("%s test AUC" % target_name,
              round(roc_auc_score(test[target[i]].values, pred_ans[:, i]),
                    4))
