"""DIEN demo incl. negative sampling + AUGRU (flow parity with
examples/run_dien.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepctr_tpu.features import (SparseFeat, DenseFeat, VarLenSparseFeat,
                                  get_feature_names)
from deepctr_tpu.models import DIEN


def get_xy_fd(use_neg=False):
    feature_columns = [
        SparseFeat("user", 4, embedding_dim=4),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item_id", 3 + 1, embedding_dim=8),
        SparseFeat("cate_id", 2 + 1, embedding_dim=4),
        DenseFeat("pay_score", 1)]
    feature_columns += [
        VarLenSparseFeat(
            SparseFeat("hist_item_id", vocabulary_size=3 + 1,
                       embedding_dim=8, embedding_name="item_id"),
            maxlen=4, length_name="seq_length"),
        VarLenSparseFeat(
            SparseFeat("hist_cate_id", vocabulary_size=2 + 1,
                       embedding_dim=4, embedding_name="cate_id"),
            maxlen=4, length_name="seq_length")]
    behavior_feature_list = ["item_id", "cate_id"]
    feature_dict = {
        "user": np.array([0, 1, 2, 3]),
        "gender": np.array([0, 1, 0, 1]),
        "item_id": np.array([1, 2, 3, 2]),
        "cate_id": np.array([1, 2, 1, 2]),
        "pay_score": np.array([0.1, 0.2, 0.3, 0.2]),
        "hist_item_id": np.array(
            [[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 0, 0], [1, 2, 0, 0]]),
        "hist_cate_id": np.array(
            [[1, 1, 2, 0], [2, 1, 1, 0], [2, 1, 0, 0], [1, 2, 0, 0]]),
        "seq_length": np.array([3, 3, 2, 2]),
    }
    if use_neg:
        feature_dict["neg_hist_item_id"] = np.array(
            [[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 0, 0], [1, 2, 0, 0]])
        feature_dict["neg_hist_cate_id"] = np.array(
            [[1, 1, 2, 0], [2, 1, 1, 0], [2, 1, 0, 0], [1, 2, 0, 0]])
        feature_columns += [
            VarLenSparseFeat(
                SparseFeat("neg_hist_item_id", vocabulary_size=3 + 1,
                           embedding_dim=8, embedding_name="item_id"),
                maxlen=4, length_name="seq_length"),
            VarLenSparseFeat(
                SparseFeat("neg_hist_cate_id", vocabulary_size=2 + 1,
                           embedding_dim=4, embedding_name="cate_id"),
                maxlen=4, length_name="seq_length")]
    x = {name: feature_dict[name]
         for name in get_feature_names(feature_columns)}
    y = np.array([1, 0, 1, 0])
    return x, y, feature_columns, behavior_feature_list


if __name__ == "__main__":
    x, y, feature_columns, behavior_feature_list = get_xy_fd(use_neg=True)
    model = DIEN(feature_columns, behavior_feature_list, gru_type="AUGRU",
                 use_negsampling=True, dnn_hidden_units=(4, 4, 4),
                 dnn_dropout=0.6)
    model.compile("adam", "binary_crossentropy",
                  metrics=["binary_crossentropy", "auc"])
    history = model.fit(x, y, batch_size=2, epochs=10, verbose=2,
                        validation_split=0.0)
