"""DIN behavior-sequence demo (flow parity with examples/run_din.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepctr_tpu.features import (SparseFeat, DenseFeat, VarLenSparseFeat,
                                  get_feature_names)
from deepctr_tpu.models import DIN


def get_xy_fd():
    feature_columns = [
        SparseFeat("user", 3, embedding_dim=8),
        SparseFeat("gender", 2, embedding_dim=8),
        SparseFeat("item", 3 + 1, embedding_dim=8),
        SparseFeat("item_gender", 2 + 1, embedding_dim=8),
        DenseFeat("score", 1)]
    feature_columns += [
        VarLenSparseFeat(SparseFeat("hist_item", 3 + 1, embedding_dim=8),
                         4, length_name="seq_length"),
        VarLenSparseFeat(
            SparseFeat("hist_item_gender", 2 + 1, embedding_dim=8),
            4, length_name="seq_length")]
    behavior_feature_list = ["item", "item_gender"]
    feature_dict = {
        "user": np.array([0, 1, 2]),
        "gender": np.array([0, 1, 0]),
        "item": np.array([1, 2, 3]),
        "item_gender": np.array([1, 2, 1]),
        "score": np.array([0.1, 0.2, 0.3]),
        "hist_item": np.array([[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 0, 0]]),
        "hist_item_gender": np.array(
            [[1, 1, 2, 0], [2, 1, 1, 0], [2, 1, 0, 0]]),
        "seq_length": np.array([3, 3, 2]),
    }
    x = {name: feature_dict[name]
         for name in get_feature_names(feature_columns)}
    y = np.array([1, 0, 1])
    return x, y, feature_columns, behavior_feature_list


if __name__ == "__main__":
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DIN(feature_columns, behavior_feature_list,
                att_weight_normalization=True)
    model.compile("adagrad", "binary_crossentropy",
                  metrics=["binary_crossentropy"])
    history = model.fit(x, y, batch_size=3, epochs=10, verbose=2,
                        validation_split=0.0)
