"""MovieLens with the multi-valued ``genres`` feature (VarLenSparseFeat,
mean pooling).  Flow parity with the reference's
examples/run_multivalue_movielens.py (pad_sequences done with numpy — no
TensorFlow dependency).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
from sklearn.preprocessing import LabelEncoder

from deepctr_tpu.features import (SparseFeat, VarLenSparseFeat,
                                  get_feature_names)
from deepctr_tpu.models import DeepFM

from data_utils import load_movielens_sample


def pad_post(seqs, maxlen):
    out = np.zeros((len(seqs), maxlen), dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s[:maxlen]
    return out


if __name__ == "__main__":
    data = load_movielens_sample()
    sparse_features = ["movie_id", "user_id", "gender", "age", "occupation",
                       "zip"]
    target = ["rating"]

    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])

    # encode genres; 0 is reserved for padding
    key2index = {}

    def split(x):
        keys = x.split("|")
        for key in keys:
            if key not in key2index:
                key2index[key] = len(key2index) + 1
        return [key2index[key] for key in keys]

    genres_list = [split(v) for v in data["genres"].values]
    max_len = max(len(g) for g in genres_list)
    genres_arr = pad_post(genres_list, max_len)

    fixlen_feature_columns = [
        SparseFeat(feat, data[feat].nunique(), embedding_dim=4)
        for feat in sparse_features]
    varlen_feature_columns = [
        VarLenSparseFeat(SparseFeat("genres",
                                    vocabulary_size=len(key2index) + 1,
                                    embedding_dim=4),
                         maxlen=max_len, combiner="mean")]
    linear_feature_columns = fixlen_feature_columns + varlen_feature_columns
    dnn_feature_columns = fixlen_feature_columns + varlen_feature_columns
    feature_names = get_feature_names(
        linear_feature_columns + dnn_feature_columns)

    model_input = {name: data[name] for name in sparse_features}
    model_input["genres"] = genres_arr

    model = DeepFM(linear_feature_columns, dnn_feature_columns,
                   task="regression")
    model.compile("adam", "mse", metrics=["mse"])
    history = model.fit(model_input, data[target].values, batch_size=256,
                        epochs=10, verbose=2, validation_split=0.2)
