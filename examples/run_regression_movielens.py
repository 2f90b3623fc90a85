"""MovieLens rating-regression recipe (DeepFM, task='regression').

Flow parity with the reference's examples/run_regression_movielens.py.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sklearn.metrics import mean_squared_error
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import LabelEncoder

from deepctr_tpu.features import SparseFeat, get_feature_names
from deepctr_tpu.models import DeepFM

from data_utils import load_movielens_sample

if __name__ == "__main__":
    data = load_movielens_sample()
    sparse_features = ["movie_id", "user_id", "gender", "age", "occupation",
                       "zip"]
    target = ["rating"]

    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])

    fixlen_feature_columns = [
        SparseFeat(feat, data[feat].nunique(), embedding_dim=4)
        for feat in sparse_features]
    linear_feature_columns = fixlen_feature_columns
    dnn_feature_columns = fixlen_feature_columns
    feature_names = get_feature_names(
        linear_feature_columns + dnn_feature_columns)

    train, test = train_test_split(data, test_size=0.2, random_state=2020)
    train_model_input = {name: train[name] for name in feature_names}
    test_model_input = {name: test[name] for name in feature_names}

    model = DeepFM(linear_feature_columns, dnn_feature_columns,
                   task="regression")
    model.compile("adam", "mse", metrics=["mse"])
    history = model.fit(train_model_input, train[target].values,
                        batch_size=256, epochs=10, verbose=2,
                        validation_split=0.2)
    pred_ans = model.predict(test_model_input, batch_size=256)
    print("")
    print("test MSE", round(mean_squared_error(
        test[target].values, pred_ans), 4))
