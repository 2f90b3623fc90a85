import pytest

from deepctr_tpu.models import xDeepFM
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize(
    "dnn_hidden_units,cin_layer_size,cin_split_half,cin_activation,"
    "sparse_feature_num,dense_feature_dim",
    [((), (), True, "linear", 1, 2),
     ((8,), (), True, "linear", 1, 1),
     ((), (8,), True, "linear", 2, 2),
     ((8,), (8,), False, "relu", 2, 0)])
def test_xDeepFM(dnn_hidden_units, cin_layer_size, cin_split_half,
                 cin_activation, sparse_feature_num, dense_feature_dim):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num)
    model = xDeepFM(feature_columns, feature_columns,
                    dnn_hidden_units=dnn_hidden_units,
                    cin_layer_size=cin_layer_size,
                    cin_split_half=cin_split_half,
                    cin_activation=cin_activation, dnn_dropout=0.5)
    check_model(model, "xDeepFM", x, y)
