import pytest

from deepctr_tpu.models import AutoInt
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize(
    "att_layer_num,dnn_hidden_units,sparse_feature_num",
    [(1, (4,), 2), (0, (4,), 2), (2, (4, 4), 2), (1, (), 1), (1, (4,), 1)])
def test_AutoInt(att_layer_num, dnn_hidden_units, sparse_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num)
    model = AutoInt(feature_columns, feature_columns,
                    att_layer_num=att_layer_num,
                    dnn_hidden_units=dnn_hidden_units, dnn_dropout=0.5)
    check_model(model, "AutoInt", x, y)
