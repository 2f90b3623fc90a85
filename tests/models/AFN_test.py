import pytest

from deepctr_tpu.models import AFN
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize(
    "afn_dnn_hidden_units,sparse_feature_num,dense_feature_num",
    [((32, 16), 3, 0), ((32, 16), 3, 3)])
def test_AFN(afn_dnn_hidden_units, sparse_feature_num, dense_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=dense_feature_num)
    model = AFN(feature_columns, feature_columns, ltl_hidden_size=32,
                afn_dnn_hidden_units=afn_dnn_hidden_units, dnn_dropout=0.5)
    check_model(model, "AFN", x, y)
