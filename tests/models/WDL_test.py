import pytest

from deepctr_tpu.models import WDL
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize("sparse_feature_num,dense_feature_num",
                         [(2, 0), (0, 2), (2, 2)])
def test_WDL(sparse_feature_num, dense_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=dense_feature_num)
    model = WDL(feature_columns, feature_columns, dnn_activation="prelu",
                dnn_hidden_units=(32, 32), dnn_dropout=0.5)
    check_model(model, "WDL", x, y)
