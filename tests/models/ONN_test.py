import pytest

from deepctr_tpu.models import ONN
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize("hidden_size,sparse_feature_num", [((8,), 2),
                                                            ((8, 8), 3)])
def test_ONN(hidden_size, sparse_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num)
    model = ONN(feature_columns, feature_columns,
                dnn_hidden_units=hidden_size, dnn_dropout=0.5)
    check_model(model, "ONN", x, y)
