import pytest

from deepctr_tpu.models import IFM
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize("hidden_size,sparse_feature_num",
                         [((32,), 3), ((32,), 2), ((32,), 1)])
def test_IFM(hidden_size, sparse_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num)
    model = IFM(feature_columns, feature_columns,
                dnn_hidden_units=hidden_size, dnn_dropout=0.5)
    check_model(model, "IFM", x, y)
