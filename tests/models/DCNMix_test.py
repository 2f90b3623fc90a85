import pytest

from deepctr_tpu.models import DCNMix
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize("cross_num,hidden_size,sparse_feature_num",
                         [(2, (32,), 2), (1, (32,), 3)])
def test_DCNMix(cross_num, hidden_size, sparse_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num)
    model = DCNMix(feature_columns, feature_columns, cross_num=cross_num,
                   dnn_hidden_units=hidden_size, low_rank=4, num_experts=2,
                   dnn_dropout=0.5)
    check_model(model, "DCNMix", x, y)
