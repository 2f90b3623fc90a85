import pytest

from deepctr_tpu.models import CCPM
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize("sparse_feature_num,dense_feature_num", [(3, 0)])
def test_CCPM(sparse_feature_num, dense_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=dense_feature_num)
    model = CCPM(feature_columns, feature_columns,
                 conv_kernel_width=(3, 2), conv_filters=(2, 1),
                 dnn_hidden_units=(32,), dnn_dropout=0.5)
    check_model(model, "CCPM", x, y)


def test_CCPM_without_seq():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=0,
        sequence_feature=())
    model = CCPM(feature_columns, feature_columns,
                 conv_kernel_width=(3, 2), conv_filters=(2, 1),
                 dnn_hidden_units=(32,), dnn_dropout=0.5)
    check_model(model, "CCPM", x, y)
