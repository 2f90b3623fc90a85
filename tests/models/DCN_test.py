import pytest

from deepctr_tpu.models import DCN
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize(
    "cross_num,hidden_size,sparse_feature_num,cross_parameterization",
    [(2, (32,), 2, "vector"), (1, (32,), 2, "matrix"),
     (1, (), 2, "vector"), (0, (32,), 2, "vector")])
def test_DCN(cross_num, hidden_size, sparse_feature_num,
             cross_parameterization):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num)
    model = DCN(feature_columns, feature_columns, cross_num=cross_num,
                cross_parameterization=cross_parameterization,
                dnn_hidden_units=hidden_size, dnn_dropout=0.5)
    check_model(model, "DCN", x, y)
