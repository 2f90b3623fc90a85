import pytest

from deepctr_tpu.models import PNN
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize(
    "use_inner,use_outter,kernel_type,sparse_feature_num",
    [(True, True, "mat", 2), (True, False, "mat", 2),
     (False, True, "vec", 3), (False, True, "num", 3),
     (False, False, "mat", 1)])
def test_PNN(use_inner, use_outter, kernel_type, sparse_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num)
    model = PNN(feature_columns, dnn_hidden_units=(8,), dnn_dropout=0.5,
                use_inner=use_inner, use_outter=use_outter,
                kernel_type=kernel_type)
    check_model(model, "PNN", x, y)
