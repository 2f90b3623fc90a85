import pytest

from deepctr_tpu.models import FiBiNET
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize("bilinear_type",
                         ["all", "each", "interaction"])
def test_FiBiNET(bilinear_type):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=2)
    model = FiBiNET(feature_columns, feature_columns,
                    bilinear_type=bilinear_type,
                    dnn_hidden_units=(8,), dnn_dropout=0.5)
    check_model(model, "FiBiNET", x, y)
