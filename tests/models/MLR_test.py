import pytest

from deepctr_tpu.models import MLR
from ..utils import check_model, get_test_data, SAMPLE_SIZE


@pytest.mark.parametrize(
    "region_sparse,region_dense,base_sparse,base_dense,bias_sparse,"
    "bias_dense",
    [(0, 2, 0, 2, 0, 1), (0, 1, 1, 0, 2, 0), (1, 0, 2, 2, 2, 1),
     (2, 0, 2, 0, 0, 0)])
def test_MLRs(region_sparse, region_dense, base_sparse, base_dense,
              bias_sparse, bias_dense):
    region_x, y, region_cols = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=region_sparse,
        dense_feature_num=region_dense, sequence_feature=("mean",),
        prefix="region")
    base_x, _, base_cols = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=base_sparse,
        dense_feature_num=base_dense, sequence_feature=(), prefix="base")
    bias_x, _, bias_cols = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=bias_sparse,
        dense_feature_num=bias_dense, sequence_feature=(), prefix="bias")
    model = MLR(region_cols, base_cols, bias_feature_columns=bias_cols)
    x = {**region_x, **base_x, **bias_x}
    check_model(model, "MLR", x, y)


def test_MLR_region_only():
    x, y, region_cols = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=2,
        prefix="region")
    model = MLR(region_cols)
    check_model(model, "MLR", x, y)
