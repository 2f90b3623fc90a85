import pytest

from deepctr_tpu.models.multitask import SharedBottom
from ...utils import SAMPLE_SIZE
from ...utils_mtl import get_mtl_test_data, check_mtl_model


@pytest.mark.parametrize("task_types",
                         [("binary", "binary"), ("binary", "regression")])
def test_SharedBottom(task_types):
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=2,
        task_types=task_types)
    model = SharedBottom(feature_columns,
                         bottom_dnn_hidden_units=(8,),
                         tower_dnn_hidden_units=(8,), dnn_dropout=0.5,
                         task_types=task_types,
                         task_names=("t1", "t2"))
    check_mtl_model(model, "SharedBottom", x, y, task_types)


def test_SharedBottom_no_tower():
    task_types = ("binary", "binary")
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=1,
        task_types=task_types)
    model = SharedBottom(feature_columns, bottom_dnn_hidden_units=(8,),
                         tower_dnn_hidden_units=(), task_types=task_types,
                         task_names=("t1", "t2"))
    check_mtl_model(model, "SharedBottom", x, y, task_types)
