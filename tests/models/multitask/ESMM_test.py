import pytest

from deepctr_tpu.models.multitask import ESMM
from ...utils import SAMPLE_SIZE
from ...utils_mtl import get_mtl_test_data, check_mtl_model


def test_ESMM():
    task_types = ("binary", "binary")
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=2,
        task_types=task_types)
    model = ESMM(feature_columns, tower_dnn_hidden_units=(8,),
                 dnn_dropout=0.5, task_types=task_types,
                 task_names=("ctr", "ctcvr"))
    check_mtl_model(model, "ESMM", x, y, task_types)


def test_ESMM_validates_tasks():
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=0)
    with pytest.raises(ValueError):
        ESMM(feature_columns, task_types=("binary", "regression"),
             task_names=("ctr", "ctcvr"))
    with pytest.raises(ValueError):
        ESMM(feature_columns, task_types=("binary",), task_names=("ctr",))
