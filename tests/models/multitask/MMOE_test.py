import pytest

from deepctr_tpu.models.multitask import MMOE
from ...utils import SAMPLE_SIZE
from ...utils_mtl import get_mtl_test_data, check_mtl_model


@pytest.mark.parametrize(
    "num_experts,gate_dnn_hidden_units,tower_dnn_hidden_units,task_types",
    [(2, (), (8,), ("binary", "binary")),
     (3, (8,), (), ("binary", "regression")),
     (2, (8,), (8,), ("binary", "binary"))])
def test_MMOE(num_experts, gate_dnn_hidden_units, tower_dnn_hidden_units,
              task_types):
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=2,
        task_types=task_types)
    model = MMOE(feature_columns, num_experts=num_experts,
                 expert_dnn_hidden_units=(8,),
                 gate_dnn_hidden_units=gate_dnn_hidden_units,
                 tower_dnn_hidden_units=tower_dnn_hidden_units,
                 dnn_dropout=0.5, task_types=task_types,
                 task_names=("t1", "t2"))
    check_mtl_model(model, "MMOE", x, y, task_types)
