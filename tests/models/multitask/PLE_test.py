import pytest

from deepctr_tpu.models.multitask import PLE
from ...utils import SAMPLE_SIZE
from ...utils_mtl import get_mtl_test_data, check_mtl_model


@pytest.mark.parametrize(
    "num_levels,specific_expert_num,shared_expert_num,gate_dnn_hidden_units,"
    "task_types",
    [(1, 1, 1, (), ("binary", "binary")),
     (2, 2, 1, (8,), ("binary", "regression"))])
def test_PLE(num_levels, specific_expert_num, shared_expert_num,
             gate_dnn_hidden_units, task_types):
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=2,
        task_types=task_types)
    model = PLE(feature_columns, shared_expert_num=shared_expert_num,
                specific_expert_num=specific_expert_num,
                num_levels=num_levels, expert_dnn_hidden_units=(8,),
                gate_dnn_hidden_units=gate_dnn_hidden_units,
                tower_dnn_hidden_units=(8,), dnn_dropout=0.5,
                task_types=task_types, task_names=("t1", "t2"))
    check_mtl_model(model, "PLE", x, y, task_types)
