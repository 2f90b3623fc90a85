import numpy as np
import pytest

from deepctr_tpu.models.multitask import MMOE
from ...utils import SAMPLE_SIZE
from ...utils_mtl import get_mtl_test_data, check_mtl_model


# mirrors the full reference grid (tests/models/multitask/MMOE_test.py:9-33):
# gate/tower units toggled independently plus a mixed binary+regression row
@pytest.mark.parametrize(
    "num_experts,gate_dnn_hidden_units,tower_dnn_hidden_units,task_types",
    [(3, (8,), (8,), ("binary", "binary")),
     (3, (), (8,), ("binary", "binary")),
     (3, (8,), (), ("binary", "binary")),
     (3, (), (), ("binary", "binary")),
     (3, (8,), (8,), ("binary", "regression"))])
def test_MMOE(num_experts, gate_dnn_hidden_units, tower_dnn_hidden_units,
              task_types):
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=3, dense_feature_num=3,
        task_types=task_types)
    model = MMOE(feature_columns, num_experts=num_experts,
                 expert_dnn_hidden_units=(16, 8),
                 gate_dnn_hidden_units=gate_dnn_hidden_units,
                 tower_dnn_hidden_units=tower_dnn_hidden_units,
                 dnn_dropout=0.5, task_types=task_types,
                 task_names=("t1", "t2"))
    check_mtl_model(model, "MMOE", x, y, task_types)


def test_MMOE_per_task_metrics():
    """evaluate() reports each task separately (<task>_<metric>) alongside
    the across-task mean, so callbacks can monitor a single task
    (reference leaves this to user code, run_multitask_learning.py:60-65)."""
    task_types = ("binary", "binary")
    x, y, feature_columns = get_mtl_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=1,
        task_types=task_types)
    model = MMOE(feature_columns, num_experts=2,
                 expert_dnn_hidden_units=(8,), tower_dnn_hidden_units=(8,),
                 task_types=task_types, task_names=("ctr", "ctcvr"))
    model.compile("adam", ["binary_crossentropy", "binary_crossentropy"],
                  metrics=["binary_crossentropy"])
    h = model.fit(x, y, batch_size=64, epochs=1, verbose=0,
                  validation_split=0.5)
    res = model.evaluate(x, y, 64)
    assert set(res) == {"binary_crossentropy", "ctr_binary_crossentropy",
                        "ctcvr_binary_crossentropy"}
    assert np.isclose(res["binary_crossentropy"],
                      (res["ctr_binary_crossentropy"]
                       + res["ctcvr_binary_crossentropy"]) / 2)
    # per-task validation metrics flow into History for monitoring
    assert "val_ctr_binary_crossentropy" in h.history
