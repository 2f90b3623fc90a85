"""ESMM (Ma et al., 2018): entire-space CTR/CTCVR factorization — returns
``[ctr, ctr * cvr]``.

Reference parity: deepctr_torch/models/multitask/esmm.py:39-94.
"""

import jax.numpy as jnp

from ..base_module import BaseModule
from ..basemodel import BaseModel
from ...inputs import combined_dnn_input
from ...layers import DNN
from ...layers.core import _dense
from .utils import validate_tasks


class ESMMModule(BaseModule):
    tower_dnn_hidden_units: tuple = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        self.ctr_dnn = DNN(self.tower_dnn_hidden_units,
                           activation=self.dnn_activation,
                           dropout_rate=self.dnn_dropout,
                           use_bn=self.dnn_use_bn, init_std=self.init_std)
        self.cvr_dnn = DNN(self.tower_dnn_hidden_units,
                           activation=self.dnn_activation,
                           dropout_rate=self.dnn_dropout,
                           use_bn=self.dnn_use_bn, init_std=self.init_std)
        self.ctr_dnn_final_layer = _dense(1, use_bias=False,
                                          name="ctr_final")
        self.cvr_dnn_final_layer = _dense(1, use_bias=False,
                                          name="cvr_final")

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        dnn_input = combined_dnn_input(sparse_embedding_list,
                                      dense_value_list)
        ctr_logit = self.ctr_dnn_final_layer(
            self.ctr_dnn(dnn_input, training)).astype(jnp.float32)
        cvr_logit = self.cvr_dnn_final_layer(
            self.cvr_dnn(dnn_input, training)).astype(jnp.float32)
        ctr_pred = self.out(ctr_logit)
        cvr_pred = self.out(cvr_logit)
        ctcvr_pred = ctr_pred * cvr_pred
        return jnp.concatenate([ctr_pred, ctcvr_pred], axis=-1)


class ESMM(BaseModel):
    """ESMM (constructor parity: esmm.py:39-41; exactly 2 binary tasks)."""

    def __init__(self, dnn_feature_columns, tower_dnn_hidden_units=(256, 128),
                 l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0,
                 init_std=1e-4, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", dnn_use_bn=False,
                 task_types=("binary", "binary"),
                 task_names=("ctr", "ctcvr"), device=None, gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        num_tasks = validate_tasks(task_types, task_names,
                                   dnn_feature_columns, exactly_two=True,
                                   binary_only=True)
        module = ESMMModule(
            linear_feature_columns=(),
            dnn_feature_columns=tuple(dnn_feature_columns), task="binary",
            init_std=init_std,
            tower_dnn_hidden_units=tuple(tower_dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__([], dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task="binary", device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.num_tasks = num_tasks
        self.task_names = list(task_names)
        self.add_regularization_rule(r"^(ctr_dnn|cvr_dnn)/.*kernel$",
                                     l2=l2_reg_dnn)
        self.add_regularization_rule(r"^(ctr_final|cvr_final)/kernel$",
                                     l2=l2_reg_dnn)
