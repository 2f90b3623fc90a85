"""Shared-Bottom MTL (Caruana, 1997): shared DNN + per-task towers.

Reference parity: deepctr_torch/models/multitask/sharedbottom.py:40-104.
"""

import jax.numpy as jnp

from ..base_module import BaseModule
from ..basemodel import BaseModel
from ...inputs import combined_dnn_input
from ...layers import DNN, PredictionLayer
from ...layers.core import _dense
from .utils import validate_tasks


class SharedBottomModule(BaseModule):
    bottom_dnn_hidden_units: tuple = (256, 128)
    tower_dnn_hidden_units: tuple = (64,)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
    task_types: tuple = ("binary", "binary")
    task_names: tuple = ("ctr", "ctcvr")

    def setup_model(self):
        num_tasks = len(self.task_names)
        self.bottom_dnn = DNN(self.bottom_dnn_hidden_units,
                              activation=self.dnn_activation,
                              dropout_rate=self.dnn_dropout,
                              use_bn=self.dnn_use_bn, init_std=self.init_std)
        if len(self.tower_dnn_hidden_units) > 0:
            self.tower_dnn = [
                DNN(self.tower_dnn_hidden_units,
                    activation=self.dnn_activation,
                    dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
                    init_std=self.init_std, name="tower_dnn_%d" % i)
                for i in range(num_tasks)]
        self.tower_dnn_final_layer = [
            _dense(1, use_bias=False, name="tower_final_%d" % i)
            for i in range(num_tasks)]
        self.task_out = [PredictionLayer(t, name="out_%d" % i)
                         for i, t in enumerate(self.task_types)]

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        dnn_input = combined_dnn_input(sparse_embedding_list,
                                      dense_value_list)
        shared = self.bottom_dnn(dnn_input, training)
        task_outs = []
        for i in range(len(self.task_names)):
            h = (self.tower_dnn[i](shared, training)
                 if len(self.tower_dnn_hidden_units) > 0 else shared)
            logit = self.tower_dnn_final_layer[i](h).astype(jnp.float32)
            task_outs.append(self.task_out[i](logit))
        return jnp.concatenate(task_outs, axis=-1)


class SharedBottom(BaseModel):
    """Shared-Bottom (constructor parity: sharedbottom.py:40-42)."""

    def __init__(self, dnn_feature_columns, bottom_dnn_hidden_units=(256, 128),
                 tower_dnn_hidden_units=(64,), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, init_std=1e-4,
                 seed=1024, dnn_dropout=0, dnn_activation="relu",
                 dnn_use_bn=False, task_types=("binary", "binary"),
                 task_names=("ctr", "ctcvr"), device=None, gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        num_tasks = validate_tasks(task_types, task_names,
                                   dnn_feature_columns)
        module = SharedBottomModule(
            linear_feature_columns=(),
            dnn_feature_columns=tuple(dnn_feature_columns),
            init_std=init_std,
            bottom_dnn_hidden_units=tuple(bottom_dnn_hidden_units),
            tower_dnn_hidden_units=tuple(tower_dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn, task_types=tuple(task_types),
            task_names=tuple(task_names))
        super().__init__([], dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task_types[0], device=device,
                         gpus=gpus, mesh=mesh,
                         shard_embeddings=shard_embeddings)
        self.num_tasks = num_tasks
        self.task_names = list(task_names)
        self.add_regularization_rule(
            r"^(bottom_dnn|tower_dnn_\d+)/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^tower_final_\d+/kernel$",
                                     l2=l2_reg_dnn)
