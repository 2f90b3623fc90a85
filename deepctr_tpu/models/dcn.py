"""DCN / DCN-V2 (Wang et al., 2017/2020): cross network + DNN, stacked head.

Reference parity: deepctr_torch/models/dcn.py:44-96.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..inputs import combined_dnn_input
from ..layers import DNN, CrossNet
from ..layers.core import _dense


class DCNModule(BaseModule):
    cross_num: int = 2
    cross_parameterization: str = "vector"
    dnn_hidden_units: tuple = (128, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        in_dim = self.compute_input_dim(self.dnn_feature_columns)
        if len(self.dnn_hidden_units) > 0:
            self.dnn = DNN(self.dnn_hidden_units,
                           activation=self.dnn_activation,
                           dropout_rate=self.dnn_dropout,
                           use_bn=self.dnn_use_bn, init_std=self.init_std)
        if self.cross_num > 0:
            self.crossnet = CrossNet(
                in_features=in_dim, layer_num=self.cross_num,
                parameterization=self.cross_parameterization)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")

    def __call__(self, X, training=False):
        logit = self.linear_model(X)
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        dnn_input = combined_dnn_input(sparse_embedding_list,
                                      dense_value_list)
        if len(self.dnn_hidden_units) > 0 and self.cross_num > 0:
            deep_out = self.dnn(dnn_input, training)
            cross_out = self.crossnet(dnn_input)
            stack_out = jnp.concatenate(
                [cross_out, deep_out.astype(cross_out.dtype)], axis=-1)
            logit = logit + self.dnn_linear(stack_out).astype(logit.dtype)
        elif len(self.dnn_hidden_units) > 0:
            deep_out = self.dnn(dnn_input, training)
            logit = logit + self.dnn_linear(deep_out).astype(logit.dtype)
        elif self.cross_num > 0:
            cross_out = self.crossnet(dnn_input)
            logit = logit + self.dnn_linear(cross_out).astype(logit.dtype)
        return self.out(logit)


class DCN(BaseModel):
    """DCN / DCN-M (constructor parity: deepctr_torch/models/dcn.py:44-49)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 cross_num=2, cross_parameterization="vector",
                 dnn_hidden_units=(128, 128), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_cross=1e-5, l2_reg_dnn=0,
                 init_std=1e-4, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", dnn_use_bn=False, task="binary",
                 device=None, gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = DCNModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, cross_num=cross_num,
            cross_parameterization=cross_parameterization,
            dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^dnn_linear/kernel$", l2=l2_reg_linear)
        self.add_regularization_rule(r"^crossnet/kernels$", l2=l2_reg_cross)
