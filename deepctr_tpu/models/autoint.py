"""AutoInt (Song et al., 2019): stacked field self-attention + DNN.

Reference parity: deepctr_torch/models/autoint.py:40-106 (note the
reference passes ``l2_reg_linear=0`` to its base, autoint.py:45).
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..inputs import combined_dnn_input, embedding_size_of
from ..layers import DNN, InteractingLayer
from ..layers.core import _dense
from .xdeepfm import _field_num


class AutoIntModule(BaseModule):
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True
    dnn_hidden_units: tuple = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        if len(self.dnn_hidden_units) <= 0 and self.att_layer_num <= 0:
            raise ValueError("Either hidden_layer or att_layer_num must > 0")
        self.use_dnn = (len(self.dnn_feature_columns) > 0 and
                        len(self.dnn_hidden_units) > 0)
        embedding_size = embedding_size_of(self.dnn_feature_columns)
        if self.use_dnn:
            self.dnn = DNN(self.dnn_hidden_units,
                           activation=self.dnn_activation,
                           dropout_rate=self.dnn_dropout,
                           use_bn=self.dnn_use_bn, init_std=self.init_std)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")
        self.int_layers = [
            InteractingLayer(embedding_size, self.att_head_num, self.att_res,
                             name="int_layer_%d" % i)
            for i in range(self.att_layer_num)]

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        logit = self.linear_model(X)
        att_input = jnp.concatenate(sparse_embedding_list, axis=1)
        for layer in self.int_layers:
            att_input = layer(att_input)
        att_output = att_input.reshape(att_input.shape[0], -1)
        dnn_input = combined_dnn_input(sparse_embedding_list,
                                      dense_value_list)
        if len(self.dnn_hidden_units) > 0 and self.att_layer_num > 0:
            deep_out = self.dnn(dnn_input, training)
            stack_out = jnp.concatenate(
                [att_output, deep_out.astype(att_output.dtype)], axis=-1)
            logit = logit + self.dnn_linear(stack_out).astype(logit.dtype)
        elif len(self.dnn_hidden_units) > 0:
            deep_out = self.dnn(dnn_input, training)
            logit = logit + self.dnn_linear(deep_out).astype(logit.dtype)
        elif self.att_layer_num > 0:
            logit = logit + self.dnn_linear(att_output).astype(logit.dtype)
        return self.out(logit)


class AutoInt(BaseModel):
    """AutoInt (constructor parity: deepctr_torch/models/autoint.py:39-42)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 att_layer_num=3, att_head_num=2, att_res=True,
                 dnn_hidden_units=(256, 128), dnn_activation="relu",
                 l2_reg_dnn=0, l2_reg_embedding=1e-5, dnn_use_bn=False,
                 dnn_dropout=0, init_std=1e-4, seed=1024, task="binary",
                 device=None, gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = AutoIntModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, att_layer_num=att_layer_num,
            att_head_num=att_head_num, att_res=att_res,
            dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=0,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
