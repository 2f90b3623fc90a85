"""xDeepFM (Lian et al., 2018): linear + CIN + DNN.

Reference parity: deepctr_torch/models/xdeepfm.py:44-107.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..features import SparseFeat, VarLenSparseFeat
from ..inputs import combined_dnn_input
from ..layers import DNN, CIN
from ..layers.core import _dense


def _field_num(feature_columns):
    """Distinct embedding tables (embedding_name dedup) — the reference's
    ``len(self.embedding_dict)`` (xdeepfm.py:66)."""
    return len({f.embedding_name for f in feature_columns
                if isinstance(f, (SparseFeat, VarLenSparseFeat))})


class XDeepFMModule(BaseModule):
    dnn_hidden_units: tuple = (256, 256)
    cin_layer_size: tuple = (256, 128)
    cin_split_half: bool = True
    cin_activation: str = "relu"
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        self.use_dnn = (len(self.dnn_feature_columns) > 0 and
                        len(self.dnn_hidden_units) > 0)
        if self.use_dnn:
            self.dnn = DNN(self.dnn_hidden_units,
                           activation=self.dnn_activation,
                           dropout_rate=self.dnn_dropout,
                           use_bn=self.dnn_use_bn, init_std=self.init_std)
            self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")
        self.use_cin = (len(self.cin_layer_size) > 0 and
                        len(self.dnn_feature_columns) > 0)
        if self.use_cin:
            field_num = _field_num(self.dnn_feature_columns)
            self.cin = CIN(field_size=field_num,
                           layer_size=self.cin_layer_size,
                           activation=self.cin_activation,
                           split_half=self.cin_split_half,
                           init_std=self.init_std)
            self.cin_linear = _dense(1, use_bias=False, name="cin_linear")

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        final_logit = self.linear_model(X)
        if self.use_cin:
            cin_input = jnp.concatenate(sparse_embedding_list, axis=1)
            cin_output = self.cin(cin_input, training=training)
            final_logit = final_logit + self.cin_linear(cin_output).astype(
                final_logit.dtype)
        if self.use_dnn:
            dnn_input = combined_dnn_input(sparse_embedding_list,
                                           dense_value_list)
            dnn_output = self.dnn(dnn_input, training)
            final_logit = final_logit + self.dnn_linear(dnn_output).astype(
                final_logit.dtype)
        return self.out(final_logit)


class xDeepFM(BaseModel):
    """xDeepFM (constructor parity: deepctr_torch/models/xdeepfm.py:44-48)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(256, 256), cin_layer_size=(256, 128),
                 cin_split_half=True, cin_activation="relu",
                 l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0,
                 l2_reg_cin=0, init_std=1e-4, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", dnn_use_bn=False, task="binary",
                 device=None, gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = XDeepFMModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, dnn_hidden_units=tuple(dnn_hidden_units),
            cin_layer_size=tuple(cin_layer_size),
            cin_split_half=cin_split_half, cin_activation=cin_activation,
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^dnn_linear/kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^cin/conv_w", l2=l2_reg_cin)
