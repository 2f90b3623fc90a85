"""NFM (He & Chua, 2017): bi-interaction pooling feeding a DNN.

Reference parity: deepctr_torch/models/nfm.py:38-78.
"""

import flax.linen as nn
import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..inputs import combined_dnn_input
from ..layers import DNN, BiInteractionPooling
from ..layers.core import _dense


class NFMModule(BaseModule):
    dnn_hidden_units: tuple = (128, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    bi_dropout: float = 0.0

    def setup_model(self):
        self.dnn = DNN(self.dnn_hidden_units, activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout, use_bn=False,
                       init_std=self.init_std)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")
        self.bi_pooling = BiInteractionPooling()
        if self.bi_dropout > 0:
            self.bi_dropout_layer = nn.Dropout(self.bi_dropout)

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        linear_logit = self.linear_model(X)
        fm_input = jnp.concatenate(sparse_embedding_list, axis=1)
        bi_out = self.bi_pooling(fm_input)
        if self.bi_dropout > 0:
            bi_out = self.bi_dropout_layer(bi_out,
                                           deterministic=not training)
        dnn_input = combined_dnn_input([bi_out], dense_value_list)
        dnn_output = self.dnn(dnn_input, training)
        logit = linear_logit + self.dnn_linear(dnn_output).astype(
            linear_logit.dtype)
        return self.out(logit)


class NFM(BaseModel):
    """NFM (constructor parity: deepctr_torch/models/nfm.py:38-44)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(128, 128), l2_reg_embedding=1e-5,
                 l2_reg_linear=1e-5, l2_reg_dnn=0, init_std=1e-4, seed=1024,
                 bi_dropout=0, dnn_dropout=0, dnn_activation="relu",
                 task="binary", device=None, gpus=None, mesh=None,
                 shard_embeddings=False):
        self._capture_init_args(locals())
        module = NFMModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            bi_dropout=bi_dropout)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^dnn_linear/kernel$", l2=l2_reg_dnn)
