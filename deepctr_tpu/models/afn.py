"""AFN (Cheng et al., 2020): adaptive factorization network — logarithmic
transformation layer learning arbitrary-order crosses (non-ensembled AFN).

Reference parity: deepctr_torch/models/afn.py:42-80.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..inputs import embedding_size_of
from ..layers import DNN, LogTransformLayer
from ..layers.core import _dense
from .xdeepfm import _field_num


class AFNModule(BaseModule):
    ltl_hidden_size: int = 256
    afn_dnn_hidden_units: tuple = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"

    def setup_model(self):
        self.ltl = LogTransformLayer(
            _field_num(self.dnn_feature_columns),
            embedding_size_of(self.dnn_feature_columns),
            self.ltl_hidden_size)
        self.afn_dnn = DNN(self.afn_dnn_hidden_units,
                           activation=self.dnn_activation,
                           dropout_rate=self.dnn_dropout, use_bn=True,
                           init_std=self.init_std)
        self.afn_dnn_linear = _dense(1, name="afn_dnn_linear")

    def __call__(self, X, training=False):
        sparse_embedding_list, _ = self.input_from_feature_columns(
            X, self.dnn_feature_columns)
        logit = self.linear_model(X)
        if len(sparse_embedding_list) == 0:
            raise ValueError("Sparse embeddings not provided. AFN only "
                             "accepts sparse embeddings as input.")
        afn_input = jnp.concatenate(sparse_embedding_list, axis=1)
        ltl_result = self.ltl(afn_input, training)
        afn_logit = self.afn_dnn(ltl_result, training)
        afn_logit = self.afn_dnn_linear(afn_logit)
        logit = logit + afn_logit.astype(logit.dtype)
        return self.out(logit)


class AFN(BaseModel):
    """AFN (constructor parity: deepctr_torch/models/afn.py:42-47)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 ltl_hidden_size=256, afn_dnn_hidden_units=(256, 128),
                 l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0,
                 init_std=1e-4, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", task="binary", device=None, gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = AFNModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, ltl_hidden_size=ltl_hidden_size,
            afn_dnn_hidden_units=tuple(afn_dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^afn_dnn/.*kernel$", l2=l2_reg_dnn)
