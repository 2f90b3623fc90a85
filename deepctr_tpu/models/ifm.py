"""IFM (Yu et al., 2019): input-aware factorization machine.

A factor-estimating DNN produces per-field weights m_{x,i} that rescale both
the linear part and the FM embeddings.
Reference parity: deepctr_torch/models/ifm.py:38-87.
"""

import jax
import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..features import SparseFeat, VarLenSparseFeat
from ..inputs import combined_dnn_input
from ..layers import FM, DNN
from ..layers.core import _dense


class IFMModule(BaseModule):
    dnn_hidden_units: tuple = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        if not len(self.dnn_hidden_units) > 0:
            raise ValueError("dnn_hidden_units is null!")
        self.fm = FM()
        self.factor_estimating_net = DNN(
            self.dnn_hidden_units, activation=self.dnn_activation,
            dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
            init_std=self.init_std)
        self.sparse_feat_num = len(
            [f for f in self.dnn_feature_columns
             if isinstance(f, (SparseFeat, VarLenSparseFeat))])
        self.transform_weight_matrix_P = _dense(
            self.sparse_feat_num, use_bias=False,
            name="transform_weight_matrix_P")

    def __call__(self, X, training=False):
        sparse_embedding_list, _ = self.input_from_feature_columns(
            X, self.dnn_feature_columns)
        if not len(sparse_embedding_list) > 0:
            raise ValueError("there are no sparse features")

        dnn_input = combined_dnn_input(sparse_embedding_list, [])
        dnn_output = self.factor_estimating_net(dnn_input, training)
        dnn_output = self.transform_weight_matrix_P(dnn_output)
        input_aware_factor = (self.sparse_feat_num *
                              jax.nn.softmax(dnn_output, axis=1))

        logit = self.linear_model(
            X, sparse_feat_refine_weight=input_aware_factor)
        fm_input = jnp.concatenate(sparse_embedding_list, axis=1)
        refined_fm_input = fm_input * input_aware_factor[:, :, None].astype(
            fm_input.dtype)
        logit = logit + self.fm(refined_fm_input).astype(logit.dtype)
        return self.out(logit)


class IFM(BaseModel):
    """IFM (constructor parity: deepctr_torch/models/ifm.py:37-42)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(256, 128), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, init_std=1e-4,
                 seed=1024, dnn_dropout=0, dnn_activation="relu",
                 dnn_use_bn=False, task="binary", device=None, gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = IFMModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^factor_estimating_net/.*kernel$",
                                     l2=l2_reg_dnn)
        self.add_regularization_rule(r"^transform_weight_matrix_P/kernel$",
                                     l2=l2_reg_dnn)
