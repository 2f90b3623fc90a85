"""DIFM (Lu et al., 2020): dual input-aware FM — vector-wise (self-attention)
and bit-wise (DNN) nets jointly estimate the input-aware factors.

Reference parity: deepctr_torch/models/difm.py:39-106.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..features import SparseFeat, VarLenSparseFeat
from ..inputs import combined_dnn_input, embedding_size_of
from ..layers import FM, DNN, InteractingLayer
from ..layers.core import _dense


class DIFMModule(BaseModule):
    att_head_num: int = 4
    att_res: bool = True
    dnn_hidden_units: tuple = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        if not len(self.dnn_hidden_units) > 0:
            raise ValueError("dnn_hidden_units is null!")
        self.fm = FM()
        self.vector_wise_net = InteractingLayer(
            embedding_size_of(self.dnn_feature_columns), self.att_head_num,
            self.att_res, scaling=True)
        self.bit_wise_net = DNN(
            self.dnn_hidden_units, activation=self.dnn_activation,
            dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
            init_std=self.init_std)
        self.sparse_feat_num = len(
            [f for f in self.dnn_feature_columns
             if isinstance(f, (SparseFeat, VarLenSparseFeat))])
        self.transform_matrix_P_vec = _dense(
            self.sparse_feat_num, use_bias=False,
            name="transform_matrix_P_vec")
        self.transform_matrix_P_bit = _dense(
            self.sparse_feat_num, use_bias=False,
            name="transform_matrix_P_bit")

    def __call__(self, X, training=False):
        sparse_embedding_list, _ = self.input_from_feature_columns(
            X, self.dnn_feature_columns)
        if not len(sparse_embedding_list) > 0:
            raise ValueError("there are no sparse features")

        att_input = jnp.concatenate(sparse_embedding_list, axis=1)
        att_out = self.vector_wise_net(att_input)
        att_out = att_out.reshape(att_out.shape[0], -1)
        m_vec = self.transform_matrix_P_vec(att_out)

        dnn_input = combined_dnn_input(sparse_embedding_list, [])
        dnn_output = self.bit_wise_net(dnn_input, training)
        m_bit = self.transform_matrix_P_bit(dnn_output)

        m_x = (m_vec + m_bit).astype(jnp.float32)

        logit = self.linear_model(X, sparse_feat_refine_weight=m_x)
        fm_input = jnp.concatenate(sparse_embedding_list, axis=1)
        refined_fm_input = fm_input * m_x[:, :, None].astype(fm_input.dtype)
        logit = logit + self.fm(refined_fm_input).astype(logit.dtype)
        return self.out(logit)


class DIFM(BaseModel):
    """DIFM (constructor parity: deepctr_torch/models/difm.py:39-44)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 att_head_num=4, att_res=True, dnn_hidden_units=(256, 128),
                 l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0,
                 init_std=1e-4, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", dnn_use_bn=False, task="binary",
                 device=None, gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = DIFMModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, att_head_num=att_head_num, att_res=att_res,
            dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^vector_wise_net/W_", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^bit_wise_net/.*kernel$",
                                     l2=l2_reg_dnn)
        self.add_regularization_rule(r"^transform_matrix_P_(vec|bit)/kernel$",
                                     l2=l2_reg_dnn)
