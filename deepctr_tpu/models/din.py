"""DIN (Zhou et al., 2018): deep interest network — attention over the
user-behavior sequence keyed by the candidate item.

Naming protocol (reference parity: deepctr_torch/models/din.py:55-111):
behavior sequences are VarLenSparseFeat named ``hist_<x>`` for each x in
``history_feature_list``; they share embedding tables with the query
features via ``embedding_name`` and must declare ``length_name``.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..features import SparseFeat, VarLenSparseFeat
from ..inputs import (combined_dnn_input, embedding_lookup,
                      varlen_embedding_lookup, get_varlen_pooling_list,
                      maxlen_lookup)
from ..layers import DNN, AttentionSequencePoolingLayer
from ..layers.core import _dense


class DINModule(BaseModule):
    history_feature_list: tuple = ()
    dnn_use_bn: bool = False
    dnn_hidden_units: tuple = (256, 128)
    dnn_activation: str = "relu"
    att_hidden_size: tuple = (64, 16)
    att_activation: str = "dice"
    att_weight_normalization: bool = False
    dnn_dropout: float = 0.0

    def setup_model(self):
        cols = self.dnn_feature_columns
        self.sparse_feature_columns = tuple(
            f for f in cols if isinstance(f, SparseFeat))
        varlen = [f for f in cols if isinstance(f, VarLenSparseFeat)]
        self.history_fc_names = tuple(
            "hist_" + x for x in self.history_feature_list)
        self.history_feature_columns = tuple(
            f for f in varlen if f.name in self.history_fc_names)
        self.sparse_varlen_feature_columns = tuple(
            f for f in varlen if f.name not in self.history_fc_names)
        self.attention = AttentionSequencePoolingLayer(
            att_hidden_units=self.att_hidden_size,
            att_activation=self.att_activation,
            weight_normalization=self.att_weight_normalization,
            return_score=False, supports_masking=False)
        self.dnn = DNN(self.dnn_hidden_units,
                       activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
                       init_std=self.init_std)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")

    def __call__(self, X, training=False):
        _, dense_value_list = self.input_from_feature_columns(
            X, self.dnn_feature_columns)

        query_emb_list = embedding_lookup(
            X, self.embedding_dict, self.feature_index,
            self.sparse_feature_columns,
            return_feat_list=self.history_feature_list, to_list=True)
        keys_emb_list = embedding_lookup(
            X, self.embedding_dict, self.feature_index,
            self.history_feature_columns,
            return_feat_list=self.history_fc_names, to_list=True)
        dnn_input_emb_list = embedding_lookup(
            X, self.embedding_dict, self.feature_index,
            self.sparse_feature_columns, to_list=True)

        sequence_embed_dict = varlen_embedding_lookup(
            X, self.embedding_dict, self.feature_index,
            self.sparse_varlen_feature_columns)
        dnn_input_emb_list += get_varlen_pooling_list(
            sequence_embed_dict, X, self.feature_index,
            self.sparse_varlen_feature_columns)

        deep_input_emb = jnp.concatenate(dnn_input_emb_list, axis=-1)
        query_emb = jnp.concatenate(query_emb_list, axis=-1)   # [B, 1, E]
        keys_emb = jnp.concatenate(keys_emb_list, axis=-1)     # [B, T, E]

        keys_length_feature_name = [
            f.length_name for f in self.history_feature_columns
            if f.length_name is not None]
        keys_length = maxlen_lookup(X, self.feature_index,
                                    keys_length_feature_name)[:, 0]

        hist = self.attention(query_emb, keys_emb, keys_length,
                              training=training)              # [B, 1, E]

        deep_input_emb = jnp.concatenate(
            [deep_input_emb, hist.astype(deep_input_emb.dtype)], axis=-1)
        deep_input_emb = deep_input_emb.reshape(deep_input_emb.shape[0], -1)
        dnn_input = combined_dnn_input([deep_input_emb], dense_value_list)
        dnn_output = self.dnn(dnn_input, training)
        dnn_logit = self.dnn_linear(dnn_output).astype(jnp.float32)
        return self.out(dnn_logit)


class DIN(BaseModel):
    """DIN (constructor parity: deepctr_torch/models/din.py:39-43)."""

    def __init__(self, dnn_feature_columns, history_feature_list,
                 dnn_use_bn=False, dnn_hidden_units=(256, 128),
                 dnn_activation="relu", att_hidden_size=(64, 16),
                 att_activation="Dice", att_weight_normalization=False,
                 l2_reg_dnn=0.0, l2_reg_embedding=1e-6, dnn_dropout=0,
                 init_std=1e-4, seed=1024, task="binary", device=None,
                 gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = DINModule(
            linear_feature_columns=(),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std,
            history_feature_list=tuple(history_feature_list),
            dnn_use_bn=dnn_use_bn,
            dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_activation=dnn_activation,
            att_hidden_size=tuple(att_hidden_size),
            att_activation=att_activation.lower(),
            att_weight_normalization=att_weight_normalization,
            dnn_dropout=dnn_dropout)
        super().__init__([], dnn_feature_columns, module, l2_reg_linear=0,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.history_feature_list = list(history_feature_list)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
