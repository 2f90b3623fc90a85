"""DIEN (Zhou et al., 2019): interest extractor GRU (+ auxiliary loss on
negative samples) -> interest evolving GRU (GRU/AIGRU/AGRU/AUGRU) -> DNN.

Reference parity: deepctr_torch/models/dien.py:44-381.  The reference's
PackedSequence + per-timestep python loops become masked ``lax.scan``s
(layers/sequence.py MaskedGRU/DynamicGRU): static [B, T, H] shapes, rows
with ``length == 0`` keep a zero carry, the final carry equals the state at
each row's true length — no host-side sorting/packing, fully jit-compatible.
The auxiliary BCE (dien.py:236-273) is computed over all positions and
masked, instead of boolean-gathering valid steps.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..features import SparseFeat, DenseFeat, VarLenSparseFeat
from ..inputs import (combined_dnn_input, embedding_lookup, get_dense_input,
                      maxlen_lookup)
from ..layers import DNN, AttentionSequencePoolingLayer
from ..layers.core import _dense
from ..layers.sequence import MaskedGRU, DynamicGRU


class InterestExtractor(nn.Module):
    """GRU over the behavior sequence + optional auxiliary BCE loss that
    pushes state t to predict click (pos) vs non-click (neg) at t+1.
    (reference parity: dien.py:191-273)"""
    input_size: int
    use_neg: bool = False
    init_std: float = 1e-3

    def setup(self):
        self.gru = MaskedGRU(self.input_size, self.input_size,
                             init_std=self.init_std)
        if self.use_neg:
            self.auxiliary_net = DNN((100, 50, 1), activation="sigmoid",
                                     init_std=self.init_std,
                                     name="auxiliary_net")

    def __call__(self, keys, keys_length, neg_keys=None, training=False):
        interests, _ = self.gru(keys, keys_length,
                                training=training)       # [B, T, H]
        aux_loss = jnp.zeros((), jnp.float32)
        if self.use_neg and neg_keys is not None:
            aux_loss = self._auxiliary_loss(
                interests[:, :-1, :], keys[:, 1:, :], neg_keys[:, 1:, :],
                keys_length - 1, training)
        return interests, aux_loss

    def _auxiliary_loss(self, states, click_seq, noclick_seq, keys_length,
                        training):
        B, T, H = states.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        mask = (pos < jnp.maximum(keys_length, 0).reshape(-1, 1)).astype(
            jnp.float32)
        # two separate aux-net passes (click / noclick) — a merged
        # [2B, T, 2H] single pass was A/B'd on v5e 2026-08-20 and LOST
        # ~4% end-to-end (DIEN-256 48.3k vs 50.3k ex/s/chip): the batch
        # concat's extra HBM round trip outweighs the taller matmuls
        click_p = self.auxiliary_net(
            jnp.concatenate([states, click_seq], axis=-1), training)[..., 0]
        noclick_p = self.auxiliary_net(
            jnp.concatenate([states, noclick_seq], axis=-1),
            training)[..., 0]
        eps = 1e-7
        click_p = jnp.clip(click_p.astype(jnp.float32), eps, 1 - eps)
        noclick_p = jnp.clip(noclick_p.astype(jnp.float32), eps, 1 - eps)
        # mean BCE over valid (state, target) pairs, clicks and non-clicks
        losses = -(jnp.log(click_p) + jnp.log(1.0 - noclick_p)) * mask
        denom = 2.0 * jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.sum(losses) / denom


class InterestEvolving(nn.Module):
    """Attention-directed interest evolution (GRU/AIGRU/AGRU/AUGRU).
    (reference parity: dien.py:276-381)"""
    input_size: int
    gru_type: str = "GRU"
    init_std: float = 1e-3
    att_hidden_size: tuple = (64, 16)
    att_activation: str = "sigmoid"
    att_weight_normalization: bool = False

    def setup(self):
        if self.gru_type not in ("GRU", "AIGRU", "AGRU", "AUGRU"):
            raise NotImplementedError(
                "gru_type: %s is not supported" % self.gru_type)
        self.attention = AttentionSequencePoolingLayer(
            att_hidden_units=self.att_hidden_size,
            att_activation=self.att_activation,
            weight_normalization=self.att_weight_normalization,
            return_score=(self.gru_type != "GRU"))
        if self.gru_type in ("GRU", "AIGRU"):
            self.evolution = MaskedGRU(self.input_size, self.input_size,
                                       init_std=self.init_std)
        else:
            self.evolution = DynamicGRU(self.input_size, self.input_size,
                                        gru_type=self.gru_type,
                                        init_std=self.init_std)

    def __call__(self, query, keys, keys_length, training=False):
        # query [B, H], keys [B, T, H], keys_length [B] -> [B, H]
        q = query[:, None, :]
        if self.gru_type == "GRU":
            interests, _ = self.evolution(keys, keys_length,
                                          training=training)
            out = self.attention(q, interests, keys_length,
                                 training=training)[:, 0]     # [B, H]
        elif self.gru_type == "AIGRU":
            att_scores = self.attention(q, keys, keys_length,
                                        training=training)    # [B, 1, T]
            interests = keys * jnp.transpose(att_scores, (0, 2, 1)).astype(
                keys.dtype)
            _, out = self.evolution(interests, keys_length,
                                    training=training)
        else:  # AGRU / AUGRU
            att_scores = self.attention(q, keys, keys_length,
                                        training=training)[:, 0]  # [B, T]
            _, out = self.evolution(keys, att_scores, keys_length,
                                    training=training)
        # rows with empty history emit exactly zero (dien.py:348-381)
        valid = (keys_length > 0).reshape(-1, 1)
        return jnp.where(valid, out, jnp.zeros_like(out))


class DIENModule(BaseModule):
    history_feature_list: tuple = ()
    gru_type: str = "GRU"
    use_negsampling: bool = False
    alpha: float = 1.0
    use_bn: bool = False
    dnn_hidden_units: tuple = (256, 128)
    dnn_activation: str = "relu"
    att_hidden_units: tuple = (64, 16)
    att_activation: str = "relu"
    att_weight_normalization: bool = True
    dnn_dropout: float = 0.0

    def setup_model(self):
        cols = self.dnn_feature_columns
        self.sparse_feature_columns = tuple(
            f for f in cols if isinstance(f, SparseFeat))
        self.dense_feature_columns = tuple(
            f for f in cols if isinstance(f, DenseFeat))
        varlen = [f for f in cols if isinstance(f, VarLenSparseFeat)]
        self.history_fc_names = tuple(
            "hist_" + x for x in self.history_feature_list)
        self.neg_history_fc_names = tuple(
            "neg_" + x for x in self.history_fc_names)
        self.history_feature_columns = tuple(
            f for f in varlen if f.name in self.history_fc_names)
        self.neg_history_feature_columns = tuple(
            f for f in varlen if f.name in self.neg_history_fc_names)
        self.varlen_sparse_feature_columns = tuple(varlen)

        interest_dim = sum(
            f.embedding_dim for f in self.sparse_feature_columns
            if f.name in self.history_feature_list)
        self.interest_extractor = InterestExtractor(
            input_size=interest_dim, use_neg=self.use_negsampling,
            init_std=self.init_std)
        self.interest_evolution = InterestEvolving(
            input_size=interest_dim, gru_type=self.gru_type,
            init_std=self.init_std,
            att_hidden_size=self.att_hidden_units,
            att_activation=self.att_activation,
            att_weight_normalization=self.att_weight_normalization)
        self.dnn = DNN(self.dnn_hidden_units,
                       activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout, use_bn=self.use_bn,
                       init_std=self.init_std)
        self.dnn_linear = _dense(1, init_std=self.init_std, use_bias=False,
                                 name="dnn_linear")

    def _get_emb(self, X):
        features = self.feature_index
        query_emb_list = embedding_lookup(
            X, self.embedding_dict, features, self.sparse_feature_columns,
            return_feat_list=self.history_feature_list, to_list=True)
        query_emb = jnp.concatenate(query_emb_list, axis=-1)[:, 0]   # [B, H]
        keys_emb_list = embedding_lookup(
            X, self.embedding_dict, features, self.history_feature_columns,
            return_feat_list=self.history_fc_names, to_list=True)
        keys_emb = jnp.concatenate(keys_emb_list, axis=-1)        # [B, T, H]
        keys_length_feature_name = [
            f.length_name for f in self.varlen_sparse_feature_columns
            if f.length_name is not None]
        keys_length = maxlen_lookup(X, features,
                                    keys_length_feature_name)[:, 0]   # [B]
        neg_keys_emb = None
        if self.use_negsampling:
            neg_keys_emb_list = embedding_lookup(
                X, self.embedding_dict, features,
                self.neg_history_feature_columns,
                return_feat_list=self.neg_history_fc_names, to_list=True)
            neg_keys_emb = jnp.concatenate(neg_keys_emb_list, axis=-1)
        return query_emb, keys_emb, neg_keys_emb, keys_length

    def __call__(self, X, training=False):
        query_emb, keys_emb, neg_keys_emb, keys_length = self._get_emb(X)
        masked_interest, aux_loss = self.interest_extractor(
            keys_emb, keys_length, neg_keys_emb, training)
        if self.use_negsampling:
            self.sow("aux_loss", "dien_aux", self.alpha * aux_loss)
        hist = self.interest_evolution(query_emb, masked_interest,
                                       keys_length, training)     # [B, H]
        deep_input_emb_list = embedding_lookup(
            X, self.embedding_dict, self.feature_index,
            self.sparse_feature_columns, to_list=True)
        deep_input_emb = jnp.concatenate(deep_input_emb_list, axis=-1)[:, 0]
        deep_input_emb = jnp.concatenate(
            [hist, deep_input_emb.astype(hist.dtype)], axis=-1)
        dense_value_list = get_dense_input(X, self.feature_index,
                                           self.dense_feature_columns)
        dnn_input = combined_dnn_input([deep_input_emb], dense_value_list)
        output = self.dnn_linear(self.dnn(dnn_input, training)).astype(
            jnp.float32)
        return self.out(output)


class DIEN(BaseModel):
    """DIEN (constructor parity: deepctr_torch/models/dien.py:44-50)."""

    def __init__(self, dnn_feature_columns, history_feature_list,
                 gru_type="GRU", use_negsampling=False, alpha=1.0,
                 use_bn=False, dnn_hidden_units=(256, 128),
                 dnn_activation="relu", att_hidden_units=(64, 16),
                 att_activation="relu", att_weight_normalization=True,
                 l2_reg_dnn=0, l2_reg_embedding=1e-6, dnn_dropout=0,
                 init_std=1e-4, seed=1024, task="binary", device=None,
                 gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = DIENModule(
            linear_feature_columns=(),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std,
            history_feature_list=tuple(history_feature_list),
            gru_type=gru_type, use_negsampling=use_negsampling, alpha=alpha,
            use_bn=use_bn, dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_activation=dnn_activation,
            att_hidden_units=tuple(att_hidden_units),
            att_activation=att_activation.lower(),
            att_weight_normalization=att_weight_normalization,
            dnn_dropout=dnn_dropout)
        super().__init__([], dnn_feature_columns, module, l2_reg_linear=0,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.history_feature_list = list(history_feature_list)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
