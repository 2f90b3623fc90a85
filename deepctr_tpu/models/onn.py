"""ONN / NFFM (Yang et al., 2019): operation-aware (per-pair) second-order
embeddings feeding a DNN.

Reference parity: deepctr_torch/models/onn.py:38-158.  The reference keeps
F*(F-1) separate pair-specific ``nn.Embedding`` tables and does O(F^2)
gathers per step (onn.py:122-137).  Here each feature packs all its
pair-specific vectors into ONE ``[vocab, F-1, E]`` table, so the device does
exactly one gather per feature and the pairwise products are a single
batched elementwise multiply — same parameter count, O(F) gathers.
"""

import flax.linen as nn
import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..features import SparseFeat
from ..inputs import combined_dnn_input, embedding_size_of, sparse_ids
from ..layers import DNN
from ..layers.core import _dense


class PairEmbedding(nn.Module):
    """Operation-aware embedding tables: feature i's table holds one E-dim
    vector per partner feature (F-1 slots).  Slot of partner j in feature
    i's table is ``j`` if j < i else ``j - 1``."""
    sparse_feature_columns: tuple
    embedding_size: int
    init_std: float = 1e-4

    def setup(self):
        F = len(self.sparse_feature_columns)
        tables = {}
        for i, feat in enumerate(self.sparse_feature_columns):
            tables[feat.name] = self.param(
                feat.name, nn.initializers.normal(self.init_std),
                (feat.vocabulary_size, max(F - 1, 1), self.embedding_size))
        self.tables = tables

    def __call__(self, X, feature_index):
        """-> list of [B, 1, E] pair-product embeddings, pairs in (i<j)
        lexicographic order (parity with onn.py:122-137)."""
        cols = self.sparse_feature_columns
        F = len(cols)
        gathered = []
        for feat in cols:
            span = feature_index[feat.name]
            ids = sparse_ids(X, span)[:, 0]
            gathered.append(jnp.take(self.tables[feat.name], ids, axis=0))
        out = []
        for i in range(F - 1):
            for j in range(i + 1, F):
                first = gathered[i][:, j - 1]      # slot of j in i's table
                second = gathered[j][:, i]         # slot of i in j's table
                out.append((first * second)[:, None, :])
        return out


class ONNModule(BaseModule):
    dnn_hidden_units: tuple = (128, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        sparse_feats = tuple(f for f in self.dnn_feature_columns
                             if isinstance(f, SparseFeat))
        self.second_order_embedding = PairEmbedding(
            sparse_feature_columns=sparse_feats,
            embedding_size=embedding_size_of(self.dnn_feature_columns),
            init_std=self.init_std)
        self.dnn = DNN(self.dnn_hidden_units, activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
                       init_std=self.init_std)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")

    def __call__(self, X, training=False):
        _, dense_value_list = self.input_from_feature_columns(
            X, self.dnn_feature_columns)
        linear_logit = self.linear_model(X)
        second_order_list = self.second_order_embedding(X,
                                                        self.feature_index)
        dnn_input = combined_dnn_input(second_order_list, dense_value_list)
        dnn_output = self.dnn(dnn_input, training)
        dnn_logit = self.dnn_linear(dnn_output).astype(linear_logit.dtype)
        if len(self.dnn_feature_columns) > 0:
            final_logit = dnn_logit + linear_logit
        else:
            final_logit = linear_logit
        return self.out(final_logit)


class ONN(BaseModel):
    """ONN/NFFM (constructor parity: deepctr_torch/models/onn.py:60-65)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(128, 128), l2_reg_embedding=1e-5,
                 l2_reg_linear=1e-5, l2_reg_dnn=0, dnn_dropout=0,
                 init_std=1e-4, seed=1024, dnn_use_bn=False,
                 dnn_activation="relu", task="binary", device=None, gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = ONNModule(
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
        self.add_regularization_rule(r"^second_order_embedding/",
                                     l2=l2_reg_embedding)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^dnn_linear/kernel$", l2=l2_reg_dnn)
