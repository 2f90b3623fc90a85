"""Shared linen building blocks for all model modules.

``LinearModel`` is the wide/linear part (reference parity:
deepctr_torch/models/basemodel.py:34-92).  ``BaseModule`` provides the
canonical embed step shared by every model's forward pass (reference:
basemodel.py:354-380) plus the feature-index plumbing.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..features import (SparseFeat, DenseFeat, VarLenSparseFeat,
                        build_input_features)
from ..inputs import (EmbeddingDict, embedding_lookup, sparse_ids,
                      varlen_embedding_lookup, get_varlen_pooling_list,
                      get_dense_input, compute_input_dim)
from ..layers.core import PredictionLayer


def fused_wide_names(linear_feature_columns, dnn_feature_columns):
    """Tables whose wide weight rides as an extra column of the deep
    table: every embedding_name used by the linear columns that a deep
    column also declares with the same vocabulary.  Packed big tables
    fuse too — packing stores ``128 // (dim+1)`` logical rows per
    physical row (inputs.packed_eligible), so the deep table, its wide
    column, and the packed layout compose; regularization splits the
    wide/deep strengths with pack-aware lane masks
    (basemodel._lane_l2_vec)."""
    deep = {f.embedding_name: (f.vocabulary_size, f.embedding_dim)
            for f in dnn_feature_columns
            if isinstance(f, (SparseFeat, VarLenSparseFeat))}
    fused = []
    for f in linear_feature_columns:
        if not isinstance(f, (SparseFeat, VarLenSparseFeat)):
            continue
        entry = deep.get(f.embedding_name)
        if entry is None or entry[0] != f.vocabulary_size:
            continue
        if f.embedding_name not in fused:
            fused.append(f.embedding_name)
    return tuple(fused)


class LinearModel(nn.Module):
    """Wide part: dim-1 embeddings for sparse feats, a weight vector for
    dense feats, masked-pooled dim-1 embeddings for varlen feats.  Supports
    the IFM/DIFM ``sparse_feat_refine_weight`` rescaling hook.

    Features whose table name appears in ``fused_names`` read their wide
    weight from the extra column of the shared deep table
    (``shared_embedding_dict.wide``) instead of a separate width-1 table —
    XLA CSE then merges the wide lookup with the deep lookup.
    """
    feature_columns: tuple
    feature_index: tuple   # tuple of (name, (start, end)) — hashable static
    init_std: float = 1e-4
    shared_embedding_dict: nn.Module = None
    fused_names: tuple = ()

    def setup(self):
        cols = self.feature_columns
        self.sparse_feature_columns = tuple(
            f for f in cols if isinstance(f, SparseFeat))
        self.dense_feature_columns = tuple(
            f for f in cols if isinstance(f, DenseFeat))
        self.varlen_sparse_feature_columns = tuple(
            f for f in cols if isinstance(f, VarLenSparseFeat))
        own_cols = tuple(
            f for f in cols
            if not (isinstance(f, (SparseFeat, VarLenSparseFeat))
                    and f.embedding_name in self.fused_names))
        self.embedding_dict = EmbeddingDict(own_cols, self.init_std,
                                            linear=True)
        dense_dim = sum(f.dimension for f in self.dense_feature_columns)
        if dense_dim > 0:
            self.weight = self.param(
                "weight", nn.initializers.normal(self.init_std),
                (dense_dim, 1))

    def _lookup(self, fc, ids, key=None):
        if fc.embedding_name in self.fused_names:
            # key= shares the full-width row gather (and its backward
            # cotangent accumulation) with the deep side's lookup of the
            # same span — see EmbeddingDict._rows
            return self.shared_embedding_dict.wide(fc.embedding_name, ids,
                                                   key=key)
        return self.embedding_dict(fc.embedding_name, ids, key=key)

    def __call__(self, X, sparse_feat_refine_weight=None):
        index = dict(self.feature_index)
        sparse_embedding_list = [
            self._lookup(fc, sparse_ids(X, index[fc.name]),
                         key=tuple(index[fc.name]))
            for fc in self.sparse_feature_columns]
        seq_embed_dict = {
            fc.name: self._lookup(fc, sparse_ids(X, index[fc.name]),
                                  key=tuple(index[fc.name]))
            for fc in self.varlen_sparse_feature_columns}
        sparse_embedding_list += get_varlen_pooling_list(
            seq_embed_dict, X, index, self.varlen_sparse_feature_columns)
        dense_value_list = get_dense_input(X, index,
                                           self.dense_feature_columns)

        linear_logit = jnp.zeros((X.shape[0], 1), X.dtype)
        if len(sparse_embedding_list) > 0:
            cat = jnp.concatenate(sparse_embedding_list, axis=-1)  # [B,1,n]
            if sparse_feat_refine_weight is not None:
                cat = cat * sparse_feat_refine_weight[:, None, :]
            linear_logit = linear_logit + jnp.sum(cat, axis=-1)
        if len(dense_value_list) > 0:
            dense = jnp.concatenate(dense_value_list, axis=-1)
            linear_logit = linear_logit + dense @ self.weight.astype(dense.dtype)
        return linear_logit


class BaseModule(nn.Module):
    """Base for all model modules: owns the shared embedding tables, the
    linear part and the prediction head; exposes the canonical embed step.

    Subclasses implement ``setup_model`` (their layers) and ``__call__``.
    """
    linear_feature_columns: tuple = ()
    dnn_feature_columns: tuple = ()
    task: str = "binary"
    init_std: float = 1e-4

    def setup(self):
        index = build_input_features(
            list(self.linear_feature_columns) + list(self.dnn_feature_columns))
        self.feature_index = index
        fused = fused_wide_names(self.linear_feature_columns,
                                 self.dnn_feature_columns)
        self.embedding_dict = EmbeddingDict(tuple(self.dnn_feature_columns),
                                            self.init_std,
                                            wide_names=fused)
        self.linear_model = LinearModel(
            tuple(self.linear_feature_columns),
            tuple((k, v) for k, v in index.items()), self.init_std,
            shared_embedding_dict=self.embedding_dict, fused_names=fused)
        self.out = PredictionLayer(self.task)
        self.setup_model()

    def setup_model(self):  # pragma: no cover - overridden
        pass

    # --- canonical embed step (reference: basemodel.py:354-380) ---
    def input_from_feature_columns(self, X, feature_columns,
                                   support_dense=True):
        sparse_feature_columns = [f for f in feature_columns
                                  if isinstance(f, SparseFeat)]
        dense_feature_columns = [f for f in feature_columns
                                 if isinstance(f, DenseFeat)]
        varlen_sparse_feature_columns = [f for f in feature_columns
                                         if isinstance(f, VarLenSparseFeat)]
        if not support_dense and len(dense_feature_columns) > 0:
            raise ValueError("DenseFeat is not supported in dnn_feature_columns")
        sparse_embedding_list = embedding_lookup(
            X, self.embedding_dict, self.feature_index,
            sparse_feature_columns, to_list=True)
        seq_embed_dict = varlen_embedding_lookup(
            X, self.embedding_dict, self.feature_index,
            varlen_sparse_feature_columns)
        varlen_embedding_list = get_varlen_pooling_list(
            seq_embed_dict, X, self.feature_index,
            varlen_sparse_feature_columns)
        dense_value_list = get_dense_input(X, self.feature_index,
                                           dense_feature_columns)
        return sparse_embedding_list + varlen_embedding_list, dense_value_list

    def compute_input_dim(self, feature_columns, include_sparse=True,
                          include_dense=True, feature_group=False):
        return compute_input_dim(feature_columns, include_sparse,
                                 include_dense, feature_group)

    @property
    def embedding_size(self):
        from ..inputs import embedding_size_of
        return embedding_size_of(self.dnn_feature_columns)
