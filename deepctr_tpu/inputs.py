"""Embedding engine + flat-matrix lookup helpers.

Reference parity: deepctr_torch/inputs.py:126-245.  Tables live in one
``EmbeddingDict`` linen module whose parameters are plain ``[vocab, dim]``
arrays keyed by ``embedding_name`` — a layout that (a) gives deterministic
parameter paths (``.../embedding_dict/<name>``) for per-group regularization
and sharding rules, and (b) row-shards cleanly over the 'model' mesh axis.

Every lookup is a static column slice of the flat input matrix + int cast +
gather; there is no dynamic shape anywhere on the device path.
"""

from collections import defaultdict
from itertools import chain

import flax.linen as nn
import jax.numpy as jnp

# tables at or below this many stored rows get their gather operand cast
# to the compute dtype (see EmbeddingDict._gather): covers the standard
# small-vocab regime and the active-rows substituted slices, and stays
# well under the packed-storage row counts where XLA uses real gathers
_GATHER_CAST_MAX_ROWS = 65536

from .features import SparseFeat, DenseFeat, VarLenSparseFeat
from .layers.sequence import masked_pooling
from .layers.utils import concat_fun


class _RowCache:
    """Mutable per-apply memo holder (flax freezes raw dicts assigned in
    setup; a plain object passes through untouched)."""

    def __init__(self):
        self.d = {}


class EmbeddingDict(nn.Module):
    """All embedding tables for a feature-column list, deduped by
    ``embedding_name`` (shared tables).  ``linear=True`` builds dim-1 tables
    for the wide/linear part.
    (reference parity: deepctr_torch/inputs.py:158-180)

    TPU addition 1 (fused wide column): tables named in ``wide_names``
    carry ONE extra trailing column holding the wide/linear weight for
    that feature.  The deep path reads ``rows[..., :dim]`` and the wide
    path ``rows[..., dim:]`` of the *same* gather, so XLA CSE collapses
    the two lookups (and their backward scatters) into one — this removes
    the separate width-1 linear tables, whose single-lane gathers are
    pathologically slow on TPU.

    TPU addition 2 (packed big tables): XLA's gather collapses on large
    tables, so tables passing :func:`packed_eligible` are STORED packed
    ([ceil(vocab/pack), 128], pack = 128 // dim) and looked up through the
    Pallas row-DMA kernel (ops/pallas_gather.py, measured 5.4x over XLA at
    vocab 1M).  Off-TPU the packed table is viewed back to [vocab, dim]
    and gathered normally, so semantics are identical everywhere.
    """
    feature_columns: tuple
    init_std: float = 1e-4
    linear: bool = False
    wide_names: tuple = ()

    def setup(self):
        tables = {}
        dims = {}
        packs = {}
        vocabs = {}
        rows = {}
        for feat in self.feature_columns:
            if isinstance(feat, (SparseFeat, VarLenSparseFeat)):
                name = feat.embedding_name
                if name in tables:
                    continue
                dim = 1 if self.linear else feat.embedding_dim
                width = dim + 1 if name in self.wide_names else dim
                vocab = feat.vocabulary_size
                if packed_eligible(vocab, width):
                    pack = 128 // width
                    vpad = (-vocab) % pack
                    shape = ((vocab + vpad) // pack, 128)
                    packs[name] = pack
                else:
                    shape = (vocab, width)
                # declared via .variable (not .param) so apply does NOT
                # re-validate the leaf's shape: the active-rows train step
                # substitutes a [touched, width] slice for the full table
                # (models/basemodel.py _make_active_rows)
                init = nn.initializers.normal(self.init_std)
                tables[name] = self.variable(
                    "params", name,
                    lambda shape=shape: init(self.make_rng("params"),
                                             shape)).value
                dims[name] = dim
                vocabs[name] = vocab
                rows[name] = shape[0]
        self.tables = tables
        self.table_dims = dims
        self.table_packs = packs
        # longest per-row lookup in this model: sequence models read
        # [B, maxlen] ids per history table.  The gather-mode "auto"
        # rule is MODEL-level (B * this, see config.gather_mode): once
        # any lookup is sequence-scale, flipping ALL the model's
        # small-table lookups to the bf16 one-hot matmul wins — mixing
        # lowering styles measured slower than either pure style
        # (DIN maxlen-50 TPU A/B 2026-08-19: off 665.7k / per-lookup
        # auto 655.1k / all-onehot 752.6k ex/s/chip).
        self._max_maxlen = max(
            [f.maxlen for f in self.feature_columns
             if isinstance(f, VarLenSparseFeat)] + [1])
        self.table_vocabs = vocabs
        # per-apply memo of full-width _rows results, keyed by
        # (table name, column span): the fused-wide design makes the
        # linear part re-look-up the same rows the deep part read — XLA
        # CSEs the forward gathers but the backward then accumulates
        # duplicate-id cotangents TWICE (two scatter-adds per fused
        # table; the second one measured ~1.2ms/step at vocab 1M,
        # tools/fwd_bisect.py grad_emb_lin 2026-08-19).  Sharing the
        # traced value gives both consumers one take and one VJP.
        # setup() runs per apply, so the memo never crosses traces.
        # (_RowCache because flax freezes raw dicts assigned in setup.)
        self._row_cache = _RowCache()
        # DECLARED physical rows (from the feature spec, NOT the live
        # param, which the active-rows step substitutes with a slice —
        # live-vs-declared mismatch is how _gather detects substitution)
        self.table_rows = rows

    def _gather(self, name, table, row_ids):
        """Row gather, routed through the configured mesh exchange:
        "gspmd" (default) is a plain take that XLA's sharding propagation
        partitions; "psum"/"a2a" call the explicit shard_map exchanges
        (deepctr_tpu/parallel/embedding.py) when the table divides the
        'model' axis.  Exchanges apply only to the FULL declared table —
        the active-rows train step substitutes small local slices
        (basemodel._make_active_rows), which gather locally.

        SMALL-table lowering under bf16 compute ("auto" applies the
        measured per-regime winners — see config.py and
        TPU_QUEUE_RESULTS.md 2026-08-19): XLA lowers
        small-table gathers as one-hot MATMULS, and an f32 one-hot
        matmul runs the MXU at ~1/4 the bf16 rate — at vocab 1M the 26
        active-rows substituted [5120, 128] lookups cost ~140 GFLOP/step
        of f32 matmul, which matches the otherwise-unexplained ~2.2ms of
        forward time AND the 1.4GB/step XLA cost analysis
        (tools/fwd_bisect.py).  DEEPCTR_GATHER_MODE selects:

          off    — plain f32 take; XLA decides everything.
          cast   — cast the table to bf16 before the take.  bf16-rate
                   matmul, but the take's VJP then scatter-adds
                   duplicate-id cotangents in bf16.
          onehot — explicit bf16 one-hot matmul with f32 ACCUMULATION
                   (ops/onehot_lookup.py): bf16 rate both directions,
                   duplicate-id grads still sum in f32.
          auto   (default) — per-regime measured winners: "cast" for
                   substituted slices of PACKED big tables (duplicates
                   rare there), "onehot" for every full small table of
                   a model whose largest lookup is sequence-scale
                   (B * max maxlen >= 32768 ids — model-level, see
                   config._ONEHOT_MIN_IDS), "off" for other full small
                   tables AND for substituted slices of small tables
                   (cast lost on small tables, and their duplicate-id
                   bf16 accumulation is dense) — see config.py.

        Forward values are identical across all three under bf16 compute
        (rows were cast at the first downstream matmul anyway).  Full
        big tables keep f32 real-gathers in every mode (casting one
        would materialize the whole table each step)."""
        from . import config
        mode, mesh, slack = config.embedding_exchange()
        if (mode != "gspmd" and mesh is not None
                and table.shape[0] == self.table_rows[name]
                and table.shape[0] % mesh.shape["model"] == 0):
            from .parallel.embedding import a2a_lookup, psum_lookup
            if mode == "psum":
                return psum_lookup(mesh, table, row_ids)
            rows, n_dropped = a2a_lookup(mesh, table, row_ids,
                                         slack=slack,
                                         return_overflow=True)
            if config.a2a_on_overflow() == "error":
                # overflow cannot raise inside jit — poison the lookup
                # so the first overflowing step yields an unmissable
                # NaN loss instead of silently training on zero rows
                # (raise a2a_slack, or opt into "drop" semantics via
                # set_embedding_exchange(..., on_overflow="drop"))
                rows = rows + jnp.where(
                    n_dropped > 0, jnp.float32(jnp.nan),
                    jnp.float32(0)).astype(rows.dtype)
            return rows
        ct = config.compute_dtype()
        # eligible: the active-rows SUBSTITUTED slice (any row-count
        # mismatch vs the declared table — the padded slice can be
        # larger than a small table) or a full UNPACKED small table.
        # A full PACKED table is big by definition (>= 131072 logical
        # rows) — running it through onehot/cast would build a giant
        # one-hot or re-cast the whole table every step.
        substituted = table.shape[0] != self.table_rows[name]
        small_full = (name not in self.table_packs
                      and table.shape[0] <= _GATHER_CAST_MAX_ROWS)
        if (table.dtype == jnp.float32 and ct == jnp.bfloat16
                and table.shape[0] <= _GATHER_CAST_MAX_ROWS
                and (substituted or small_full)):
            gmode = config.gather_mode(
                substituted=substituted,
                big=name in self.table_packs,
                n_ids=row_ids.shape[0] * self._max_maxlen,
                table_shape=tuple(table.shape))
            if gmode == "onehot":
                from .ops.onehot_lookup import (onehot_lookup,
                                                onehot_lookup_factorized,
                                                factorized_supported)
                flat = row_ids.reshape(-1)
                # inference traces take the factorized forward (1.30x,
                # wide stage-1 output tiles the MXU; BASELINE round-5);
                # training keeps the direct form — the factorized
                # backward materializes a [n, V2*W] cotangent and
                # measured 2.7x worse
                import os as _os
                fmode = _os.environ.get("DEEPCTR_FACTORIZED_ONEHOT",
                                        "all")
                # "all" (default): factorized FORWARD on training and
                # inference traces — bit-equal to the direct form (the
                # custom_vjp keeps the DIRECT backward either way;
                # golden tests) and measured faster end-to-end on both:
                # DIEN-100 train +6.4%, DIN-100 train +9% (interleaved
                # pairs), DIEN-100 predict +13.6%.  "1": inference
                # only; "0": off.
                if (fmode != "0"
                        and (fmode == "all"
                             or not config.is_training_trace())
                        and factorized_supported(*table.shape)):
                    rows = onehot_lookup_factorized(table, flat)
                else:
                    rows = onehot_lookup(table, flat)
                return rows.reshape(row_ids.shape + (table.shape[1],))
            if gmode == "cast":
                table = table.astype(ct)
        return jnp.take(table, row_ids, axis=0)

    def _rows(self, name, ids, key=None):
        """Gather full-width rows (incl. any wide column).  ``key`` is
        the caller's (start, end) column span: lookups of the same table
        from the same span within one apply share one traced gather (and
        therefore ONE backward cotangent accumulation) via _row_cache."""
        if key is not None:
            ck = (name, key)
            hit = self._row_cache.d.get(ck)
            if hit is not None and hit.shape == ids.shape + (hit.shape[-1],):
                return hit
        rows = self._rows_uncached(name, ids)
        if key is not None:
            self._row_cache.d[ck] = rows
        return rows

    def _rows_uncached(self, name, ids):
        table = self.tables[name]
        pack = self.table_packs.get(name)
        if pack is None:
            return self._gather(name, table, ids)
        dim = self.table_dims[name]
        width = dim + 1 if name in self.wide_names else dim
        from . import config
        flat = ids.reshape(-1)
        if (config.use_pallas_explicit() and flat.shape[0] % 1024 == 0
                and pack * width == 128):
            # explicit opt-in only: the XLA path below measured 2x faster
            # (0.099ms vs 0.183ms at [1M,16] x 4096 ids) once rows are
            # packed to 128 lanes — XLA's gather pathology is narrow ROWS,
            # which the packed layout fixes for XLA itself
            from .ops.pallas_gather import gather_rows_packed
            rows = gather_rows_packed(table, flat, width, pack)
        else:
            n = flat.shape[0]
            rows128 = self._gather(name, table, flat // pack) # [n, 128]
            used = (rows128[:, :pack * width] if pack * width < 128
                    else rows128)
            rows3 = used.reshape(n, pack, width)
            # lane select as a one-hot multiply + sum over the (tiny)
            # pack axis: take_along_axis here lowers to a per-ELEMENT
            # gather whose transpose is a per-element scatter — both
            # serial on TPU; the mask form is pure VPU work in both
            # directions (pack <= 128 so the extra multiplies are noise)
            sel_oh = (jnp.arange(pack, dtype=jnp.int32)[None, :]
                      == (flat % pack)[:, None])
            rows = jnp.sum(rows3 * sel_oh[:, :, None].astype(rows3.dtype),
                           axis=1)
        return rows.reshape(ids.shape + (width,))

    def __call__(self, name, ids, key=None):
        """Gather rows: ids int [..., ] -> [..., dim] (deep columns)."""
        rows = self._rows(name, ids, key)
        if name in self.wide_names:
            rows = rows[..., :self.table_dims[name]]
        return rows

    def wide(self, name, ids, key=None):
        """The fused wide column: ids int [...] -> [..., 1]."""
        rows = self._rows(name, ids, key)
        return rows[..., self.table_dims[name]:]


# tables this large use packed storage + the Pallas gather kernel
PACKED_VOCAB_THRESHOLD = 131072


def packed_eligible(vocab, width):
    """Big tables store ``pack = 128 // width`` logical rows per 128-lane
    physical row (waste lanes beyond pack*width are unused).  Non-dividing
    widths pack too — e.g. width 17 (a dim-16 table with its fused wide
    column) packs 7 rows with 9 waste lanes — so wide-column fusion and
    packed storage compose instead of forcing a separate width-1 wide
    table (which would make the same id span feed two tables and defeat
    the active-rows train step)."""
    return vocab >= PACKED_VOCAB_THRESHOLD and width <= 64


def sparse_ids(X, span):
    """Static column slice -> int32 ids."""
    return X[:, span[0]:span[1]].astype(jnp.int32)


def embedding_lookup(X, embedding_dict, feature_index, sparse_feature_columns,
                     return_feat_list=(), mask_feat_list=(), to_list=False):
    """Gather [B,1,E] embeddings per sparse feature, grouped by group_name.
    (reference parity: deepctr_torch/inputs.py:183-210)
    """
    group_embedding_dict = defaultdict(list)
    for fc in sparse_feature_columns:
        feature_name = fc.name
        if len(return_feat_list) == 0 or feature_name in return_feat_list:
            span = tuple(feature_index[feature_name])
            ids = sparse_ids(X, span)
            emb = embedding_dict(fc.embedding_name, ids, key=span)
            group_embedding_dict[fc.group_name].append(emb)
    if to_list:
        return list(chain.from_iterable(group_embedding_dict.values()))
    return group_embedding_dict


def varlen_embedding_lookup(X, embedding_dict, feature_index,
                            varlen_sparse_feature_columns):
    """Gather [B,maxlen,E] sequences per varlen feature.
    (reference parity: deepctr_torch/inputs.py:213-227)
    """
    out = {}
    for fc in varlen_sparse_feature_columns:
        span = tuple(feature_index[fc.name])
        ids = sparse_ids(X, span)
        out[fc.name] = embedding_dict(fc.embedding_name, ids, key=span)
    return out


def get_varlen_pooling_list(embedding_vec_dict, X, feature_index,
                            varlen_sparse_feature_columns):
    """Masked-pool each varlen sequence to [B,1,E]; masking either by
    ``ids != 0`` or by an explicit length column.
    (reference parity: deepctr_torch/inputs.py:141-155)
    """
    pooled = []
    for feat in varlen_sparse_feature_columns:
        seq_emb = embedding_vec_dict[feat.name]
        if feat.length_name is None:
            mask = sparse_ids(X, feature_index[feat.name]) != 0   # [B,T]
            emb = masked_pooling([seq_emb, mask], feat.combiner,
                                 supports_masking=True)
        else:
            length = X[:, feature_index[feat.length_name][0]:
                       feature_index[feat.length_name][1]]
            emb = masked_pooling([seq_emb, length], feat.combiner,
                                 supports_masking=False)
        pooled.append(emb)
    return pooled


def get_dense_input(X, feature_index, feature_columns):
    """Slice dense columns to a list of [B, d] float arrays.
    (reference parity: deepctr_torch/inputs.py:230-238)
    """
    dense_feature_columns = [f for f in feature_columns
                             if isinstance(f, DenseFeat)]
    return [X[:, feature_index[fc.name][0]:feature_index[fc.name][1]]
            for fc in dense_feature_columns]


def combined_dnn_input(sparse_embedding_list, dense_value_list):
    """Flatten+concat sparse embeddings and dense values to the [B, D] DNN
    input.  (reference parity: deepctr_torch/inputs.py:126-138)
    """
    if len(sparse_embedding_list) > 0 and len(dense_value_list) > 0:
        sparse_dnn_input = jnp.concatenate(
            sparse_embedding_list, axis=-1).reshape(
                sparse_embedding_list[0].shape[0], -1)
        dense_dnn_input = jnp.concatenate(
            dense_value_list, axis=-1).reshape(dense_value_list[0].shape[0], -1)
        return concat_fun([sparse_dnn_input,
                           dense_dnn_input.astype(sparse_dnn_input.dtype)])
    elif len(sparse_embedding_list) > 0:
        return jnp.concatenate(sparse_embedding_list, axis=-1).reshape(
            sparse_embedding_list[0].shape[0], -1)
    elif len(dense_value_list) > 0:
        return jnp.concatenate(dense_value_list, axis=-1).reshape(
            dense_value_list[0].shape[0], -1)
    raise NotImplementedError


def maxlen_lookup(X, feature_index, maxlen_column):
    """Slice the behavior-length column (DIN/DIEN protocol).
    (reference parity: deepctr_torch/inputs.py:241-245)
    """
    if maxlen_column is None or len(maxlen_column) == 0:
        raise ValueError("please add max length column for VarLenSparseFeat "
                         "of DIN/DIEN input")
    span = feature_index[maxlen_column[0]]
    return X[:, span[0]:span[1]].astype(jnp.int32)


def compute_input_dim(feature_columns, include_sparse=True,
                      include_dense=True, feature_group=False):
    """DNN input width implied by a feature-column list.
    (reference parity: deepctr_torch/models/basemodel.py:382-400)
    """
    sparse_feature_columns = [f for f in feature_columns
                              if isinstance(f, (SparseFeat, VarLenSparseFeat))]
    dense_feature_columns = [f for f in feature_columns
                             if isinstance(f, DenseFeat)]
    dense_input_dim = sum(f.dimension for f in dense_feature_columns)
    if feature_group:
        sparse_input_dim = len(sparse_feature_columns)
    else:
        sparse_input_dim = sum(f.embedding_dim for f in sparse_feature_columns)
    input_dim = 0
    if include_sparse:
        input_dim += sparse_input_dim
    if include_dense:
        input_dim += dense_input_dim
    return input_dim


def embedding_size_of(feature_columns):
    """Shared embedding dim; raises if sparse features disagree.
    (reference parity: deepctr_torch/models/basemodel.py:518-527)
    """
    sparse_feature_columns = [f for f in feature_columns
                              if isinstance(f, (SparseFeat, VarLenSparseFeat))]
    sizes = set(f.embedding_dim for f in sparse_feature_columns)
    if len(sizes) > 1:
        raise ValueError("embedding_dim of SparseFeat and VarlenSparseFeat "
                         "must be same in this model!")
    return list(sizes)[0]
