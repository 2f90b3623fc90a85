"""Keras-style training engine over jit-compiled functional train steps.

Reference parity: deepctr_torch/models/basemodel.py:95-527 (compile / fit /
evaluate / predict, per-group L1/L2 regularization as an explicit loss term,
auxiliary-loss channel, History/EarlyStopping/ModelCheckpoint callbacks,
validation_split semantics).

TPU-native design decisions (vs the reference's eager loop):
  * the whole step — forward, loss, per-group reg, grads, optimizer — is ONE
    jitted function with donated state; batches are padded to a fixed shape
    so each model compiles exactly once;
  * padded rows are masked via a sample-weight vector;
  * multi-device runs go through a `jax.sharding.Mesh`: the batch is sharded
    over the 'data' axis, embedding tables can be row-sharded over 'model'
    (see deepctr_tpu.parallel); XLA inserts the gradient all-reduces.
"""

import functools
import os as _os
import re
import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.core import unfreeze

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    tqdm = None

from ..callbacks import CallbackList, History
from ..features import (SparseFeat, VarLenSparseFeat, build_input_features)
from .. import native
from ..inputs import compute_input_dim, embedding_size_of
from ..layers.utils import slice_arrays
from ..losses import resolve_loss
from ..utils import serialization
from ..utils.metrics import resolve_metrics

warnings.filterwarnings("ignore",
                        message=".*donated buffers were not usable.*")


# torch-default learning rates per optimizer name (reference parity:
# basemodel.py:447-461).  The SINGLE source of truth for both the dense
# optax transforms and the sparse table-update path — they must never
# train at different rates.
_OPT_DEFAULT_LR = {"sgd": 0.01, "adam": 0.001, "adagrad": 0.01,
                   "rmsprop": 0.01}
_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8
_ADAGRAD_EPS = 1e-10
_RMS_DECAY, _RMS_EPS = 0.99, 1e-8


def _torch_adagrad(lr, eps=_ADAGRAD_EPS):
    """torch.optim.Adagrad semantics: acc += g²; step = lr·g/(√acc + eps).

    optax.adagrad is NOT equivalent: it computes g·rsqrt(acc + eps) with
    a zero-accumulator guard — eps INSIDE the sqrt.  For the tiny
    first-step gradients of init_std=1e-4 embeddings (g ~ 1e-5, acc =
    g²) the two step sizes differ by up to √2 (g/√(g²+eps) ≈ 0.7 vs
    g/(|g|+eps) ≈ 1.0), which the trajectory-equivalence test vs the
    reference catches (tests/test_trajectory_parity_vs_reference.py).
    (reference parity: torch.optim.Adagrad as used by
    deepctr_torch/models/basemodel.py:447-461)
    """
    def init_fn(params):
        return jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)

    def update_fn(updates, state, params=None):
        new_state = jax.tree_util.tree_map(
            lambda a, g: a + jnp.square(g.astype(jnp.float32)),
            state, updates)
        upd = jax.tree_util.tree_map(
            lambda g, a: (-lr * g / (jnp.sqrt(a) + eps)).astype(g.dtype),
            updates, new_state)
        return upd, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _torch_rmsprop(lr, decay=_RMS_DECAY, eps=_RMS_EPS):
    """torch.optim.RMSprop semantics (momentum 0, not centered):
    v = decay·v + (1-decay)·g²; step = lr·g/(√v + eps).

    optax.rmsprop is NOT equivalent for the same reason optax.adagrad
    was not (see _torch_adagrad): its scale_by_rms puts eps INSIDE the
    sqrt (g·rsqrt(v + eps)), while torch adds eps to √v — for
    init-scale gradients the step sizes differ materially.  The
    rmsprop trajectory-equivalence test pins this form.
    (reference parity: torch.optim.RMSprop as named by
    deepctr_torch/models/basemodel.py:447-461)
    """
    def init_fn(params):
        return jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)

    def update_fn(updates, state, params=None):
        new_state = jax.tree_util.tree_map(
            lambda v, g: decay * v
            + (1 - decay) * jnp.square(g.astype(jnp.float32)),
            state, updates)
        upd = jax.tree_util.tree_map(
            lambda g, v: (-lr * g / (jnp.sqrt(v) + eps)).astype(g.dtype),
            updates, new_state)
        return upd, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _get_optimizer(optimizer, learning_rate=None):
    """Name -> optax transform with torch-default hyperparameters;
    ``learning_rate`` overrides the name's default.
    (reference parity: basemodel.py:447-461)
    """
    if isinstance(optimizer, str):
        if optimizer not in _OPT_DEFAULT_LR:
            raise NotImplementedError("unknown optimizer %r" % optimizer)
        lr = (_OPT_DEFAULT_LR[optimizer] if learning_rate is None
              else float(learning_rate))
        if optimizer == "sgd":
            return optax.sgd(lr)
        if optimizer == "adam":
            return optax.adam(lr, b1=_ADAM_B1, b2=_ADAM_B2, eps=_ADAM_EPS)
        if optimizer == "adagrad":
            return _torch_adagrad(lr)
        return _torch_rmsprop(lr)
    if learning_rate is not None:
        raise ValueError("learning_rate is only meaningful with a named "
                         "optimizer; configure the optax transform directly")
    return optimizer


class BaseModel(object):
    """Engine wrapper around a linen module: owns params/opt state, the
    jitted step functions and the Keras-style training loop.
    """

    def __init__(self, linear_feature_columns, dnn_feature_columns, module,
                 l2_reg_linear=1e-5, l2_reg_embedding=1e-5, init_std=1e-4,
                 seed=1024, task="binary", device=None, gpus=None, mesh=None,
                 shard_embeddings=False):
        self.linear_feature_columns = list(linear_feature_columns)
        self.dnn_feature_columns = list(dnn_feature_columns)
        self.feature_index = build_input_features(
            self.linear_feature_columns + self.dnn_feature_columns)
        # features declaring on-the-fly hashing (native FNV-1a; a
        # capability the reference declares but stubs, inputs.py:31-33)
        self._hash_feats = {
            f.name: f
            for f in self.linear_feature_columns + self.dnn_feature_columns
            if isinstance(f, (SparseFeat, VarLenSparseFeat)) and f.use_hash}
        self.input_dim = (max(e for _, e in self.feature_index.values())
                          if self.feature_index else 0)
        self.module = module
        self.seed = seed
        self.task = task
        self.device = device   # accepted for API parity; JAX picks devices
        self.gpus = gpus
        self.mesh = mesh
        self.shard_embeddings = shard_embeddings
        self.num_tasks = 1
        self.stop_training = False
        self.history = History()
        self.aux_loss_alpha = 0.0
        self._init_kwargs = getattr(self, "_init_kwargs", {})

        # tables carrying a fused wide column (see EmbeddingDict.wide):
        # {param_path: deep_dim} — reg splits those params column-wise so
        # the wide column gets l2_reg_linear, the deep columns
        # l2_reg_embedding, exactly like separate tables would
        from .base_module import fused_wide_names
        dnn_dims = {f.embedding_name: f.embedding_dim
                    for f in self.dnn_feature_columns
                    if hasattr(f, "embedding_name")}
        self._wide_cols = {
            "embedding_dict/%s" % name: dnn_dims[name]
            for name in fused_wide_names(self.linear_feature_columns,
                                         self.dnn_feature_columns)}

        # per-group regularization rules: (path_regex, l1, l2, part)
        # part: None = whole param; "deep"/"wide" = column split for params
        # listed in self._wide_cols
        self.regularization_rules = []
        self.add_regularization_rule(r"^embedding_dict/",
                                     l2=l2_reg_embedding, part="deep")
        self.add_regularization_rule(r"^embedding_dict/",
                                     l2=l2_reg_linear, part="wide")
        self.add_regularization_rule(r"^linear_model/", l2=l2_reg_linear)

        # --- init parameters ---
        rng = jax.random.PRNGKey(seed)
        x0 = jnp.zeros((2, max(self.input_dim, 1)), jnp.float32)
        variables = module.init({"params": rng, "dropout": rng}, x0,
                                training=False)
        variables = unfreeze(variables)
        self.params = variables.get("params", {})
        self.batch_stats = variables.get("batch_stats", {})

        self._compiled = False
        self._train_step = None
        self._epoch_runners = {}
        self._predict_fn = None
        self._sharding_applied = False
        self.optim = None

    # ------------------------------------------------------------------
    # regularization / aux loss
    # ------------------------------------------------------------------
    def add_regularization_rule(self, pattern, l1=0.0, l2=0.0, part=None):
        """Register explicit L1/L2 on every param whose '/'-joined path
        matches ``pattern``.  TPU-native replacement for the reference's
        ``add_regularization_weight`` over live parameter lists
        (basemodel.py:402-428)."""
        if l1 > 0 or l2 > 0:
            self.regularization_rules.append(
                (pattern, float(l1), float(l2), part))

    # API-parity alias (patterns instead of parameter lists)
    add_regularization_weight = add_regularization_rule

    def _build_reg_fn(self):
        flat = _flatten_with_paths(self.params)
        layouts = self._table_layouts()
        # tables on the sparse-update path are fully lazy: both the reg
        # VALUE and its gradient are applied to touched rows inside the
        # table update — including them here would read (value) and write
        # (gradient) every full table every step, which at production
        # vocab sizes costs more than the rest of the step combined
        sparse_paths = {s[0] for s in getattr(self, "_sparse_specs", [])}
        # entries: (path, l1, l2, lane_mask_or_None).  Table params get a
        # per-STORED-lane 0/1 mask (pack-aware: fused wide lanes vs deep
        # lanes vs waste); everything else is regularized whole.
        entries = []
        for pattern, l1, l2, part in self.regularization_rules:
            rx = re.compile(pattern)
            for p, w in flat:
                if not rx.search(p) or p in sparse_paths:
                    continue
                if p in layouts:
                    deep_vec, wide_vec = self._lane_masks(p, layouts)
                    if part == "wide":
                        mask = wide_vec
                    elif part == "deep":
                        mask = deep_vec
                    else:
                        mask = deep_vec + wide_vec
                    if not mask.any():
                        continue
                    mask = None if mask.all() else jnp.asarray(mask)
                elif part == "wide":
                    # wide-column rules only apply to fused tables
                    continue
                else:
                    mask = None
                entries.append((p, l1, l2, mask))

        def reg_fn(params):
            total = jnp.zeros((), jnp.float32)
            for p, l1, l2, mask in entries:
                w = _get_path(params, p)
                if l1 > 0:
                    aw = jnp.abs(w)
                    total = total + jnp.sum(
                        l1 * (aw if mask is None else aw * mask))
                if l2 > 0:
                    sq = jnp.square(w)
                    total = total + jnp.sum(
                        l2 * (sq if mask is None else sq * mask))
            return total
        return reg_fn

    def get_regularization_loss(self):
        """Current explicit L1/L2 penalty over the live parameters, as a
        python float.  (reference parity: basemodel.py:412-428 — there it
        is summed eagerly every step; here the same function is fused
        into the jitted loss, and this accessor evaluates it on demand.)

        Note: tables on the sparse-update path apply their regularization
        lazily inside the row update; their contribution is therefore not
        part of this eager sum (see _build_reg_fn)."""
        return float(self._build_reg_fn()(self.params))

    def input_from_feature_columns(self, x, feature_columns=None):
        """Embed a raw input dict/list/matrix: returns
        ``(sparse_embedding_list, dense_value_list)`` as numpy arrays —
        each embedding ``[N, 1, E]``, each dense ``[N, d]``.  The hook
        reference users call when composing custom architectures
        (reference parity: basemodel.py:354-380)."""
        if feature_columns is None:
            feature_columns = self.module.dnn_feature_columns
        self._sync_params()   # sparse-update tables may lag after fit
        X = jnp.asarray(self._assemble_x(x))
        variables = {"params": self.params}
        if jax.tree_util.tree_leaves(self.batch_stats):
            variables["batch_stats"] = self.batch_stats
        se, dv = self.module.apply(
            variables, X, tuple(feature_columns),
            method=lambda mod, X, cols: mod.input_from_feature_columns(
                X, cols))
        return ([np.asarray(e) for e in se], [np.asarray(d) for d in dv])

    # ------------------------------------------------------------------
    # compile
    # ------------------------------------------------------------------
    def compile(self, optimizer, loss=None, metrics=None,
                learning_rate=None, sparse_table_updates="auto"):
        """Configure optimizer (name or optax transform), loss (name,
        callable, or per-task list) and metrics (names).
        (reference parity: basemodel.py:433-445)

        ``learning_rate`` (TPU addition): overrides the named optimizer's
        torch-default rate; applies to BOTH the dense parameters and the
        sparse table-update path.

        ``sparse_table_updates`` (TPU addition): True / False / "auto".
        When active, embedding tables never materialize a dense gradient:
        the train step dedups the batch's ids on device, runs the forward
        against the gathered touched rows, and scatters per-row optimizer
        updates back (active-rows step), with table L2 applied lazily to
        touched rows — the production-CTR update rule; dense optimizers
        pay 3+ full HBM passes over every table per step.  Supported for
        'sgd', 'adagrad' and 'adam' (lazy per-row bias correction; for
        adam, rows untouched by a batch skip their momentum decay, the
        standard LazyAdam semantics).  "auto" turns it on when the model
        holds >=1M table rows (where dense updates dominate the step).
        Requesting True with an unsupported optimizer warns and falls back
        to dense updates.
        """
        # re-compiles after a fit must build the new optimizer/table
        # state from the CURRENT weights: combined-storage tables leave
        # params lagging behind table_state until synced (without this a
        # compile('adam') following a fit('adagrad') would seed the new
        # (w | m | v) buffers from the pre-fit weights)
        self._sync_params()
        self.metrics_names = ["loss"]
        self.optim = _get_optimizer(optimizer, learning_rate)
        self._optimizer_name = optimizer if isinstance(optimizer, str) else None
        self._learning_rate = (
            float(learning_rate) if learning_rate is not None
            else _OPT_DEFAULT_LR.get(self._optimizer_name))
        self.loss_func = resolve_loss(loss)
        self.metrics = resolve_metrics(metrics)
        for name in self.metrics:
            self.metrics_names.append(name)

        self._sparse_specs = self._resolve_sparse_specs(sparse_table_updates)
        sparse_paths = {p for p, _, _, _ in self._sparse_specs}
        if sparse_paths:
            mask = jax.tree_util.tree_map_with_path(
                lambda path, _: _path_str(path) not in sparse_paths,
                self.params)
            self._masked_optim = optax.masked(self.optim, mask)
            self.table_state = self._build_table_state()
        else:
            self._masked_optim = self.optim
            self._arena_bases, self._arena_layout = {}, []
            self.table_state = {}
        self.opt_state = self._masked_optim.init(self.params)
        self._strip_combined_leaves()
        self._compiled = False
        return self

    # ------------------------------------------------------------------
    # sparse (touched-rows-only / active-rows) embedding-table updates
    # ------------------------------------------------------------------
    _SPARSE_OPTIMIZERS = ("sgd", "adagrad", "adam", "rmsprop")

    def _resolve_sparse_specs(self, mode):
        if mode is False:
            return []
        if self._optimizer_name not in self._SPARSE_OPTIMIZERS:
            if mode is True:
                warnings.warn(
                    "sparse_table_updates=True requires a named optimizer "
                    "in %r (got %r) — falling back to DENSE table updates"
                    % (self._SPARSE_OPTIMIZERS,
                       self._optimizer_name or type(self.optim).__name__))
            return []
        spans_map = self._table_id_spans()
        flat = dict(_flatten_with_paths(self.params))
        vocabs = self._table_vocabs()
        spans_map = {p: s for p, s in spans_map.items()
                     if p in flat and p in vocabs
                     and getattr(flat[p], "ndim", 0) == 2}
        total_rows = sum(flat[p].shape[0] for p in spans_map)
        if mode == "auto" and total_rows < 1_000_000:
            return []
        # Per-table gate (auto mode): a SMALL table gains nothing from
        # the active-rows path — its substituted [~B, width] slice is
        # as big as (or bigger than) the table itself, so substitution
        # only INFLATES the forward's one-hot lookup matmuls and
        # replaces a cheap dense update with per-row scatter machinery.
        # Sparse pays once vocab >> touched rows (~batch size); the
        # criteo_real TPU v5e sweep over DEEPCTR_SPARSE_MIN_ROWS
        # (2026-08-19, B=4096): 0 -> 826.9k, 2048 -> 961.2k,
        # 8192 -> 1.043M, 16384 -> 1.074M, 65536 -> 1.075M,
        # 131072 -> 1.008M ex/s/chip — knee at ~4x batch, and the
        # unpacked 93k-vocab table still wants sparse.  Explicit
        # sparse_table_updates=True forces every table (tests exercise
        # the machinery at small vocab that way).
        # DEEPCTR_SPARSE_MIN_ROWS overrides for A/B.
        if mode == "auto":
            min_rows = int(_os.environ.get("DEEPCTR_SPARSE_MIN_ROWS",
                                           16384))
            spans_map = {p: s for p, s in spans_map.items()
                         if vocabs[p] >= min_rows}
        # packed tables (param rows != vocab) are updated by PACKED row
        # index: ids map to rows via // pack
        specs = []
        for p, spans in sorted(spans_map.items()):
            n_rows = flat[p].shape[0]
            pack = max(1, int(round(vocabs[p] / n_rows)))
            specs.append((p, tuple(map(tuple, spans)), n_rows, pack))
        # The active-rows step rewrites each table's id columns of X with
        # slice-local proxy ids, so a flat-matrix span can only serve ONE
        # sparse-updated table — any OTHER consumer of a rewritten span
        # would read proxy ids as real ids.  Wide-column fusion makes
        # multi-consumer spans rare (deep table + wide column share one
        # param); for the residual cases every table touching a contested
        # span stays on the dense optax path.
        span_owners = {}
        for spec in specs:
            for sp in spec[1]:
                span_owners.setdefault(sp, []).append(spec[0])
        contested = {p for owners in span_owners.values()
                     if len(owners) > 1 for p in owners}
        if contested and mode is True:
            warnings.warn(
                "sparse_table_updates: tables %s share id columns and "
                "fall back to dense updates" % sorted(contested))
        return [s for s in specs if s[0] not in contested]

    def _table_vocabs(self):
        """{table_param_path: vocabulary_size} over both column lists."""
        from .base_module import fused_wide_names
        fused = set(fused_wide_names(self.linear_feature_columns,
                                     self.dnn_feature_columns))
        out = {}
        for f in self.dnn_feature_columns:
            if isinstance(f, (SparseFeat, VarLenSparseFeat)):
                out["embedding_dict/%s" % f.embedding_name] = \
                    f.vocabulary_size
        for f in self.linear_feature_columns:
            if isinstance(f, (SparseFeat, VarLenSparseFeat)):
                if f.embedding_name not in fused:
                    out["linear_model/embedding_dict/%s"
                        % f.embedding_name] = f.vocabulary_size
        return out

    def _table_id_spans(self):
        """{table_param_path: [column spans]} — which flat-matrix columns
        hold ids for each embedding table (fused wide tables collect both
        the deep and the linear features' spans)."""
        from .base_module import fused_wide_names
        fused = set(fused_wide_names(self.linear_feature_columns,
                                     self.dnn_feature_columns))
        spans = {}

        def add(f, path):
            spans.setdefault(path, []).append(self.feature_index[f.name])

        for f in self.dnn_feature_columns:
            if isinstance(f, (SparseFeat, VarLenSparseFeat)):
                add(f, "embedding_dict/%s" % f.embedding_name)
        for f in self.linear_feature_columns:
            if isinstance(f, (SparseFeat, VarLenSparseFeat)):
                if f.embedding_name in fused:
                    add(f, "embedding_dict/%s" % f.embedding_name)
                else:
                    add(f, "linear_model/embedding_dict/%s"
                        % f.embedding_name)
        # dedup identical spans per table (a feature in both column lists)
        return {p: sorted(set(map(tuple, s))) for p, s in spans.items()}

    def _use_combined_state(self, w):
        """Adagrad sparse tables on the Pallas path store (w | acc) as ONE
        [R, 256] buffer so the update kernel costs 1 read + 1 write DMA
        per touched row (DMA issue rate is the measured bound —
        tools/update_micro.py).  The params leaf then lags during
        training and is re-synced from the combined buffer before any
        read (predict/get_weights/checkpoint) — see _sync_params.

        ROW-SHARDED tables keep the combined layout too (round-2
        verdict #3): the update runs in a shard_map where the Pallas
        scatter is legal per shard (parallel/update.py) — requires the
        pair rows to stay co-located (rows %% model-axis size == 0) and
        the default 'scatter' update mode.  DEEPCTR_FORCE_COMBINED=1
        forces the layout without Pallas (XLA drop-scatter fallback) so
        the CPU dryrun/tests exercise the sharded combined path."""
        from .. import config
        if getattr(w, "ndim", 0) != 2 or w.shape[1] != 128:
            return False
        enabled = (config.use_pallas()
                   or _os.environ.get("DEEPCTR_FORCE_COMBINED") == "1")
        if self.mesh is None or not self.shard_embeddings:
            return enabled
        return (enabled
                and self._update_mode() == "scatter"
                and "model" in self.mesh.shape
                and w.shape[0] % self.mesh.shape["model"] == 0)

    def _init_table_state(self, w):
        if self._optimizer_name == "adagrad":
            if self._use_combined_state(w):
                # INTERLEAVED [2R, 128]: weights at even physical rows,
                # accumulator at odd — Mosaic only lowers per-row DMAs
                # for one-tile-wide (128-lane) rows, so a [R, 256]
                # (w | acc) layout is not an option (see pallas_update)
                return {"combined": jnp.stack(
                    [w.astype(jnp.float32),
                     jnp.zeros(w.shape, jnp.float32)],
                    axis=1).reshape(2 * w.shape[0], w.shape[1])}
            return jnp.zeros(w.shape, jnp.float32)
        if self._optimizer_name == "adam":
            # lazy adam: per-row moments + a step count for bias
            # correction.  _adam_t_mode selects the t form:
            #   table (default) — ONE scalar per table, incremented
            #     every step: torch.optim.Adam's own semantics
            #     (state['step'] is per PARAMETER, so dense torch
            #     corrects every row by the global step — and for a
            #     long-untouched row torch's decayed-m + ~1 correction
            #     matches table-t's fresh-m + ~1 correction more closely
            #     than rowwise's t=1 full-magnitude step).
            #   rowwise — [R] int32, rows advance their own timeline
            #     when touched (torch.optim.SparseAdam-style).
            #     Costs ~1.4ms/step at vocab-1M shapes: the [R] t
            #     gather+scatter is an XLA element-scatter (micro
            #     2026-08-20; pooling all 26 tables into one scatter
            #     measured WORSE, 2.29ms — the element-scatter lowering
            #     itself is the cost).  Same-session A/B: vocab-1M adam
            #     438.2k (rowwise) vs 551.7k (table) ex/s/chip.
            t0 = (jnp.zeros((), jnp.int32)
                  if self._adam_t_mode() == "table"
                  else jnp.zeros((w.shape[0],), jnp.int32))
            sharded = (self.mesh is not None and self.shard_embeddings)
            # row-sharded triples require the scalar-t form (the shard-
            # local update broadcasts one step count; parallel/update.py
            # sharded_combined3_update); rowwise-t sharded falls back to
            # separate leaves
            if (self._use_combined_state(w)
                    and (not sharded
                         or self._adam_t_mode() == "table")):
                # INTERLEAVED [3R, 128] (w | m | v) triples, the adam
                # analog of adagrad's pair layout: the Pallas scatter
                # writes 1 triple-DMA per touched row (L=3) instead of
                # three XLA row scatters.  Row-sharded tables use this
                # too via parallel/update.sharded_combined3_update when
                # t is the per-table scalar (the default); only the
                # rowwise-t form falls back to separate leaves.
                return {"combined3": jnp.stack(
                    [w.astype(jnp.float32),
                     jnp.zeros(w.shape, jnp.float32),
                     jnp.zeros(w.shape, jnp.float32)],
                    axis=1).reshape(3 * w.shape[0], w.shape[1]),
                    "t": t0}
            return {"m": jnp.zeros(w.shape, jnp.float32),
                    "v": jnp.zeros(w.shape, jnp.float32),
                    "t": t0}
        if self._optimizer_name == "rmsprop":
            # lazy rmsprop: per-row square-average, decayed only when a
            # row is touched (same lazy-moment semantics as adam);
            # separate-leaf XLA path only (no combined/Pallas variant —
            # rmsprop is not a big-vocab production default)
            return jnp.zeros(w.shape, jnp.float32)
        return ()

    def _adam_t_mode(self):
        """DEEPCTR_ADAM_T=table|rowwise — see _init_table_state."""
        mode = _os.environ.get("DEEPCTR_ADAM_T", "table")
        if mode not in ("rowwise", "table"):
            raise ValueError("DEEPCTR_ADAM_T=%r — must be rowwise|table"
                             % mode)
        return mode

    def _update_mode(self):
        """Active-rows update variant (A/B'd on the real TPU at vocab 1M,
        tools/ablate_active_rows; BASELINE.md round-2 table):
          scatter (default) — per-table: XLA pair-gather + fused XLA
            adagrad + one write-only Pallas scatter launch per table
            (332.7k ex/s/chip);
          arena            — ALL combined-storage tables in ONE [2P, 128]
            buffer: one pair-gather, one batched adagrad, ONE grid-G
            scatter launch (312.9k — loses: the [G, n] starts scalar-
            prefetch array is ~0.5MB of SMEM, and the kernel's per-DMA
            issue cost measured 42 vs 28 ns; launch overhead was never
            the bound — tools/scatter_issue_micro.py);
          scatter_pooled   — per-table storage, pooled launch (314.9k —
            the stacked vals copy costs an extra HBM round trip);
          fused            — per-table read-modify-write kernel (287.2k —
            2 pair-DMAs per row vs scatter's 1);
          scatter_pair     — like scatter, but the transform fetches the
            (w, acc) pair with ONE [R, 2, 128]-form gather per table
            instead of a w gather in transform + an acc gather in
            row_update (205.3k vs a 440.9k same-session scatter control
            — the pair-form gather + the [:, 0]/[:, 1] slices it forces
            lower pathologically; flat per-table row gathers already run
            at batched-gather bandwidth, so gather-op count was never
            the bound)."""
        mode = _os.environ.get("DEEPCTR_UPDATE_MODE", "scatter")
        valid = ("scatter", "arena", "scatter_pooled", "fused",
                 "scatter_pair")
        if mode not in valid:
            raise ValueError("DEEPCTR_UPDATE_MODE=%r — must be one of %s"
                             % (mode, "|".join(valid)))
        return mode

    def _build_table_state(self):
        """Per-table optimizer state; combined-storage (w | acc) tables
        are CONCATENATED into one shared '__arena__' buffer in arena mode
        so the whole update is a single gather + single scatter launch
        (see ops/pallas_update.arena_scatter_rows)."""
        self._arena_bases = {}       # path -> pair-row base in the arena
        self._arena_layout = []      # ordered (path, base, n_rows)
        state = {}
        arena_parts = []
        base = 0
        use_arena = (self._update_mode() == "arena"
                     and self._optimizer_name == "adagrad")
        for p, spans, n_rows, pack in self._sparse_specs:
            w = _get_path(self.params, p)
            st = self._init_table_state(w)
            if (use_arena and isinstance(st, dict) and "combined" in st):
                self._arena_bases[p] = base
                self._arena_layout.append((p, base, n_rows))
                arena_parts.append(st["combined"])
                base += n_rows
            else:
                state[p] = st
            if isinstance(st, dict) and ("combined" in st
                                         or "combined3" in st):
                # free this table's params buffer NOW, before the next
                # table's combined build: otherwise the CONSTRUCTION
                # peak is full-params + full-combined simultaneously
                # (the duplication the placeholder design removes) —
                # at the capacity edge that transient alone OOMs
                self.params = _set_path(
                    self.params, p,
                    jnp.zeros((0,) + w.shape[1:], w.dtype))
                self._params_stale = True
        if arena_parts:
            state["__arena__"] = jnp.concatenate(arena_parts, axis=0)
        return state

    def _table_layouts(self):
        """{table_param_path: (logical_width, fused_deep_dim_or_None,
        pack)} — the lane layout of every embedding-table param, derived
        from the feature columns (packed tables store ``pack`` logical
        rows per physical 128-lane row; lanes >= pack*width are waste)."""
        from .base_module import fused_wide_names
        fused = set(fused_wide_names(self.linear_feature_columns,
                                     self.dnn_feature_columns))
        flat = dict(_flatten_with_paths(self.params))
        dims = {}
        for f in self.dnn_feature_columns:
            if isinstance(f, (SparseFeat, VarLenSparseFeat)):
                dims["embedding_dict/%s" % f.embedding_name] = \
                    (f.embedding_dim, f.embedding_name in fused)
        for f in self.linear_feature_columns:
            if isinstance(f, (SparseFeat, VarLenSparseFeat)):
                if f.embedding_name not in fused:
                    dims["linear_model/embedding_dict/%s"
                         % f.embedding_name] = (1, False)
        layouts = {}
        for p, (dim, is_fused) in dims.items():
            if p not in flat or getattr(flat[p], "ndim", 0) != 2:
                continue
            width = dim + 1 if is_fused else dim
            stored = flat[p].shape[1]
            pack = 128 // width if stored != width else 1
            layouts[p] = (width, dim if is_fused else None, pack)
        return layouts

    def _lane_masks(self, path, layouts):
        """(deep_mask, wide_mask) float lane vectors over the STORED width
        of a table param: deep lanes carry the embedding L2, the fused
        wide lane (if any) the linear L2, waste lanes neither."""
        width, fused_dim, pack = layouts[path]
        unit = np.zeros((width,), np.float32)
        deep = unit.copy()
        wide = unit.copy()
        if fused_dim is None:
            deep[:] = 1.0
        else:
            deep[:fused_dim] = 1.0
            wide[fused_dim:] = 1.0
        stored = width if pack == 1 else 128
        deep_vec = np.zeros((stored,), np.float32)
        wide_vec = np.zeros((stored,), np.float32)
        for j in range(pack):
            deep_vec[j * width:(j + 1) * width] = deep
            wide_vec[j * width:(j + 1) * width] = wide
        return deep_vec, wide_vec

    def _table_l2_vec(self, path, w):
        """Per-STORED-lane L2 strengths for lazy regularization (fused
        wide lanes carry l2_reg_linear, deep lanes l2_reg_embedding,
        waste lanes of packed tables zero)."""
        layouts = self._table_layouts()
        if path not in layouts:   # unknown layout: uniform from rules
            l2 = 0.0
            for pattern, _, rl2, part in self.regularization_rules:
                if part is None and re.compile(pattern).search(path):
                    l2 += rl2
            return jnp.full((w.shape[1],), l2, jnp.float32)
        deep_vec, wide_vec = self._lane_masks(path, layouts)
        vec = np.zeros_like(deep_vec)
        for pattern, _, l2, part in self.regularization_rules:
            if not re.compile(pattern).search(path):
                continue
            if part == "wide":
                vec += l2 * wide_vec
            elif part == "deep":
                vec += l2 * deep_vec
            else:
                vec += l2 * (deep_vec + wide_vec)
        return jnp.asarray(vec)

    def _make_active_rows(self):
        """Build the two halves of the ACTIVE-ROWS train step.

        The round-1 sparse path still let autograd materialize a dense
        [rows, width] table gradient (the gather's transpose), which
        dominates the step at production vocab (PLAN.md §2).  Here the
        table never enters autograd at full size:

          transform(params, X):
            per table — gather the batch's id columns, dedup the touched
            (packed) rows with ONE on-device sort, gather those rows into
            a small [cap, width] slice, substitute the slice for the
            table leaf, and rewrite the id columns of X to point into the
            slice (``slot*pack + lane``).  The forward then runs
            unmodified against the substituted tree, and autograd's
            gradient for the table is the SMALL per-unique-row matrix
            (duplicates are segment-summed by the gather's transpose
            within the slice).

          row_update(params, table_state, grads, aux):
            per table — lazy L2 on the touched rows, per-row optimizer
            step (sgd / adagrad / lazy adam with per-row bias
            correction), one scatter back into the full table; padding
            slots scatter out of bounds and are dropped.

        A synthetic id 0 is prepended to every table's id list so row 0
        is always slot 0, which pins ``proxy == 0  <=>  id == 0`` — the
        varlen 0-padding mask (inputs.py get_varlen_pooling_list) keeps
        working on proxied ids.
        """
        specs = []
        for path, spans, n_rows, pack in self._sparse_specs:
            w = _get_path(self.params, path)
            specs.append((path, spans, n_rows, pack,
                          self._table_l2_vec(path, w)))
        opt_name = self._optimizer_name
        lr = self._learning_rate
        arena_bases = dict(self._arena_bases)
        update_mode = self._update_mode()
        # row-sharded tables must NOT enter a pallas_call: GSPMD has to
        # replicate a custom call's operands (a full-table all-gather per
        # step, plus a silently dropped donation) — XLA's scatter keeps
        # the P('model', None) sharding instead
        sharded_tables = self.mesh is not None and self.shard_embeddings
        mesh = self.mesh
        # DEEPCTR_SUBST_BARRIER=1 (opt-in): optimization_barrier on each
        # substituted slice, forcing XLA to materialize it once instead
        # of composing the combined-buffer gather into every downstream
        # lookup.  Tested as a gather-of-gather fix for the big-vocab
        # forward gap and measured ~NO-OP (fwd_bisect emb 3.19 vs 3.30ms
        # at vocab 1M — PLAN.md); kept only as an ablation knob.  The
        # actual suspect is the f32 one-hot-matmul gather lowering, see
        # EmbeddingDict._gather / DEEPCTR_GATHER_CAST.
        use_barrier = _os.environ.get("DEEPCTR_SUBST_BARRIER", "0") == "1"

        def transform(params, table_state, X):
            aux = {}
            rewrites = []   # (start, end, [B, width] proxy cols)
            # per-spec (packed-)row vectors, grouped by length so ALL
            # tables of a group dedup through ONE batched sort — 26
            # separate 4k sorts measured as the dominant active-rows cost
            # on TPU; one [26, 4k] sort amortizes it
            items = []
            for path, spans, n_rows, pack, _ in specs:
                ids = jnp.concatenate(
                    [X[:, s:e].astype(jnp.int32).reshape(-1)
                     for s, e in spans])
                ids = jnp.concatenate([jnp.zeros((1,), jnp.int32), ids])
                # pad the id vector only to an 8 multiple (TPU shape
                # alignment).  It used to pad to the Pallas update
                # kernels' 1024 block — but every padding slot is a
                # clip-mode gather of an out-of-bounds row in the
                # touched-rows fetch below, and those reads measured
                # ~1.1ms/step at vocab 1M (tools/subgather_micro.py:
                # 26x[5120] 1.757ms vs 26x[4104] 0.639ms).  The kernels
                # now pad to their block size internally (a cheap
                # concatenate that never re-enters the gather).  Pads
                # carry the single out-of-bounds row `n_rows*pack`
                # (one extra dedup slot, dropped by every scatter).
                pad = (-ids.shape[0]) % 8
                if pad:
                    ids = jnp.concatenate(
                        [ids, jnp.full((pad,), n_rows * pack, jnp.int32)])
                items.append((path, spans, n_rows, pack, ids, pad))
            by_n = {}
            for item in items:
                by_n.setdefault(int(item[4].shape[0]), []).append(item)

            for n, group in sorted(by_n.items()):
                G = len(group)
                rows_mat = jnp.stack(
                    [ids // pack if pack > 1 else ids
                     for _, _, _, pack, ids, _ in group])       # [G, n]
                iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                        (G, n))
                impl = _os.environ.get("DEEPCTR_DEDUP_IMPL", "sorts")
                # "packed" (A/B variant, measured SLOWER end-to-end):
                # single-array sorts with the payload in the low bits of
                # one int32 key.  Hypothesis was that halving each sort's
                # data beats the two-array form; measured on TPU v5e
                # 2026-08-19 it LOSES — transform_sub 1.821 vs 1.024ms,
                # vocab-1M 508.9k vs 562.3k, criteo_real 1.022M vs
                # 1.107M ex/s/chip: XLA's multi-operand TPU sort shares
                # one comparator pass, while the packed form pays the
                # key multiply + two unpack mod/divs on the full array.
                # Bit budget when engaged: payloads are positions (< n),
                # so the aux sorts need n*(n+1) < 2^31 and the main sort
                # additionally (max_row+2)*n < 2^31.
                # rows_mat values are <= n_rows (the OOB pad row is
                # n_rows*pack, whose packed row is n_rows); +1 headroom
                max_row = max(t[2] for t in group)
                packable_aux = impl == "packed" and n * (n + 1) < 2 ** 31
                packable_main = (packable_aux
                                 and (max_row + 2) * n < 2 ** 31)
                if packable_main:
                    packed = jax.lax.sort(rows_mat * n + iota,
                                          dimension=-1, is_stable=False)
                    sorted_rows = packed // n
                    order = packed % n
                else:
                    sorted_rows, order = jax.lax.sort(
                        (rows_mat, iota), dimension=-1, num_keys=1,
                        is_stable=False)
                first = jnp.concatenate(
                    [jnp.ones((G, 1), jnp.int32),
                     (sorted_rows[:, 1:] != sorted_rows[:, :-1])
                     .astype(jnp.int32)], axis=1)
                slot_sorted = jnp.cumsum(first, axis=1) - 1     # [G, n]
                if impl == "scatter":
                    # original form, kept for A/B: two [G, n] scatters.
                    # Measured 1.44ms vs 0.37ms for the sort form at
                    # [26, 5120] on TPU v5e (tools/subgather_micro.py
                    # 2026-08-19; sorted/unique promises don't help)
                    gi = jnp.arange(G)[:, None]
                    inv = jnp.zeros((G, n), jnp.int32).at[gi, order].set(
                        slot_sorted)
                    urows_mat = jnp.zeros((G, n), jnp.int32).at[
                        gi, slot_sorted].set(sorted_rows)
                elif packable_aux:
                    # packed forms of the two aux sorts (see bit budget
                    # above).  inv: key order (distinct — no ties), low
                    # bits slot; after sorting, element i is original
                    # position i's slot.  compaction: key slot-of-first
                    # (duplicates key past every slot at n), low bits the
                    # SORTED position; the gather then pulls slot s's
                    # unique row out of sorted_rows.
                    inv = jax.lax.sort(order * n + slot_sorted,
                                       dimension=-1, is_stable=False) % n
                    compact_key = jnp.where(first == 1, slot_sorted, n)
                    upos = jax.lax.sort(compact_key * n + iota,
                                        dimension=-1, is_stable=False) % n
                    urows_mat = jnp.take_along_axis(sorted_rows, upos,
                                                    axis=1)
                else:
                    # scatter-free dedup: one extra batched sort each.
                    # inv: sorting (order, slot) by order inverts the
                    # sort permutation — inv[j] = slot of original id j.
                    _, inv = jax.lax.sort(
                        (order, slot_sorted), dimension=-1, num_keys=1,
                        is_stable=False)
                    # urows: compaction sort — each run's FIRST element
                    # keys by its slot, duplicates key past every slot
                    # (n), so position s ends up holding slot s's unique
                    # row (positions >= n_unique hold duplicate garbage,
                    # overwritten by the sentinel branch below)
                    compact_key = jnp.where(first == 1, slot_sorted, n)
                    _, urows_mat = jax.lax.sort(
                        (compact_key, sorted_rows), dimension=-1,
                        num_keys=1, is_stable=False)
                n_unique = slot_sorted[:, -1:] + 1              # [G, 1]
                # padding slots index DISTINCT, ASCENDING out-of-bounds
                # rows (n_rows + k): the whole index vector is then sorted
                # AND unique, which lets XLA use its fast scatter/gather
                # lowering (the generic scatter measured ~19ms/step at
                # vocab 1M — the dominant active-rows cost)
                sentinel = jnp.asarray([[t[2]] for t in group], jnp.int32)
                scatter_mat = jnp.where(
                    jnp.arange(n)[None, :] < n_unique, urows_mat,
                    sentinel + jnp.arange(n, dtype=jnp.int32)[None, :])

                # ARENA members of the group: every combined-storage table
                # lives in ONE shared [2P, 128] buffer, so all their
                # touched (w, acc) pairs come back with ONE gather
                arena_sel = [g for g, it in enumerate(group)
                             if it[0] in arena_bases]
                W_arena = None
                if arena_sel:
                    arena_buf = table_state["__arena__"]
                    bases = np.array([arena_bases[group[g][0]]
                                      for g in arena_sel],
                                     np.int32)[:, None]
                    caps = np.array([group[g][2] - 1 for g in arena_sel],
                                    np.int32)[:, None]
                    sub = (scatter_mat if len(arena_sel) == len(group)
                           else scatter_mat[np.array(arena_sel)])
                    # clip each table's out-of-bounds dedup padding onto
                    # its LAST row: bases ascend in spec order, so the
                    # flat index vector stays globally sorted (XLA's fast
                    # gather); padding slots' values are never read
                    gth = (jnp.minimum(sub, caps) + bases).reshape(-1)
                    pairs = arena_buf.reshape(-1, 2, 128).at[gth].get(
                        mode="clip", indices_are_sorted=True)
                    W_arena, A_arena = pairs[:, 0, :], pairs[:, 1, :]
                    if use_barrier:
                        W_arena = jax.lax.optimization_barrier(W_arena)
                    nvs = jnp.stack(
                        [n_unique[g, 0] - (1 if group[g][5] else 0)
                         for g in arena_sel])
                    aux.setdefault("__arena__", []).append(
                        {"paths": [group[g][0] for g in arena_sel],
                         "W": W_arena, "A": A_arena,
                         "starts": (sub + bases) * 2, "nvs": nvs})

                for g, (path, spans, n_rows, pack, ids,
                        pad) in enumerate(group):
                    urows = scatter_mat[g]
                    # valid-prefix length for the fused update kernel:
                    # the padding ids dedup into exactly one extra
                    # (out-of-bounds) slot when present
                    n_valid = n_unique[g, 0] - (1 if pad else 0)
                    if path in arena_bases:
                        k = arena_sel.index(g)
                        small = W_arena[k * n:(k + 1) * n]
                    else:
                        st = table_state.get(path)
                        combined = isinstance(st, dict) and "combined" in st
                        combined3 = (isinstance(st, dict)
                                     and "combined3" in st)
                        # clip maps padding rows onto the last row
                        # (harmless: nothing reads their slice values);
                        # post-clip indices are still sorted but no longer
                        # unique, so only the sorted promise is made here
                        acc_small = None
                        if combined and update_mode == "scatter_pair":
                            # ONE pair-form gather fetches w AND acc rows
                            # together (vs w here + acc in row_update)
                            prs = st["combined"].reshape(-1, 2, 128).at[
                                urows].get(mode="clip",
                                           indices_are_sorted=True)
                            small, acc_small = prs[:, 0, :], prs[:, 1, :]
                        elif combined:
                            # authoritative weights live in the
                            # interleaved (w, acc) buffer at EVEN physical
                            # rows; the params leaf lags during training
                            small = st["combined"].at[urows * 2].get(
                                mode="clip",
                                indices_are_sorted=True)
                        elif combined3:
                            # adam (w | m | v) triple storage: weights at
                            # physical rows 3r
                            small = st["combined3"].at[urows * 3].get(
                                mode="clip",
                                indices_are_sorted=True)
                        else:
                            w = _get_path(params, path)
                            small = w.at[urows].get(
                                mode="clip",
                                indices_are_sorted=True)   # [n, width]
                        if use_barrier:
                            small = jax.lax.optimization_barrier(small)
                        aux[path] = (urows, n_valid, small, acc_small)
                    params = _set_path(params, path, small)
                    proxy = inv[g] * pack + ids % pack if pack > 1 \
                        else inv[g]
                    proxy = proxy[1:]
                    off = 0
                    for s, e in spans:
                        width = e - s
                        chunk = proxy[off:off + X.shape[0] * width]
                        off += X.shape[0] * width
                        rewrites.append((s, e, chunk.reshape(
                            X.shape[0], width).astype(X.dtype)))
            # apply every span rewrite in ONE concatenate instead of a
            # serial chain of 26 lane-offset dynamic-update-slices on
            # [B, cols] (measured: a modest 3.21 -> 3.05ms on the
            # fwd_bisect emb probe at vocab 1M; kept for the op-count
            # and dependency-chain reduction)
            rewrites.sort(key=lambda r: r[0])
            pieces, cur = [], 0
            for s, e, chunk in rewrites:
                if s > cur:
                    pieces.append(X[:, cur:s])
                pieces.append(chunk)
                cur = e
            if cur < X.shape[1]:
                pieces.append(X[:, cur:])
            if rewrites:
                X = jnp.concatenate(pieces, axis=1)
            return params, X, aux

        def _get_rows(arr, rows):
            return arr.at[rows].get(mode="clip", indices_are_sorted=True)

        def _set_rows(arr, rows, vals):
            # rows are sorted and unique by construction (dedup slots +
            # distinct ascending out-of-bounds padding, dropped here) —
            # both promises unlock XLA's vectorized scatter lowering
            return arr.at[rows].set(vals, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)

        def row_update(params, table_state, grads, aux):
            from .. import config as dc_config
            from ..ops.pallas_update import (arena_scatter_rows,
                                             combined_update_supported,
                                             fused_row_update,
                                             fused_row_update_combined,
                                             multi_scatter_rows,
                                             row_update_supported,
                                             scatter_rows)
            new_state = dict(table_state)
            l2_by_path = {s[0]: s[4] for s in specs}
            # ARENA path: every combined table's update in ONE batched
            # adagrad + ONE scatter launch into the shared buffer.  The
            # vals tensor is the contiguous output of the batched math —
            # no per-table stacking (the copy that sank scatter_pooled)
            for grp in aux.get("__arena__", ()):
                arena_buf = new_state["__arena__"]
                Ga = len(grp["paths"])
                n = grp["starts"].shape[1]
                g_all = jnp.concatenate(
                    [_get_path(grads, p) for p in grp["paths"]]
                ).astype(jnp.float32).reshape(Ga, n, 128)
                l2s = jnp.stack([l2_by_path[p].astype(jnp.float32)
                                 for p in grp["paths"]])[:, None, :]
                W3 = grp["W"].astype(jnp.float32).reshape(Ga, n, 128)
                A3 = grp["A"].astype(jnp.float32).reshape(Ga, n, 128)
                gp = g_all + 2.0 * l2s * W3          # lazy L2, touched rows
                a2 = A3 + gp * gp
                # torch-Adagrad form: eps OUTSIDE the sqrt (see
                # _torch_adagrad; the Pallas kernels match)
                wn = W3 - lr * gp / (jnp.sqrt(a2) + _ADAGRAD_EPS)
                newpairs = jnp.stack([wn, a2], axis=2).reshape(
                    Ga, 2 * n, 128)
                new_state["__arena__"] = arena_scatter_rows(
                    arena_buf, newpairs, grp["starts"], grp["nvs"], L=2)
            pooled = []   # combined tables awaiting the one-launch scatter
            for path, spans, n_rows, pack, l2_vec in specs:
                if path in arena_bases:
                    continue
                w = _get_path(params, path)
                g = _get_path(grads, path)                     # [n, width]
                rows, n_valid, w_rows_cached, acc_cached = aux[path]
                st = table_state.get(path)
                if (sharded_tables and isinstance(st, dict)
                        and "combined" in st):
                    # row-sharded combined storage: shard-local update
                    # under shard_map (each shard searchsorts its slot
                    # range in the sorted starts, runs the adagrad math
                    # on its rows, and scatters locally — Pallas kernel
                    # on TPU, XLA drop-scatter elsewhere); see
                    # parallel/update.py (round-2 verdict #3)
                    from ..parallel.update import sharded_combined_update
                    new_state[path] = {"combined": sharded_combined_update(
                        mesh, st["combined"], g, w_rows_cached, rows * 2,
                        n_valid, l2_vec, lr, _ADAGRAD_EPS)}
                    continue
                if (sharded_tables and isinstance(st, dict)
                        and "combined3" in st):
                    # row-sharded adam triples: shard-local (w | m | v)
                    # update with the per-table scalar step count
                    # broadcast (parallel/update.sharded_combined3_update)
                    from ..parallel.update import sharded_combined3_update
                    new_t = st["t"] + 1
                    new_state[path] = {
                        "combined3": sharded_combined3_update(
                            mesh, st["combined3"], g, w_rows_cached,
                            rows * 3, n_valid, l2_vec, lr, _ADAM_B1,
                            _ADAM_B2, _ADAM_EPS,
                            new_t.astype(jnp.float32)),
                        "t": new_t}
                    continue
                if (isinstance(st, dict) and "combined" in st
                        and combined_update_supported(st["combined"], g,
                                                      rows)):
                    # interleaved (w, acc) pair storage; params leaf stays
                    # stale until _sync_params.  Variants, A/B'd in-step
                    # on the real TPU at vocab 1M (tools/
                    # ablate_active_rows): scatter 332.7k / scatter_pooled
                    # 314.9k / fused 287.2k ex/s/chip:
                    #   scatter (default) — XLA gathers the acc rows (its
                    #     row-gather lowering is fast), the adagrad math
                    #     fuses into XLA vector ops, and a write-only
                    #     Pallas kernel per table issues 1 pair DMA per
                    #     touched row;
                    #   scatter_pooled — ONE multi-table kernel launch for
                    #     all tables; loses: the [G, 2n, 128] vals stack
                    #     costs a full HBM round trip that outweighs the
                    #     saved launches;
                    #   fused — read + compute + write inside one RMW
                    #     kernel per table (2 pair DMAs per row,
                    #     in-kernel roll/mask compute).
                    if update_mode.startswith("scatter"):
                        comb = st["combined"]
                        acc_rows = (acc_cached if acc_cached is not None
                                    else comb.at[rows * 2 + 1].get(
                                        mode="clip",
                                        indices_are_sorted=True))
                        w_rows = w_rows_cached.astype(jnp.float32)
                        gp = g.astype(jnp.float32) \
                            + 2.0 * l2_vec[None, :] * w_rows
                        a2 = acc_rows + gp * gp
                        wn = w_rows - lr * gp / (jnp.sqrt(a2)
                                                 + _ADAGRAD_EPS)
                        newpairs = jnp.stack([wn, a2], axis=1).reshape(
                            2 * wn.shape[0], wn.shape[1])
                        if update_mode == "scatter_pooled":
                            pooled.append((path, st["combined"], newpairs,
                                           rows * 2, n_valid))
                        elif dc_config.use_pallas():
                            new_state[path] = {"combined": scatter_rows(
                                comb, newpairs, rows * 2, n_valid, L=2)}
                        else:
                            # combined layout without a Pallas backend
                            # (CPU: DEEPCTR_FORCE_COMBINED / leaked
                            # set_use_pallas between state-init and
                            # trace): XLA drop-scatter of the pair rows —
                            # same semantics, measured-slower on TPU
                            prs = jnp.stack(
                                [wn, a2], axis=1)       # [n, 2, width]
                            new_state[path] = {"combined":
                                comb.reshape(-1, 2, comb.shape[1]).at[
                                    rows].set(
                                    prs, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True).reshape(
                                    comb.shape)}
                    else:
                        new_state[path] = {
                            "combined": fused_row_update_combined(
                                st["combined"], g, rows, n_valid, l2_vec,
                                lr, _ADAGRAD_EPS)}
                    continue
                if (isinstance(st, dict) and "combined3" in st
                        and combined_update_supported(st["combined3"], g,
                                                      rows, L=3)):
                    # adam triple storage (w | m | v): bit-identical math
                    # to the separate-leaf lazy adam below (per-row t,
                    # bias correction at the row's own timeline), but the
                    # writeback is ONE Pallas triple-DMA per touched row
                    # instead of three XLA row scatters
                    comb = st["combined3"]
                    m_rows = comb.at[rows * 3 + 1].get(
                        mode="clip", indices_are_sorted=True)
                    v_rows = comb.at[rows * 3 + 2].get(
                        mode="clip", indices_are_sorted=True)
                    w_rows = w_rows_cached.astype(jnp.float32)
                    gp = g.astype(jnp.float32) \
                        + 2.0 * l2_vec[None, :] * w_rows
                    m_new = _ADAM_B1 * m_rows + (1 - _ADAM_B1) * gp
                    v_new = _ADAM_B2 * v_rows + (1 - _ADAM_B2) * gp * gp
                    if st["t"].ndim == 0:      # per-table scalar t
                        new_t = st["t"] + 1
                        tf = new_t.astype(jnp.float32)
                    else:                      # per-row t (rowwise)
                        t_rows = st["t"].at[rows].get(
                            mode="clip", indices_are_sorted=True) + 1
                        tf = t_rows.astype(jnp.float32)[:, None]
                        new_t = st["t"].at[rows].set(
                            t_rows, mode="drop", indices_are_sorted=True,
                            unique_indices=True)
                    m_hat = m_new / (1 - _ADAM_B1 ** tf)
                    v_hat = v_new / (1 - _ADAM_B2 ** tf)
                    wn = w_rows - lr * m_hat / (jnp.sqrt(v_hat)
                                                + _ADAM_EPS)
                    if dc_config.use_pallas():
                        trip = jnp.stack([wn, m_new, v_new],
                                         axis=1).reshape(
                            3 * wn.shape[0], wn.shape[1])
                        newcomb = scatter_rows(comb, trip, rows * 3,
                                               n_valid, L=3)
                    else:
                        # XLA drop-scatter fallback (CPU/forced layout)
                        newcomb = comb.reshape(
                            -1, 3, comb.shape[1]).at[rows].set(
                            jnp.stack([wn, m_new, v_new], axis=1),
                            mode="drop", indices_are_sorted=True,
                            unique_indices=True).reshape(comb.shape)
                    new_state[path] = {"combined3": newcomb, "t": new_t}
                    continue
                if (dc_config.use_pallas()
                        and not sharded_tables
                        and opt_name in ("sgd", "adagrad")
                        and row_update_supported(w, g, rows)):
                    # fused RMW kernel: one windowed-DMA pass over the
                    # touched rows (XLA's scatter measured ~8GB/s; the
                    # kernel is bit-exact vs the path below — see
                    # tools/update_micro.py); the transform's gather
                    # provides the old row values (no per-row w read)
                    acc = table_state[path] if opt_name == "adagrad" \
                        else None
                    new_w, new_acc = fused_row_update(
                        w, acc, g, rows, n_valid, l2_vec, lr,
                        _ADAGRAD_EPS, w_rows=w_rows_cached)
                    if new_acc is not None:
                        new_state[path] = new_acc
                    params = _set_path(params, path, new_w)
                    continue
                w_rows = w_rows_cached.astype(jnp.float32)
                # lazy L2: regularize exactly the touched rows
                g = g + 2.0 * l2_vec[None, :] * w_rows
                if opt_name == "adagrad":
                    acc = table_state[path]
                    acc_rows = _get_rows(acc, rows) + jnp.square(g)
                    new_state[path] = _set_rows(acc, rows, acc_rows)
                    step = lr * g / (jnp.sqrt(acc_rows) + _ADAGRAD_EPS)
                elif opt_name == "rmsprop":
                    acc = table_state[path]
                    acc_rows = (_RMS_DECAY * _get_rows(acc, rows)
                                + (1 - _RMS_DECAY) * jnp.square(g))
                    new_state[path] = _set_rows(acc, rows, acc_rows)
                    step = lr * g / (jnp.sqrt(acc_rows) + _RMS_EPS)
                elif opt_name == "adam":
                    st = table_state[path]
                    m = (_ADAM_B1 * _get_rows(st["m"], rows)
                         + (1 - _ADAM_B1) * g)
                    v = (_ADAM_B2 * _get_rows(st["v"], rows)
                         + (1 - _ADAM_B2) * jnp.square(g))
                    if st["t"].ndim == 0:      # per-table scalar t
                        new_t = st["t"] + 1
                        tf = new_t.astype(jnp.float32)
                    else:                      # per-row t (rowwise)
                        t = _get_rows(st["t"], rows) + 1
                        tf = t.astype(jnp.float32)[:, None]
                        new_t = _set_rows(st["t"], rows, t)
                    m_hat = m / (1 - _ADAM_B1 ** tf)
                    v_hat = v / (1 - _ADAM_B2 ** tf)
                    step = lr * m_hat / (jnp.sqrt(v_hat) + _ADAM_EPS)
                    new_state[path] = {"m": _set_rows(st["m"], rows, m),
                                       "v": _set_rows(st["v"], rows, v),
                                       "t": new_t}
                else:
                    step = lr * g
                params = _set_path(params, path,
                                   _set_rows(w, rows, w_rows - step))
            if pooled:
                # one kernel launch per starts-length group (uniform
                # criteo shapes -> a single launch for all 26 tables)
                by_n = {}
                for item in pooled:
                    by_n.setdefault(int(item[3].shape[0]), []).append(item)
                for _, group in sorted(by_n.items()):
                    outs = multi_scatter_rows(
                        [it[1] for it in group],
                        jnp.stack([it[2] for it in group]),
                        jnp.stack([it[3] for it in group]),
                        jnp.stack([jnp.asarray(it[4], jnp.int32)
                                   for it in group]),
                        L=2)
                    for it, out in zip(group, outs):
                        new_state[it[0]] = {"combined": out}
            return params, new_state

        return transform, row_update

    def _make_forward(self):
        module = self.module
        has_bn = bool(jax.tree_util.tree_leaves(self.batch_stats))

        def forward(params, batch_stats, X, training, rng):
            from .. import config as dc_config
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            mutable = ["batch_stats", "aux_loss"] if training else ["aux_loss"]
            rngs = {"dropout": rng} if training else None
            # trace-time training flag: ops below the module boundary
            # (EmbeddingDict gathers) pick inference-only lowerings
            # (e.g. the factorized one-hot) from it
            with dc_config.trace_training(training):
                y_pred, mutated = module.apply(variables, X,
                                               training=training,
                                               rngs=rngs, mutable=mutable)
            new_stats = mutated.get("batch_stats", batch_stats)
            aux = jnp.zeros((), jnp.float32)
            for leaf in jax.tree_util.tree_leaves(mutated.get("aux_loss", {})):
                aux = aux + jnp.sum(leaf)
            return y_pred, new_stats, aux
        return forward

    def _ensure_predict_fn(self):
        if self._predict_fn is not None:
            return
        forward = self._make_forward()

        def predict_step(params, batch_stats, X):
            y_pred, _, _ = forward(params, batch_stats, X, False,
                                   jax.random.PRNGKey(0))
            return y_pred
        self._predict_fn = jax.jit(predict_step)
        if self.mesh is not None and not self._sharding_applied:
            self._apply_sharding()

    def _ensure_compiled(self):
        if self._compiled:
            return
        if self.optim is None:
            raise RuntimeError("call model.compile(...) before fit()")
        optim = self._masked_optim
        loss_func = self.loss_func
        reg_fn = self._build_reg_fn()
        num_tasks = self.num_tasks
        forward = self._make_forward()
        active_rows = (self._make_active_rows() if self._sparse_specs
                       else None)
        sparse_paths = tuple(s[0] for s in self._sparse_specs)

        def compute_loss(y_pred, y, sw):
            if isinstance(loss_func, list):
                assert len(loss_func) == num_tasks, (
                    "the length of `loss_func` should be equal with "
                    "`self.num_tasks`")
                return sum(loss_func[i](y_pred[:, i], y[:, i], sw)
                           for i in range(num_tasks))
            if num_tasks > 1:
                return loss_func(y_pred, y, sw[:, None])
            return loss_func(y_pred.reshape(-1), y.reshape(-1), sw)

        def train_step(params, opt_state, table_state, batch_stats, rng, X,
                       y, sw):
            if active_rows is not None:
                transform, row_update = active_rows
                # substitute each sparse table with its touched-rows slice
                # and rewrite X's id columns to index the slice — autograd
                # then never sees (or materializes a gradient for) the
                # full table
                params_in, X, row_aux = transform(params, table_state, X)
            else:
                params_in = params

            def loss_fn(p):
                y_pred, new_stats, aux = forward(p, batch_stats, X, True, rng)
                data_loss = compute_loss(y_pred.astype(jnp.float32), y, sw)
                total = data_loss + reg_fn(p) + aux
                return total, (new_stats, data_loss, y_pred)
            (total, (new_stats, data_loss, y_pred)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params_in))
            updates, new_opt_state = optim.update(grads, opt_state, params_in)
            if active_rows is None:
                new_params = optax.apply_updates(params, updates)
            else:
                # sparse-updated tables bypass optax entirely: optax.masked
                # passes their updates through UNCHANGED (the raw small
                # gradient); keep the ORIGINAL full-table leaves and apply
                # the per-row update to them
                def _apply(path, p, u):
                    if _path_str(path) in sparse_paths:
                        return p
                    return optax.apply_updates(p, u)
                new_params = jax.tree_util.tree_map_with_path(
                    _apply, params, updates)
                new_params, table_state = row_update(
                    new_params, table_state, grads, row_aux)
            return (new_params, new_opt_state, table_state, new_stats,
                    data_loss, total, y_pred)

        donate = (0, 1, 2, 3)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        # the device-resident fit loop's jitted epoch runners close over
        # _train_step; rebuild them after any recompile
        self._epoch_runners = {}
        self._ensure_predict_fn()
        self._compiled = True
        self._apply_sharding()

    def _apply_sharding(self):
        if self.mesh is None or self._sharding_applied:
            return
        from ..parallel.sharding import (shard_variables, batch_sharding)
        # table_state arrays mirror table shapes, so they inherit the row
        # sharding through the same shape-matching placement as opt_state
        state = {"opt": getattr(self, "opt_state", None),
                 "tables": getattr(self, "table_state", {})}
        self.params, self.batch_stats, state = shard_variables(
            self.mesh, self.params, self.batch_stats, state,
            shard_embeddings=self.shard_embeddings)
        self.opt_state = state["opt"]
        self.table_state = state["tables"]
        self._batch_sharding = batch_sharding(self.mesh)
        self._sharding_applied = True

    def _put_batch(self, *arrays):
        if self.mesh is None:
            return arrays
        return tuple(jax.device_put(a, self._batch_sharding) for a in arrays)

    # ------------------------------------------------------------------
    # data plumbing
    # ------------------------------------------------------------------
    def _assemble_x(self, x):
        """dict/list of arrays -> one [N, input_dim] float32 matrix.

        Column-concat runs through the native batcher when built
        (deepctr_tpu/native); features with ``use_hash`` are hashed onto
        [0, vocabulary_size) here on the host (strings or ints)."""
        if isinstance(x, dict):
            x = [x[feature] for feature in self.feature_index]
        if isinstance(x, np.ndarray):
            x = [x]
        arrays = []
        for name, a in zip(self.feature_index, x):
            a = np.asarray(a)
            if a.ndim == 1:
                a = a[:, None]
            feat = self._hash_feats.get(name)
            if feat is not None:
                a = self._hash_feature(feat, a)
            arrays.append(np.asarray(a, dtype=np.float32))
        lens = {a.shape[0] for a in arrays}
        if len(lens) > 1:
            detail = ", ".join(
                "%s: %d" % (n, a.shape[0])
                for n, a in zip(self.feature_index, arrays))
            raise ValueError(
                "input features have inconsistent sample counts (%s)"
                % detail)
        X = native.assemble(arrays)
        if X.shape[1] != self.input_dim:
            raise ValueError("input width %d != expected %d"
                             % (X.shape[1], self.input_dim))
        return X

    def assemble_device_input(self, x):
        """dict/list of host arrays -> flat [N, input_dim] jax array on
        device.  Feed the result to :meth:`fit` / :meth:`predict` to use
        the device-resident loops (one upload, zero per-step host
        traffic)."""
        return jnp.asarray(self._assemble_x(x))

    @staticmethod
    def _hash_feature(feat, a):
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(np.int64)
        if np.issubdtype(a.dtype, np.integer):
            ids = native.hash_to_bucket(a, feat.vocabulary_size)
            # id 0 is the padding/mask value for sequence features
            if isinstance(feat, VarLenSparseFeat):
                ids = np.where(a == 0, 0, ids)
            return ids
        ids = native.hash_to_bucket(a, feat.vocabulary_size)
        if isinstance(feat, VarLenSparseFeat):
            empty = np.vectorize(lambda v: len(str(v)) == 0)(a)
            ids = np.where(empty, 0, ids)
        return ids

    # ------------------------------------------------------------------
    # fit / evaluate / predict
    # ------------------------------------------------------------------
    def fit(self, x=None, y=None, batch_size=None, epochs=1, verbose=1,
            initial_epoch=0, validation_split=0., validation_data=None,
            shuffle=True, callbacks=None, profile=None,
            steps_per_epoch=None):
        """Keras-style training loop; returns a History object.
        (reference parity: basemodel.py:137-309)

        TPU additions beyond the reference:
          * ``profile``: a directory path — captures a jax.profiler trace
            of the training loop for TensorBoard/XProf.
          * streaming input: ``x`` may be a zero-arg CALLABLE returning an
            iterator of ``(x_chunk, y_chunk)`` pairs (called once per
            epoch), for datasets larger than host memory.  Chunks may be
            any size; each is padded/split to ``batch_size`` steps.
            ``steps_per_epoch`` optionally caps the steps consumed.
        """
        if profile:
            jax.profiler.start_trace(profile)
        try:
            if callable(x):
                return self._fit_stream(x, batch_size, epochs, verbose,
                                        initial_epoch, validation_data,
                                        callbacks, steps_per_epoch, shuffle)
            if isinstance(x, jax.Array):
                return self._fit_device(x, y, batch_size, epochs, verbose,
                                        initial_epoch, validation_split,
                                        validation_data, shuffle, callbacks)
            return self._fit(x, y, batch_size, epochs, verbose,
                             initial_epoch, validation_split,
                             validation_data, shuffle, callbacks)
        finally:
            if profile:
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass

    def _fit_device(self, X, y, batch_size, epochs, verbose, initial_epoch,
                    validation_split, validation_data, shuffle, callbacks):
        """Device-resident training: pass ``x`` as a flat [N, input_dim]
        ``jax.Array`` (column order = ``get_feature_names``) and the WHOLE
        epoch runs inside one jitted ``lax.fori_loop`` — shuffle
        (``jax.random.permutation``), batch gather, and every train step
        happen on device; the host reads back one small loss vector per
        epoch.  This is the loop the headline bench numbers measure
        (bench.py) exposed through the public API: per-epoch cost is one
        dispatch instead of ``steps_per_epoch`` round-trips.

        Semantics vs :meth:`_fit` (kept: epoch callbacks, History,
        EarlyStopping/ModelCheckpoint, validation, epoch loss = sum of
        batch-sum losses / N):
          * train metrics are computed once over the epoch's predictions
            (gathered on device, one readback) instead of averaged over
            per-batch values — a deliberate improvement, noted here
            because the reference averages per-batch (SURVEY.md §2.3);
          * the trailing partial batch is padded on device and masked via
            sample weights, exactly like :meth:`_fit`.
        """
        if batch_size is None:
            batch_size = 256
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]
        if y.shape[0] != X.shape[0]:
            raise ValueError(
                "x and y have different sample counts: %d vs %d"
                % (X.shape[0], y.shape[0]))

        do_validation = False
        val_x, val_y = [], []
        if validation_data:
            do_validation = True
            val_x, val_y = validation_data[:2]
        elif validation_split and 0. < validation_split < 1.:
            do_validation = True
            split_at = int(X.shape[0] * (1. - validation_split))
            X, val_x = X[:split_at], X[split_at:]
            y, val_y = y[:split_at], y[split_at:]

        self._ensure_compiled()
        step = self._train_step.__wrapped__   # compose into the epoch jit
        B = batch_size
        sample_num = int(X.shape[0])
        steps_per_epoch = (sample_num - 1) // B + 1
        n_pad = steps_per_epoch * B
        sw = jnp.zeros((n_pad,), jnp.float32).at[:sample_num].set(1.0)
        if n_pad > sample_num:
            pad = n_pad - sample_num
            X = jnp.concatenate(
                [X, jnp.zeros((pad, X.shape[1]), X.dtype)])
            y = jnp.concatenate([y, jnp.zeros((pad, y.shape[1]), y.dtype)])
        if self.mesh is not None:
            X, y, sw = self._put_batch(X, y, sw)
        n_out = self.num_tasks
        do_shuffle = bool(shuffle)
        # epoch-long predictions are only read for train metrics; without
        # them the per-step [B, n_out] scatter and the [n_pad, n_out]
        # carry would survive in the hot loop (outputs can't be DCE'd)
        need_preds = bool(verbose > 0 and self.metrics)

        # A fresh closure per fit() call would defeat jax.jit's cache and
        # recompile the whole epoch every call (20-60s through the axon
        # tunnel) — cache the jitted runner per static epoch geometry;
        # _ensure_compiled resets the cache when the step fn changes.
        runner_key = (B, steps_per_epoch, n_pad, do_shuffle, n_out,
                      need_preds)
        run_epoch = self._epoch_runners.get(runner_key)
        if run_epoch is None:
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def run_epoch(params, opt_state, table_state, batch_stats, rng,
                          X, y, sw):
                perm = (jax.random.permutation(rng, n_pad) if do_shuffle
                        else jnp.arange(n_pad))

                def body(i, carry):
                    p, o, ts, bs, losses, preds = carry
                    idx = jax.lax.dynamic_slice(perm, (i * B,), (B,))
                    xb = jnp.take(X, idx, axis=0)
                    yb = jnp.take(y, idx, axis=0)
                    swb = jnp.take(sw, idx, axis=0)
                    rng_i = jax.random.fold_in(rng, i)
                    p, o, ts, bs, data_loss, total, y_pred = step(
                        p, o, ts, bs, rng_i, xb, yb, swb)
                    losses = losses.at[i].set(total)
                    if need_preds:
                        preds = preds.at[idx].set(
                            y_pred.reshape(B, -1).astype(jnp.float32))
                    return (p, o, ts, bs, losses, preds)

                init = (params, opt_state, table_state, batch_stats,
                        jnp.zeros((steps_per_epoch,), jnp.float32),
                        jnp.zeros((n_pad, n_out) if need_preds else (),
                                  jnp.float32))
                return jax.lax.fori_loop(0, steps_per_epoch, body, init)

            self._epoch_runners[runner_key] = run_epoch

        callbacks = CallbackList((callbacks or []) + [self.history])
        callbacks.set_model(self)
        callbacks.on_train_begin()
        self.stop_training = False
        base_rng = jax.random.PRNGKey(self.seed + 1)

        if verbose > 0:
            print("Train on {0} samples, validate on {1} samples, {2} steps "
                  "per epoch (device-resident loop)".format(
                      sample_num, len(val_y), steps_per_epoch))

        for epoch in range(initial_epoch, epochs):
            callbacks.on_epoch_begin(epoch)
            start_time = time.time()
            rng = jax.random.fold_in(base_rng, epoch)
            # validation/callbacks may have materialized combined-table
            # leaves (_sync_params); re-strip so the cached runner sees
            # the compiled [0, width] placeholder shapes
            self._strip_combined_leaves()
            (self.params, self.opt_state, self.table_state,
             self.batch_stats, losses, preds) = run_epoch(
                self.params, self.opt_state, self.table_state,
                self.batch_stats, rng, X, y, sw)
            self._mark_params_stale()
            epoch_logs = {
                "loss": float(jnp.sum(losses)) / sample_num}
            if verbose > 0 and self.metrics:
                y_np = np.asarray(y[:sample_num])
                p_np = np.asarray(preds[:sample_num]).astype("float64")
                if self.num_tasks == 1:
                    y_np, p_np = y_np.reshape(-1), p_np.reshape(-1)
                for name, metric_fun in self.metrics.items():
                    epoch_logs[name] = metric_fun(y_np, p_np)
            if do_validation:
                for name, result in self.evaluate(val_x, np.asarray(val_y),
                                                  batch_size).items():
                    epoch_logs["val_" + name] = result
            if verbose > 0:
                print("Epoch {0}/{1} - {2}s - loss: {3:.4f}".format(
                    epoch + 1, epochs, int(time.time() - start_time),
                    epoch_logs["loss"]) +
                    "".join(" - %s: %.4f" % (k, v)
                            for k, v in epoch_logs.items() if k != "loss"))
            callbacks.on_epoch_end(epoch, epoch_logs)
            if self.stop_training:
                break
        callbacks.on_train_end()
        return self.history

    def _fit_stream(self, make_iter, batch_size, epochs, verbose,
                    initial_epoch, validation_data, callbacks,
                    steps_per_epoch, shuffle=True):
        """Chunked/streaming training: one pass over ``make_iter()`` per
        epoch; each yielded (x_chunk, y_chunk) is assembled host-side
        and shuffled WITHIN the chunk (global shuffle of an out-of-core
        dataset is the data pipeline's job).

        Host/device DOUBLE BUFFERING (round-2 verdict #6 — the old loop
        was a synchronous parse -> upload -> step per batch, with a
        device sync on every step's ``float(total_loss)``):

          * a background thread runs the host half (iterator pull,
            native assembly, hashing, shuffle, padding) one chunk
            AHEAD, feeding a 2-deep queue;
          * each prepped chunk trains inside ONE jitted ``fori_loop``
            (per-chunk device-resident runner, cached per chunk
            geometry like the epoch runners), so dispatch overhead
            amortizes over the chunk and the device never waits on
            per-step readbacks — chunk losses stay on device until the
            epoch ends (one readback per chunk, deferred).

        Train metrics (verbose > 0) are computed once over the epoch's
        predictions, matching :meth:`_fit_device` (deliberate deviation
        from the reference's per-batch averaging, SURVEY.md §2.3)."""
        import queue as _queuemod
        import threading

        if batch_size is None:
            batch_size = 256
        self._ensure_compiled()
        step = self._train_step.__wrapped__
        B = batch_size
        base_rng = jax.random.PRNGKey(self.seed + 1)
        rng_shuffle = np.random.default_rng(self.seed)
        callbacks = CallbackList((callbacks or []) + [self.history])
        callbacks.set_model(self)
        callbacks.on_train_begin()
        self.stop_training = False
        need_preds = bool(verbose > 0 and self.metrics)
        n_out = self.num_tasks
        global_step = 0

        def get_runner(nb):
            key = ("stream", B, nb, n_out, need_preds)
            run = self._epoch_runners.get(key)
            if run is not None:
                return run

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def run(params, opt_state, table_state, batch_stats, rng,
                    X, y, sw):
                def body(i, carry):
                    p, o, ts, bs, losses, preds = carry
                    xb = jax.lax.dynamic_slice_in_dim(X, i * B, B)
                    yb = jax.lax.dynamic_slice_in_dim(y, i * B, B)
                    swb = jax.lax.dynamic_slice_in_dim(sw, i * B, B)
                    rng_i = jax.random.fold_in(rng, i)
                    p, o, ts, bs, _, total, y_pred = step(
                        p, o, ts, bs, rng_i, xb, yb, swb)
                    losses = losses.at[i].set(total)
                    if need_preds:
                        preds = jax.lax.dynamic_update_slice_in_dim(
                            preds,
                            y_pred.reshape(B, -1).astype(jnp.float32),
                            i * B, 0)
                    return (p, o, ts, bs, losses, preds)

                init = (params, opt_state, table_state, batch_stats,
                        jnp.zeros((nb,), jnp.float32),
                        jnp.zeros((nb * B, n_out) if need_preds else (),
                                  jnp.float32))
                return jax.lax.fori_loop(0, nb, body, init)

            self._epoch_runners[key] = run
            return run

        def prep_chunk(x_chunk, y_chunk):
            """Host half: assemble + shuffle + pad to a batch multiple."""
            X = self._assemble_x(x_chunk)
            yc = np.asarray(y_chunk, dtype=np.float32)
            if yc.ndim == 1:
                yc = yc[:, None]
            if shuffle:
                order = rng_shuffle.permutation(len(X))
                X, yc = X[order], yc[order]
            n = len(X)
            nb = (n - 1) // B + 1
            n_pad = nb * B
            sw = np.zeros(n_pad, np.float32)
            sw[:n] = 1.0
            if n_pad > n:
                X = np.concatenate(
                    [X, np.zeros((n_pad - n, X.shape[1]), np.float32)])
                yc = np.concatenate(
                    [yc, np.zeros((n_pad - n, yc.shape[1]), np.float32)])
            return X, yc, sw, n, nb

        for epoch in range(initial_epoch, epochs):
            callbacks.on_epoch_begin(epoch)
            start_time = time.time()
            self._strip_combined_leaves()   # see _fit_device epoch loop
            sample_num, steps = 0, 0
            loss_parts = []    # device arrays; read back once at epoch end
            pred_parts, y_parts = [], []
            q = _queuemod.Queue(maxsize=2)
            stop = threading.Event()

            def produce():
                try:
                    for x_chunk, y_chunk in make_iter():
                        if stop.is_set():
                            return
                        q.put(prep_chunk(x_chunk, y_chunk))
                    q.put(None)
                except BaseException as e:   # surfaced on the main thread
                    q.put(e)

            worker = threading.Thread(target=produce, daemon=True)
            worker.start()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    X, yc, sw, n, nb = item
                    if steps_per_epoch and steps + nb > steps_per_epoch:
                        nb = steps_per_epoch - steps
                        if nb <= 0:
                            stop.set()
                            break
                        X, yc, sw = X[:nb * B], yc[:nb * B], sw[:nb * B]
                        n = int(sw.sum())
                    Xd, yd, swd = self._put_batch(
                        jnp.asarray(X), jnp.asarray(yc), jnp.asarray(sw))
                    rng = jax.random.fold_in(base_rng, global_step)
                    (self.params, self.opt_state, self.table_state,
                     self.batch_stats, losses, preds) = get_runner(nb)(
                        self.params, self.opt_state, self.table_state,
                        self.batch_stats, rng, Xd, yd, swd)
                    loss_parts.append(losses)
                    if need_preds:
                        pred_parts.append(preds[:n])
                        y_parts.append(yc[:n])
                    global_step += nb
                    steps += nb
                    sample_num += n
                    if steps_per_epoch and steps >= steps_per_epoch:
                        stop.set()
                        break
            finally:
                # even on interrupt: any steps that ran leave combined-
                # storage params lagging table_state
                stop.set()
                self._mark_params_stale()
                worker.join(timeout=30)
            total_loss_epoch = float(sum(
                jnp.sum(l) for l in loss_parts)) if loss_parts else 0.0
            epoch_logs = {"loss": total_loss_epoch / max(sample_num, 1)}
            if need_preds and pred_parts:
                y_np = np.concatenate(y_parts)
                p_np = np.concatenate(
                    [np.asarray(p) for p in pred_parts]).astype("float64")
                if self.num_tasks == 1:
                    y_np, p_np = y_np.reshape(-1), p_np.reshape(-1)
                for name, metric_fun in self.metrics.items():
                    epoch_logs[name] = metric_fun(y_np, p_np)
            if validation_data:
                val_x, val_y = validation_data[:2]
                for name, result in self.evaluate(val_x, val_y,
                                                  batch_size).items():
                    epoch_logs["val_" + name] = result
            if verbose > 0:
                print("Epoch {0}/{1} - {2}s - {3} samples - loss: {4:.4f}"
                      .format(epoch + 1, epochs,
                              int(time.time() - start_time), sample_num,
                              epoch_logs["loss"]) +
                      "".join(" - %s: %.4f" % (k, v)
                              for k, v in epoch_logs.items()
                              if k != "loss"))
            callbacks.on_epoch_end(epoch, epoch_logs)
            if self.stop_training:
                break
        callbacks.on_train_end()
        return self.history

    def _fit(self, x, y, batch_size, epochs, verbose, initial_epoch,
             validation_split, validation_data, shuffle, callbacks):
        if isinstance(x, dict):
            x = [x[feature] for feature in self.feature_index]
        if isinstance(x, np.ndarray):
            x = [x]
        x = [np.asarray(a) for a in x]
        y = np.asarray(y)

        do_validation = False
        if validation_data:
            do_validation = True
            if len(validation_data) == 2:
                val_x, val_y = validation_data
            elif len(validation_data) == 3:
                val_x, val_y, _ = validation_data
            else:
                raise ValueError(
                    "When passing a `validation_data` argument, it must "
                    "contain either 2 items (x_val, y_val), or 3 items "
                    "(x_val, y_val, val_sample_weights)")
            if isinstance(val_x, dict):
                val_x = [val_x[feature] for feature in self.feature_index]
        elif validation_split and 0. < validation_split < 1.:
            do_validation = True
            split_at = int(x[0].shape[0] * (1. - validation_split))
            x, val_x = (slice_arrays(x, 0, split_at),
                        slice_arrays(x, split_at))
            y, val_y = (slice_arrays(y, 0, split_at),
                        slice_arrays(y, split_at))
        else:
            val_x, val_y = [], []

        X = self._assemble_x(x)
        y = np.asarray(y, dtype=np.float32)
        if y.ndim == 1:
            y = y[:, None]
        if y.shape[0] != X.shape[0]:
            raise ValueError(
                "x and y have different sample counts: %d vs %d"
                % (X.shape[0], y.shape[0]))

        if batch_size is None:
            batch_size = 256

        self._ensure_compiled()
        rng_shuffle = np.random.default_rng(self.seed)
        base_rng = jax.random.PRNGKey(self.seed + 1)

        sample_num = len(X)
        steps_per_epoch = (sample_num - 1) // batch_size + 1

        callbacks = CallbackList((callbacks or []) + [self.history])
        callbacks.set_model(self)
        callbacks.on_train_begin()
        self.stop_training = False

        if verbose > 0:
            print("Train on {0} samples, validate on {1} samples, {2} steps "
                  "per epoch".format(sample_num, len(val_y),
                                     steps_per_epoch))

        global_step = 0
        for epoch in range(initial_epoch, epochs):
            callbacks.on_epoch_begin(epoch)
            epoch_logs = {}
            start_time = time.time()
            self._strip_combined_leaves()   # see _fit_device epoch loop
            loss_epoch = 0.0
            total_loss_epoch = 0.0
            train_result = {}

            order = (rng_shuffle.permutation(sample_num) if shuffle
                     else np.arange(sample_num))
            iterator = range(steps_per_epoch)
            if verbose == 1 and tqdm is not None:
                iterator = tqdm(iterator, disable=False)
            try:
                for step in iterator:
                    idx = order[step * batch_size:(step + 1) * batch_size]
                    n_valid = len(idx)
                    if n_valid < batch_size:  # pad to the compiled shape
                        pad = np.zeros(batch_size - n_valid, dtype=idx.dtype)
                        idx = np.concatenate([idx, pad])
                    xb = X[idx]
                    yb = y[idx]
                    sw = np.zeros(batch_size, np.float32)
                    sw[:n_valid] = 1.0
                    rng = jax.random.fold_in(base_rng, global_step)
                    xb, yb, swb = self._put_batch(xb, yb, sw)
                    (self.params, self.opt_state, self.table_state,
                     self.batch_stats, data_loss, total_loss,
                     y_pred) = self._train_step(
                        self.params, self.opt_state, self.table_state,
                        self.batch_stats, rng, xb, yb, swb)
                    global_step += 1
                    loss_epoch += float(data_loss)
                    total_loss_epoch += float(total_loss)
                    if verbose > 0 and self.metrics:
                        y_np = np.asarray(yb)[:n_valid]
                        p_np = np.asarray(y_pred).astype("float64")[:n_valid]
                        if self.num_tasks == 1:
                            y_np = y_np.reshape(-1)
                            p_np = p_np.reshape(-1)
                        for name, metric_fun in self.metrics.items():
                            train_result.setdefault(name, []).append(
                                metric_fun(y_np, p_np))
            except KeyboardInterrupt:
                if hasattr(iterator, "close"):
                    iterator.close()
                raise
            finally:
                # even on interrupt: steps already ran, so the params
                # leaves of combined-storage tables lag table_state and a
                # later predict/save must re-sync
                self._mark_params_stale()
            if hasattr(iterator, "close"):
                iterator.close()

            epoch_logs["loss"] = total_loss_epoch / sample_num
            for name, result in train_result.items():
                epoch_logs[name] = np.sum(result) / steps_per_epoch

            if do_validation:
                eval_result = self.evaluate(val_x, val_y, batch_size)
                for name, result in eval_result.items():
                    epoch_logs["val_" + name] = result

            if verbose > 0:
                epoch_time = int(time.time() - start_time)
                print("Epoch {0}/{1}".format(epoch + 1, epochs))
                eval_str = "{0}s - loss: {1: .4f}".format(
                    epoch_time, epoch_logs["loss"])
                for name in self.metrics:
                    eval_str += " - " + name + ": {0: .4f}".format(
                        epoch_logs[name])
                if do_validation:
                    for name in self.metrics:
                        eval_str += (" - val_" + name + ": {0: .4f}".format(
                            epoch_logs["val_" + name]))
                print(eval_str)
            callbacks.on_epoch_end(epoch, epoch_logs)
            if self.stop_training:
                break
        callbacks.on_train_end()
        return self.history

    def evaluate(self, x, y, batch_size=256):
        """Metrics over full predictions. (parity: basemodel.py:311-323)

        Multi-task models additionally report each task separately as
        ``<task_name>_<metric>`` (the reference leaves per-task scoring to
        user code, examples/run_multitask_learning.py:60-65; surfacing it
        here lets History / EarlyStopping / ModelCheckpoint monitor e.g.
        ``val_ctr_auc``).  The bare metric name stays the across-task mean.
        """
        pred_ans = self.predict(x, batch_size)
        y = np.asarray(y)
        eval_result = {}
        for name, metric_fun in self.metrics.items():
            if self.num_tasks > 1 and y.ndim > 1 and y.shape[-1] > 1:
                task_names = list(getattr(self, "task_names", []) or
                                  ["task%d" % i for i in range(y.shape[-1])])
                vals = []
                for i in range(y.shape[-1]):
                    v = metric_fun(y[:, i], pred_ans[:, i])
                    eval_result["%s_%s" % (task_names[i], name)] = v
                    vals.append(v)
                eval_result[name] = float(np.mean(vals))
            else:
                eval_result[name] = metric_fun(y.reshape(-1),
                                               pred_ans.reshape(-1))
        return eval_result

    def predict(self, x, batch_size=256):
        """Batched inference -> float64 ndarray [N, out_dim].
        (parity: basemodel.py:325-352)

        ``x`` may also be a device-resident flat [N, input_dim]
        ``jax.Array`` (see :meth:`_fit_device`): batches are then sliced
        and padded on device and only predictions come back to the host.
        """
        self._sync_params()
        on_device = isinstance(x, jax.Array)
        X = x if on_device else self._assemble_x(x)
        if on_device and (X.ndim != 2 or X.shape[1] != self.input_dim):
            raise ValueError("device input must be [N, %d], got %r"
                             % (self.input_dim, X.shape))
        self._ensure_predict_fn()
        xp = jnp if on_device else np
        n = len(X)
        outs = []
        for start in range(0, n, batch_size):
            xb = X[start:start + batch_size]
            n_valid = len(xb)
            if n_valid < batch_size:
                xb = xp.concatenate(
                    [xb, xp.zeros((batch_size - n_valid, X.shape[1]),
                                  xp.float32)])
            if self.mesh is not None:
                xb = jax.device_put(xb, self._batch_sharding)
            y_pred = np.asarray(self._predict_fn(self.params,
                                                 self.batch_stats, xb))
            outs.append(y_pred[:n_valid])
        out = np.concatenate(outs).astype("float64")
        if out.ndim == 1:
            out = out[:, None]
        return out

    # ------------------------------------------------------------------
    # weights / persistence
    # ------------------------------------------------------------------
    def _mark_params_stale(self):
        """Called by the fit loops after training steps: combined-storage
        tables update only their (w | acc) buffer, leaving the params
        leaf lagging until the next _sync_params."""
        if "__arena__" in getattr(self, "table_state", {}) or any(
                isinstance(self.table_state.get(spec[0]), dict)
                and ("combined" in self.table_state[spec[0]]
                     or "combined3" in self.table_state[spec[0]])
                for spec in getattr(self, "_sparse_specs", [])):
            self._params_stale = True

    def _combined_table_paths(self):
        """Param paths whose weights live in combined storage (the
        interleaved (w | acc)/(w | m | v) buffers or the arena)."""
        paths = set(p for p, _, _ in getattr(self, "_arena_layout", []))
        for spec in getattr(self, "_sparse_specs", []):
            st = getattr(self, "table_state", {}).get(spec[0])
            if isinstance(st, dict) and ("combined" in st
                                         or "combined3" in st):
                paths.add(spec[0])
        return paths

    def _strip_combined_leaves(self):
        """Drop combined-storage tables' params leaves to [0, width]
        placeholders (round-4 verdict #2).

        During training those weights live ONLY in table_state's
        interleaved buffer — the train step never reads the params leaf
        (the active-rows transform gathers touched rows straight from
        the combined buffer and substitutes the slice) — so a full
        params copy is pure duplication: ~2.5 GB of the 9.2 GB step
        arguments at criteo_real adam.  The placeholder keeps the
        pytree STRUCTURE (jit/runner caches stay warm) while freeing
        the buffer; any read path (predict/evaluate/get_weights/
        checkpoint/serving) materializes on demand via _sync_params,
        and the fit loops re-strip before the next epoch."""
        stripped = False
        for path in self._combined_table_paths():
            w = _get_path(self.params, path)
            if w.shape[0] != 0:
                self.params = _set_path(
                    self.params, path, jnp.zeros((0,) + w.shape[1:],
                                                 w.dtype))
                stripped = True
        if stripped:
            self._params_stale = True

    def _sync_params(self):
        """Copy the weight lanes of combined-storage tables back into
        params (cheap lane slice, once per epoch/read — never per step)."""
        if not getattr(self, "_params_stale", False):
            return
        arena = self.table_state.get("__arena__")
        for path, base, n_rows in getattr(self, "_arena_layout", []):
            self.params = _set_path(
                self.params, path,
                arena[2 * base:2 * (base + n_rows):2])
        for spec in self._sparse_specs:
            st = self.table_state.get(spec[0])
            if isinstance(st, dict) and "combined" in st:
                self.params = _set_path(self.params, spec[0],
                                        st["combined"][::2])
            elif isinstance(st, dict) and "combined3" in st:
                self.params = _set_path(self.params, spec[0],
                                        st["combined3"][::3])
        self._params_stale = False

    def get_weights(self):
        self._sync_params()
        return {"params": serialization.tree_to_numpy(self.params),
                "batch_stats": serialization.tree_to_numpy(self.batch_stats)}

    def set_weights(self, weights):
        self._params_stale = False
        self.params = jax.tree_util.tree_map(jnp.asarray, weights["params"])
        self.batch_stats = jax.tree_util.tree_map(
            jnp.asarray, weights.get("batch_stats", {}))
        if getattr(self, "optim", None) is not None:
            self.opt_state = self._masked_optim.init(self.params)
            self.table_state = self._build_table_state()
            self._strip_combined_leaves()
        self._sharding_applied = False
        if self._compiled:
            self._apply_sharding()

    # torch-flavored aliases used throughout the reference test-suite
    def state_dict(self):
        return self.get_weights()

    def load_state_dict(self, weights):
        self.set_weights(weights)

    def save_weights(self, path):
        serialization.save_weights(self, path)

    def load_weights(self, path):
        serialization.load_weights(self, path)

    def save(self, path):
        serialization.save_model(self, path)

    def save_checkpoint(self, directory, include_optimizer=True):
        """Orbax train-state checkpoint (params + optimizer state) for
        exact resume — the reference never checkpoints optimizer state."""
        self._sync_params()
        serialization.save_checkpoint(self, directory, include_optimizer)

    def load_checkpoint(self, directory):
        return serialization.load_checkpoint(self, directory)

    # ------------------------------------------------------------------
    # misc parity helpers
    # ------------------------------------------------------------------
    def compute_input_dim(self, feature_columns, include_sparse=True,
                          include_dense=True, feature_group=False):
        return compute_input_dim(feature_columns, include_sparse,
                                 include_dense, feature_group)

    @property
    def embedding_size(self):
        return embedding_size_of(self.dnn_feature_columns)

    def _capture_init_args(self, local_vars):
        """Record constructor kwargs so whole-model save/load can rebuild.
        (`mesh` is excluded — device meshes are process-local, re-supply on
        load.)"""
        drop = {"self", "__class__", "mesh"}
        self._init_kwargs = {k: v for k, v in local_vars.items()
                             if k not in drop}


def _flatten_with_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            out.extend(_flatten_with_paths(tree[k], prefix + (k,)))
    else:
        out.append(("/".join(prefix), tree))
    return out


def _get_path(tree, path):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def _set_path(tree, path, value):
    """Return a copy of a nested-dict pytree with ``path`` replaced."""
    keys = path.split("/")
    if len(keys) == 1:
        out = dict(tree)
        out[keys[0]] = value
        return out
    out = dict(tree)
    out[keys[0]] = _set_path(tree[keys[0]], "/".join(keys[1:]), value)
    return out


def _path_str(key_path):
    """jax tree_map_with_path key tuple -> 'a/b/c'."""
    return "/".join(str(getattr(k, "key", k)) for k in key_path)
