"""Global framework configuration.

Unlike the reference (which inherits dtype/device decisions from torch
defaults), TPU performance is dominated by (a) whether matmuls run in
bfloat16 on the MXU and (b) whether Pallas kernels are used for the hot
interaction ops.  Both are process-wide switches read at *model build* time.
"""

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32
_USE_PALLAS = "auto"  # "auto" | True | False


def set_compute_dtype(dtype):
    """Set the activation/matmul compute dtype (params stay float32).

    Use ``set_compute_dtype('bfloat16')`` before building a model to run
    every Dense/interaction matmul on the MXU in bf16.
    """
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if not isinstance(dtype, str) else jnp.dtype(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE


# Trace-time training flag: set by BaseModel._make_forward around
# module.apply so ops below the module boundary (EmbeddingDict gathers)
# can pick inference-only lowerings at TRACE time (no runtime cost; the
# train step and the predict fn are separate traces).  Defaults to
# True — training semantics are never changed by an unset flag.
_TRACE_TRAINING = True


def trace_training(flag):
    """Context manager marking the current trace as training/inference."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        global _TRACE_TRAINING
        prev = _TRACE_TRAINING
        _TRACE_TRAINING = bool(flag)
        try:
            yield
        finally:
            _TRACE_TRAINING = prev
    return _cm()


def is_training_trace():
    return _TRACE_TRAINING


def set_use_pallas(mode):
    """Control Pallas kernel dispatch: True / False / 'auto' (TPU only)."""
    global _USE_PALLAS
    assert mode in (True, False, "auto")
    _USE_PALLAS = mode


def use_pallas():
    """Resolve the Pallas switch against the current default backend."""
    if _USE_PALLAS == "auto":
        import jax
        try:
            return jax.default_backend() not in ("cpu", "gpu")
        except Exception:
            return False
    return _USE_PALLAS


def use_pallas_explicit():
    """True only when the user explicitly enabled Pallas (not 'auto') —
    used by ops whose kernels win isolated but lose inside the fused
    train step (see ops/dispatch.py)."""
    return _USE_PALLAS is True


# --------------------------------------------------------------------------
# Small-table gather lowering under bf16 compute (inputs.EmbeddingDict).
# XLA lowers small-table gathers as one-hot matmuls; with f32 tables the
# MXU runs at ~1/4 the bf16 rate (see EmbeddingDict._gather docstring).
#   "off"    — plain f32 take (XLA decides everything)
#   "cast"   — cast the table to bf16 before the take (bf16 matmul rate,
#              bf16 duplicate-id grad accumulation)
#   "onehot" — explicit bf16 one-hot matmul, f32 accumulation both
#              directions (ops/onehot_lookup.py)
#   "auto"   — measured winner per call site (TPU v5e end-to-end A/B,
#              TPU_QUEUE_RESULTS.md 2026-08-19): "cast" for active-rows
#              substituted slices of BIG (packed) tables (DeepFM vocab
#              1M: 450.1k vs 440.4k off vs 398.7k onehot ex/s/chip),
#              "off" everywhere else — full small tables (standard
#              shape: 1.543M off vs 1.464M cast vs 1.443M onehot) AND
#              substituted slices of small tables: cast lost on small
#              tables in the measured leg, and duplicate-id cotangents
#              accumulating in bf16 are exactly dense at small vocab
#              (~1.4k dups/row for vocab 3 at B=4096).  At big vocab
#              duplicates are rare (~4k draws of >=131k rows) and the
#              slice writeback re-rounds to the f32 table either way.
# DEEPCTR_GATHER_MODE env overrides (A/B without code changes).
# --------------------------------------------------------------------------
_GATHER_MODE = "auto"


def set_gather_mode(mode):
    """Select the small-table gather lowering: 'auto'|'off'|'cast'|'onehot'."""
    global _GATHER_MODE
    assert mode in ("auto", "off", "cast", "onehot")
    _GATHER_MODE = mode


# "auto" flips ALL of a model's full-small-table lookups to the
# explicit bf16 one-hot matmul (f32 accumulation) once the model's
# LARGEST lookup carries at least this many ids: sequence models read
# [B*maxlen] ids per history table, and XLA's native f32 lowering
# loses 14-37% end-to-end there (TPU v5e A/B 2026-08-19: DIN/DIEN
# maxlen 50-256, onehot wins every leg — DIN-256 94.1k->128.7k,
# DIEN-100 105.3k->144.0k ex/s/chip; at 16384 ids "off" still wins
# slightly, 2.125M vs 2.062M, and at the 4096-id standard shape by
# ~6%.  Crossover is between 16k and 51k ids; 32768 is the
# conservative pick).  The decision is model-level, not per-lookup:
# mixing lowering styles within one model measured slower than either
# pure style (DIN-50 same-session: off 665.7k / mixed 655.1k /
# all-onehot 752.6k).  Override with DEEPCTR_ONEHOT_MIN_IDS.
_ONEHOT_MIN_IDS = 32768


def gather_mode(substituted=False, big=False, n_ids=None,
                table_shape=None):
    """Resolve the small-table gather mode (env override > config).

    ``substituted`` says whether the lookup target is an active-rows
    substituted slice (vs a full small table); ``big`` whether the
    DECLARED table is packed-storage scale; ``n_ids`` the id count of
    the MODEL'S LARGEST lookup (B * max maxlen — model-level on
    purpose, see the block comment above); ``table_shape`` the stored
    [rows, width] of THIS table.  "auto" resolves to the per-regime
    A/B winner: "cast" for substituted slices of big tables; "onehot"
    for full small tables whenever the FACTORIZED forward supports the
    shape (TPU v5e 2026-08-20: the factorized bf16 one-hot beat XLA's
    own gather lowering at the 4096-id standard shape by +38-40% —
    1.82M -> 2.55M ex/s/chip, interleaved pairs — flipping round-3's
    direct-one-hot crossover, which only won at >= 32768 ids) or, for
    unsupported-but-sequence-scale lookups, the direct one-hot;
    "off" otherwise (tiny tables at small id counts: forcing onehot
    everywhere measured -7.5% at criteo_real)."""
    import os
    env = os.environ.get("DEEPCTR_GATHER_MODE")
    if env:
        if env not in ("auto", "off", "cast", "onehot"):
            raise ValueError(
                "DEEPCTR_GATHER_MODE=%r — must be auto|off|cast|onehot "
                "(a typo here would silently measure the wrong A/B leg)"
                % env)
        mode = env
    elif os.environ.get("DEEPCTR_GATHER_CAST") == "1":   # legacy knob
        mode = "cast"
    else:
        mode = _GATHER_MODE
    if mode == "auto":
        if substituted and big:
            return "cast"
        min_ids = int(os.environ.get("DEEPCTR_ONEHOT_MIN_IDS",
                                     _ONEHOT_MIN_IDS))
        if not substituted and n_ids is not None and n_ids >= min_ids:
            return "onehot"
        if (not substituted and table_shape is not None
                and os.environ.get("DEEPCTR_FACTORIZED_ONEHOT",
                                   "all") == "all"):
            rows, width = table_shape
            v2 = min(rows, max(1, 1024 // max(width, 1)))
            if v2 > 1 and rows // v2 >= 2:   # factorized-supported
                return "onehot"
        return "off"
    return mode


# --------------------------------------------------------------------------
# Fused Pallas (AU)GRU scan dispatch (ops/pallas_gru.py) for
# MaskedGRU / DynamicGRU: the whole recurrence in one pallas_call.
#   "auto"      — measured default (see gru_kernel(): currently the
#                 lax.scan — the kernel lost/washed the end-to-end A/B)
#   True/False  — force on/off
#   "interpret" — kernel via the Pallas interpreter (CPU golden tests)
# DEEPCTR_GRU_KERNEL env overrides (0|1|auto|interpret) for A/Bs.
# --------------------------------------------------------------------------
_GRU_KERNEL = "auto"


def set_gru_kernel(mode):
    """Control the fused Pallas GRU scan: True/False/'auto'/'interpret'."""
    global _GRU_KERNEL
    assert mode in (True, False, "auto", "interpret")
    _GRU_KERNEL = mode


# inference-only auto dispatch gate (T <= this uses the kernel's
# no-carry forward).  DISABLED (0): a single T=56 micro read the kernel
# forward at 0.043 vs scan 0.158ms, but the same-session follow-up grid
# (T = 48, 63, 96, 128, 192 — tools/gru_kernel_micro.py 2026-08-20)
# shows the kernel forward LOSING at every T (e.g. 48: 0.108 vs 0.070;
# 63: 0.210 vs 0.139; 96: 0.412 vs 0.190) — the T=56 reading was a
# one-off artifact.  The dispatch plumbing stays (training-aware gate,
# forced modes) so a future win only needs this constant.
_GRU_INFER_MAX_T = 0


def gru_kernel(training=True, T=None):
    """Resolve the GRU-kernel switch -> False | 'compiled' | 'interpret'.

    TRAINING 'auto' resolves to False (the masked lax.scan): the
    end-to-end A/B on a real v5e (2026-08-20, tools/gru_kernel_ab.py,
    same-session pairs inside the full DIEN train step) measured the
    fused kernel 0.74x at maxlen 50, 0.79x at 100, 1.01x at 256, 1.00x
    at 512 — a LOSS at short history and a wash at long.  The kernel is
    numerically proven (tests/ops/test_gru.py golden tests; real-chip
    numeric check f32-fwd bit-exact vs the oracle) and remains a forced
    A/B variant (DEEPCTR_GRU_KERNEL=1).

    INFERENCE 'auto' would dispatch the kernel on TPU when ``T`` is at
    or below _GRU_INFER_MAX_T — currently 0 (disabled): the follow-up
    micro grid showed the scan winning the forward at every measured T
    (see the constant's comment).
    """
    import os
    env = os.environ.get("DEEPCTR_GRU_KERNEL")
    mode = _GRU_KERNEL
    if env is not None:
        mode = {"0": False, "1": True, "auto": "auto",
                "interpret": "interpret"}.get(env)
        if mode is None:
            raise ValueError(
                "DEEPCTR_GRU_KERNEL=%r — must be 0|1|auto|interpret" % env)
    if mode == "auto":
        if training or T is None or T > _GRU_INFER_MAX_T:
            mode = False
        else:
            import jax
            try:
                mode = jax.default_backend() not in ("cpu", "gpu")
            except Exception:
                mode = False
    if mode is True:
        # Forced-on (DEEPCTR_GRU_KERNEL=1 / set_gru_kernel(True)) off
        # TPU would die at Mosaic compile time with an opaque error;
        # degrade to the interpreter, which is slow but numerically
        # the same kernel (advisor r4).
        import jax
        try:
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
        except Exception:
            on_tpu = False
        return "compiled" if on_tpu else "interpret"
    return mode or False


# --------------------------------------------------------------------------
# Sharded-embedding lookup exchange (mesh runs only).
#   "gspmd" — default: plain gather, XLA's sharding propagation inserts
#             the exchange it derives from the table/batch shardings.
#   "psum"  — explicit shard_map: every shard gathers its own rows,
#             one all-reduce over the 'model' axis (parallel/embedding.py).
#   "a2a"   — explicit shard_map all_to_all routing with static capacity
#             ceil(B/M)*slack; ids beyond a bucket's capacity DROP to zero
#             rows (loud counting available via a2a_lookup directly).
# --------------------------------------------------------------------------
_EMBEDDING_EXCHANGE = "gspmd"
_EXCHANGE_MESH = None
_A2A_SLACK = 2.0
_A2A_ON_OVERFLOW = "error"


def set_embedding_exchange(mode, mesh=None, a2a_slack=2.0,
                           on_overflow="error"):
    """Select how row-sharded embedding lookups exchange rows on a mesh.

    ``mesh`` is required for the explicit modes (shard_map needs it);
    read at model TRACE time, so set this before the first fit/predict.

    ``on_overflow`` (a2a only): capacity overflow is data-dependent
    inside jit, so it cannot raise —
      "error" (default): POISON the lookup with NaN so the first
          overflowing step fails unmissably (NaN loss) instead of
          silently training on zero rows; raise ``a2a_slack`` to fix.
      "drop": keep the zero-row semantics (capacity sampling) —
          explicit opt-in, ids beyond a bucket's capacity embed as 0.
    """
    global _EMBEDDING_EXCHANGE, _EXCHANGE_MESH, _A2A_SLACK, \
        _A2A_ON_OVERFLOW
    assert mode in ("gspmd", "psum", "a2a")
    assert on_overflow in ("error", "drop")
    if mode != "gspmd" and mesh is None:
        raise ValueError("explicit exchange modes need the mesh")
    _EMBEDDING_EXCHANGE = mode
    _EXCHANGE_MESH = mesh
    _A2A_SLACK = float(a2a_slack)
    _A2A_ON_OVERFLOW = on_overflow


def embedding_exchange():
    return _EMBEDDING_EXCHANGE, _EXCHANGE_MESH, _A2A_SLACK


def a2a_on_overflow():
    return _A2A_ON_OVERFLOW
