"""Small-table row lookup as an explicit bf16 one-hot matmul with f32
accumulation.

XLA lowers small-table gathers to one-hot matmuls itself, but with f32
tables the matmul runs the MXU at ~1/4 the bf16 rate — at vocab 1M the
active-rows step's 26 substituted [5120, 128] lookups cost ~140
GFLOP/step of f32 one-hot matmul, the dominant forward cost
(tools/fwd_bisect.py; PLAN.md round-2 notes).

Two possible fixes:

* ``DEEPCTR_GATHER_CAST=1`` (EmbeddingDict._gather): cast the table to
  bf16 before the take.  Fast, but the take's VJP then scatter-adds
  duplicate-id cotangents in bf16.
* THIS op: ``onehot_lookup(table, ids)`` writes the one-hot matmul
  explicitly with bf16 operands and ``preferred_element_type=f32`` —
  the MXU natively multiplies bf16 and ACCUMULATES in f32, so the
  forward runs at bf16 rate while duplicate-id gradients still sum in
  f32 (the transpose matmul also accumulates f32).  Values are
  bf16-rounded exactly once, same as the downstream compute cast.

The custom_vjp keeps the backward a bf16xbf16->f32 matmul too: the
incoming f32 cotangent is rounded to bf16 per-element, then the
per-duplicate SUM happens inside the dot in f32.  Per-element bf16
rounding of cotangents matches what any bf16 activation path already
implies; what this op protects is the accumulation across a batch's
repeated ids (hot features repeat thousands of times per 4096-batch).

Enabled per-call by EmbeddingDict._gather when
``DEEPCTR_GATHER_MODE=onehot`` (A/B vs "cast" and "off" on the real
TPU; see tools/when_tpu_returns.sh).
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["onehot_lookup"]


def _onehot(ids, rows, dtype):
    # iota + compare + convert — the same HLO XLA's own gather->matmul
    # rewrite produces, consumed by the matmul emitters without
    # materializing the [n, rows] plane in HBM
    return jax.nn.one_hot(ids, rows, dtype=dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def onehot_lookup(table, ids):
    """rows = table[ids] for int ids [n] over table [R, W] (R small).

    Forward: onehot(ids) @ table in bf16 with f32 accumulation; returns
    bf16 (the compute dtype the caller would cast to anyway).
    """
    return _fwd(table, ids)[0]


def _fwd(table, ids):
    oh = _onehot(ids, table.shape[0], jnp.bfloat16)
    rows = jax.lax.dot_general(
        oh, table.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return rows.astype(jnp.bfloat16), (ids, table.shape[0])


def _bwd(res, g):
    ids, n_rows = res
    oh = _onehot(ids, n_rows, jnp.bfloat16)
    # [R, n] @ [n, W] with f32 accumulation: duplicate-id cotangents sum
    # exactly (up to the one bf16 rounding of each cotangent element)
    grad_table = jax.lax.dot_general(
        oh, g.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return grad_table, None


onehot_lookup.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# factorized forward (INFERENCE dispatch)
# --------------------------------------------------------------------------
# id = hi * V2 + lo factors the [n, R] one-hot into onehot(hi) [n, V1]
# against table.reshape(V1, V2*W) plus a VPU-cheap einsum with
# onehot(lo).  FLOPs are identical (stage-1 alone costs the direct
# form's MACs) but the stage-1 output is V2*W lanes wide, so the MXU
# tiles fully where the direct form's W-wide output (W=16..32) wastes
# 3/4+ of each 128-lane tile — measured 1.30x on the forward at the
# DIEN-256 lookup shape (BASELINE.md round-5, tools/
# factorized_onehot_micro.py).  The BACKWARD of the factorized form
# must materialize the [n, V2*W] cotangent (2.7x WORSE, measured), so
# this variant keeps the DIRECT backward via custom_vjp — the table
# cotangent (sum of g rows per id) is lowering-independent — and the
# gather site only dispatches it on inference traces anyway
# (config.is_training_trace()).

def _factor_v2(n_rows, width):
    """Pick V2 so the stage-1 output is a few full MXU tiles wide."""
    v2 = max(1, 1024 // max(width, 1))
    return min(v2, n_rows)


def factorized_supported(n_rows, width):
    v2 = _factor_v2(n_rows, width)
    # need a real factorization (v2 > 1) and a stage-1 contraction that
    # is actually smaller than the direct one to win the lane economics
    return v2 > 1 and n_rows // v2 >= 2


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def onehot_lookup_factorized(table, ids):
    """rows = table[ids] — factorized bf16 one-hot forward, direct
    backward.  Numerically: each output element is an f32 accumulation
    of bf16 products selecting one row, same as the direct form."""
    return _fwd_fact(table, ids)[0]


def _fwd_fact(table, ids):
    R, W = table.shape
    V2 = _factor_v2(R, W)
    V1 = -(-R // V2)
    pad = V1 * V2 - R
    t = table.astype(jnp.bfloat16)
    if pad:
        t = jnp.concatenate(
            [t, jnp.zeros((pad, W), jnp.bfloat16)], axis=0)
    hi = ids // V2
    lo = ids % V2
    stage1 = jax.lax.dot_general(
        _onehot(hi, V1, jnp.bfloat16), t.reshape(V1, V2 * W),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [n, V2*W] f32
    oh_lo = _onehot(lo, V2, jnp.float32)
    rows = jnp.einsum("nvw,nv->nw", stage1.reshape(-1, V2, W), oh_lo)
    return rows.astype(jnp.bfloat16), (ids, R)


onehot_lookup_factorized.defvjp(_fwd_fact, _bwd)
