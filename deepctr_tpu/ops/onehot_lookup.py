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
