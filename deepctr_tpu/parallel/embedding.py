"""Explicit-collective sharded embedding lookup (shard_map).

The default multi-chip path lets GSPMD propagate shardings through the
jitted step (parallel/sharding.py): a `NamedSharding(('model', None))`
table makes XLA insert the lookup exchange automatically.  This module is
the EXPLICIT alternative — the collectives are written out — for cases
where GSPMD's choice is poor or the schedule must be controlled
(SURVEY.md §5.8: "row-sharded tables with all-to-all lookup exchange").

Two exchanges are provided:

* ``psum_lookup`` — every device gathers the rows it owns (out-of-range
  ids contribute zeros) and the partial results are summed over the
  'model' axis.  Traffic: B*E per device per step, one all-reduce.  Best
  for CTR-sized embedding dims (E <= 64): the rows are small and the
  all-reduce rides ICI.
* ``a2a_lookup`` — ids are bucketed by owner with a static per-device
  capacity, exchanged with `all_to_all`, gathered locally, and exchanged
  back.  Traffic: B*E/M + B ids; wins when E is large or the model axis
  is wide.  Capacity is `ceil(B/M) * slack` — overflow ids fall back to
  zeros (callers should size slack for their id skew).
"""

import functools
import math

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
    _CHECK_KW = "check_vma"   # jax >= 0.8 name for replication checking
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
    _CHECK_KW = "check_rep"
from jax.sharding import PartitionSpec as P


def psum_lookup(mesh, sharded_table, ids, axis="model"):
    """sharded_table [V, E] row-sharded over ``axis``; ids int32 [...].
    Returns [..., E] replicated over ``axis``."""
    M = mesh.shape[axis]
    V = sharded_table.shape[0]
    rows_per = V // M

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P()), out_specs=P())
    def f(local_table, flat_ids):
        my = jax.lax.axis_index(axis)
        local = flat_ids - my * rows_per
        in_range = (local >= 0) & (local < rows_per)
        rows = jnp.take(local_table,
                        jnp.clip(local, 0, rows_per - 1), axis=0)
        rows = rows * in_range[:, None].astype(rows.dtype)
        return jax.lax.psum(rows, axis)

    flat = ids.reshape(-1)
    out = f(sharded_table, flat)
    return out.reshape(ids.shape + (sharded_table.shape[1],))


def a2a_lookup(mesh, sharded_table, ids, axis="model", slack=2.0,
               return_overflow=False):
    """all_to_all exchange: route each id to its owning shard, gather
    there, route the rows back.  Static capacity ``ceil(B/M)*slack`` per
    (src, dst) pair; ids beyond a bucket's capacity return zero rows
    (their writes are routed out of bounds and DROPPED — they can never
    clobber a valid id's slot).

    Capacity overflow is a data-dependent event inside jit, so it cannot
    raise; with ``return_overflow=True`` the call also returns the number
    of dropped ids as an int32 scalar.  The engine's a2a backend
    (inputs.EmbeddingDict._gather) consumes it: by default it POISONS
    the looked-up rows with NaN when any id dropped, so overflow fails
    loudly at the first step; ``set_embedding_exchange(...,
    on_overflow="drop")`` opts into the silent zero-row semantics."""
    M = mesh.shape[axis]
    V, E = sharded_table.shape
    rows_per = V // M
    flat = ids.reshape(-1)
    B = flat.shape[0]
    cap = int(math.ceil(B / M) * slack)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P()), out_specs=(P(), P()),
        # replication through all_to_all is by construction (ids
        # replicated => symmetric exchange) but not statically inferable
        **{_CHECK_KW: False})
    def f(local_table, flat_ids):
        owner = jnp.clip(flat_ids // rows_per, 0, M - 1)      # [B]
        # slot of each id within its owner's bucket
        onehot = jax.nn.one_hot(owner, M, dtype=jnp.int32)    # [B, M]
        slot = jnp.cumsum(onehot, axis=0)[jnp.arange(B), owner] - 1
        ok = slot < cap
        # bucketed ids [M, cap]; overflow slots index column `cap`, out of
        # bounds, so mode="drop" discards them instead of overwriting the
        # legitimate occupant of the last slot
        buckets = jnp.zeros((M, cap), jnp.int32)
        buckets = buckets.at[owner, jnp.where(ok, slot, cap)].set(
            flat_ids, mode="drop")
        # exchange: dim 0 is the destination shard
        recv = jax.lax.all_to_all(buckets, axis, 0, 0,
                                  tiled=True)                 # [M, cap]
        my = jax.lax.axis_index(axis)
        local = jnp.clip(recv - my * rows_per, 0, rows_per - 1)
        rows = jnp.take(local_table, local.reshape(-1),
                        axis=0).reshape(M, cap, E)
        rows_back = jax.lax.all_to_all(rows, axis, 0, 0,
                                       tiled=True)            # [M, cap, E]
        out = rows_back[owner, jnp.where(ok, slot, 0)]
        out = out * ok[:, None].astype(rows_back.dtype)
        n_dropped = jnp.sum((~ok).astype(jnp.int32))
        return out, n_dropped

    out, n_dropped = f(sharded_table, flat)
    out = out.reshape(ids.shape + (E,))
    if return_overflow:
        return out, n_dropped
    return out
