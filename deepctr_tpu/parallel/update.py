"""Shard-local sparse table updates for ROW-SHARDED combined storage.

Round-2 verdict #3: `shard_embeddings=True` used to disable combined
(w | acc) storage and every Pallas update kernel — GSPMD would have to
replicate a pallas_call's operands (a full-table all-gather per step)
— silently reverting the production multi-chip big-vocab configuration
to the measured-slow XLA row scatter.  This module keeps the combined
layout and wraps the update in `shard_map`, where partitioning is
manual and the kernel is legal: every shard

  1. finds its contiguous slot range [lo, hi) in the globally SORTED
     pair-row starts (searchsorted against its row base),
  2. rolls starts/grads/current-rows so its range is a valid prefix,
  3. gathers its LOCAL accumulator rows, runs the adagrad math, and
  4. writes back with the per-table write-only Pallas scatter kernel
     (ops/pallas_update.scatter_rows) on TPU, or an XLA ``mode="drop"``
     scatter elsewhere (the CPU dryrun path).

No collective appears anywhere: the update is row-local by
construction (each touched row's gradient and old value are replicated
inputs; its accumulator lives only on the owner shard).

Reference frame: the reference has no distributed update at all
(deepctr_torch/models/basemodel.py:206-209 is single-process
DataParallel); this subsystem is the north star's "table gradients
apply sparsely on the sharded tables" requirement.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax.experimental.shard_map import shard_map
except ImportError:  # jax >= 0.6 moved it
    from jax.sharding import shard_map

# shard_map replication checking kwarg was renamed across jax versions
import inspect as _inspect
_CHECK_KW = ("check_vma" if "check_vma"
             in _inspect.signature(shard_map).parameters else "check_rep")


def sharded_combined_update(mesh, combined, g, w_rows, starts, n_valid,
                            l2_vec, lr, eps, axis="model"):
    """Adagrad update of interleaved (w, acc) pair storage sharded
    P(axis, None) over ``mesh``.

    combined: [2R, 128] f32, rows sharded over ``axis`` (pairs stay
    co-located: caller guarantees R %% mesh.shape[axis] == 0);
    g, w_rows: [n, 128] gradient / current-value rows (replicated);
    starts: [n] int32 PAIR-row starts (= packed row * 2), sorted, valid
    prefix ``n_valid`` (padding entries are out of bounds and sorted
    above every real start); l2_vec: [128] lazy-L2 lane strengths.
    Returns the updated combined buffer (same sharding).
    """
    from .. import config as dc_config
    from ..ops.pallas_update import scatter_rows, scatter_rows_supported

    M = mesh.shape[axis]
    local_rows = combined.shape[0] // M
    use_kernel = dc_config.use_pallas()
    lr = float(lr)
    eps = float(eps)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P()),
        out_specs=P(axis, None),
        **{_CHECK_KW: False})
    def f(local_comb, g, w_rows, starts, nv):
        my = jax.lax.axis_index(axis)
        base = my * local_rows
        nv = nv[0]
        # this shard's slot range in the sorted starts, clipped to the
        # valid prefix (padding starts sort above every real one)
        lo = jnp.minimum(jnp.searchsorted(starts, base), nv)
        hi = jnp.minimum(jnp.searchsorted(starts, base + local_rows), nv)
        n_local = hi - lo
        starts_l = jnp.roll(starts, -lo) - base
        g_l = jnp.roll(g, -lo, axis=0).astype(jnp.float32)
        w_l = jnp.roll(w_rows, -lo, axis=0).astype(jnp.float32)
        # local acc rows; clip keeps garbage tail indices in bounds —
        # monotone, so the sorted promise survives for the valid prefix
        acc = local_comb.at[jnp.clip(starts_l + 1, 0,
                                     local_comb.shape[0] - 1)].get(
            mode="clip", indices_are_sorted=True)
        gp = g_l + 2.0 * l2_vec[None, :].astype(jnp.float32) * w_l
        a2 = acc + gp * gp
        wn = w_l - lr * gp / (jnp.sqrt(a2) + eps)
        newpairs = jnp.stack([wn, a2], axis=1).reshape(-1, 128)
        if use_kernel and scatter_rows_supported(local_comb, newpairs,
                                                 starts_l, 2):
            return scatter_rows(local_comb, newpairs, starts_l, n_local,
                                L=2)
        # XLA fallback (CPU dryrun/tests): out-of-range slots drop
        slot = jnp.arange(starts_l.shape[0], dtype=jnp.int32)
        ok = slot < n_local
        safe = jnp.where(ok, starts_l, local_comb.shape[0])
        out = local_comb.at[safe].set(wn, mode="drop")
        return out.at[safe + 1].set(a2, mode="drop")

    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    return f(combined, g, w_rows, starts, nv)


def sharded_combined3_update(mesh, comb3, g, w_rows, starts, n_valid,
                             l2_vec, lr, b1, b2, eps, tf, axis="model"):
    """Adam update of interleaved (w | m | v) TRIPLE storage sharded
    P(axis, None) over ``mesh`` — the adam analog of
    :func:`sharded_combined_update` (same shard-local scheme: slot-range
    searchsorted, roll-to-prefix, local gathers + math + Pallas scatter).

    comb3: [3R, 128] f32, rows sharded over ``axis`` (triples stay
    co-located: caller guarantees R %% mesh.shape[axis] == 0);
    starts: [n] int32 TRIPLE-row starts (= packed row * 3), sorted;
    tf: scalar f32 — the table's step count AFTER this update
    (DEEPCTR_ADAM_T=table, torch.optim.Adam state['step'] semantics;
    the rowwise-t form is not supported sharded and falls back to
    separate leaves in the engine).
    """
    from .. import config as dc_config
    from ..ops.pallas_update import scatter_rows, scatter_rows_supported

    M = mesh.shape[axis]
    local_rows = comb3.shape[0] // M
    use_kernel = dc_config.use_pallas()
    lr, b1, b2, eps = float(lr), float(b1), float(b2), float(eps)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P(), P()),
        out_specs=P(axis, None),
        **{_CHECK_KW: False})
    def f(local_comb, g, w_rows, starts, nv, tf):
        my = jax.lax.axis_index(axis)
        base = my * local_rows
        nv = nv[0]
        lo = jnp.minimum(jnp.searchsorted(starts, base), nv)
        hi = jnp.minimum(jnp.searchsorted(starts, base + local_rows), nv)
        n_local = hi - lo
        starts_l = jnp.roll(starts, -lo) - base
        g_l = jnp.roll(g, -lo, axis=0).astype(jnp.float32)
        w_l = jnp.roll(w_rows, -lo, axis=0).astype(jnp.float32)
        cap = local_comb.shape[0] - 1
        m_rows = local_comb.at[jnp.clip(starts_l + 1, 0, cap)].get(
            mode="clip", indices_are_sorted=True)
        v_rows = local_comb.at[jnp.clip(starts_l + 2, 0, cap)].get(
            mode="clip", indices_are_sorted=True)
        gp = g_l + 2.0 * l2_vec[None, :].astype(jnp.float32) * w_l
        m_new = b1 * m_rows + (1 - b1) * gp
        v_new = b2 * v_rows + (1 - b2) * gp * gp
        tff = tf[0]
        m_hat = m_new / (1 - b1 ** tff)
        v_hat = v_new / (1 - b2 ** tff)
        wn = w_l - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        newtrip = jnp.stack([wn, m_new, v_new], axis=1).reshape(-1, 128)
        if use_kernel and scatter_rows_supported(local_comb, newtrip,
                                                 starts_l, 3):
            return scatter_rows(local_comb, newtrip, starts_l, n_local,
                                L=3)
        slot = jnp.arange(starts_l.shape[0], dtype=jnp.int32)
        ok = slot < n_local
        safe = jnp.where(ok, starts_l, local_comb.shape[0])
        out = local_comb.at[safe].set(wn, mode="drop")
        out = out.at[safe + 1].set(m_new, mode="drop")
        return out.at[safe + 2].set(v_new, mode="drop")

    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    tfa = jnp.asarray(tf, jnp.float32).reshape(1)
    return f(comb3, g, w_rows, starts, nv, tfa)
