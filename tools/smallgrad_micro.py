"""Which backward should the active-rows lookup use?

The big-vocab step's dominant cost (~8ms of 12.3, tools/
ablate_active_rows full_noupd vs upd_in_ctx) is the gather TRANSPOSE:
autodiff turns each substituted-table lookup ``take(small [n,128],
idx [B])`` into an XLA scatter-add of B batch-ordered (non-sorted,
non-unique) rows — the known scatter pathology.  Candidates, measured
at the production shape (26 tables x B=4096 x [5120,128]):

  take        — autodiff of jnp.take, batch-ordered ids (today's path)
  take_iota   — autodiff of jnp.take with idx == arange (what the
                per-OCCURRENCE substitution would produce: the
                transpose is a scatter over unique ascending ids)
  onehot_bf16 — lookup as one_hot(idx) @ table: backward is
                one_hot^T @ upstream, an MXU matmul (f32 accumulate)
  onehot_f32  — same in float32
  segsum      — manual sorted segment-sum, no autodiff: permute
                upstream by the sort order, f32 cumsum, gather the two
                segment-boundary rows per slot, subtract (the sort
                itself is shared with the transform's dedup in the real
                step; it is INCLUDED here to be conservative)

Usage: python tools/smallgrad_micro.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

G = 26
B = 4096
N = 5120            # substituted-table rows
STEPS = 30


def bench(step):
    @functools.partial(jax.jit, static_argnums=0)
    def run(k, acc0):
        return jax.lax.fori_loop(0, k, lambda i, a: a + step(i), acc0)

    run(1, jnp.float32(0)).item()
    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(k, jnp.float32(0)).item()
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(STEPS + 1) - t(1)) / STEPS


def main():
    rng = np.random.default_rng(0)
    tables = [jnp.asarray(rng.normal(size=(N, 128)) * 0.01, jnp.float32)
              for _ in range(G)]
    idx = jnp.asarray(rng.integers(0, B, size=(G, B)), jnp.int32)
    u = jnp.asarray(rng.normal(size=(G, B, 128)) * 0.01, jnp.float32)

    out = {}

    def probe(gs):
        return sum(g.reshape(-1)[0].astype(jnp.float32) for g in gs)

    # --- take: autodiff scatter-add backward, batch-ordered ids
    def loss_take(ts, i):
        return sum(jnp.sum(jnp.take(t, (idx[k] + i) % B, axis=0) * u[k])
                   for k, t in enumerate(ts))

    out["take_ms"] = bench(
        lambda i: probe(jax.grad(loss_take)(tables, i))) * 1e3

    # --- take_iota: identity-ordered ids (per-occurrence substitution);
    # i-dependence goes through u so nothing hoists out of the loop
    def loss_iota(ts, i):
        ii = jnp.arange(B, dtype=jnp.int32)
        ui = u.at[0, 0, 0].add(i.astype(jnp.float32))
        return sum(jnp.sum(jnp.take(t, ii, axis=0) * ui[k])
                   for k, t in enumerate(ts))

    out["take_iota_ms"] = bench(
        lambda i: probe(jax.grad(loss_iota)(tables, i))) * 1e3

    # --- onehot: lookup via MXU matmul (backward is a matmul too)
    def loss_onehot(ts, i, dt):
        tot = jnp.float32(0)
        for k, t in enumerate(ts):
            oh = jax.nn.one_hot((idx[k] + i) % B, N, dtype=dt)
            rows = jax.lax.dot(oh, t.astype(dt),
                               preferred_element_type=jnp.float32)
            tot = tot + jnp.sum(rows * u[k])
        return tot

    out["onehot_bf16_ms"] = bench(
        lambda i: probe(jax.grad(loss_onehot)(tables, i,
                                              jnp.bfloat16))) * 1e3
    out["onehot_f32_ms"] = bench(
        lambda i: probe(jax.grad(loss_onehot)(tables, i,
                                              jnp.float32))) * 1e3

    # --- segsum: manual sorted segment-sum (no autodiff)
    def step_segsum(i):
        ii = (idx + i) % B                          # [G, B]
        iota = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32), (G, B))
        srt, order = jax.lax.sort((ii, iota), dimension=-1, num_keys=1,
                                  is_stable=False)
        tot = jnp.float32(0)
        for k in range(G):
            us = jnp.take(u[k], order[k], axis=0)   # [B,128] row-sorted
            cs = jnp.cumsum(us, axis=0)             # f32 prefix sums
            # per target row r: sum = cs[end(r)] - cs[end(prev present r)]
            # end(r) = last sorted position with id <= r
            ends = jnp.searchsorted(srt[k], jnp.arange(N, dtype=jnp.int32),
                                    side="right").astype(jnp.int32) - 1
            ge = jnp.where((ends >= 0)[:, None],
                           cs.at[jnp.maximum(ends, 0)].get(
                               mode="clip", indices_are_sorted=True), 0.0)
            prev = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), ends[:-1]])
            gprev = jnp.where((prev >= 0)[:, None],
                              cs.at[jnp.maximum(prev, 0)].get(
                                  mode="clip", indices_are_sorted=True),
                              0.0)
            g = ge - gprev                           # [N,128]
            tot = tot + g.reshape(-1)[0]
        return tot
    out["segsum_ms"] = bench(step_segsum) * 1e3

    for k, v in out.items():
        print(json.dumps({"phase": k, "ms": round(v, 3)}), flush=True)


if __name__ == "__main__":
    main()
