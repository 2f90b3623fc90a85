"""Drill the active-rows TRANSFORM's per-op costs on the real TPU.

fwd_bisect (TPU_QUEUE_RESULTS.md 2026-08-19) decomposes the vocab-1M
transform_sub (2.853ms) as sort ~0.16 + urows-scatter ~0.59 +
inv-scatter+X-rewrite ~0.69 + w-row gathers ~1.41ms.  The 26 per-table
gathers move only ~68MB (5120 rows x 512B x 26) — 1.41ms is ~49GB/s
effective, i.e. ~50us of overhead per gather OP, not bandwidth.  This
tool A/Bs:

gather forms (the ~1.41ms):
  g26_even    — shipping form: 26 separate [2R,128] pair buffers,
                per-table at[urows*2].get(clip, sorted)
  g26_4104    — same, n padded to 8 instead of 1024 (5120 -> 4104):
                how much do the 1023 clip-padding rows cost?
  g26_wsep    — 26 separate [R,128] w-only buffers (no interleave
                stride): does the *2 even-index form hurt?
  g1_flat     — ONE [G*2R,128] arena, ONE flat gather of [G*n] globally
                sorted indices (w rows only)
  g1_flat_wa  — arena, ONE flat gather of [2*G*n] interleaved (w,acc)
                indices, deinterleaved by reshape[:, 0]/[:, 1] — would
                also delete the update's separate acc gathers
  g26_bf16    — 26 bf16 shadow buffers (half the bytes; tests whether
                the gather is transaction- or byte-bound)

dedup forms (the ~1.28ms of [G,n] scatters):
  dd_scatter  — shipping: inv + urows via .at[gi, idx].set
  dd_hint     — same with unique_indices/indices_are_sorted promises
  dd_sorts    — scatter-free: inv and urows each via one more batched
                sort (sort-as-permutation-inverse / sort-compaction)

Methodology: device-resident index tensors precomputed outside the
loop ([K,G,n], step i reads page i%K), K steps inside one jitted
fori_loop, (K+1)-vs-1 difference, scalar readback (CLAUDE.md: tunnel
block_until_ready does not block).  Usage: python tools/subgather_micro.py
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
R = 142858            # packed rows per table (vocab 1M / pack 7)
NV = 4097             # valid slots (B=4096 + sentinel)
N = 5120              # shipping pad (1024 multiple)
N8 = 4104             # 8-multiple pad
K = 16                # precomputed index pages
STEPS = 30


def bench(step, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run(k, acc0, *a):
        return jax.lax.fori_loop(0, k, lambda i, c: c + step(i, *a), acc0)

    run(1, jnp.float32(0), *args).item()

    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(k, jnp.float32(0), *args).item()
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(STEPS + 1) - t(1)) / STEPS


def main():
    rng = np.random.default_rng(0)
    out = {}

    # ---- gather drill --------------------------------------------------
    # K pages of per-table sorted unique row indices with the shipping
    # padding scheme (clip padding = distinct ascending out-of-bounds)
    U = np.zeros((K, G, N), np.int32)
    for k in range(K):
        for t in range(G):
            rows = np.sort(rng.choice(R, NV, replace=False))
            U[k, t, :NV] = rows
            U[k, t, NV:] = R + np.arange(N - NV)
    U = jnp.asarray(U)
    U8 = U[:, :, :N8]

    tables = [jnp.asarray(rng.normal(size=(2 * R, 128)) * 0.01, jnp.float32)
              for _ in range(G)]
    arena = jnp.concatenate(tables, axis=0)            # [G*2R, 128]
    wsep = [t[0::2] for t in tables]                   # [R, 128] each
    tab16 = [t.astype(jnp.bfloat16) for t in tables]
    bases = jnp.asarray(
        np.arange(G, dtype=np.int64)[:, None] * (2 * R), jnp.int32)  # [G,1]

    def g26_even(i, U, tabs):
        u = jax.lax.dynamic_index_in_dim(U, i % K, 0, keepdims=False)
        tot = jnp.float32(0)
        for t in range(G):
            rows = tabs[t].at[u[t] * 2].get(mode="clip",
                                            indices_are_sorted=True)
            tot += jnp.sum(rows)
        return tot

    out["g26_even_n5120"] = bench(g26_even, U, tables)
    out["g26_even_n4104"] = bench(g26_even, U8, tables)

    def g26_wsep(i, U, tabs):
        u = jax.lax.dynamic_index_in_dim(U, i % K, 0, keepdims=False)
        tot = jnp.float32(0)
        for t in range(G):
            rows = tabs[t].at[u[t]].get(mode="clip",
                                        indices_are_sorted=True)
            tot += jnp.sum(rows)
        return tot

    out["g26_wsep"] = bench(g26_wsep, U, wsep)

    def g1_flat(i, U, arena):
        u = jax.lax.dynamic_index_in_dim(U, i % K, 0, keepdims=False)
        # per-table clip BEFORE the base offset so padding stays inside
        # its own table's range (keeps the flat vector globally sorted)
        gth = (jnp.minimum(u, R - 1) * 2 + bases).reshape(-1)
        rows = arena.at[gth].get(mode="clip", indices_are_sorted=True)
        return jnp.sum(rows)

    out["g1_flat"] = bench(g1_flat, U, arena)

    def g1_flat_wa(i, U, arena):
        u = jax.lax.dynamic_index_in_dim(U, i % K, 0, keepdims=False)
        base = jnp.minimum(u, R - 1) * 2 + bases          # [G, n]
        gth = (base[:, :, None]
               + jnp.arange(2, dtype=jnp.int32)[None, None, :]).reshape(-1)
        rows = arena.at[gth].get(mode="clip", indices_are_sorted=True)
        pairs = rows.reshape(-1, 2, 128)
        return jnp.sum(pairs[:, 0, :]) + jnp.sum(pairs[:, 1, :]) * 0.5

    out["g1_flat_wa"] = bench(g1_flat_wa, U, arena)

    def g26_bf16(i, U, tabs):
        u = jax.lax.dynamic_index_in_dim(U, i % K, 0, keepdims=False)
        tot = jnp.float32(0)
        for t in range(G):
            rows = tabs[t].at[u[t] * 2].get(mode="clip",
                                            indices_are_sorted=True)
            tot += jnp.sum(rows.astype(jnp.float32))
        return tot

    out["g26_bf16"] = bench(g26_bf16, U, tab16)

    # ---- dedup drill ---------------------------------------------------
    IDS = jnp.asarray(rng.integers(0, R, size=(K, G, N), dtype=np.int32))

    def prep(i, IDS):
        rows_mat = jax.lax.dynamic_index_in_dim(IDS, i % K, 0,
                                                keepdims=False)
        n = rows_mat.shape[1]
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (G, n))
        sorted_rows, order = jax.lax.sort((rows_mat, iota), dimension=-1,
                                          num_keys=1, is_stable=False)
        first = jnp.concatenate(
            [jnp.ones((G, 1), jnp.int32),
             (sorted_rows[:, 1:] != sorted_rows[:, :-1]).astype(jnp.int32)],
            axis=1)
        slot_sorted = jnp.cumsum(first, axis=1) - 1
        return sorted_rows, order, first, slot_sorted

    def consume(inv, urows):
        return (jnp.sum(inv).astype(jnp.float32) * 1e-9
                + jnp.sum(urows).astype(jnp.float32) * 1e-9)

    def dd_sort_only(i, IDS):
        sorted_rows, order, first, slot_sorted = prep(i, IDS)
        return consume(order, slot_sorted)

    out["dd_sort_only"] = bench(dd_sort_only, IDS)

    def dd_scatter(i, IDS):
        sorted_rows, order, first, slot_sorted = prep(i, IDS)
        n = sorted_rows.shape[1]
        gi = jnp.arange(G)[:, None]
        inv = jnp.zeros((G, n), jnp.int32).at[gi, order].set(slot_sorted)
        urows = jnp.zeros((G, n), jnp.int32).at[gi, slot_sorted].set(
            sorted_rows)
        return consume(inv, urows)

    out["dd_scatter"] = bench(dd_scatter, IDS)

    def dd_hint(i, IDS):
        sorted_rows, order, first, slot_sorted = prep(i, IDS)
        n = sorted_rows.shape[1]
        gi = jnp.arange(G)[:, None]
        inv = jnp.zeros((G, n), jnp.int32).at[gi, order].set(
            slot_sorted, unique_indices=True)
        urows = jnp.zeros((G, n), jnp.int32).at[gi, slot_sorted].set(
            sorted_rows, indices_are_sorted=True)
        return consume(inv, urows)

    out["dd_hint"] = bench(dd_hint, IDS)

    def dd_sorts(i, IDS):
        sorted_rows, order, first, slot_sorted = prep(i, IDS)
        n = sorted_rows.shape[1]
        # inv: sorting (order, slot) by order inverts the permutation
        _, inv = jax.lax.sort((order, slot_sorted), dimension=-1,
                              num_keys=1, is_stable=False)
        # urows: compaction sort — firsts get their slot as key, dups
        # get n (past every real slot), so position s ends up holding
        # the unique row of slot s
        key = jnp.where(first == 1, slot_sorted, n)
        _, urows = jax.lax.sort((key, sorted_rows), dimension=-1,
                                num_keys=1, is_stable=False)
        return consume(inv, urows)

    out["dd_sorts"] = bench(dd_sorts, IDS)

    for k, v in out.items():
        print(json.dumps({"phase": k, "ms": round(v * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
