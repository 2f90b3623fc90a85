"""Which gather form should fetch (w, acc) pairs from the interleaved
[2R, 128] combined buffer?  And what does a GATHER OP itself cost —
i.e. would batching the 26 per-table gathers into one op pay?

Today the active-rows step gathers twice per table (w rows at urows*2 in
transform, acc rows at urows*2+1 in row_update).  Candidates:

  two        — today's pair of row gathers per table (baseline)
  reshape3   — one gather of [R, 2, 128] rows at urows (the arena form)
  interleave — one [*, 128] row gather of the 2n interleaved indices
               (2u, 2u+1, sorted by construction), split after
  batched1   — ONE gather for ALL tables: tables stacked [G*2R, 128],
               indices offset by table — models an arena-style transform

And for the substituted-FORWARD side (B=4096 ids from a [n, 128] slice):

  fwd26      — 26 separate takes (today's forward)
  fwd1       — one take from the stacked [26n, 128] substituted buffer

NOTE: buffers must be created ON DEVICE and passed as jit ARGUMENTS —
numpy constants (or device arrays captured by closure) are baked into
the HLO and re-uploaded through the ~KB/s axon tunnel.

Usage: python tools/pair_gather_micro.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

G = 26
N = 4097            # touched rows per table
R = 143000          # physical packed rows per table
B = 4096            # batch ids for the forward-side variants
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
    key = jax.random.PRNGKey(0)
    allbuf = jax.jit(lambda k: jax.random.normal(
        k, (G, 2 * R, 128)) * 0.01)(key)
    idx = jax.jit(lambda k: jnp.sort(jax.random.randint(
        k, (G, N), 0, R), axis=1))(key)
    small = jax.jit(lambda k: jax.random.normal(
        k, (G * N, 128)) * 0.01)(key)
    bidx = jax.jit(lambda k: jax.random.randint(
        k, (G, B), 0, N))(key)

    out = {}

    def pairprobe(w, a):
        return (w.reshape(-1)[0] + a.reshape(-1)[0]).astype(jnp.float32)

    def step_two(i, buf, ix):
        tot = jnp.float32(0)
        for k in range(G):
            u = jnp.minimum(ix[k] + (i % 8), R - 1)
            w = buf[k].at[u * 2].get(mode="clip", indices_are_sorted=True)
            a = buf[k].at[u * 2 + 1].get(mode="clip",
                                         indices_are_sorted=True)
            tot = tot + pairprobe(w, a)
        return tot
    out["two_ms"] = bench(step_two, allbuf, idx) * 1e3

    def step_reshape3(i, buf, ix):
        tot = jnp.float32(0)
        for k in range(G):
            u = jnp.minimum(ix[k] + (i % 8), R - 1)
            p = buf[k].reshape(R, 2, 128).at[u].get(
                mode="clip", indices_are_sorted=True)
            tot = tot + pairprobe(p[:, 0], p[:, 1])
        return tot
    out["reshape3_ms"] = bench(step_reshape3, allbuf, idx) * 1e3

    def step_interleave(i, buf, ix):
        tot = jnp.float32(0)
        for k in range(G):
            u = jnp.minimum(ix[k] + (i % 8), R - 1)
            both = jnp.stack([u * 2, u * 2 + 1], axis=1).reshape(-1)
            p = buf[k].at[both].get(
                mode="clip", indices_are_sorted=True).reshape(N, 2, 128)
            tot = tot + pairprobe(p[:, 0], p[:, 1])
        return tot
    out["interleave_ms"] = bench(step_interleave, allbuf, idx) * 1e3

    def step_batched1(i, buf, ix):
        flat = buf.reshape(G * 2 * R, 128)
        u = jnp.minimum(ix + (i % 8), R - 1)           # [G, N]
        off = (jnp.arange(G, dtype=jnp.int32) * 2 * R)[:, None]
        both = jnp.stack([u * 2, u * 2 + 1], axis=2) + off[:, :, None]
        p = flat.at[both.reshape(-1)].get(
            mode="clip", indices_are_sorted=True).reshape(G, N, 2, 128)
        return pairprobe(p[:, :, 0], p[:, :, 1])
    out["batched1_ms"] = bench(step_batched1, allbuf, idx) * 1e3

    def step_fwd26(i, sm, bx):
        tot = jnp.float32(0)
        for k in range(G):
            ids = (bx[k] + i) % N
            rows = jnp.take(sm[k * N:(k + 1) * N], ids, axis=0)
            tot = tot + rows.reshape(-1)[0].astype(jnp.float32)
        return tot
    out["fwd26_ms"] = bench(step_fwd26, small, bidx) * 1e3

    def step_fwd1(i, sm, bx):
        ids = (bx + i) % N                              # [G, B]
        off = (jnp.arange(G, dtype=jnp.int32) * N)[:, None]
        rows = jnp.take(sm, (ids + off).reshape(-1), axis=0)
        return rows.reshape(-1)[0].astype(jnp.float32)
    out["fwd1_ms"] = bench(step_fwd1, small, bidx) * 1e3

    for k, v in out.items():
        print(json.dumps({"phase": k, "ms": round(v, 3)}), flush=True)


if __name__ == "__main__":
    main()
