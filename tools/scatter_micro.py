"""Microbenchmark: hinted gather/scatter cost, 26 per-table ops vs one
pooled op — decides whether pooling tables into one arena pays.

Shapes mirror the vocab-1M bench: 26 tables x [142858, 128], 4097
touched rows each (sorted unique), vs one pool [26*142858, 128] with
26*4097 touched rows.  Tables are allocated INSIDE the jit so the
(n+1)-vs-1 step subtraction cancels allocation/zero-fill; the fori_loop
carry keeps the scatters in-place.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

R = 142858          # rows per table (vocab 1M, pack 7)
T = 26              # tables
N = 4097            # touched rows per table
STEPS = 20


def sorted_unique_rows(k, n, r):
    ids = jax.random.randint(k, (n,), 0, r)
    s = jnp.sort(ids)
    uniq = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    return jnp.where(uniq, s, r + jnp.arange(n))   # dups -> distinct OOB


def bench(run):
    def timed(n):
        run(n).item()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(n).item()
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(STEPS + 1) - timed(1)) / STEPS


def main():
    key = jax.random.PRNGKey(0)
    rows_l = [sorted_unique_rows(jax.random.fold_in(key, i), N, R)
              for i in range(T)]
    vals = jnp.ones((N, 128), jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def scatter26(n):
        tabs = [jnp.zeros((R, 128), jnp.float32) + i for i in range(T)]
        def body(i, tabs):
            f = (i + 1).astype(jnp.float32)
            return [t.at[r].set(vals * f, mode="drop",
                                indices_are_sorted=True,
                                unique_indices=True)
                    for t, r in zip(tabs, rows_l)]
        tabs = jax.lax.fori_loop(0, n, body, tabs)
        return sum(t[0, 0] for t in tabs)

    print(json.dumps({"variant": "scatter_26_tables",
                      "ms": round(bench(scatter26) * 1e3, 3)}), flush=True)

    prows = jnp.sort(jnp.concatenate(
        [r.clip(0, R - 1) + i * R for i, r in enumerate(rows_l)]))
    pvals = jnp.ones((T * N, 128), jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def scatter_pool(n):
        pool = jnp.zeros((T * R, 128), jnp.float32)
        def body(i, pool):
            f = (i + 1).astype(jnp.float32)
            return pool.at[prows].set(pvals * f, mode="drop",
                                      indices_are_sorted=True,
                                      unique_indices=True)
        pool = jax.lax.fori_loop(0, n, body, pool)
        return pool[0, 0]

    print(json.dumps({"variant": "scatter_pooled",
                      "ms": round(bench(scatter_pool) * 1e3, 3)}), flush=True)

    @functools.partial(jax.jit, static_argnums=0)
    def gather_pool(n):
        pool = jnp.zeros((T * R, 128), jnp.float32)
        def body(i, acc):
            g = (pool + acc * 0).at[prows].get(mode="clip",
                                               indices_are_sorted=True)
            return acc + jnp.sum(g) + 1.0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    print(json.dumps({"variant": "gather_pooled",
                      "ms": round(bench(gather_pool) * 1e3, 3)}), flush=True)

    @functools.partial(jax.jit, static_argnums=0)
    def gather26(n):
        tabs = [jnp.zeros((R, 128), jnp.float32) + i for i in range(T)]
        def body(i, acc):
            out = acc
            for t, r in zip(tabs, rows_l):
                g = (t + acc * 0).at[r].get(mode="clip",
                                            indices_are_sorted=True)
                out = out + jnp.sum(g)
            return out + 1.0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    print(json.dumps({"variant": "gather_26_tables",
                      "ms": round(bench(gather26) * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
