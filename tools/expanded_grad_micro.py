"""Measured A/B for the vocab-1M backward's last big lever (verdict r3
#6): the duplicate-id cotangent accumulation of the substituted-slice
lookups.

Today the model gathers rows from the substituted [n_uniq, 128] slice at
proxy positions (duplicates included); autodiff's vjp of that gather is
an XLA scatter-ADD over the ~4104 occurrences — measured ~1.0ms/step at
vocab 1M across the 26 tables (TPU_QUEUE_RESULTS.md grad_lookup probe),
even though only ~10% of occurrences are duplicates.

Alternative (the "expanded-grad" design, round-3 analyzed-only): a
custom_vjp on the lookup whose backward replaces the scatter-add with a
SORTED SEGMENT-SUM that reuses the transform's sort products (order =
sort permutation, per-slot run boundaries — all computed by the dedup
transform every step anyway):

    g_sorted = g_occ[order]          # one [n_occ, 128] permutation gather
    cs       = cumsum(g_sorted)      # [n_occ, 128]
    g_uniq   = cs[ends-1] - cs[starts-1]   # two [n_uniq, 128] gathers

The forward is IDENTICAL (the same proxy gather), so the A/B is purely
the backward: scatter-add vs gather+cumsum+boundary-diff, G=26 tables at
the production shapes (B=4096 -> n_occ=4104, n_uniq~3700, 128 lanes).

Usage: python tools/expanded_grad_micro.py     [REPS=30 G=26]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

N_OCC = 4104          # 4096 batch ids + sentinel + pad-to-8
N_UNIQ = 3704         # measured unique count at vocab 1M, uniform ids
WIDTH = 128
REPS = int(os.environ.get("REPS", "30"))
G = int(os.environ.get("G", "26"))


def _setup(seed):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    proxies, orders, starts, ends = [], [], [], []
    for g in range(G):
        ids = rng.integers(0, N_UNIQ, N_OCC)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        first = np.concatenate([[1], (sorted_ids[1:]
                                      != sorted_ids[:-1]).astype(int)])
        slot = np.cumsum(first) - 1
        proxy = np.empty(N_OCC, np.int32)
        proxy[order] = slot          # original position -> slot
        st = np.zeros(N_UNIQ, np.int32)
        en = np.zeros(N_UNIQ, np.int32)
        run_starts = np.nonzero(first)[0]
        n_u = run_starts.shape[0]
        st[:n_u] = run_starts
        en[:n_u] = np.concatenate([run_starts[1:], [N_OCC]])
        # empty slots: start == end -> zero row out of the boundary diff
        st[n_u:] = en[n_u:] = N_OCC
        proxies.append(proxy); orders.append(order.astype(np.int32))
        starts.append(st); ends.append(en)
    return (jnp.asarray(np.stack(proxies)), jnp.asarray(np.stack(orders)),
            jnp.asarray(np.stack(starts)), jnp.asarray(np.stack(ends)))


def main():
    import jax
    import jax.numpy as jnp

    proxy, order, starts, ends = _setup(0)
    key = jax.random.PRNGKey(0)
    smalls = jax.random.normal(key, (G, N_UNIQ, WIDTH), jnp.float32)
    cot = jax.random.normal(key, (G, N_OCC, WIDTH), jnp.float32)

    def lookup_plain(small, p):
        return small.at[p].get(mode="clip")          # vjp = scatter-add

    @jax.custom_vjp
    def lookup_seg(small, p, o, st, en):
        return small.at[p].get(mode="clip")

    def lookup_seg_fwd(small, p, o, st, en):
        return small.at[p].get(mode="clip"), (p, o, st, en)

    def lookup_seg_bwd(res, g_occ):
        p, o, st, en = res
        g_sorted = g_occ.at[o].get(mode="clip")      # permutation gather
        cs = jnp.cumsum(g_sorted.astype(jnp.float32), axis=0)
        top = cs.at[en - 1].get(mode="clip")
        bot = jnp.where((st > 0)[:, None],
                        cs.at[st - 1].get(mode="clip"), 0.0)
        g_uniq = jnp.where((en > st)[:, None], top - bot, 0.0)
        return (g_uniq, None, None, None, None)

    lookup_seg.defvjp(lookup_seg_fwd, lookup_seg_bwd)

    def make_loss(mode):
        def loss(smalls, cot):
            total = jnp.float32(0)
            for g in range(G):
                if mode == "plain":
                    rows = lookup_plain(smalls[g], proxy[g])
                else:
                    rows = lookup_seg(smalls[g], proxy[g], order[g],
                                      starts[g], ends[g])
                total = total + jnp.vdot(rows, cot[g])
            return total
        return jax.grad(loss)

    def bench(fn):
        @functools.partial(jax.jit, static_argnums=0)
        def run(n, smalls, cot):
            def body(i, acc):
                g = fn(smalls, jnp.roll(cot, i, axis=1))
                return acc + g[0].reshape(-1)[0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def timed(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run(n, smalls, cot).item()
                best = min(best, time.perf_counter() - t0)
            return best

        run(1, smalls, cot).item()
        return (timed(REPS + 1) - timed(1)) / REPS

    # correctness first: both grads must match
    ga = make_loss("plain")(smalls, cot)
    gb = make_loss("seg")(smalls, cot)
    err = float(jnp.max(jnp.abs(ga - gb)))
    scale = float(jnp.max(jnp.abs(ga)))
    print(json.dumps({"check": "grad_equal", "max_abs_err": err,
                      "scale": scale}), flush=True)
    assert err <= 1e-3 * max(scale, 1.0), (err, scale)

    t_plain = bench(make_loss("plain"))
    t_seg = bench(make_loss("seg"))
    print(json.dumps({"G": G, "n_occ": N_OCC, "n_uniq": N_UNIQ,
                      "scatter_add_ms": round(1e3 * t_plain, 3),
                      "sorted_segsum_ms": round(1e3 * t_seg, 3),
                      "speedup": round(t_plain / t_seg, 3)}), flush=True)


if __name__ == "__main__":
    main()
