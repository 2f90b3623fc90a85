"""Real-TPU check + timing of the fused Pallas row-update kernel vs the
hinted-XLA gather/scatter composition (the current row_update path)."""

import functools
import json
import os
import time

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from deepctr_tpu.ops.pallas_update import fused_row_update

R = 142858
T = 26
N = 5120          # padded touched-row capacity (multiple of 1024)
NV = 4097         # valid rows
STEPS = 20
LR, EPS = 0.05, 1e-10


def main():
    rng = np.random.default_rng(0)
    rows_np = np.sort(rng.choice(R, NV, replace=False))
    rows = jnp.asarray(np.concatenate(
        [rows_np, R + np.arange(N - NV)]), jnp.int32)
    g = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
    l2 = jnp.asarray(np.full(128, 1e-5), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    a0 = jnp.asarray(rng.random((R, 128)), jnp.float32)

    # ---- correctness on real silicon vs jnp composition ----
    @jax.jit
    def xla_update(w, acc):
        w_rows = w.at[rows].get(mode="clip", indices_are_sorted=True)
        gg = g + 2.0 * l2[None, :] * w_rows
        acc_rows = acc.at[rows].get(mode="clip",
                                    indices_are_sorted=True) + gg * gg
        acc = acc.at[rows].set(acc_rows, mode="drop",
                               indices_are_sorted=True, unique_indices=True)
        w = w.at[rows].set(w_rows - LR * gg * jax.lax.rsqrt(acc_rows + EPS),
                           mode="drop", indices_are_sorted=True,
                           unique_indices=True)
        return w, acc

    # NB: xla path applies updates to padded OOB rows too? mode=drop: no.
    # but its gg for pad rows uses clipped gathers -> dropped. equivalent.
    w_x, a_x = xla_update(w0, a0)
    w_p, a_p = jax.jit(lambda w, a: fused_row_update(
        w, a, g, rows, NV, l2, LR, EPS))(w0, a0)
    dw = float(jnp.max(jnp.abs(w_x - w_p)))
    da = float(jnp.max(jnp.abs(a_x - a_p)))
    print(json.dumps({"check": "max_abs_diff", "w": dw, "acc": da}),
          flush=True)
    assert dw < 1e-5 and da < 1e-4, (dw, da)

    # ---- timing: T tables per step, fori_loop ----
    def bench(update_one, tag):
        @functools.partial(jax.jit, static_argnums=0)
        def run(n):
            tabs = [(jnp.zeros((R, 128), jnp.float32) + i,
                     jnp.zeros((R, 128), jnp.float32)) for i in range(T)]
            def body(i, tabs):
                f = (i + 1).astype(jnp.float32)
                return [update_one(w, a, g * f) for (w, a) in tabs]
            tabs = jax.lax.fori_loop(0, n, body, tabs)
            return sum(w[0, 0] + a[0, 0] for (w, a) in tabs)

        def timed(n):
            run(n).item()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run(n).item()
                best = min(best, time.perf_counter() - t0)
            return best
        dt = (timed(STEPS + 1) - timed(1)) / STEPS
        print(json.dumps({"variant": tag, "ms": round(dt * 1e3, 3)}),
              flush=True)

    w_rows_cache = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
    bench(lambda w, a, gg: fused_row_update(w, a, gg, rows, NV, l2, LR,
                                            EPS, w_rows=w_rows_cache),
          "pallas_fused_26tables_3dma")

    def xla_one(w, acc, gg):
        w_rows = w.at[rows].get(mode="clip", indices_are_sorted=True)
        g2 = gg + 2.0 * l2[None, :] * w_rows
        acc_rows = acc.at[rows].get(mode="clip",
                                    indices_are_sorted=True) + g2 * g2
        acc = acc.at[rows].set(acc_rows, mode="drop",
                               indices_are_sorted=True, unique_indices=True)
        w = w.at[rows].set(
            w_rows - LR * g2 * jax.lax.rsqrt(acc_rows + EPS),
            mode="drop", indices_are_sorted=True, unique_indices=True)
        return (w, acc)

    if os.environ.get("MICRO_XLA"):
        bench(xla_one, "xla_hinted_26tables")


if __name__ == "__main__":
    main()
