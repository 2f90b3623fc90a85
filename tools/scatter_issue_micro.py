"""Isolate the big-vocab update's cost structure on the real TPU.

The vocab-1M step spends ~7ms in the table update; pooling kernel
launches (arena mode) measured ~neutral, so the bound is NOT launch
overhead — candidates are (a) the pair gathers, (b) the adagrad math,
(c) the per-row DMA ISSUE RATE of the scatter kernel's scalar loop.

This tool times each in isolation at the production shape
(G=26 tables x n=5120 slots, ~4097 valid, [143k, 128] pair tables), and
A/Bs scatter-loop variants:

  dyn        — the shipping kernel: dynamic `count` bound, wait +
               conditional start per row (scatter_rows / arena)
  static_uK  — static full-n trip count (padding rows DMA into a
               sacrificial dump row past the table end) with the issue
               loop unrolled K-fold — tests whether scalar-loop overhead
               per DMA is the wall

All variants run STEPS times inside one jitted fori_loop with the arena
as the carry (in-place aliasing; the per-call input copy cancels in the
(K+1)-vs-1 difference).  Usage: python tools/scatter_issue_micro.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepctr_tpu.ops.pallas_update import (_ROWS_PER_STEP, _WINDOW,
                                           arena_scatter_rows, scatter_rows)

G = 26
R = 142858           # pair rows per table (vocab 1M / pack 7)
N = 5120             # padded slots (multiple of 1024)
NV = 4097            # valid rows
L = 2
STEPS = 30


def _make_static_kernel(L, unroll):
    """Full-N issue loop, no dynamic count: padding rows carry a start
    pointing at the dump row, so every j issues a (harmless) DMA and the
    trip count is static.  Mosaic's fori_loop only lowers unroll=1 or
    full-unroll, so the K-fold unroll is MANUAL: K wait+start pairs per
    loop body (the loop overhead amortizes over K DMAs)."""
    assert (_ROWS_PER_STEP - _WINDOW) % unroll == 0

    def kernel(starts_smem, vals_ref, _t_in, t_out, sems):
        base = pl.program_id(0) * _ROWS_PER_STEP

        def wr(j):
            return pltpu.make_async_copy(
                vals_ref.at[pl.ds(j * L, L), :],
                t_out.at[pl.ds(starts_smem[base + j], L), :],
                sems.at[j % _WINDOW])

        for j in range(_WINDOW):            # warm: fully unrolled
            wr(j).start()

        def drain(jj, _):
            j = jj * unroll
            for u in range(unroll):
                wr(j + u).wait()
                wr(j + u + _WINDOW).start()
            return 0

        jax.lax.fori_loop(0, (_ROWS_PER_STEP - _WINDOW) // unroll,
                          drain, 0)
        for j in range(_ROWS_PER_STEP - _WINDOW, _ROWS_PER_STEP):
            wr(j).wait()                    # tail: fully unrolled

    return kernel


def static_scatter(table, vals, starts, unroll):
    n = starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _ROWS_PER_STEP,),
        in_specs=[
            pl.BlockSpec((_ROWS_PER_STEP * L, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((_WINDOW,))],
    )
    (out,) = pl.pallas_call(
        _make_static_kernel(L, unroll),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(table.shape, table.dtype)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, vals, table)
    return out


def bench_carry(step, arena):
    """step: (arena, i) -> arena. K iterations in one jitted fori_loop
    (arena carried in place); timing closed by scalar readback."""
    @functools.partial(jax.jit, static_argnums=0)
    def run(k, a):
        a = jax.lax.fori_loop(0, k, lambda i, a: step(a, i), a)
        return a.reshape(-1)[:1].astype(jnp.float32).sum()

    run(1, arena).item()
    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(k, arena).item()
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(STEPS + 1) - t(1)) / STEPS


def main():
    rng = np.random.default_rng(0)
    # one arena for all G tables (pair rows), plus one dump pair row
    P = G * R
    arena = jnp.asarray(rng.normal(size=((P + 1) * L, 128)) * 0.01,
                        jnp.float32)
    starts_np = np.zeros((G, N), np.int32)
    for t in range(G):
        rows = np.sort(rng.choice(R, NV, replace=False))
        starts_np[t, :NV] = (t * R + rows) * L
        starts_np[t, NV:] = P * L          # dump row (static variants)
    starts = jnp.asarray(starts_np)
    nvs = jnp.full((G,), NV, jnp.int32)
    vals = jnp.asarray(rng.normal(size=(G, N * L, 128)) * 0.01, jnp.float32)
    grows = jnp.sort(jnp.asarray(
        (starts_np[:, :NV] // L).reshape(-1), jnp.int32))
    g_all = jnp.asarray(rng.normal(size=(G, NV, 128)) * 0.01, jnp.float32)

    out = {}

    # (a) pair gather of all touched rows (i-dependent index defeats
    # hoisting; still sorted)
    def gather_step(a, i):
        pairs = a.reshape(-1, 2, 128).at[
            jnp.minimum(grows + (i % 2), P - 1)].get(
            mode="clip", indices_are_sorted=True)
        return a.at[0, 0].add(pairs[0, 0, 0] * 1e-30)
    out["pair_gather_ms"] = bench_carry(gather_step, arena) * 1e3

    # (b) batched adagrad math alone (inputs pre-gathered once)
    pairs0 = arena.reshape(-1, 2, 128).at[grows].get(
        mode="clip", indices_are_sorted=True)

    def math_step(a, i):
        g = g_all.at[0, 0, 0].add(i.astype(jnp.float32))
        W = pairs0[:, 0, :].reshape(G, NV, 128)
        A = pairs0[:, 1, :].reshape(G, NV, 128)
        gp = g + 2e-5 * W
        a2 = A + gp * gp
        wn = W - 0.01 * gp * jax.lax.rsqrt(a2 + 1e-10)
        np_ = jnp.stack([wn, a2], axis=2).reshape(G, 2 * NV, 128)
        return a.at[0, 0].add(np_[0, 0, 0] * 1e-30)
    out["math_ms"] = bench_carry(math_step, arena) * 1e3

    # (c) scatter variants (side-effecting kernels; same vals each step)
    def per_table_step(a, i):
        for t in range(G):
            a = scatter_rows(a, vals[t], starts[t], NV, L=L)
        return a
    out["scatter_dyn_per_table_ms"] = bench_carry(per_table_step,
                                                  arena) * 1e3

    def arena_step(a, i):
        return arena_scatter_rows(a, vals, starts, nvs, L=L)
    out["scatter_dyn_arena_ms"] = bench_carry(arena_step, arena) * 1e3

    for unroll in (1, 2, 4, 8):
        def static_step(a, i, u=unroll):
            for t in range(G):
                a = static_scatter(a, vals[t], starts[t], u)
            return a
        out["scatter_static_u%d_ms" % unroll] = bench_carry(
            static_step, arena) * 1e3

    for k, v in out.items():
        rec = {"phase": k, "ms": round(v, 3)}
        if k.startswith("scatter"):
            dmas = G * (N if "static" in k else NV)
            rec["ns_per_dma"] = round(v * 1e6 / dmas, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
