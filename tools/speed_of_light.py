"""Per-kernel speed-of-light report for the hot ops on the current TPU.

For each hot op at bench shapes this measures achieved time (scalar-sync
method — see bench.py docstring) and compares against the roofline bound:
max(FLOPs / peak_flops, bytes / peak_bw).

Usage:  python tools/speed_of_light.py          (runs on the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

# v5e (1 chip): bf16 MXU peak and HBM bandwidth
PEAK_FLOPS = 197e12
PEAK_F32_FLOPS = 98e12
PEAK_BW = 819e9

B = 4096


def timed(loop_fn, n=40):
    def t(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop_fn(k).item()
            best = min(best, time.perf_counter() - t0)
        return best
    t(1)
    return (t(n + 1) - t(1)) / n


def chain(fn, seed_arrays, feed):
    """Build a jitted fori_loop that feeds op outputs back into inputs."""
    @jax.jit
    def loop(n):
        def body(i, carry):
            out = fn(*carry)
            return feed(carry, out)
        carry = jax.lax.fori_loop(0, n, body, seed_arrays)
        leaf = jax.tree_util.tree_leaves(carry)[0]
        return jnp.sum(leaf.reshape(-1)[:2].astype(jnp.float32))
    return loop


def report(name, dt, flops, bytes_):
    bound = max(flops / PEAK_FLOPS, bytes_ / PEAK_BW)
    if dt <= bound / 10:  # cheaper than dispatch-noise floor resolves
        print("%-28s  < measurement floor (SoL %0.3f ms)"
              % (name, bound * 1e3))
        return
    print("%-28s %8.3f ms   %6.1f TF/s   SoL %6.3f ms   %5.1f%% of SoL"
          % (name, dt * 1e3, flops / dt / 1e12, bound * 1e3,
             100.0 * bound / dt))


def main():
    key = jax.random.PRNGKey(0)
    dt16 = jnp.bfloat16

    # --- FM cross ---
    from deepctr_tpu.ops.reference import fm_cross_ref
    F, E = 26, 16
    x = jax.random.normal(key, (B, F, E), dt16)
    loop = chain(lambda a: (a + fm_cross_ref(a)[..., None] * dt16(1e-6),),
                 (x,), lambda c, o: o)
    dtm = timed(loop, n=300)
    report("fm_cross [B,26,16]", dtm, 4 * B * F * E,
           2 * B * F * E * 2)

    # --- CIN layer (jnp default path) ---
    from deepctr_tpu.ops.reference import cin_mix_ref
    D, H, Fq, O = 16, 128, 26, 256
    h = jax.random.normal(key, (B, D, H), dt16)
    xq = jax.random.normal(key, (B, D, Fq), dt16)
    w = (jax.random.normal(key, (O, H, Fq)) * 0.05).astype(dt16)
    loop = chain(lambda hh: (cin_mix_ref(hh, xq, w)[:, :, :H] * dt16(1e-3),),
                 (h,), lambda c, o: o)
    dtm = timed(loop)
    report("cin jnp [H128,F26,O256]", dtm, 2 * B * D * H * Fq * O,
           2 * (B * D * (H + Fq + O) + O * H * Fq)
           + 2 * 2 * B * D * H * Fq)   # includes z materialization traffic

    # --- CIN layer (pallas kernel) ---
    from deepctr_tpu.ops import pallas as P
    loop = chain(lambda hh: (P.cin_mix(hh, xq, w)[:, :, :H] * dt16(1e-3),),
                 (h,), lambda c, o: o)
    dtm = timed(loop)
    report("cin pallas [H128,F26,O256]", dtm, 2 * B * D * H * Fq * O,
           2 * (B * D * (H + Fq + O) + O * H * Fq))

    # --- CrossNet matrix layer ---
    from deepctr_tpu.ops.reference import cross_net_ref
    n = 429
    xc = jax.random.normal(key, (B, n), dt16)
    kern = (jax.random.normal(key, (2, n, n)) * 0.02).astype(dt16)
    bias = jnp.zeros((2, n, 1), dt16)
    loop = chain(lambda a: (cross_net_ref(a, kern, bias, "matrix")
                            * dt16(1e-2),), (xc,), lambda c, o: o)
    dtm = timed(loop, n=200)
    report("crossnet-mat x2 [B,429]", dtm, 2 * 2 * B * n * n,
           2 * (2 * B * n + 2 * n * n))

    # --- DNN tower 429-400-400-400 ---
    ws = [(jax.random.normal(key, s) * 0.02).astype(dt16)
          for s in ((429, 400), (400, 400), (400, 400))]
    xd = jax.random.normal(key, (B, 429), dt16)

    def dnn(a):
        hcur = a
        for wi in ws:
            hcur = jax.nn.relu(hcur[:, :wi.shape[0]] @ wi)
        return (jnp.pad(hcur, ((0, 0), (0, 29))) * dt16(1e-2),)
    loop = chain(dnn, (xd,), lambda c, o: o)
    dtm = timed(loop, n=200)
    flops = 2 * B * (429 * 400 + 400 * 400 + 400 * 400)
    report("dnn 429-400x3", dtm, flops,
           2 * (B * 429 + sum(w.size for w in ws) + B * 400))


if __name__ == "__main__":
    main()
