"""Same-session A/B: fused Pallas GRU scan kernel vs the masked lax.scan
inside the full DIEN training step, on the real TPU.

Leg 1 first COMPILES + numerically checks the kernel at the bench shape
(B=1024, H=64, bf16 f32) against the scan oracle — Mosaic lowering
issues (lane slices at 64/128 within a 192-lane block) would show here,
not in the CPU interpret-mode golden tests.  Then, per maxlen, runs the
DIEN training-step benchmark with DEEPCTR_GRU_KERNEL=0 and =1
back-to-back (bench.py methodology: device-resident batch, steps inside
one fori_loop, scalar sync).

Usage: python tools/gru_kernel_ab.py            (numeric check + grid)
       SEQ_MAXLENS=50,256 python tools/gru_kernel_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def numeric_check():
    import jax
    import jax.numpy as jnp
    from deepctr_tpu.ops.pallas_gru import gru_scan
    from tests.ops.test_gru import oracle

    for mode in ("gru", "agru", "augru"):
        for dtype, tol in ((jnp.float32, 2e-4), (jnp.bfloat16, 5e-2)):
            rng = np.random.default_rng(0)
            T, B, H = 50, 1024, 64
            gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), dtype)
            whh_t = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.3, dtype)
            bhh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, dtype)
            lengths = rng.integers(0, T + 1, B)
            mask = jnp.asarray(
                (np.arange(T)[None] < lengths[:, None]).astype(np.float32),
                dtype)
            att = (jnp.asarray(rng.random((B, T)), dtype)
                   if mode != "gru" else None)

            def loss(fn, gi, whh_t, bhh, att):
                outs, hlast = fn(gi, whh_t, bhh, att)
                return (jnp.sum(outs.astype(jnp.float32) ** 2)
                        + jnp.sum(hlast.astype(jnp.float32) ** 2))

            kern = jax.jit(lambda gi, w, b, a: gru_scan(
                gi, w, b, mask, att=a, mode=mode))
            orac = jax.jit(lambda gi, w, b, a: oracle(
                gi, w, b, mask, a, mode))
            ko, kh = kern(gi, whh_t, bhh, att)
            oo, oh = orac(gi, whh_t, bhh, att)
            err_o = float(jnp.max(jnp.abs(ko.astype(jnp.float32)
                                          - oo.astype(jnp.float32))))
            gk = jax.jit(jax.grad(loss, argnums=(1, 2, 3)),
                         static_argnums=0)(kern, gi, whh_t, bhh, att)
            go = jax.jit(jax.grad(loss, argnums=(1, 2, 3)),
                         static_argnums=0)(orac, gi, whh_t, bhh, att)
            err_g = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                              - b.astype(jnp.float32))))
                        for a, b in zip(gk, go))
            scale = max(float(jnp.max(jnp.abs(g.astype(jnp.float32))))
                        for g in go)
            rec = {"check": mode, "dtype": str(jnp.dtype(dtype)),
                   "max_abs_err_fwd": err_o,
                   "max_abs_err_grad": err_g, "grad_scale": scale}
            print(json.dumps(rec), flush=True)
            assert err_o < tol and err_g < tol * max(scale, 1.0), rec
    print(json.dumps({"check": "numeric", "status": "PASS"}), flush=True)


def main():
    numeric_check()
    import tools.seq_train_bench as stb
    maxlens = [int(s) for s in
               os.environ.get("SEQ_MAXLENS", "50,100,256,512").split(",")]
    for maxlen in maxlens:
        rec = {"model": "dien", "maxlen": maxlen,
               "unit": "examples/sec/chip"}
        os.environ["DEEPCTR_GRU_KERNEL"] = "0"
        rec["scan_eps"] = round(stb.bench_ours("dien", maxlen), 1)
        os.environ["DEEPCTR_GRU_KERNEL"] = "1"
        rec["kernel_eps"] = round(stb.bench_ours("dien", maxlen), 1)
        rec["speedup"] = round(rec["kernel_eps"] / rec["scan_eps"], 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
