"""Isolated micro: fused Pallas GRU kernel vs the masked lax.scan
recurrence, OUTSIDE the DIEN step (tools/gru_kernel_ab.py measures
end-to-end; this separates kernel-vs-scan speed from everything else in
the model — aux net, attention, lookups).

Times forward and forward+backward at the DIEN bench shape
(B=1024, H=64) across maxlens, bf16 and f32.

Usage: python tools/gru_kernel_micro.py   [MAXLENS=56,256 DTYPES=bf16]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

B, H = 1024, 64
REPS = 30


def scan_ref(gi, whh_t, bhh, mask, att, mode, remat=True):
    import jax
    import jax.numpy as jnp
    T = gi.shape[0]
    H_ = gi.shape[2] // 3

    def step(h, xs):
        gi_t, m_t, a_t = xs
        gh = h @ whh_t + bhh
        r = jax.nn.sigmoid(gi_t[:, :H_] + gh[:, :H_])
        z = jax.nn.sigmoid(gi_t[:, H_:2 * H_] + gh[:, H_:2 * H_])
        n = jnp.tanh(gi_t[:, 2 * H_:] + r * gh[:, 2 * H_:])
        if mode == "gru":
            h_new = (1.0 - z) * n + z * h
        else:
            a = a_t[:, None]
            u = a * z if mode == "augru" else a
            h_new = (1.0 - u) * h + u * n
        m = m_t[:, None]
        return h + m * (h_new - h), m * h_new

    body = jax.checkpoint(step, prevent_cse=False) if remat else step
    a_seq = (jnp.swapaxes(att, 0, 1) if att is not None
             else jnp.zeros((T, B), gi.dtype))
    h0 = jnp.zeros((B, H_), gi.dtype)
    hlast, outs = jax.lax.scan(body, h0, (gi, jnp.swapaxes(mask, 0, 1),
                                          a_seq))
    return outs, hlast


def bench(fn, gi, *rest):
    """Per-iteration time with REPS iterations inside ONE fori_loop
    (tunnel dispatch is ~30ms/call — per-call timing is meaningless
    here; bench.py methodology).  gi is rolled per iteration so XLA
    cannot hoist the body out of the loop."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, gi, *rest):
        def body(i, acc):
            out = fn(jnp.roll(gi, i, axis=1), *rest)
            # consume EVERY output fully: a single-element probe lets
            # XLA DCE the scan's unconsumed steps (the custom call
            # can't be sliced, so a lazy probe biases FOR the scan)
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return acc + s
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def timed(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(n, gi, *rest).item()
            best = min(best, time.perf_counter() - t0)
        return best

    run(1, gi, *rest).item()   # warm both shapes' compiles
    return (timed(REPS + 1) - timed(1)) / REPS


def main():
    import jax
    import jax.numpy as jnp
    from deepctr_tpu.ops.pallas_gru import gru_scan

    maxlens = [int(s) for s in
               os.environ.get("MAXLENS", "56,256").split(",")]
    dtypes = {"bf16": jnp.bfloat16, "f32": jnp.float32}
    names = os.environ.get("DTYPES", "bf16").split(",")
    mode = os.environ.get("MODE", "augru")
    for T in maxlens:
        for name in names:
            dt = dtypes[name]
            rng = np.random.default_rng(0)
            gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), dt)
            whh_t = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.3, dt)
            bhh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, dt)
            lengths = rng.integers(1, T + 1, B)
            mask = jnp.asarray((np.arange(T)[None] < lengths[:, None])
                               .astype(np.float32), dt)
            att = (jnp.asarray(rng.random((B, T)), dt)
                   if mode != "gru" else None)

            kern = functools.partial(gru_scan, mode=mode)
            scan = functools.partial(scan_ref, mode=mode)

            rec = {"T": T, "dtype": name, "mode": mode}
            rec["fwd_scan_ms"] = round(1e3 * bench(
                lambda g, w, b, a: scan(g, w, b, mask, a),
                gi, whh_t, bhh, att), 3)
            rec["fwd_kern_ms"] = round(1e3 * bench(
                lambda g, w, b, a: kern(g, w, b, mask, att=a),
                gi, whh_t, bhh, att), 3)

            def mk_grad(fn):
                def lf(g, w, b, a):
                    outs, hlast = fn(g, w, b, a)
                    return (jnp.sum(outs.astype(jnp.float32) ** 2)
                            + jnp.sum(hlast.astype(jnp.float32) ** 2))
                return jax.grad(lf, argnums=(0, 1, 2))
            rec["bwd_scan_ms"] = round(1e3 * bench(
                mk_grad(lambda g, w, b, a: scan(g, w, b, mask, a)),
                gi, whh_t, bhh, att), 3)
            rec["bwd_kern_ms"] = round(1e3 * bench(
                mk_grad(lambda g, w, b, a: kern(g, w, b, mask, att=a)),
                gi, whh_t, bhh, att), 3)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
