"""Is the packed-lookup LANE SELECT's [n, pack, width] reshape a hidden
relayout cost?

The packed deep lookup (inputs.py EmbeddingDict._rows) gathers [n, 128]
physical rows, reshapes to [n, pack, width] (width 16 -> minor dim NOT
lane-aligned -> Mosaic relayout both directions), multiplies by a
[n, pack] one-hot and sums.  Candidates at the production shape
(26 tables x B=4096 ids x [5120, 128] substituted slices, width 16,
pack 8):

  reshape_oh — today's path: reshape + one-hot multiply + sum
  matmul_sel — lane-aligned: sel128 = onehot(pack) @ E  ([n,128] block
               mask), A = rows * sel128, out = A @ Q ([128,16] const
               lane-fold matmul); no minor-dim reshape anywhere, MXU
               does the fold, backward is (dout @ Q^T) * sel128
  gather_only — take + slice [:, :16]: lower bound (no select at all)

Each is measured forward-only and fwd+grad-wrt-tables (the real step
differentiates through the select to the substituted slices).

NOTE: buffers are created ON DEVICE and passed as jit ARGUMENTS —
closure-captured constants are baked into the HLO and re-uploaded
through the ~KB/s axon tunnel.

Usage: python tools/lane_select_micro.py
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
B = 4096
N = 5120            # substituted-slice rows
W = int(os.environ.get("SEL_WIDTH", 16))   # 17 = the fused-wide width
PACK = 128 // W
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


E_CONST = (jnp.arange(128)[None, :] // W
           == jnp.arange(PACK)[:, None]).astype(jnp.float32)   # [PACK,128]
Q_CONST = (jnp.arange(128)[:, None] % W
           == jnp.arange(W)[None, :]).astype(jnp.float32)      # [128,W]


def sel_reshape(rows128, lane):
    used = (rows128[:, :PACK * W] if PACK * W < 128 else rows128)
    rows3 = used.reshape(rows128.shape[0], PACK, W)
    oh = (jnp.arange(PACK, dtype=jnp.int32)[None, :] == lane[:, None])
    return jnp.sum(rows3 * oh[:, :, None].astype(rows3.dtype), axis=1)


def sel_matmul(rows128, lane):
    oh = (jnp.arange(PACK, dtype=jnp.int32)[None, :]
          == lane[:, None]).astype(rows128.dtype)
    sel128 = jax.lax.dot(oh, E_CONST.astype(rows128.dtype))    # [n,128]
    return jax.lax.dot(rows128 * sel128, Q_CONST.astype(rows128.dtype),
                       preferred_element_type=jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    tables = jax.jit(lambda k: jax.random.normal(
        k, (G, N, 128)) * 0.01)(key)
    # independent per-table arrays (slices of one arg block fast gather
    # lowerings — see pair_gather_micro postmortem), so split on host:
    tables = [jax.device_put(t) for t in tables]
    ids = jax.jit(lambda k: jax.random.randint(
        k, (G, B), 0, N * PACK))(key)
    u = jax.jit(lambda k: jax.random.normal(k, (G, B, W)) * 0.01)(key)

    out = {}

    def fwd_of(sel):
        def loss(ts, i, iv, uv):
            tot = jnp.float32(0)
            for k, t in enumerate(ts):
                flat = (iv[k] + i) % (N * PACK)
                rows128 = jnp.take(t, flat // PACK, axis=0)
                rows = sel(rows128, flat % PACK) if sel else \
                    rows128[:, :W]
                tot = tot + jnp.sum(rows * uv[k])
            return tot
        return loss

    variants = {"reshape_oh": sel_reshape, "matmul_sel": sel_matmul,
                "gather_only": None}
    for name, sel in variants.items():
        loss = fwd_of(sel)
        out[name + "_fwd_ms"] = bench(
            lambda i, ts, iv, uv, _l=loss: _l(list(ts), i, iv, uv),
            tuple(tables), ids, u) * 1e3
        out[name + "_fwdbwd_ms"] = bench(
            lambda i, ts, iv, uv, _l=loss: sum(
                g.reshape(-1)[0].astype(jnp.float32)
                for g in jax.grad(lambda tt: _l(tt, i, iv, uv))(list(ts))),
            tuple(tables), ids, u) * 1e3

    # numeric check: both selects agree
    r = jax.random.normal(key, (64, 128))
    ln = jax.random.randint(key, (64,), 0, PACK)
    d = jnp.abs(sel_reshape(r, ln) - sel_matmul(r, ln)).max()
    out["max_abs_diff"] = float(d)

    for k, v in out.items():
        print(json.dumps({"phase": k, "v": round(float(v), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
