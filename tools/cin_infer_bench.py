"""A/B the Pallas CIN kernel on the xDeepFM INFERENCE path (real TPU).

Training keeps the XLA einsum CIN (the fused kernel loses there — custom
VJP fusion barrier, see ops/dispatch.py); inference has no VJP, so the
forward kernel dispatches on 'auto'.  This records the end-to-end
predict throughput both ways.

Usage: python tools/cin_infer_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_SPARSE, N_DENSE, VOCAB, EMB = 26, 13, 10000, 16
BATCH = 4096
STEPS = 30


def bench(use_pallas):
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import DenseFeat, SparseFeat
    from deepctr_tpu.models import xDeepFM

    dc_config.set_compute_dtype("bfloat16")
    dc_config.set_use_pallas(use_pallas)
    cols = ([SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    model = xDeepFM(cols, cols, dnn_hidden_units=(400, 400),
                    cin_layer_size=(256, 128))
    model.compile("adagrad", "binary_crossentropy", metrics=[])
    model._ensure_predict_fn()
    fwd = model._predict_fn.__wrapped__

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (BATCH, N_SPARSE), 0, VOCAB)
    dense = jax.random.uniform(key, (BATCH, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)

    @jax.jit
    def run(params, batch_stats, n):
        def body(i, acc):
            # roll the batch per step so the loop body is not
            # loop-invariant (XLA would hoist a pure repeated call)
            xb = jnp.roll(X, i, axis=0)
            y = fwd(params, batch_stats, xb)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    run(model.params, model.batch_stats, 1).item()
    def timed(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(model.params, model.batch_stats, n).item()
            best = min(best, time.perf_counter() - t0)
        return best
    t1 = timed(1)
    tn = timed(STEPS + 1)
    return BATCH * STEPS / (tn - t1)


def main():
    off = bench(False)
    on = bench("auto")
    print(json.dumps({
        "metric": "xdeepfm_predict_throughput",
        "unit": "examples/sec/chip",
        "pallas_off": round(off, 1),
        "pallas_auto": round(on, 1),
        "speedup": round(on / off, 3),
    }))


if __name__ == "__main__":
    main()
