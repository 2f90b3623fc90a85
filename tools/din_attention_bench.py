"""A/B the fused Pallas DIN attention kernel on the real TPU.

Measures DIN predict (inference) throughput at long history lengths with
the fused attention kernel ON vs OFF (VERDICT r1 #6: record a measured
win or negative result at maxlen >= 256).

Methodology per bench.py: device-resident batch, steps inside one jitted
fori_loop, scalar-readback sync.

Usage: python tools/din_attention_bench.py   (real TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

MAXLEN = int(os.environ.get("DIN_MAXLEN", 256))
BATCH = int(os.environ.get("DIN_BATCH", 1024))
VOCAB, EMB = 10000, 32
STEPS = 30


def build(use_pallas):
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import (DenseFeat, SparseFeat,
                                      VarLenSparseFeat)
    from deepctr_tpu.models import DIN

    dc_config.set_compute_dtype("bfloat16")
    dc_config.set_use_pallas(use_pallas)
    cols = [
        SparseFeat("user", 1000, EMB),
        SparseFeat("item", VOCAB, EMB),
        SparseFeat("item_gender", 10, EMB),
        DenseFeat("score", 1),
        VarLenSparseFeat(SparseFeat("hist_item", VOCAB, EMB,
                                    embedding_name="item"),
                         maxlen=MAXLEN, length_name="seq_length"),
        VarLenSparseFeat(SparseFeat("hist_item_gender", 10, EMB,
                                    embedding_name="item_gender"),
                         maxlen=MAXLEN, length_name="seq_length"),
    ]
    model = DIN(cols, ["item", "item_gender"], dnn_hidden_units=(256, 128),
                att_weight_normalization=True)
    model.compile("adagrad", "binary_crossentropy", metrics=[])
    model._ensure_predict_fn()

    key = jax.random.PRNGKey(0)
    width = model.input_dim
    # feature_index order: user, item, item_gender, score, hist_item
    # [MAXLEN], hist_item_gender [MAXLEN], seq_length
    parts = [
        jax.random.randint(key, (BATCH, 1), 0, 1000).astype(jnp.float32),
        jax.random.randint(key, (BATCH, 1), 0, VOCAB).astype(jnp.float32),
        jax.random.randint(key, (BATCH, 1), 0, 10).astype(jnp.float32),
        jax.random.uniform(key, (BATCH, 1)),
        jax.random.randint(key, (BATCH, MAXLEN), 1, VOCAB).astype(
            jnp.float32),
        jax.random.randint(key, (BATCH, MAXLEN), 1, 10).astype(jnp.float32),
        jax.random.randint(key, (BATCH, 1), 1, MAXLEN + 1).astype(
            jnp.float32),
    ]
    X = jnp.concatenate(parts, axis=1)
    assert X.shape[1] == width, (X.shape, width)
    return model, X


def bench(use_pallas):
    import jax
    import jax.numpy as jnp

    model, X = build(use_pallas)
    fwd = model._predict_fn.__wrapped__

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
    on = bench(True)
    print(json.dumps({
        "metric": "din_predict_maxlen%d" % MAXLEN,
        "unit": "examples/sec/chip",
        "pallas_off": round(off, 1),
        "pallas_on": round(on, 1),
        "speedup": round(on / off, 3),
    }))


if __name__ == "__main__":
    main()
