"""Inference throughput: live predict_fn vs AOT serving artifact.

Measures three paths at a fixed batch size on the current backend:
  live      — model's jitted predict step (what predict() dispatches)
  exported  — jax.export artifact called in-process
  reloaded  — artifact after a serialize/deserialize round trip
              (what an actual serving process runs)

All three should land within noise of each other — the artifact IS the
same XLA program; the check is that export adds no overhead and that the
serialized program round-trips at full speed.

Usage: [BENCH_VOCAB=...] python tools/serving_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_SPARSE, N_DENSE = 26, 13
VOCAB = int(os.environ.get("BENCH_VOCAB", 10000))
EMB = 16
BATCH = 4096
STEPS = 30
HIDDEN = (400, 400, 400)


def main():
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config, serving
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    dc_config.set_compute_dtype("bfloat16")
    cols = ([SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    model = DeepFM(cols, cols, dnn_hidden_units=HIDDEN)
    model.compile("adagrad", "binary_crossentropy", metrics=[])

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (BATCH, N_SPARSE), 0, VOCAB)
    dense = jax.random.uniform(key, (BATCH, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)

    model._ensure_predict_fn()
    live = lambda xb: model._predict_fn(model.params, model.batch_stats, xb)

    exp = serving.export_predict(model, batch_size=BATCH)
    path = "/tmp/serving_bench.stablehlo"
    serving.save_exported(exp, path)
    reloaded = serving.load_exported(path)

    def timed(fn):
        # amortize dispatch: chain STEPS calls, sync once via readback
        fn(X)[0, 0].item()            # warm/compile
        t0 = time.perf_counter()
        out = None
        for _ in range(STEPS):
            out = fn(X)
        out[0, 0].item()
        return BATCH * STEPS / (time.perf_counter() - t0)

    for name, fn in (("live", live), ("exported", exp.call),
                     ("reloaded", reloaded.call)):
        eps = timed(fn)
        print(json.dumps({"path": name,
                          "examples_per_sec": round(eps, 1)}), flush=True)


if __name__ == "__main__":
    main()
