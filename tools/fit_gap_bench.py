"""Measure the public fit() against bench.py's raw-loop number.

Round-1 gap: fit() synced the host every step (~30ms/dispatch through
the axon tunnel), so the advertised throughput existed only inside
bench.py.  With the device-resident loop (fit(x=jax.Array) — whole epoch
in one jitted fori_loop, one scalar readback per epoch) the public API
should measure within ~1.3x of the raw loop.

Usage: python tools/fit_gap_bench.py   (real TPU; ~5 min of compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

N_SPARSE, N_DENSE, EMB = 26, 13, 16
VOCAB = int(os.environ.get("BENCH_VOCAB", 10000))
BATCH = 4096
STEPS_PER_EPOCH = 100
HIDDEN = (400, 400, 400)


def main():
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    dc_config.set_compute_dtype("bfloat16")
    cols = ([SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    model = DeepFM(cols, cols, dnn_hidden_units=HIDDEN)
    model.compile(os.environ.get("BENCH_OPT", "adagrad"),
                  "binary_crossentropy", metrics=[])

    # device-resident dataset: one epoch = STEPS_PER_EPOCH full batches
    n = BATCH * STEPS_PER_EPOCH
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (n, N_SPARSE), 0, VOCAB)
    dense = jax.random.uniform(key, (n, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)
    y = jax.random.bernoulli(key, 0.25, (n,)).astype(jnp.float32)

    model.fit(X, y, batch_size=BATCH, epochs=1, verbose=0)   # compile+warm
    t0 = time.perf_counter()
    epochs = 3
    model.fit(X, y, batch_size=BATCH, epochs=epochs, verbose=0)
    dt = time.perf_counter() - t0
    fit_eps = n * epochs / dt

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ.setdefault("BENCH_EXTRAS", "0")
    import bench
    bench_eps = bench.bench_model(DeepFM, dnn_hidden_units=HIDDEN)

    print(json.dumps({
        "fit_examples_per_sec": round(fit_eps, 1),
        "bench_examples_per_sec": round(bench_eps, 1),
        "fit_vs_bench": round(bench_eps / fit_eps, 3),
    }))


if __name__ == "__main__":
    main()
