"""Headline benchmark: DeepFM training throughput (examples/sec/chip) on a
Criteo-shaped synthetic workload, run on whatever accelerator JAX exposes.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/sec/chip", "vs_baseline": N}

``vs_baseline`` is measured against the reference implementation
(DeepCTR-Torch, CPU torch in this image) running the same model/batch on
this host when available, else against the recorded torch-CPU number in
BASELINE.md context (the reference publishes no numbers of its own —
see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

# Criteo layout: 26 categorical + 13 dense (run_classification_criteo.py).
N_SPARSE = 26
N_DENSE = 13
VOCAB = 10000
EMB_DIM = 16
BATCH = 4096
STEPS = 30
WARMUP = 5
HIDDEN = (400, 400, 400)

# Reference DeepFM examples/sec at the same shapes, measured on this host
# (torch CPU, bench_reference() below, 2026-08-16).  Overridden live when
# BENCH_RUN_REFERENCE=1.
FALLBACK_REFERENCE_EPS = 21296.0


def make_data(n):
    rng = np.random.default_rng(0)
    x = {}
    for i in range(N_SPARSE):
        x["C%d" % i] = rng.integers(0, VOCAB, n).astype(np.int64)
    for i in range(N_DENSE):
        x["I%d" % i] = rng.random(n).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.float32)
    return x, y


def bench_tpu():
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM
    import jax

    dc_config.set_compute_dtype("bfloat16")
    cols = ([SparseFeat("C%d" % i, VOCAB, EMB_DIM) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    model = DeepFM(cols, cols, dnn_hidden_units=HIDDEN)
    model.compile("adagrad", "binary_crossentropy", metrics=[])

    n = BATCH * 4
    x, y = make_data(n)
    X = model._assemble_x(x)
    yv = y[:, None]
    sw = np.ones(BATCH, np.float32)

    model._ensure_compiled()
    step = model._train_step
    rng = jax.random.PRNGKey(0)

    def run_step(i):
        lo = (i * BATCH) % n
        xb = X[lo:lo + BATCH]
        yb = yv[lo:lo + BATCH]
        out = step(model.params, model.opt_state, model.batch_stats, rng,
                   xb, yb, sw)
        (model.params, model.opt_state, model.batch_stats) = out[:3]
        return out[3]

    for i in range(WARMUP):
        loss = run_step(i)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(STEPS):
        loss = run_step(i)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def bench_reference():
    """Run the reference DeepCTR-Torch at the same shapes (CPU torch)."""
    sys.path.insert(0, "/root/reference")
    import torch
    from deepctr_torch.inputs import SparseFeat, DenseFeat
    from deepctr_torch.models import DeepFM as TorchDeepFM

    cols = ([SparseFeat("C%d" % i, VOCAB, EMB_DIM) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    model = TorchDeepFM(cols, cols, dnn_hidden_units=HIDDEN, device="cpu")
    model.compile("adagrad", "binary_crossentropy", metrics=[])
    x, y = make_data(BATCH * 2)
    steps = 4
    t0 = time.perf_counter()
    model.fit(x, y, batch_size=BATCH, epochs=steps, verbose=0, shuffle=False)
    dt = time.perf_counter() - t0
    return BATCH * 2 * steps / dt


def main():
    eps = bench_tpu()
    ref_eps = FALLBACK_REFERENCE_EPS
    if os.environ.get("BENCH_RUN_REFERENCE") == "1":
        try:
            ref_eps = bench_reference()
        except Exception:
            pass
    print(json.dumps({
        "metric": "deepfm_criteo_train_throughput",
        "value": round(eps, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(eps / ref_eps, 2),
    }))


if __name__ == "__main__":
    main()
