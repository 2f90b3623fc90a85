"""Streaming fit vs device-resident fit throughput.

Round-2 verdict #6 asked for a streaming-fit number.  The new
_fit_stream double-buffers: a background thread assembles chunk c+1
while chunk c trains inside one jitted fori_loop (per-chunk
device-resident runner), and loss readbacks are deferred to epoch end.

Measurement caveat (axon tunnel): host->device transfer through the
tunnel runs at ~KB/s, so on THIS rig a TPU streaming run measures the
tunnel, not the design — production TPU hosts upload over PCIe at
~10 GB/s where a 64k-row chunk (~10 MB) costs ~1 ms against ~50 ms of
compute.  The design-relevant overlap (host parse/assemble/shuffle vs
device step) is therefore measured on the CPU backend, where both
sides are real.  Usage: JAX_PLATFORM_NAME=cpu python tools/stream_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

N_SPARSE, N_DENSE = 26, 13
VOCAB, EMB = 10000, 16
N = 262_144
CHUNK = 32_768
BATCH = 4096
HIDDEN = (64, 32)


def main():
    import jax
    if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    rng = np.random.default_rng(0)
    cols = ([SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    x = {f.name: (rng.integers(0, VOCAB, N) if i < N_SPARSE
                  else rng.random(N).astype(np.float32))
         for i, f in enumerate(cols)}
    y = rng.integers(0, 2, N).astype(np.float32)

    def build():
        m = DeepFM(cols, cols, dnn_hidden_units=HIDDEN, seed=3)
        m.compile("adagrad", "binary_crossentropy", metrics=[])
        return m

    # device-resident control: one upfront upload, whole epochs on device
    m = build()
    Xd = m.assemble_device_input(x)
    m.fit(Xd, y, batch_size=BATCH, epochs=1, verbose=0)   # warm/compile
    t0 = time.time()
    m.fit(Xd, y, batch_size=BATCH, epochs=2, verbose=0)
    dev_eps = 2 * N / (time.time() - t0)

    # streaming: chunked callable, host assemble + upload per epoch
    def chunks():
        for lo in range(0, N, CHUNK):
            yield ({k: v[lo:lo + CHUNK] for k, v in x.items()},
                   y[lo:lo + CHUNK])

    m = build()
    m.fit(chunks, batch_size=BATCH, epochs=1, verbose=0)   # warm/compile
    t0 = time.time()
    m.fit(chunks, batch_size=BATCH, epochs=2, verbose=0)
    stream_eps = 2 * N / (time.time() - t0)

    print(json.dumps({
        "metric": "stream_vs_device_resident",
        "backend": jax.default_backend(),
        "device_resident_eps": round(dev_eps, 1),
        "stream_eps": round(stream_eps, 1),
        "stream_over_device_ratio": round(dev_eps / stream_eps, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
