"""DIN / DIEN TRAINING throughput at realistic history lengths.

Round-2 verdict #5: the reference's worst serial bottleneck is the
per-timestep python GRU loop (deepctr_torch/layers/sequence.py:285-320,
driven by DIEN's packed sequences); ours is a masked lax.scan
(deepctr_tpu/layers/sequence.py) — this records the training-step
number at maxlen 50..512 that the claim "replaced the bottleneck"
needs.  DIN (attention pooling, no GRU) runs as the scan-free control:
the DIEN/DIN ratio at equal maxlen bounds the scan's share of the step.

Ours: real TPU, device-resident batch, STEPS train steps inside one
jitted fori_loop, scalar-readback sync (bench.py methodology).
SEQ_REFERENCE=1 adds the torch-CPU reference legs (same shapes, one
timed epoch over N_REF rows) — slow at large maxlen; the python loop
is the point.

Usage: python tools/seq_train_bench.py            (ours, maxlen grid)
       SEQ_REFERENCE=1 SEQ_MAXLENS=50,100 python tools/seq_train_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

VOCAB, EMB = 10000, 32
BATCH = 1024
STEPS = 30
N_REF = 8192
MAXLENS = [int(s) for s in
           os.environ.get("SEQ_MAXLENS", "50,100,256,512").split(",")]


def columns(maxlen, use_neg, sparse_cls, varlen_cls, dense_cls):
    cols = [
        sparse_cls("user", 1000, EMB),
        sparse_cls("item_id", VOCAB, EMB),
        sparse_cls("cate_id", 100, EMB),
        dense_cls("pay_score", 1),
        varlen_cls(sparse_cls("hist_item_id", VOCAB, EMB,
                              embedding_name="item_id"),
                   maxlen=maxlen, length_name="seq_length"),
        varlen_cls(sparse_cls("hist_cate_id", 100, EMB,
                              embedding_name="cate_id"),
                   maxlen=maxlen, length_name="seq_length"),
    ]
    if use_neg:
        cols += [
            varlen_cls(sparse_cls("neg_hist_item_id", VOCAB, EMB,
                                  embedding_name="item_id"),
                       maxlen=maxlen, length_name="seq_length"),
            varlen_cls(sparse_cls("neg_hist_cate_id", 100, EMB,
                                  embedding_name="cate_id"),
                       maxlen=maxlen, length_name="seq_length"),
        ]
    return cols


def data(maxlen, use_neg, n, rng):
    x = {
        "user": rng.integers(0, 1000, n),
        "item_id": rng.integers(1, VOCAB, n),
        "cate_id": rng.integers(1, 100, n),
        "pay_score": rng.random(n).astype(np.float32),
        "hist_item_id": rng.integers(1, VOCAB, (n, maxlen)),
        "hist_cate_id": rng.integers(1, 100, (n, maxlen)),
        "seq_length": rng.integers(1, maxlen + 1, n),
    }
    if use_neg:
        x["neg_hist_item_id"] = rng.integers(1, VOCAB, (n, maxlen))
        x["neg_hist_cate_id"] = rng.integers(1, 100, (n, maxlen))
    y = rng.integers(0, 2, n).astype(np.float32)
    return x, y


def bench_ours(model_name, maxlen):
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import (DenseFeat, SparseFeat,
                                      VarLenSparseFeat)
    from deepctr_tpu.models import DIEN, DIN

    dc_config.set_compute_dtype("bfloat16")
    use_neg = model_name == "dien"
    cols = columns(maxlen, use_neg, SparseFeat, VarLenSparseFeat,
                   DenseFeat)
    if model_name == "dien":
        model = DIEN(cols, ["item_id", "cate_id"], gru_type="AUGRU",
                     use_negsampling=True, dnn_hidden_units=(256, 128))
    else:
        model = DIN(cols, ["item_id", "cate_id"],
                    dnn_hidden_units=(256, 128),
                    att_weight_normalization=True)
    model.compile("adagrad", "binary_crossentropy", metrics=[])
    model._ensure_compiled()
    step = model._train_step.__wrapped__

    rng = np.random.default_rng(0)
    x, y = data(maxlen, use_neg, BATCH, rng)
    Xl = [np.asarray(x[name], dtype=np.float32).reshape(BATCH, -1)
          for name in model.feature_index]
    X = jnp.asarray(np.concatenate(Xl, axis=1))
    yj = jnp.asarray(y.reshape(-1, 1))
    sw = jnp.ones((BATCH,), jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(n, params, opt_state, table_state, batch_stats):
        def body(i, carry):
            p, o, ts, bs, acc = carry
            xb = jnp.roll(X, i, axis=0)
            p, o, ts, bs, _, total, _ = step(
                p, o, ts, bs, jax.random.fold_in(key, i), xb, yj, sw)
            return (p, o, ts, bs, acc + total)
        out = jax.lax.fori_loop(
            0, n, body, (params, opt_state, table_state, batch_stats,
                         jnp.float32(0)))
        return out[4]

    args = (model.params, model.opt_state, model.table_state,
            model.batch_stats)
    run(1, *args).item()

    def timed(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(n, *args).item()
            best = min(best, time.perf_counter() - t0)
        return best
    dt = timed(STEPS + 1) - timed(1)
    return BATCH * STEPS / dt


def bench_reference(model_name, maxlen):
    sys.path.insert(0, "/root/reference")
    import torch
    from deepctr_torch.inputs import (DenseFeat, SparseFeat,
                                      VarLenSparseFeat)
    from deepctr_torch.models import DIEN, DIN

    torch.set_num_threads(os.cpu_count() or 8)
    use_neg = model_name == "dien"
    cols = columns(maxlen, use_neg, SparseFeat, VarLenSparseFeat,
                   DenseFeat)
    if model_name == "dien":
        model = DIEN(cols, ["item_id", "cate_id"], gru_type="AUGRU",
                     use_negsampling=True, dnn_hidden_units=(256, 128),
                     device="cpu")
    else:
        model = DIN(cols, ["item_id", "cate_id"],
                    dnn_hidden_units=(256, 128),
                    att_weight_normalization=True, device="cpu")
    model.compile("adagrad", "binary_crossentropy")
    rng = np.random.default_rng(0)
    x, y = data(maxlen, use_neg, N_REF, rng)
    model.fit(x, y, batch_size=256, epochs=1, verbose=0)   # warm
    t0 = time.time()
    model.fit(x, y, batch_size=256, epochs=1, verbose=0)
    return N_REF / (time.time() - t0)


def main():
    for model_name in ("din", "dien"):
        for maxlen in MAXLENS:
            rec = {"model": model_name, "maxlen": maxlen,
                   "unit": "examples/sec/chip"}
            rec["ours_train_eps"] = round(bench_ours(model_name, maxlen),
                                          1)
            if os.environ.get("SEQ_REFERENCE") == "1":
                rec["reference_cpu_eps"] = round(
                    bench_reference(model_name, maxlen), 1)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
