"""INFERENCE throughput (predict examples/sec/chip) for the headline
configs + jax.export serving-artifact overhead (round-4 verdict #5: the
reference's predict loop, ref basemodel.py:325-352, is half its API
surface and we had no recorded inference numbers).

Methodology = bench.py's (axon tunnel: device-resident batch, STEPS
forward passes inside ONE jitted lax.fori_loop with the batch rolled
per step, scalar-readback sync; first-call subtraction removes the
dispatch round-trip).

Configs: DeepFM standard (vocab 10k), DeepFM criteo_real (true Kaggle
cardinalities), xDeepFM (reports BOTH CIN dispatches: XLA einsum and
the Pallas inference kernel — the round-2 micro had the kernel 1.53x
on the CIN alone), DIN/DIEN at maxlen 100.  The serving leg exports
the DeepFM-standard artifact (fixed batch) and runs the SAME fori_loop
through ``exported.call`` — the delta vs the in-process forward is the
artifact's call overhead.

Usage: python tools/predict_bench.py            (all legs, prints JSON)
       PREDICT_CONFIGS=deepfm,din python tools/predict_bench.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import bench as train_bench

BATCH = 4096
SEQ_BATCH = 1024
STEPS = 50


def _timed_loop(run_n, batch):
    """eps from best-of-3 timed (t(STEPS+1) - t(1)) / STEPS."""
    def timed(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_n(n).item()
            best = min(best, time.perf_counter() - t0)
        return best

    run_n(1).item()   # warm/compile
    t1 = timed(1)
    tn = timed(STEPS + 1)
    return batch / ((tn - t1) / STEPS)


def _forward_loop(model, X):
    """Jitted n-step forward-only loop over rolled batches.

    params/batch_stats/X ride as jit ARGUMENTS, not closure constants —
    closing over them bakes the tables into the program as constants
    (2.5 GB of HLO at criteo_real), which the axon tunnel cannot upload
    inside the compile window."""
    import functools
    import jax
    import jax.numpy as jnp

    forward = model._make_forward()
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_args(params, batch_stats, X, n):
        def body(i, acc):
            xb = jnp.roll(X, i, axis=0)
            y_pred, _, _ = forward(params, batch_stats, xb, False, key)
            return acc + jnp.sum(y_pred.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return functools.partial(run_args, model.params, model.batch_stats, X)


def bench_predict(model_cls, vocab=None, vocabs=None, **kwargs):
    """Inference eps for a bench.py-shaped (26 sparse + 13 dense) model."""
    from deepctr_tpu import config as dc_config
    train_bench.VOCABS = vocabs
    train_bench.VOCAB = vocab if vocab is not None else 10000
    dc_config.set_compute_dtype("bfloat16")
    cols = train_bench._columns()
    model = model_cls(cols, cols, **kwargs)
    import jax
    X, _, _ = train_bench._device_batch(jax.random.PRNGKey(0),
                                        model.input_dim,
                                        model.feature_index)
    return _timed_loop(_forward_loop(model, X), BATCH)


def bench_predict_seq(model_name, maxlen):
    """DIN / DIEN inference eps at a given history length."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "seq_train_bench",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "seq_train_bench.py"))
    stb = ilu.module_from_spec(spec)
    spec.loader.exec_module(stb)
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat, DenseFeat, VarLenSparseFeat
    from deepctr_tpu.models import DIN, DIEN
    import jax
    import jax.numpy as jnp

    dc_config.set_compute_dtype("bfloat16")
    use_neg = model_name == "dien"
    cols = stb.columns(maxlen, use_neg, SparseFeat, VarLenSparseFeat,
                       DenseFeat)
    if model_name == "dien":
        model = DIEN(cols, ["item_id", "cate_id"], gru_type="AUGRU",
                     use_negsampling=True, alpha=1.0,
                     dnn_hidden_units=(256, 128))
    else:
        model = DIN(cols, ["item_id", "cate_id"],
                    dnn_hidden_units=(256, 128))
    rng = np.random.default_rng(0)
    x, _ = stb.data(maxlen, use_neg, SEQ_BATCH, rng)
    Xh = np.zeros((SEQ_BATCH, model.input_dim), np.float32)
    for name, (lo, hi) in model.feature_index.items():
        v = x[name]
        Xh[:, lo:hi] = v.reshape(SEQ_BATCH, hi - lo)
    X = jnp.asarray(Xh)
    return _timed_loop(_forward_loop(model, X), SEQ_BATCH)


def bench_serving_artifact():
    """DeepFM-standard artifact call vs in-process forward (same loop)."""
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.serving import export_predict
    import jax
    import jax.numpy as jnp

    train_bench.VOCABS = None
    train_bench.VOCAB = 10000
    dc_config.set_compute_dtype("bfloat16")
    cols = train_bench._columns()
    model = DeepFM(cols, cols, dnn_hidden_units=train_bench.HIDDEN)
    X, _, _ = train_bench._device_batch(jax.random.PRNGKey(0),
                                        model.input_dim,
                                        model.feature_index)
    in_process = _timed_loop(_forward_loop(model, X), BATCH)

    exported = export_predict(model, batch_size=BATCH)

    @jax.jit
    def run(n):
        def body(i, acc):
            xb = jnp.roll(X, i, axis=0)
            y_pred = exported.call(xb)
            return acc + jnp.sum(y_pred.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    artifact = _timed_loop(run, BATCH)
    return {"in_process_eps": round(in_process, 1),
            "artifact_eps": round(artifact, 1),
            "artifact_overhead_x": round(in_process / artifact, 3)}


def main():
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.models import DeepFM, xDeepFM

    which = os.environ.get("PREDICT_CONFIGS",
                           "deepfm,criteo_real,xdeepfm,din,dien,serving")
    which = set(which.split(","))
    out = {}
    if "deepfm" in which:
        out["deepfm_predict_eps"] = round(bench_predict(
            DeepFM, dnn_hidden_units=train_bench.HIDDEN), 1)
    if "criteo_real" in which:
        out["deepfm_criteo_real_predict_eps"] = round(bench_predict(
            DeepFM, vocabs=train_bench.CRITEO_KAGGLE_VOCABS,
            dnn_hidden_units=train_bench.HIDDEN), 1)
    if "xdeepfm" in which:
        # CIN inference dispatch A/B: 'auto' = Pallas inference kernel
        # on TPU (ops/dispatch.cin_mix), off = XLA einsum
        kw = dict(dnn_hidden_units=(400, 400), cin_layer_size=(256, 128))
        try:
            dc_config.set_use_pallas(False)
            out["xdeepfm_predict_eps_xla"] = round(
                bench_predict(xDeepFM, **kw), 1)
        finally:
            dc_config.set_use_pallas("auto")
        out["xdeepfm_predict_eps_pallas_cin"] = round(
            bench_predict(xDeepFM, **kw), 1)
    if "din" in which:
        out["din_predict_maxlen100_eps"] = round(
            bench_predict_seq("din", 100), 1)
    if "dien" in which:
        out["dien_predict_maxlen100_eps"] = round(
            bench_predict_seq("dien", 100), 1)
    if "serving" in which:
        out["serving_artifact"] = bench_serving_artifact()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
