"""bf16 vs f32 converged-quality check for the models with the most
bf16-sensitive paths (round-4 verdict #7): DIEN (masked GRU scan
carries) and xDeepFM (CIN conv chains).

Protocol = BASELINE.md's DeepFM bf16 check: the planted-signal
synthetic, ours trained twice per seed — f32 compute vs bf16 compute
(set_compute_dtype; params stay f32 either way) — over >=3 seeds, test
AUC compared.  PASS when the |mean gap| sits inside the ~0.002
same-framework seed-noise floor.

Usage: python tools/bf16_quality.py --model dien --seeds 3
       python tools/bf16_quality.py --model xdeepfm --seeds 3
"""

import argparse
import importlib.util
import json
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, ".."))

import numpy as np


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_here, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_ours(model, dtype, x_tr, y_tr, x_te, y_te, seed, epochs, batch):
    from sklearn.metrics import roc_auc_score
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import (SparseFeat, DenseFeat,
                                      VarLenSparseFeat)
    from deepctr_tpu import models as zoo

    dc_config.set_compute_dtype(dtype)
    try:
        if model == "dien":
            ext = _load("synthetic_auc_parity_ext")
            cols = ext.seq_columns(SparseFeat, DenseFeat, VarLenSparseFeat,
                                   use_neg=True)
            m = zoo.DIEN(cols, ["item"], seed=seed,
                         **ext._seq_kwargs("dien"))
        else:
            sap = _load("synthetic_auc_parity")
            cols = ([SparseFeat("C%d" % f, sap.VOCAB, 8)
                     for f in range(sap.N_SPARSE)]
                    + [DenseFeat("I%d" % d, 1)
                       for d in range(sap.N_DENSE)])
            m = zoo.xDeepFM(cols, cols, seed=seed,
                            dnn_hidden_units=(64, 32),
                            cin_layer_size=(32, 16))
        m.compile("adagrad", "binary_crossentropy", metrics=[])
        t0 = time.time()
        m.fit(x_tr, y_tr, batch_size=batch, epochs=epochs, verbose=0)
        auc = roc_auc_score(
            y_te, np.asarray(m.predict(x_te, batch),
                             np.float64).reshape(-1))
        return auc, time.time() - t0
    finally:
        dc_config.set_compute_dtype("float32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["dien", "xdeepfm"], required=True)
    ap.add_argument("--rows", type=int, default=120_000)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--backend", default="cpu")
    args = ap.parse_args()
    if args.backend != "default":
        import jax
        jax.config.update("jax_platforms", args.backend)
    epochs = args.epochs or {"dien": 20, "xdeepfm": 60}[args.model]
    batch = 4096

    from sklearn.metrics import roc_auc_score
    gaps, f32_all, bf16_all = [], [], []
    for seed in range(args.seeds):
        if args.model == "dien":
            ext = _load("synthetic_auc_parity_ext")
            x, y, score = ext.make_seq_dataset(args.rows, seed=100 + seed,
                                               use_neg=True)
            x_tr, x_te, y_tr, y_te, n_te = ext._split(x, y, args.rows)
        else:
            sap = _load("synthetic_auc_parity")
            made = sap.make_dataset(args.rows, seed=100 + seed)
            x, y = made[0], made[1]
            n_te = args.rows // 5
            x_tr = {k: v[:-n_te] for k, v in x.items()}
            x_te = {k: v[-n_te:] for k, v in x.items()}
            y_tr, y_te = y[:-n_te], y[-n_te:]
        a32, t32 = run_ours(args.model, "float32", x_tr, y_tr, x_te,
                            y_te, 1024 + seed, epochs, batch)
        a16, t16 = run_ours(args.model, "bfloat16", x_tr, y_tr, x_te,
                            y_te, 1024 + seed, epochs, batch)
        print(json.dumps({"model": args.model, "seed": seed,
                          "f32_auc": round(a32, 5),
                          "bf16_auc": round(a16, 5),
                          "gap": round(a16 - a32, 5),
                          "epochs": epochs}), flush=True)
        gaps.append(a16 - a32)
        f32_all.append(a32)
        bf16_all.append(a16)
    mean_gap = float(np.mean(gaps))
    print(json.dumps({
        "model": args.model,
        "verdict": "PASS" if abs(mean_gap) <= 0.002 else "FAIL",
        "mean_gap_bf16_minus_f32": round(mean_gap, 5),
        "per_seed_gaps": [round(g, 5) for g in gaps],
        "mean_f32": round(float(np.mean(f32_all)), 5),
        "mean_bf16": round(float(np.mean(bf16_all)), 5),
        "band": 0.002}), flush=True)


if __name__ == "__main__":
    main()
