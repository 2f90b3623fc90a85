"""Converged AUC parity vs DeepCTR-Torch beyond DeepFM: DIN, DIEN
(use_negsampling) and MMOE on planted-signal datasets (verdict r3 #4).

tools/synthetic_auc_parity.py pins DeepFM; this harness plants signals
that exercise the machinery the remaining families rewired for TPU:

* seq (DIN / DIEN): P(click) depends on a RECENCY-WEIGHTED sum of
  target-item x history-item latent inner products,
  score ~ sum_j gamma^(len-1-j) <u_target, u_hist_j>  (gamma = 0.5),
  plus linear/dense effects.  The target-history interaction is what
  DIN's LocalActivationUnit attends over; the recency decay is what
  DIEN's interest-evolution GRU tracks.  DIEN runs use_negsampling=True
  (random negative histories) so the auxiliary-BCE path trains too.
* mtl (MMOE): two binary tasks over a shared planted FM signal with
  CONFLICTING task heads (task B subtracts half the shared score), so
  the expert/gate decomposition matters; per-task AUC is compared.

Both frameworks train the same model family with the same hypers,
split, batch order discipline (shuffle inside fit, independent inits) —
the estimator of a SYSTEMATIC quality difference is the mean AUC gap
over seeds (same-framework seed spread measured ~0.002 at convergence).

Usage: python tools/synthetic_auc_parity_ext.py --model din|dien|mmoe
         [--rows 120000] [--seeds 3] [--epochs N]
Writes one JSON line per (seed, framework) plus a verdict line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, "/root/reference")

import numpy as np

V, E, T = 100, 8, 10          # item vocab (0 = pad), emb dim, maxlen
N_DENSE = 2
DIM_LATENT = 4
BATCH = 4096
GAMMA = 0.5                   # recency decay of the planted signal


def make_seq_dataset(rows, seed, use_neg):
    rng = np.random.default_rng(seed)
    item = rng.integers(1, V, rows)
    lengths = rng.integers(2, T + 1, rows)
    mask = np.arange(T)[None, :] < lengths[:, None]
    hist = np.where(mask, rng.integers(1, V, (rows, T)), 0)
    dense = rng.normal(size=(rows, N_DENSE)).astype(np.float32)

    U = rng.normal(size=(V, DIM_LATENT)) / np.sqrt(DIM_LATENT)
    lin = rng.normal(size=(V,)) * 0.3
    w_dense = rng.normal(size=(N_DENSE,)) * 0.3
    # recency weights gamma^(len-1-j) over valid positions, normalized
    pos = np.arange(T)[None, :]
    w = np.where(mask, GAMMA ** (lengths[:, None] - 1 - pos), 0.0)
    w = w / w.sum(axis=1, keepdims=True)
    sims = (U[item][:, None, :] * U[hist]).sum(-1) * np.sqrt(DIM_LATENT)
    score = (w * sims).sum(1) * 3.0 + lin[item] + dense @ w_dense
    score = (score - score.mean()) / (score.std() + 1e-9) * 2.0
    y = (rng.random(rows) < 1.0 / (1.0 + np.exp(-score))).astype(np.float32)

    x = {"item": item, "seq_length": lengths, "hist_item": hist}
    if use_neg:
        x["neg_hist_item"] = np.where(mask, rng.integers(1, V, (rows, T)),
                                      0)
    for d in range(N_DENSE):
        x["I%d" % d] = dense[:, d]
    return x, y, score


def seq_columns(SparseFeat, DenseFeat, VarLenSparseFeat, use_neg):
    cols = [SparseFeat("item", V, E)]
    cols += [DenseFeat("I%d" % d, 1) for d in range(N_DENSE)]
    cols.append(VarLenSparseFeat(
        SparseFeat("hist_item", V, E, embedding_name="item"), T,
        length_name="seq_length"))
    if use_neg:
        cols.append(VarLenSparseFeat(
            SparseFeat("neg_hist_item", V, E, embedding_name="item"), T,
            length_name="seq_length"))
    return cols


def make_mtl_dataset(rows, seed):
    rng = np.random.default_rng(seed)
    n_sparse = 6
    ids = rng.integers(0, V, size=(rows, n_sparse))
    dense = rng.normal(size=(rows, N_DENSE)).astype(np.float32)
    U = rng.normal(size=(n_sparse, V, DIM_LATENT)) / np.sqrt(DIM_LATENT)
    lin_a = rng.normal(size=(n_sparse, V)) * 0.3
    lin_b = rng.normal(size=(n_sparse, V)) * 0.3
    lat = np.stack([U[f, ids[:, f]] for f in range(n_sparse)], axis=1)
    s = lat.sum(axis=1)
    shared = 0.5 * ((s * s).sum(-1) - (lat * lat).sum(-1).sum(-1))
    sa = shared + sum(lin_a[f, ids[:, f]] for f in range(n_sparse))
    sb = -0.5 * shared + sum(lin_b[f, ids[:, f]] for f in range(n_sparse))
    ys = []
    for sc in (sa, sb):
        sc = (sc - sc.mean()) / (sc.std() + 1e-9) * 2.0
        ys.append((rng.random(rows)
                   < 1.0 / (1.0 + np.exp(-sc))).astype(np.float32))
    x = {"C%d" % f: ids[:, f] for f in range(n_sparse)}
    for d in range(N_DENSE):
        x["I%d" % d] = dense[:, d]
    return x, np.stack(ys, axis=1)


def mtl_columns(SparseFeat, DenseFeat):
    return ([SparseFeat("C%d" % f, V, E) for f in range(6)]
            + [DenseFeat("I%d" % d, 1) for d in range(N_DENSE)])


def _split(x, y, rows):
    n_te = rows // 5
    x_tr = {k: v[:-n_te] for k, v in x.items()}
    x_te = {k: v[-n_te:] for k, v in x.items()}
    return x_tr, x_te, y[:-n_te], y[-n_te:], n_te


def _seq_kwargs(model):
    if model == "din":
        return dict(dnn_hidden_units=(64, 32), att_hidden_size=(32, 16))
    return dict(gru_type="AUGRU", use_negsampling=True, alpha=1.0,
                dnn_hidden_units=(64, 32), att_hidden_units=(32, 16))


def run_seq(framework, model, x_tr, y_tr, x_te, y_te, seed, epochs):
    from sklearn.metrics import roc_auc_score
    if framework == "ours":
        from deepctr_tpu.features import (SparseFeat, DenseFeat,
                                          VarLenSparseFeat)
        from deepctr_tpu import models as zoo
    else:
        import torch
        torch.manual_seed(seed)
        torch.set_num_threads(os.cpu_count() or 8)
        from deepctr_torch.inputs import (SparseFeat, DenseFeat,
                                          VarLenSparseFeat)
        from deepctr_torch import models as zoo
    cols = seq_columns(SparseFeat, DenseFeat, VarLenSparseFeat,
                       use_neg=(model == "dien"))
    cls = zoo.DIN if model == "din" else zoo.DIEN
    kwargs = dict(_seq_kwargs(model), seed=seed)
    if framework == "reference":
        kwargs["device"] = "cpu"
    m = cls(cols, ["item"], **kwargs)
    m.compile("adagrad", "binary_crossentropy", metrics=[])
    t0 = time.time()
    m.fit(x_tr, y_tr, batch_size=BATCH, epochs=epochs, verbose=0)
    auc = roc_auc_score(y_te, np.asarray(m.predict(x_te, BATCH),
                                         np.float64).reshape(-1))
    return auc, time.time() - t0


def run_mtl(framework, x_tr, y_tr, x_te, y_te, seed, epochs):
    from sklearn.metrics import roc_auc_score
    if framework == "ours":
        from deepctr_tpu.features import SparseFeat, DenseFeat
        from deepctr_tpu.models import MMOE
    else:
        import torch
        torch.manual_seed(seed)
        torch.set_num_threads(os.cpu_count() or 8)
        from deepctr_torch.inputs import SparseFeat, DenseFeat
        from deepctr_torch.models import MMOE
    cols = mtl_columns(SparseFeat, DenseFeat)
    kwargs = dict(num_experts=4, expert_dnn_hidden_units=(64, 32),
                  gate_dnn_hidden_units=(16,),
                  tower_dnn_hidden_units=(16,),
                  task_types=("binary", "binary"),
                  task_names=("a", "b"), seed=seed)
    if framework == "reference":
        kwargs["device"] = "cpu"
    m = MMOE(cols, **kwargs)
    m.compile("adagrad",
              ["binary_crossentropy", "binary_crossentropy"], metrics=[])
    t0 = time.time()
    m.fit(x_tr, y_tr, batch_size=BATCH, epochs=epochs, verbose=0)
    pred = np.asarray(m.predict(x_te, BATCH), np.float64)
    aucs = [roc_auc_score(y_te[:, k], pred[:, k]) for k in range(2)]
    return float(np.mean(aucs)), time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["din", "dien", "mmoe"],
                    required=True)
    ap.add_argument("--rows", type=int, default=120_000)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--backend", default="cpu",
                    help="jax platform for 'ours' (default cpu: quality "
                         "parity is backend-independent and the TPU is "
                         "often held by a bench; pass 'default' to use "
                         "the ambient backend)")
    args = ap.parse_args()
    if args.backend != "default":
        import jax
        jax.config.update("jax_platforms", args.backend)
    epochs = args.epochs or {"din": 30, "dien": 20, "mmoe": 40}[args.model]

    from sklearn.metrics import roc_auc_score
    gaps, ours_all, ref_all = [], [], []
    for seed in range(args.seeds):
        if args.model == "mmoe":
            x, y = make_mtl_dataset(args.rows, seed=100 + seed)
            x_tr, x_te, y_tr, y_te, n_te = _split(x, y, args.rows)
            a_ours, t_ours = run_mtl("ours", x_tr, y_tr, x_te, y_te,
                                     1024 + seed, epochs)
            a_ref, t_ref = run_mtl("reference", x_tr, y_tr, x_te, y_te,
                                   1024 + seed, epochs)
            bayes = None
        else:
            x, y, score = make_seq_dataset(args.rows, seed=100 + seed,
                                           use_neg=(args.model == "dien"))
            x_tr, x_te, y_tr, y_te, n_te = _split(x, y, args.rows)
            bayes = round(roc_auc_score(y_te, score[-n_te:]), 5)
            a_ours, t_ours = run_seq("ours", args.model, x_tr, y_tr,
                                     x_te, y_te, 1024 + seed, epochs)
            a_ref, t_ref = run_seq("reference", args.model, x_tr, y_tr,
                                   x_te, y_te, 1024 + seed, epochs)
        print(json.dumps({"model": args.model, "seed": seed,
                          "framework": "deepctr_tpu",
                          "test_auc": round(a_ours, 5),
                          "train_s": round(t_ours, 1), "n_test": n_te,
                          "bayes_auc": bayes, "epochs": epochs}),
              flush=True)
        print(json.dumps({"model": args.model, "seed": seed,
                          "framework": "reference",
                          "test_auc": round(a_ref, 5),
                          "train_s": round(t_ref, 1)}), flush=True)
        gaps.append(a_ours - a_ref)
        ours_all.append(a_ours)
        ref_all.append(a_ref)
    mean_gap = abs(float(np.mean(gaps)))
    print(json.dumps({"model": args.model,
                      "verdict": "PASS" if mean_gap <= 0.002 else "FAIL",
                      "mean_auc_gap": round(mean_gap, 5),
                      "per_seed_gaps": [round(g, 5) for g in gaps],
                      "mean_ours": round(float(np.mean(ours_all)), 5),
                      "mean_reference": round(float(np.mean(ref_all)), 5),
                      "band": 0.002}), flush=True)


if __name__ == "__main__":
    main()
