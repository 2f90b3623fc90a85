"""Large-sample AUC parity vs DeepCTR-Torch on a planted-signal dataset.

The criteo_sample parity tables (BASELINE.md) have 39-row test sets —
several AUC points of noise.  This harness generates a SYNTHETIC CTR
dataset large enough for +/-0.002 AUC resolution (default 150k rows,
30k test), with a planted factorization-machine signal both frameworks
can learn to CONVERGENCE (vocab 100 -> ~1200 train examples per value;
at vocab 1000 both frameworks memorize instead: train AUC 0.98, test
0.54 — tuned 2026-08-19): every (feature, value) pair gets a latent vector, and
P(click) = sigmoid(scale * (sum of pairwise latent inner products +
linear effects + dense effects)).  Both frameworks train the same
DeepFM (same hypers, same split) and test AUC is compared.

The trajectory-equivalence tests (tests/test_trajectory_parity_vs_
reference.py) already prove step-level parity; this adds the
statistical end: converged model QUALITY parity at a sample size where
the comparison means something.

Usage: python tools/synthetic_auc_parity.py [--rows 150000] [--seeds 2]
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

N_SPARSE, N_DENSE = 8, 4
VOCAB, DIM_LATENT = 100, 4
EPOCHS, BATCH = 80, 4096   # converged: test-AUC seed spread ~0.0016 here


def make_dataset(rows, seed):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, VOCAB, size=(rows, N_SPARSE))
    dense = rng.normal(size=(rows, N_DENSE)).astype(np.float32)
    # planted FM signal: latent vectors per (feature, value)
    U = rng.normal(size=(N_SPARSE, VOCAB, DIM_LATENT)) / np.sqrt(DIM_LATENT)
    lin = rng.normal(size=(N_SPARSE, VOCAB)) * 0.3
    w_dense = rng.normal(size=(N_DENSE,)) * 0.3
    lat = np.stack([U[f, ids[:, f]] for f in range(N_SPARSE)], axis=1)
    s = lat.sum(axis=1)
    score = 0.5 * ((s * s).sum(-1) - (lat * lat).sum(-1).sum(-1))
    score += sum(lin[f, ids[:, f]] for f in range(N_SPARSE))
    score += dense @ w_dense
    score = (score - score.mean()) / (score.std() + 1e-9) * 2.0
    y = (rng.random(rows) < 1.0 / (1.0 + np.exp(-score))).astype(np.float32)
    x = {"C%d" % f: ids[:, f] for f in range(N_SPARSE)}
    x["__bayes_score__"] = score   # popped by main; AUC ceiling context
    for d in range(N_DENSE):
        x["I%d" % d] = dense[:, d]
    return x, y


def run_ours(x_tr, y_tr, x_te, y_te, seed):
    from sklearn.metrics import roc_auc_score
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM
    cols = ([SparseFeat("C%d" % f, VOCAB, 8) for f in range(N_SPARSE)]
            + [DenseFeat("I%d" % d, 1) for d in range(N_DENSE)])
    m = DeepFM(cols, cols, dnn_hidden_units=(64, 32), seed=seed)
    m.compile("adagrad", "binary_crossentropy", metrics=[])
    t0 = time.time()
    m.fit(x_tr, y_tr, batch_size=BATCH, epochs=EPOCHS, verbose=0)
    auc = roc_auc_score(y_te, m.predict(x_te, BATCH).reshape(-1))
    return auc, time.time() - t0


def run_reference(x_tr, y_tr, x_te, y_te, seed):
    import torch
    from sklearn.metrics import roc_auc_score
    from deepctr_torch.inputs import SparseFeat, DenseFeat
    from deepctr_torch.models import DeepFM
    torch.manual_seed(seed)
    torch.set_num_threads(os.cpu_count() or 8)
    cols = ([SparseFeat("C%d" % f, VOCAB, 8) for f in range(N_SPARSE)]
            + [DenseFeat("I%d" % d, 1) for d in range(N_DENSE)])
    m = DeepFM(cols, cols, dnn_hidden_units=(64, 32), seed=seed,
               device="cpu")
    m.compile("adagrad", "binary_crossentropy", metrics=[])
    t0 = time.time()
    m.fit(x_tr, y_tr, batch_size=BATCH, epochs=EPOCHS, verbose=0)
    auc = roc_auc_score(y_te, m.predict(x_te, BATCH).reshape(-1))
    return auc, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=150_000)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    gaps, ours_all, ref_all = [], [], []
    for seed in range(args.seeds):
        x, y = make_dataset(args.rows, seed=100 + seed)
        score = x.pop("__bayes_score__")
        n_te = args.rows // 5
        from sklearn.metrics import roc_auc_score
        bayes = roc_auc_score(y[-n_te:], score[-n_te:])
        x_tr = {k: v[:-n_te] for k, v in x.items()}
        x_te = {k: v[-n_te:] for k, v in x.items()}
        y_tr, y_te = y[:-n_te], y[-n_te:]
        a_ours, t_ours = run_ours(x_tr, y_tr, x_te, y_te, 1024 + seed)
        print(json.dumps({"seed": seed, "framework": "deepctr_tpu",
                          "test_auc": round(a_ours, 5),
                          "train_s": round(t_ours, 1),
                          "n_test": n_te, "bayes_auc": round(bayes, 5)}), flush=True)
        a_ref, t_ref = run_reference(x_tr, y_tr, x_te, y_te, 1024 + seed)
        print(json.dumps({"seed": seed, "framework": "reference",
                          "test_auc": round(a_ref, 5),
                          "train_s": round(t_ref, 1),
                          "n_test": n_te}), flush=True)
        gaps.append(a_ours - a_ref)
        ours_all.append(a_ours)
        ref_all.append(a_ref)
    # frameworks train from INDEPENDENT inits/shuffles, so single runs
    # carry ~0.002 AUC of seed noise even at convergence (measured:
    # same-framework seed spread 0.0016 at 80 epochs); the estimator of
    # a SYSTEMATIC quality difference is the mean gap over seeds
    mean_gap = abs(float(np.mean(gaps)))
    print(json.dumps({"verdict": "PASS" if mean_gap <= 0.002 else "FAIL",
                      "mean_auc_gap": round(mean_gap, 5),
                      "per_seed_gaps": [round(g, 5) for g in gaps],
                      "mean_ours": round(float(np.mean(ours_all)), 5),
                      "mean_reference": round(float(np.mean(ref_all)), 5),
                      "band": 0.002}), flush=True)


if __name__ == "__main__":
    main()
