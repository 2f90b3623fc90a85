"""Full-Criteo dress rehearsal (round-4 verdict #4): everything the real
day-file run needs, exercised end-to-end on a SYNTHESIZED criteo-format
file with a planted signal — so when a real day_* dump appears, the run
is one ``--path`` away.

Stages (select with --stages, comma-separated):

  synth     write a ≥50M-row tab-separated criteo-format file
            (label + 13 ints + 26 hex categoricals, fixed-width fields
            written via LUT gathers — ~GB/s).  The label is Bernoulli of
            a planted logit over two categorical latents + one dense
            effect; the stage records the BAYES AUC (scoring a held-out
            sample with the true probabilities) as the quality ceiling.
  stream    stream-train DeepFM on the real chip via
            fit(criteo_stream(path, ...)) for --stream-chunks chunks;
            records streaming examples/sec/chip.
  resident  device-resident fit on the first --resident-rows rows at the
            same geometry; records ex/s/chip and the streaming/resident
            ratio (the number BASELINE.md carried only CPU-measured).
  auc       the reference's canonical AUC protocol
            (run_classification_criteo.py:12-66: LabelEncoder +
            MinMaxScaler + 80/20 split) on a --auc-rows subsample, BOTH
            frameworks, test AUC compared to each other and the ceiling.

Usage:
  python tools/full_criteo_rehearsal.py --rows 50000000 --stages synth
  python tools/full_criteo_rehearsal.py --stages stream,resident,auc
  (tools/on_full_criteo.sh runs the full sequence and appends the
  record to BASELINE.md)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

DEFAULT_PATH = "/tmp/criteo_synth.txt"
N_SPARSE, N_DENSE = 26, 13
# distinct values of the signal-carrying columns: small enough that a
# few-hundred-k-row AUC subsample sees each value many times (the
# protocol must be able to LEARN the signal); cardinality realism comes
# from the other 24 columns at OTHER_VOCAB distinct values
SIG_VOCAB = 2_000
OTHER_VOCAB = 100_000    # distinct values elsewhere
DIM = 4                  # latent dim of the planted interaction


def _luts(seed):
    """Per-field byte LUTs (fixed width: ints 3 digits, cats 6 hex)."""
    dense_lut = np.array(["%03d" % v for v in range(1000)], dtype="S3")
    cat_lut = np.array(["%06x" % v for v in range(OTHER_VOCAB)],
                       dtype="S6")
    return dense_lut, cat_lut


def _planted(seed):
    rng = np.random.default_rng(seed)
    u1 = rng.normal(size=(SIG_VOCAB, DIM)) / np.sqrt(DIM)
    u2 = rng.normal(size=(SIG_VOCAB, DIM)) / np.sqrt(DIM)
    b1 = rng.normal(size=(SIG_VOCAB,)) * 0.4
    b2 = rng.normal(size=(SIG_VOCAB,)) * 0.4
    return u1, u2, b1, b2


def _chunk_logits(ids1, ids2, d0, planted):
    u1, u2, b1, b2 = planted
    inter = (u1[ids1] * u2[ids2]).sum(-1)
    return 2.0 * inter + b1[ids1] + b2[ids2] + 0.8 * (d0 - 0.5) - 0.3


def synth(path, rows, seed=0, chunk=1_000_000):
    """Write the criteo-format file; returns dict with the Bayes AUC."""
    dense_lut, cat_lut = _luts(seed)
    planted = _planted(seed)
    row_w = 1 + N_DENSE * 4 + N_SPARSE * 7  # label + \t-joined fields + \n
    tab = ord("\t")
    t0 = time.time()
    bayes_scores, bayes_labels = [], []
    with open(path, "wb", buffering=1 << 24) as fh:
        done = 0
        ci = 0
        while done < rows:
            n = min(chunk, rows - done)
            rng = np.random.default_rng((seed << 20) + ci)
            ids1 = rng.integers(0, SIG_VOCAB, n)
            ids2 = rng.integers(0, SIG_VOCAB, n)
            dense_raw = rng.integers(0, 1000, (n, N_DENSE))
            d0 = dense_raw[:, 0] / 999.0
            logit = _chunk_logits(ids1, ids2, d0, planted)
            p = 1.0 / (1.0 + np.exp(-logit))
            y = (rng.random(n) < p)
            if ci == 0:   # held-out chunk scores the Bayes ceiling
                bayes_scores.append(p)
                bayes_labels.append(y)

            buf = np.empty((n, row_w), np.uint8)
            buf[:, 0] = np.where(y, ord("1"), ord("0"))
            pos = 1
            for j in range(N_DENSE):
                buf[:, pos] = tab
                col = dense_lut[dense_raw[:, j]].view(np.uint8)
                buf[:, pos + 1:pos + 4] = col.reshape(n, 3)
                pos += 4
            cats = rng.integers(0, OTHER_VOCAB, (n, N_SPARSE))
            cats[:, 0] = ids1
            cats[:, 1] = ids2
            for j in range(N_SPARSE):
                buf[:, pos] = tab
                col = cat_lut[cats[:, j]].view(np.uint8)
                buf[:, pos + 1:pos + 7] = col.reshape(n, 6)
                pos += 7
            buf[:, -1] = ord("\n")
            fh.write(buf.tobytes())
            done += n
            ci += 1
            if ci % 10 == 0:
                print("  synth %dM rows, %.0fs" % (done // 10**6,
                                                   time.time() - t0),
                      file=sys.stderr, flush=True)
    from sklearn.metrics import roc_auc_score
    bayes = roc_auc_score(np.concatenate(bayes_labels),
                          np.concatenate(bayes_scores))
    return {"rows": rows, "path": path, "bytes": os.path.getsize(path),
            "synth_s": round(time.time() - t0, 1),
            "bayes_auc": round(float(bayes), 4)}


def _model(vocab, emb=16, hidden=(400, 400, 400)):
    from deepctr_tpu import criteo_columns, set_compute_dtype
    from deepctr_tpu.models import DeepFM
    set_compute_dtype("bfloat16")
    cols = criteo_columns(vocab_size=vocab, embedding_dim=emb)
    m = DeepFM(cols, cols, dnn_hidden_units=hidden)
    m.compile("adagrad", "binary_crossentropy", metrics=[])
    return m, cols


def stream(path, vocab, batch, n_chunks, chunk_rows=1 << 20):
    """Streaming fit throughput over the first n_chunks chunks.

    Rows are COUNTED as yielded, not assumed: criteo_stream emits a
    chunk per read-buffer drain (<= chunk_rows rows), so chunk count x
    chunk_rows overstated the trained rows 14.7x in the first version
    of this harness.  read_bytes is raised so chunks actually reach
    chunk_rows (one runner dispatch + one upload per ~1M rows)."""
    from deepctr_tpu import criteo_stream
    m, cols = _model(vocab)
    full = criteo_stream(path, cols, chunk_rows=chunk_rows,
                         read_bytes=1 << 28)
    counter = {"rows": 0}

    def capped():
        it = full()
        for i, item in enumerate(it):
            if i >= n_chunks:
                break
            counter["rows"] += len(item[1])
            yield item

    def _drain(m):
        # force the device queue empty INSIDE the timed window: through
        # the axon tunnel block_until_ready doesn't block and device_put
        # is async, so a returned fit() may still have uploads + steps
        # queued — read a scalar that depends on the LAST step's params
        import jax
        for leaf in jax.tree_util.tree_leaves(m.table_state) + \
                jax.tree_util.tree_leaves(m.params):
            if getattr(leaf, "size", 0):
                float(leaf.reshape(-1)[0])
                return

    # warm epoch (compiles) then a timed epoch — fit() caches its
    # per-geometry runners so epoch 2 is compile-free
    m.fit(capped, batch_size=batch, epochs=1, verbose=0)
    _drain(m)
    counter["rows"] = 0
    t0 = time.time()
    m.fit(capped, batch_size=batch, epochs=1, verbose=0)
    _drain(m)
    dt = time.time() - t0
    n = counter["rows"]
    return {"stream_eps": round(n / dt, 1), "rows_per_epoch": n,
            "batch": batch}


def resident(path, vocab, batch, rows):
    """Device-resident fit throughput on the first `rows` rows."""
    from deepctr_tpu import criteo_stream
    m, cols = _model(vocab)
    x_parts, y_parts, got = {}, [], 0
    for x, y in criteo_stream(path, cols, chunk_rows=1 << 20)():
        for k, v in x.items():
            x_parts.setdefault(k, []).append(v)
        y_parts.append(y)
        got += len(y)
        if got >= rows:
            break
    x = {k: np.concatenate(v)[:rows] for k, v in x_parts.items()}
    y = np.concatenate(y_parts)[:rows]
    # the device-resident epoch runner engages when x is a flat
    # [N, input_dim] jax.Array (fit's dispatch; dict-x takes the host
    # per-batch loop whose ~30ms/dispatch tunnel round trips dominate)
    import jax.numpy as jnp
    X = jnp.asarray(m._assemble_x(x))

    # time epoch 2 INSIDE one fit call: a second fit() re-uploads the
    # host arrays through the tunnel (~8 MB/s) and measures the upload,
    # not the device-resident loop
    from deepctr_tpu.callbacks import Callback

    class _EpochTimer(Callback):
        def __init__(self):
            self.t = []

        def on_epoch_begin(self, epoch, logs=None):
            self._t0 = time.time()

        def on_epoch_end(self, epoch, logs=None):
            self.t.append(time.time() - self._t0)

    timer = _EpochTimer()
    m.fit(X, y, batch_size=batch, epochs=2, verbose=0, shuffle=False,
          callbacks=[timer])
    dt = timer.t[-1]
    return {"resident_eps": round(rows / dt, 1), "rows": rows}


def auc_protocol(path, rows, frameworks=("ours", "reference"),
                 epochs=3, batch=4096):
    """The reference's canonical Criteo recipe on a subsample of the
    file (ref examples/run_classification_criteo.py:12-66), both
    frameworks: pandas read -> LabelEncoder on categoricals ->
    MinMaxScaler on dense -> 80/20 split -> DeepFM -> test AUC."""
    import pandas as pd
    from sklearn.metrics import roc_auc_score
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import LabelEncoder, MinMaxScaler

    names = (["label"] + ["I%d" % i for i in range(1, 14)]
             + ["C%d" % i for i in range(1, 27)])
    data = pd.read_csv(path, sep="\t", header=None, names=names,
                       nrows=rows)
    sparse_features = ["C%d" % i for i in range(1, 27)]
    dense_features = ["I%d" % i for i in range(1, 14)]
    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])
    data[dense_features] = MinMaxScaler().fit_transform(
        data[dense_features])
    out = {}
    for fw in frameworks:
        if fw == "ours":
            from deepctr_tpu.features import SparseFeat, DenseFeat
            from deepctr_tpu.models import DeepFM
            from deepctr_tpu import config as dc_config
            dc_config.set_compute_dtype("bfloat16")
        else:
            sys.path.insert(0, "/root/reference")
            import torch
            torch.set_num_threads(os.cpu_count() or 8)
            from deepctr_torch.inputs import SparseFeat, DenseFeat  # noqa
            from deepctr_torch.models import DeepFM  # noqa
        cols = ([SparseFeat(f, data[f].max() + 1, 16)
                 for f in sparse_features]
                + [DenseFeat(f, 1) for f in dense_features])
        train, test = train_test_split(data, test_size=0.2,
                                       random_state=2020)
        tr = {n: train[n].values for n in sparse_features + dense_features}
        te = {n: test[n].values for n in sparse_features + dense_features}
        model = DeepFM(cols, cols, task="binary",
                       dnn_hidden_units=(400, 400, 400))
        if fw == "reference":
            model.compile("adagrad", "binary_crossentropy", metrics=[])
        else:
            model.compile("adagrad", "binary_crossentropy", metrics=[])
        t0 = time.time()
        model.fit(tr, train["label"].values, batch_size=batch,
                  epochs=epochs, verbose=0)
        pred = model.predict(te, batch_size=batch)
        out[fw + "_auc"] = round(
            float(roc_auc_score(test["label"].values, pred)), 4)
        out[fw + "_train_s"] = round(time.time() - t0, 1)
    if "ours_auc" in out and "reference_auc" in out:
        out["auc_gap"] = round(out["ours_auc"] - out["reference_auc"], 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=DEFAULT_PATH)
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--stages", default="synth,stream,resident,auc")
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--stream-chunks", type=int, default=8)
    ap.add_argument("--resident-rows", type=int, default=4 << 20)
    ap.add_argument("--auc-rows", type=int, default=500_000)
    ap.add_argument("--auc-epochs", type=int, default=3)
    args = ap.parse_args()
    stages = args.stages.split(",")
    record = {"config": vars(args)}
    if "synth" in stages:
        record["synth"] = synth(args.path, args.rows)
        print(json.dumps({"synth": record["synth"]}), flush=True)
    if "stream" in stages:
        record["stream"] = stream(args.path, args.vocab, args.batch,
                                  args.stream_chunks)
        print(json.dumps({"stream": record["stream"]}), flush=True)
    if "resident" in stages:
        record["resident"] = resident(args.path, args.vocab, args.batch,
                                      args.resident_rows)
        if "stream" in record:
            record["resident"]["stream_vs_resident"] = round(
                record["stream"]["stream_eps"]
                / record["resident"]["resident_eps"], 3)
        print(json.dumps({"resident": record["resident"]}), flush=True)
    if "auc" in stages:
        record["auc"] = auc_protocol(args.path, args.auc_rows,
                                     epochs=args.auc_epochs,
                                     batch=args.batch)
        print(json.dumps({"auc": record["auc"]}), flush=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
