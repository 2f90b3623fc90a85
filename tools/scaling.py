"""Scaling harness: the jitted DeepFM train step at 1, 2, 4, 8 mesh devices.

Fixed TOTAL batch (strong scaling): on real hardware each mesh size adds
chips, so examples/sec should grow ~linearly (north star: >=80%
efficiency 1 host -> slice, BASELINE.json).  On the CI / dev CPU backend
the "devices" are virtual slices of ONE physical host, so total compute
is constant and the meaningful reading is the inverse: how much
throughput the GSPMD partitioning itself costs (collectives, partitioned
compilation, halo bookkeeping) relative to the 1-device program —
``partition_overhead`` below.  The same harness reports real scaling
efficiency when pointed at a pod slice.

Usage:  python tools/scaling.py [--devices 1,2,4,8] [--md SCALING.md]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

TOTAL_BATCH = 8192
STEPS = 30
N_SPARSE, N_DENSE, VOCAB, EMB = 13, 13, 10000, 16


def measure(n_devices):
    import functools

    import jax
    import jax.numpy as jnp
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.parallel import make_mesh

    mesh = make_mesh((n_devices, 1), devices=jax.devices()[:n_devices])
    cols = ([SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    model = DeepFM(cols, cols, dnn_hidden_units=(128, 128), mesh=mesh)
    model.compile("adagrad", "binary_crossentropy", metrics=[])
    model._ensure_compiled()
    step = model._train_step.__wrapped__

    B = TOTAL_BATCH
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (B, N_SPARSE), 0, VOCAB)
    dense = jax.random.uniform(key, (B, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)
    y = jax.random.bernoulli(key, 0.25, (B, 1)).astype(jnp.float32)
    sw = jnp.ones((B,), jnp.float32)
    X, y, sw = model._put_batch(X, y, sw)

    @functools.partial(jax.jit, static_argnums=4)
    def run(params, opt_state, table_state, batch_stats, n):
        def body(i, carry):
            p, o, ts, bs = carry
            rng = jax.random.fold_in(key, i)
            p, o, ts, bs, _, total, _ = step(p, o, ts, bs, rng, X, y, sw)
            return (p, o, ts, bs)
        p, o, ts, bs = jax.lax.fori_loop(
            0, n, body, (params, opt_state, table_state, batch_stats))
        return jnp.sum(jax.tree_util.tree_leaves(p)[0].reshape(-1)[:4]
                       .astype(jnp.float32))

    def timed(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(model.params, model.opt_state, model.table_state,
                model.batch_stats, n).item()
            best = min(best, time.perf_counter() - t0)
        return best

    run(model.params, model.opt_state, model.table_state,
        model.batch_stats, 1).item()
    dt = (timed(STEPS + 1) - timed(1)) / STEPS
    return B / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--md", default=None)
    args = ap.parse_args()

    import jax
    virtual = jax.default_backend() == "cpu"
    sizes = [int(s) for s in args.devices.split(",")
             if int(s) <= len(jax.devices())]
    rows = []
    for n in sizes:
        eps = measure(n)
        base = rows[0][1] if rows else eps
        rec = {"devices": n, "examples_per_sec": round(eps, 1),
               "total_batch": TOTAL_BATCH}
        if virtual:
            rec["partition_overhead"] = round(max(0.0, 1 - eps / base), 3)
        else:
            ideal = base * n
            rec["scaling_efficiency"] = round(eps / ideal, 3)
        rows.append((n, eps, rec))
        print(json.dumps(rec), flush=True)

    if args.md:
        with open(args.md, "w") as f:
            f.write("# Scaling: DeepFM train step, total batch %d\n\n"
                    % TOTAL_BATCH)
            if virtual:
                f.write(
                    "Backend: cpu — VIRTUAL devices slicing one physical "
                    "host, so total compute is constant across mesh sizes; "
                    "the column below is the GSPMD PARTITIONING OVERHEAD "
                    "(throughput lost to collectives + partitioned "
                    "program), not interconnect scaling.  Run on a pod "
                    "slice for true efficiency (same command).\n\n"
                    "| devices | examples/sec | partition overhead |\n"
                    "|---|---|---|\n")
                for n, eps, rec in rows:
                    f.write("| %d | %.0f | %.1f%% |\n"
                            % (n, eps, 100 * rec["partition_overhead"]))
            else:
                f.write("Backend: %s (real devices)\n\n"
                        "| devices | examples/sec | scaling efficiency |\n"
                        "|---|---|---|\n" % jax.default_backend())
                for n, eps, rec in rows:
                    f.write("| %d | %.0f | %.1f%% |\n"
                            % (n, eps, 100 * rec.get("scaling_efficiency",
                                                     1.0)))


if __name__ == "__main__":
    # the axon sitecustomize registers the TPU backend unconditionally;
    # honor an explicit JAX_PLATFORMS=cpu request via jax.config
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    main()
