"""A/B the ROW-SHARDED sparse-table update: combined (w | acc) storage +
shard-local Pallas scatter (parallel/update.sharded_combined_update) vs
separate accumulator leaves + XLA row scatter.

Runs a lookup-heavy DeepFM with one big packed table on a
("data", "model") mesh with shard_embeddings=True and times the jitted
train step under both layouts.  On the CPU mesh (8 virtual devices) the
combined leg uses the XLA drop-scatter fallback inside shard_map —
absolute numbers are partitioned-program overhead, the leg is a dress
rehearsal; on a real slice the Pallas kernel engages and the numbers
decide the production default (verdict r3 #7 / tools/on_real_slice.sh).

Usage: python tools/sharded_update_bench.py [--mesh 4x2]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

BATCH = 4096
STEPS = 20
N_SPARSE, VOCAB, EMB = 8, 1_000_000, 16


def measure(layout, mesh_shape):
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.parallel import make_mesh

    on_cpu = jax.default_backend() == "cpu"
    if layout == "combined":
        if on_cpu:
            os.environ["DEEPCTR_FORCE_COMBINED"] = "1"
    else:
        os.environ.pop("DEEPCTR_FORCE_COMBINED", None)
        dc_config.set_use_pallas(False)   # separate acc + XLA scatter
    try:
        mesh = make_mesh(mesh_shape)
        cols = [SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
        model = DeepFM(cols, cols, dnn_hidden_units=(64,), mesh=mesh,
                       shard_embeddings=True)
        model.compile("adagrad", "binary_crossentropy", metrics=[],
                      sparse_table_updates=True)
        if layout == "combined":
            assert any(isinstance(model.table_state.get(s[0]), dict)
                       and "combined" in model.table_state[s[0]]
                       for s in model._sparse_specs), \
                "combined layout did not engage"
        model._ensure_compiled()
        step = model._train_step.__wrapped__

        key = jax.random.PRNGKey(0)
        ids = jax.random.randint(key, (BATCH, N_SPARSE), 0, VOCAB)
        X = ids.astype(jnp.float32)
        y = jax.random.bernoulli(key, 0.25, (BATCH, 1)).astype(jnp.float32)
        sw = jnp.ones((BATCH,), jnp.float32)
        X, y, sw = model._put_batch(X, y, sw)

        @functools.partial(jax.jit, static_argnums=4)
        def run(params, opt_state, table_state, batch_stats, n):
            def body(i, carry):
                p, o, ts, bs = carry
                rng = jax.random.fold_in(key, i)
                xb = jnp.roll(X, i, axis=0)
                p, o, ts, bs, _, total, _ = step(p, o, ts, bs, rng, xb,
                                                 y, sw)
                return (p, o, ts, bs)
            out = jax.lax.fori_loop(
                0, n, body,
                (params, opt_state, table_state, batch_stats))
            return jnp.sum(jax.tree_util.tree_leaves(out[0])[0]
                           .reshape(-1)[:4].astype(jnp.float32))

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
        return BATCH / dt
    finally:
        dc_config.set_use_pallas("auto")
        os.environ.pop("DEEPCTR_FORCE_COMBINED", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="4x2",
                    help="data x model mesh shape, e.g. 4x2")
    args = ap.parse_args()
    mesh_shape = tuple(int(s) for s in args.mesh.split("x"))
    for layout in ("combined", "separate"):
        eps = measure(layout, mesh_shape)
        print(json.dumps({"sharded_update": layout,
                          "mesh": args.mesh, "vocab": VOCAB,
                          "examples_per_sec": round(eps, 1)}), flush=True)


if __name__ == "__main__":
    main()
