"""A/B the sharded-embedding lookup exchanges: gspmd vs psum vs a2a.

Times the jitted train step of a lookup-heavy DeepFM on a ("data",
"model") mesh under each config.set_embedding_exchange mode.  On the CPU
mesh (8 virtual devices) the absolute numbers measure partitioned-program
overhead, but the RELATIVE ordering tells which exchange schedule GSPMD
picked vs the hand-written ones; run on a real slice for ICI truth.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/exchange_bench.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

BATCH = 4096
STEPS = 20
N_SPARSE, VOCAB = 16, 16384
EMB = int(os.environ.get("EXCHANGE_EMB", "32"))


def measure(mode, mesh_shape=(4, 2)):
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.parallel import make_mesh

    mesh = make_mesh(mesh_shape)
    dc_config.set_embedding_exchange(
        mode, None if mode == "gspmd" else mesh, a2a_slack=4.0)
    try:
        cols = [SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
        model = DeepFM(cols, cols, dnn_hidden_units=(64,), mesh=mesh,
                       shard_embeddings=True)
        model.compile("adagrad", "binary_crossentropy", metrics=[])
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
                p, o, ts, bs, _, total, _ = step(p, o, ts, bs, rng, X, y, sw)
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
        dc_config.set_embedding_exchange("gspmd")


def main():
    for mode in ("gspmd", "psum", "a2a"):
        eps = measure(mode)
        print(json.dumps({"exchange": mode, "emb_dim": EMB,
                          "examples_per_sec": round(eps, 1)}), flush=True)


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    main()
