"""Where do the big-vocab forward's ~2.4ms go, by MODEL PART?

Times transform + forward + loss (the ablate_active_rows `fwd` variant)
for DeepFM sub-configurations at BENCH_VOCAB (default 1M), B=4096:

  full      — linear + FM + DNN (the bench model)
  no_linear — DeepFM([], cols): drops the fused wide column lookups
  no_fm     — use_fm=False: drops the FM pairwise term
  dnn_only  — neither linear nor FM
  no_dnn    — dnn_hidden_units=(): linear + FM only

Each config also prints jit cost_analysis bytes/flops so
bandwidth-bound vs overhead-bound is readable directly.

Usage: BENCH_VOCAB=1000000 python tools/fwd_parts.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_SPARSE, N_DENSE = 26, 13
VOCAB = int(os.environ.get("BENCH_VOCAB", 1000000))
EMB = 16
BATCH = 4096
STEPS = 30
HIDDEN = (400, 400, 400)


def main():
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    dc_config.set_compute_dtype("bfloat16")
    cols = ([SparseFeat("C%d" % i, VOCAB, EMB) for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (BATCH, N_SPARSE), 0, VOCAB)
    dense = jax.random.uniform(key, (BATCH, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)
    y = jax.random.bernoulli(key, 0.25, (BATCH, 1)).astype(jnp.float32)
    sw = jnp.ones((BATCH,), jnp.float32)

    configs = {
        "full": dict(linear=True, fm=True, dnn=HIDDEN),
        "no_linear": dict(linear=False, fm=True, dnn=HIDDEN),
        "no_fm": dict(linear=True, fm=False, dnn=HIDDEN),
        "dnn_only": dict(linear=False, fm=False, dnn=HIDDEN),
        "no_dnn": dict(linear=True, fm=True, dnn=()),
    }
    only = os.environ.get("FWD_ONLY")
    if only:
        keep = set(only.split(","))
        configs = {k: v for k, v in configs.items() if k in keep}

    for name, cfg in configs.items():
        model = DeepFM(cols if cfg["linear"] else [], cols,
                       use_fm=cfg["fm"], dnn_hidden_units=cfg["dnn"])
        model.compile("adagrad", "binary_crossentropy", metrics=[],
                      sparse_table_updates=True)
        model._ensure_compiled()
        transform, _ = model._make_active_rows()
        forward = model._make_forward()
        loss_fn_builder = model.loss_func
        reg_fn = model._build_reg_fn()

        def step(i, params, ts):
            Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
            p_sub, Xs, aux = transform(params, ts, Xi)
            y_pred, _, aux_l = forward(p_sub, model.batch_stats, Xs, True,
                                       jax.random.fold_in(key, i))
            return (loss_fn_builder(
                y_pred.reshape(-1).astype(jnp.float32), y.reshape(-1), sw)
                + reg_fn(p_sub) + aux_l)

        @functools.partial(jax.jit, static_argnums=0)
        def run(k, acc0, params, ts):
            return jax.lax.fori_loop(
                0, k, lambda i, c: c + step(i, params, ts), acc0)

        args = (model.params, model.table_state)
        run(1, jnp.float32(0), *args).item()
        lowered = jax.jit(lambda p, t: step(0, p, t)).lower(*args)
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca

        def t(k):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run(k, jnp.float32(0), *args).item()
                best = min(best, time.perf_counter() - t0)
            return best
        dt = (t(STEPS + 1) - t(1)) / STEPS
        print(json.dumps({
            "config": name, "ms": round(dt * 1e3, 3),
            "GB_accessed": round(ca.get("bytes accessed", 0) / 1e9, 3),
            "GFLOPs": round(ca.get("flops", 0) / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
