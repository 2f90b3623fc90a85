"""Ablate the big-vocab train step on the real TPU: where do the ~20ms go?

Times (fori_loop, device-resident, scalar-readback sync — see bench.py):
  transform  — id dedup sorts + touched-row gathers + X proxy rewrite
  fwd        — forward loss on the substituted tree
  fwdbwd     — value_and_grad on the substituted tree
  update     — row_update scatters (+ optax dense update)
  full       — the production train step
  dense_fwdbwd — value_and_grad WITHOUT substitution (dense table grads)

Usage: BENCH_VOCAB=1000000 python tools/ablate_active_rows.py
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

# BENCH_CRITEO=1: ablate at the 26 true Criteo-Kaggle cardinalities
# (mixed one-hot-regime small tables + packed big tables) instead of a
# uniform BENCH_VOCAB — the criteo_real bench's shape (see bench.py)
if os.environ.get("BENCH_CRITEO") == "1":
    VOCABS = [1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3,
              93145, 5683, 8351593, 3194, 27, 14992, 5461306, 10, 5652,
              2173, 4, 7046547, 18, 15, 286181, 105, 142572]
else:
    VOCABS = [VOCAB] * N_SPARSE


def main():
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    dc_config.set_compute_dtype("bfloat16")
    cols = ([SparseFeat("C%d" % i, VOCABS[i], EMB)
             for i in range(N_SPARSE)]
            + [DenseFeat("I%d" % i, 1) for i in range(N_DENSE)])
    model = DeepFM(cols, cols, dnn_hidden_units=HIDDEN)
    model.compile("adagrad", "binary_crossentropy", metrics=[],
                  sparse_table_updates=True)
    model._ensure_compiled()
    assert model._sparse_specs

    transform, row_update = model._make_active_rows()
    forward = model._make_forward()
    loss_fn_builder = model.loss_func
    reg_fn = model._build_reg_fn()
    optim = model._masked_optim

    key = jax.random.PRNGKey(0)
    ids = jnp.concatenate(
        [jax.random.randint(jax.random.fold_in(key, c), (BATCH, 1), 0,
                            VOCABS[c]) for c in range(N_SPARSE)], axis=1)
    dense = jax.random.uniform(key, (BATCH, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)
    y = jax.random.bernoulli(key, 0.25, (BATCH, 1)).astype(jnp.float32)
    sw = jnp.ones((BATCH,), jnp.float32)

    def data_loss_of(p_sub, Xs, rng):
        y_pred, _, aux = forward(p_sub, model.batch_stats, Xs, True, rng)
        return (loss_fn_builder(y_pred.reshape(-1).astype(jnp.float32),
                                y.reshape(-1), sw) + reg_fn(p_sub) + aux)

    variants = {}

    def fori(fn):
        # n steps; a scalar accumulator carries a data dependency on each
        # iteration's result (prevents hoisting/DCE) without copying the
        # big tables
        @functools.partial(jax.jit, static_argnums=0)
        def run(n, params, table_state, opt_state):
            def body(i, carry):
                return fn(i, carry)
            out = jax.lax.fori_loop(
                0, n, body,
                (params, table_state, opt_state, jnp.float32(0)))
            return out[3] + jnp.sum(
                jax.tree_util.tree_leaves(out[0])[0].reshape(-1)[:4]
                .astype(jnp.float32))
        return run

    def v_transform(i, carry):
        params, ts, os_, acc = carry
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCABS[0])
        p_sub, Xs, aux = transform(params, ts, Xi)
        probes = [t.reshape(-1)[0].astype(jnp.float32)
                  for t in jax.tree_util.tree_leaves(p_sub)[:4]]
        acc = acc + sum(probes) + Xs.reshape(-1)[0]
        return (params, ts, os_, acc)

    def v_fwdbwd(i, carry):
        params, ts, os_, acc = carry
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCABS[0])
        p_sub, Xs, aux = transform(params, ts, Xi)
        g = jax.grad(lambda p: data_loss_of(p, Xs, jax.random.fold_in(
            key, i)))(p_sub)
        probes = [t.reshape(-1)[0].astype(jnp.float32)
                  for t in jax.tree_util.tree_leaves(g)[:4]]
        acc = acc + sum(probes)
        return (params, ts, os_, acc)

    def v_fwdbwd_all(i, carry):
        # like fwdbwd but consumes EVERY grad leaf: the 4-leaf probe lets
        # XLA dead-code-eliminate the table-grad transposes, hiding them
        params, ts, os_, acc = carry
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCABS[0])
        p_sub, Xs, aux = transform(params, ts, Xi)
        g = jax.grad(lambda p: data_loss_of(p, Xs, jax.random.fold_in(
            key, i)))(p_sub)
        acc = acc + sum(t.reshape(-1)[0].astype(jnp.float32)
                        for t in jax.tree_util.tree_leaves(g))
        return (params, ts, os_, acc)

    def v_fwd(i, carry):
        params, ts, os_, acc = carry
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCABS[0])
        p_sub, Xs, aux = transform(params, ts, Xi)
        loss = data_loss_of(p_sub, Xs, jax.random.fold_in(key, i))
        return (params, ts, os_, acc + loss)

    def v_update(i, carry):
        # transform + row_update with a synthetic gradient (no autodiff):
        # isolates the update machinery; subtract the transform variant
        # for the net scatter/gather/math cost
        params, ts, os_, acc = carry
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCABS[0])
        p_sub, Xs, aux = transform(params, ts, Xi)
        grads = jax.tree_util.tree_map(
            lambda t: jnp.full_like(t, 1e-6), p_sub)
        new_params, new_ts = row_update(params, ts, grads, aux)
        probe = jax.tree_util.tree_leaves(new_ts)[0].reshape(-1)[0]
        return (new_params, new_ts, os_, acc + probe.astype(jnp.float32))

    def v_full(i, carry):
        params, ts, os_, acc = carry
        rng = jax.random.fold_in(key, i)
        params, os_, ts, _, _, total, _ = model._train_step.__wrapped__(
            params, os_, ts, model.batch_stats, rng, X, y, sw)
        return (params, ts, os_, acc + total)

    sparse_paths = {s[0] for s in model._sparse_specs}

    def _apply_dense(params, updates):
        import optax
        from deepctr_tpu.models.basemodel import _path_str

        def ap(path, p, u):
            if _path_str(path) in sparse_paths:
                return p
            return optax.apply_updates(p, u)
        return jax.tree_util.tree_map_with_path(ap, params, updates)

    def v_full_noupd(i, carry):
        # the production step minus row_update: isolates whether the
        # "missing" time lives in the table update when composed
        params, ts, os_, acc = carry
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCABS[0])
        p_sub, Xs, aux = transform(params, ts, Xi)
        rng = jax.random.fold_in(key, i)
        total, grads = jax.value_and_grad(
            lambda p: data_loss_of(p, Xs, rng))(p_sub)
        updates, os2 = optim.update(grads, os_, p_sub)
        params = _apply_dense(params, updates)
        return (params, ts, os2, acc + total)

    def v_upd_in_ctx(i, carry):
        # transform + REAL grads + row_update, no optax: the update with
        # its true in-step inputs (autodiff gradients, not synthetic)
        params, ts, os_, acc = carry
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCABS[0])
        p_sub, Xs, aux = transform(params, ts, Xi)
        rng = jax.random.fold_in(key, i)
        total, grads = jax.value_and_grad(
            lambda p: data_loss_of(p, Xs, rng))(p_sub)
        new_params, new_ts = row_update(params, ts, grads, aux)
        return (new_params, new_ts, os_, acc + total)

    def v_dense(i, carry):
        params, ts, os_, acc = carry
        g = jax.grad(lambda p: data_loss_of(p, X, jax.random.fold_in(
            key, i)))(params)
        probes = [t.reshape(-1)[0].astype(jnp.float32)
                  for t in jax.tree_util.tree_leaves(g)[:4]]
        acc = acc + sum(probes)
        return (params, ts, os_, acc)

    variants = {"transform": v_transform, "fwd": v_fwd,
                "fwdbwd": v_fwdbwd, "fwdbwd_all": v_fwdbwd_all,
                "update": v_update,
                "full_noupd": v_full_noupd, "upd_in_ctx": v_upd_in_ctx,
                "full": v_full}
    if os.environ.get("ABLATE_DENSE"):
        variants["dense_fwdbwd"] = v_dense
    only = os.environ.get("ABLATE_ONLY")
    if only:
        keep = set(only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    for name, fn in variants.items():
        run = fori(fn)
        args = (model.params, model.table_state, model.opt_state)
        run(1, *args).item()
        def timed(n):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run(n, *args).item()
                best = min(best, time.perf_counter() - t0)
            return best
        dt = (timed(STEPS + 1) - timed(1)) / STEPS
        print(json.dumps({"variant": name, "ms_per_step": round(dt * 1e3, 3),
                          "examples_per_sec": round(BATCH / dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
