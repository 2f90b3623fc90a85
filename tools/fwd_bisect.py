"""Bisect the big-vocab forward INSIDE the real code path.

tools/fwd_parts.py showed the ~3.2ms fwd is nearly independent of model
parts (DNN/FM/linear each ~0.1ms) — so ~2ms lives in shared machinery.
This bisects it with flax method-override probes on the REAL module at
BENCH_VOCAB (default 1M), B=4096:

  transform — id dedup + touched-row gathers + X rewrite (baseline)
  emb       — + input_from_feature_columns(dnn cols), sum-probe
  lin       — + linear_model(X), sum-probe
  emb_lin   — + both
  full      — + the real forward + loss (ablate `fwd` parity check)

Usage: BENCH_VOCAB=1000000 python tools/fwd_bisect.py
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
    model = DeepFM(cols, cols, dnn_hidden_units=HIDDEN)
    model.compile("adagrad", "binary_crossentropy", metrics=[],
                  sparse_table_updates=True)
    model._ensure_compiled()
    transform, _ = model._make_active_rows()
    forward = model._make_forward()
    loss_fn_builder = model.loss_func
    reg_fn = model._build_reg_fn()

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (BATCH, N_SPARSE), 0, VOCAB)
    dense = jax.random.uniform(key, (BATCH, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)
    y = jax.random.bernoulli(key, 0.25, (BATCH, 1)).astype(jnp.float32)
    sw = jnp.ones((BATCH,), jnp.float32)

    dnn_cols = tuple(model.module.dnn_feature_columns)

    def m_emb(mod, Xs):
        se, dv = mod.input_from_feature_columns(Xs, dnn_cols)
        return (sum(jnp.sum(e.astype(jnp.float32)) for e in se)
                + sum(jnp.sum(d.astype(jnp.float32)) for d in dv))

    def m_lin(mod, Xs):
        return jnp.sum(mod.linear_model(Xs).astype(jnp.float32))

    def m_emb_lin(mod, Xs):
        return m_emb(mod, Xs) + m_lin(mod, Xs)

    def probe_of(method):
        def step(i, params, ts):
            Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
            p_sub, Xs, aux = transform(params, ts, Xi)
            return model.module.apply({"params": p_sub}, Xs,
                                      method=method).astype(jnp.float32)
        return step

    def s_transform(i, params, ts):
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        p_sub, Xs, aux = transform(params, ts, Xi)
        return (sum(t.reshape(-1)[0].astype(jnp.float32)
                    for t in jax.tree_util.tree_leaves(p_sub)[:4])
                + Xs.reshape(-1)[0])

    def s_transform_all(i, params, ts):
        # consume EVERY output so nothing DCEs: true transform cost
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        p_sub, Xs, aux = transform(params, ts, Xi)
        tot = jnp.sum(Xs)
        for t in jax.tree_util.tree_leaves(p_sub):
            tot += jnp.sum(t.astype(jnp.float32))
        for t in jax.tree_util.tree_leaves(aux):
            tot += t.astype(jnp.float32).reshape(-1)[0]
        return tot

    def s_transform_sub(i, params, ts):
        # consume p_sub + Xs only (what the forward actually reads);
        # aux (acc gathers etc.) is left to DCE as in the fwd path
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        p_sub, Xs, aux = transform(params, ts, Xi)
        tot = jnp.sum(Xs)
        for t in jax.tree_util.tree_leaves(p_sub):
            tot += jnp.sum(t.astype(jnp.float32))
        return tot

    def s_sub_urows(i, params, ts):
        # consume only the dedup products (urows, n_valid): batched sort
        # + the urows_mat scatter; the inv scatter, row gathers and X
        # rewrite all DCE
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        _, _, aux = transform(params, ts, Xi)
        tot = jnp.float32(0)
        for v in aux.values():
            if isinstance(v, tuple):
                tot += jnp.sum(v[0]).astype(jnp.float32)
                tot += v[1].astype(jnp.float32)
        return tot

    def s_sub_xonly(i, params, ts):
        # consume only the rewritten X: sort + inv scatter + proxy
        # rewrite; urows_mat scatter and row gathers DCE
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        _, Xs, _ = transform(params, ts, Xi)
        return jnp.sum(Xs)

    def s_sub_ponly(i, params, ts):
        # consume only the substituted slices: sort + urows_mat scatter
        # + the 26 row gathers; inv scatter and X rewrite DCE
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        p_sub, _, _ = transform(params, ts, Xi)
        return sum(jnp.sum(t.astype(jnp.float32))
                   for t in jax.tree_util.tree_leaves(p_sub))

    # lookup_only: the same module method over a PRE-SUBSTITUTED tree
    # passed as jit args — isolates lookup cost from transform cost
    only_env = os.environ.get("BISECT_ONLY")
    p_sub0 = Xs0 = None
    if not only_env or "lookup" in only_env:
        p_sub0, Xs0, _ = jax.jit(transform)(
            model.params, model.table_state, X)

    def s_lookup_only(i, p_sub, _ts):
        Xi = Xs0.at[0, 0].set(((Xs0[0, 0].astype(jnp.int32) + i)
                               % 64).astype(Xs0.dtype))
        se, dv = model.module.apply(
            {"params": p_sub}, Xi, dnn_cols,
            method=lambda mod, Xs, cols: mod.input_from_feature_columns(
                Xs, cols))
        return (sum(jnp.sum(e.astype(jnp.float32)) for e in se)
                + sum(jnp.sum(d.astype(jnp.float32)) for d in dv))

    def s_full(i, params, ts):
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        p_sub, Xs, aux = transform(params, ts, Xi)
        y_pred, _, aux_l = forward(p_sub, model.batch_stats, Xs, True,
                                   jax.random.fold_in(key, i))
        return (loss_fn_builder(
            y_pred.reshape(-1).astype(jnp.float32), y.reshape(-1), sw)
            + reg_fn(p_sub) + aux_l)

    # grad stages: the real step differentiates wrt the SUBSTITUTED tree
    # (transform is outside the grad — indices are int); these isolate
    # the backward's cost: grad_full - full = whole bwd; grad_lookup -
    # lookup_only = bwd of the lookups alone (the duplicate-id cotangent
    # accumulation into the [n, w] substituted slices)
    def s_grad_full(i, params, ts):
        Xi = X.at[0, 0].set((X[0, 0].astype(jnp.int32) + i) % VOCAB)
        p_sub, Xs, aux = transform(params, ts, Xi)

        def loss_of(p):
            y_pred, _, aux_l = forward(p, model.batch_stats, Xs, True,
                                       jax.random.fold_in(key, i))
            return (loss_fn_builder(
                y_pred.reshape(-1).astype(jnp.float32), y.reshape(-1), sw)
                + reg_fn(p) + aux_l)

        g = jax.grad(loss_of)(p_sub)
        return sum(t.astype(jnp.float32).reshape(-1)[0]
                   for t in jax.tree_util.tree_leaves(g))

    def s_grad_lookup(i, p_sub, _ts):
        Xi = Xs0.at[0, 0].set(((Xs0[0, 0].astype(jnp.int32) + i)
                               % 64).astype(Xs0.dtype))

        def probe(p):
            se, dv = model.module.apply(
                {"params": p}, Xi, dnn_cols,
                method=lambda mod, Xs, cols:
                    mod.input_from_feature_columns(Xs, cols))
            return (sum(jnp.sum(e.astype(jnp.float32)) for e in se)
                    + sum(jnp.sum(d.astype(jnp.float32)) for d in dv))

        g = jax.grad(probe)(p_sub)
        return sum(t.astype(jnp.float32).reshape(-1)[0]
                   for t in jax.tree_util.tree_leaves(g))

    def s_grad_emb_lin(i, p_sub, _ts):
        # deep lookups + the fused-wide linear part, differentiated: if
        # this costs ~grad_lookup + another full scatter-add, the wide
        # path's second take of the same rows is duplicating the
        # backward's cotangent accumulation (XLA CSEs the forward
        # gathers but not the two scatter-adds)
        Xi = Xs0.at[0, 0].set(((Xs0[0, 0].astype(jnp.int32) + i)
                               % 64).astype(Xs0.dtype))

        def probe(p):
            return model.module.apply(
                {"params": p}, Xi,
                method=lambda mod, Xs: m_emb_lin(mod, Xs))

        g = jax.grad(probe)(p_sub)
        return sum(t.astype(jnp.float32).reshape(-1)[0]
                   for t in jax.tree_util.tree_leaves(g))

    stages = {"transform": s_transform, "transform_all": s_transform_all,
              "transform_sub": s_transform_sub,
              "sub_urows": s_sub_urows, "sub_xonly": s_sub_xonly,
              "sub_ponly": s_sub_ponly,
              "lookup_only": s_lookup_only,
              "emb": probe_of(m_emb),
              "lin": probe_of(m_lin), "emb_lin": probe_of(m_emb_lin),
              "full": s_full,
              "grad_full": s_grad_full, "grad_lookup": s_grad_lookup,
              "grad_emb_lin": s_grad_emb_lin}
    only = os.environ.get("BISECT_ONLY")
    if only:
        keep = set(only.split(","))
        stages = {k: v for k, v in stages.items() if k in keep}

    for name, step in stages.items():
        @functools.partial(jax.jit, static_argnums=0)
        def run(k, acc0, params, ts, _s=step):
            return jax.lax.fori_loop(
                0, k, lambda i, c: c + _s(i, params, ts), acc0)

        args = ((p_sub0, model.table_state)
                if name in ("lookup_only", "grad_lookup", "grad_emb_lin")
                else (model.params, model.table_state))
        run(1, jnp.float32(0), *args).item()

        def t(k):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run(k, jnp.float32(0), *args).item()
                best = min(best, time.perf_counter() - t0)
            return best
        dt = (t(STEPS + 1) - t(1)) / STEPS
        ca = {}
        try:
            low = jax.jit(lambda p, ts, _s=step: _s(0, p, ts)).lower(*args)
            c = low.compile().cost_analysis()
            ca = c[0] if isinstance(c, (list, tuple)) else c
        except Exception:
            pass
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3),
                          "GB": round(ca.get("bytes accessed", 0) / 1e9, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
