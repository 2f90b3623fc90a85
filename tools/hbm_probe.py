"""Peak-HBM accounting for the bench train loop via XLA's
memory_analysis (round-4 verdict #2 validation: stripping the
combined-table params duplication should cut step arguments by the
duplicated weight bytes — ~2.5 GB at criteo_real adam — and unlock
configs that previously OOM'd at compile).

Prints one JSON line with argument/output/temp/alias sizes for the
compiled bench fori_loop at the requested config.

Usage: BENCH_OPT=adam python tools/hbm_probe.py criteo_real
       BENCH_OPT=adam BENCH_VOCAB=2000000 python tools/hbm_probe.py vocab
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import bench


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "criteo_real"
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.models import DeepFM
    import jax
    import jax.numpy as jnp

    if which == "criteo_real":
        bench.VOCABS = bench.CRITEO_KAGGLE_VOCABS
        bench.VOCAB = 10000
    else:
        bench.VOCABS = None
        bench.VOCAB = int(os.environ.get("BENCH_VOCAB", 1_000_000))
    dc_config.set_compute_dtype("bfloat16")
    cols = bench._columns()
    model = DeepFM(cols, cols, dnn_hidden_units=bench.HIDDEN)
    model.compile(os.environ.get("BENCH_OPT", "adagrad"),
                  "binary_crossentropy", metrics=[],
                  sparse_table_updates=True)
    model._ensure_compiled()
    step = model._train_step.__wrapped__
    key = jax.random.PRNGKey(0)
    X, y, sw = bench._device_batch(key, model.input_dim,
                                   model.feature_index)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def run(params, opt_state, table_state, batch_stats, n):
        def body(i, carry):
            p, o, ts, bs = carry
            rng = jax.random.fold_in(key, i)
            xb = jnp.roll(X, i, axis=0)
            p, o, ts, bs, _, total, _ = step(p, o, ts, bs, rng, xb, y, sw)
            return (p, o, ts, bs)
        carry = jax.lax.fori_loop(
            0, n, body, (params, opt_state, table_state, batch_stats))
        probe = jax.tree_util.tree_leaves(carry[0])[0]
        return jnp.sum(probe.reshape(-1)[:4].astype(jnp.float32)), carry

    lowered = run.lower(model.params, model.opt_state, model.table_state,
                        model.batch_stats, jnp.int32(3))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    out = {"config": which, "opt": os.environ.get("BENCH_OPT", "adagrad")}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 3)
    # placeholder diagnostic: bytes the params tree would carry if the
    # combined tables were still duplicated there
    dup = 0
    for p in model._combined_table_paths():
        st = model.table_state.get(p)
        if isinstance(st, dict) and "combined" in st:
            dup += st["combined"].nbytes // 2
        elif isinstance(st, dict) and "combined3" in st:
            dup += st["combined3"].nbytes // 3
    out["stripped_duplicate_gb"] = round(dup / 2**30, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
