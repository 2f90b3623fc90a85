"""DIEN step decomposition by ABLATION (verdict r3 #8: find the long-T
lever, measure before building).

The isolated GRU micro (tools/gru_kernel_micro.py) puts BOTH masked
scans at ~5.6ms of the ~20.4ms DIEN-256 step — so ~2/3 of the step is
NOT the recurrences (the round-2 "scans are ~2/3 of the step" reading
conflated the scans with everything use_neg adds).  This tool times the
full DIEN training step under ablations to apportion the rest:

  full       — AUGRU + use_negsampling (the bench config)
  noneg      — AUGRU, use_negsampling=False (drops 2 neg history
               lookups + the aux BCE net over [B, T-1, 2H])
  auxskip    — use_neg columns + lookups kept, aux loss monkeypatched
               to 0 (isolates the aux net fwd+bwd from the lookups)
  gru        — gru_type=GRU, use_neg (second recurrence unchanged,
               attention applied after instead of inside)
  din        — DIN at the same maxlen (no GRU, no aux: the floor of
               the non-recurrent parts)

Usage: SEQ_MAXLENS=256 python tools/dien_ablate.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import tools.seq_train_bench as stb


def bench_variant(maxlen, variant):
    import jax
    import jax.numpy as jnp
    from deepctr_tpu import config as dc_config
    from deepctr_tpu.features import (DenseFeat, SparseFeat,
                                      VarLenSparseFeat)
    from deepctr_tpu.models import DIEN, DIN

    dc_config.set_compute_dtype("bfloat16")
    use_neg = variant in ("full", "gru", "auxskip")
    if variant == "auxskip":
        import jax.numpy as _jnp
        from deepctr_tpu.models import dien as dien_mod
        # replace the aux BCE NET with a live-but-trivial consumer of
        # the neg sequence: the 1e-12-scaled sum keeps the neg lookups
        # and their backward in the graph (a plain 0 would let XLA DCE
        # them and collapse auxskip into noneg)
        dien_mod.InterestExtractor._auxiliary_loss = (
            lambda self, states, click_seq, noclick_seq, keys_length,
            training: _jnp.sum(noclick_seq.astype(_jnp.float32)) * 1e-12)
    cols = stb.columns(maxlen, use_neg, SparseFeat, VarLenSparseFeat,
                       DenseFeat)
    if variant == "din":
        model = DIN(cols, ["item_id", "cate_id"],
                    dnn_hidden_units=(256, 128),
                    att_weight_normalization=True)
    else:
        model = DIEN(cols, ["item_id", "cate_id"],
                     gru_type=("GRU" if variant == "gru" else "AUGRU"),
                     use_negsampling=use_neg,
                     dnn_hidden_units=(256, 128))
    model.compile("adagrad", "binary_crossentropy", metrics=[])
    model._ensure_compiled()
    step = model._train_step.__wrapped__

    rng = np.random.default_rng(0)
    x, y = stb.data(maxlen, use_neg, stb.BATCH, rng)
    Xl = [np.asarray(x[name], dtype=np.float32).reshape(stb.BATCH, -1)
          for name in model.feature_index]
    X = jnp.asarray(np.concatenate(Xl, axis=1))
    yj = jnp.asarray(y.reshape(-1, 1))
    sw = jnp.ones((stb.BATCH,), jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(n, params, opt_state, table_state, batch_stats):
        def body(i, carry):
            p, o, ts, bs, acc = carry
            xb = jnp.roll(X, i, axis=0)
            p, o, ts, bs, _, total, _ = step(
                p, o, ts, bs, jax.random.fold_in(key, i), xb, yj, sw)
            return (p, o, ts, bs, acc + total)
        out = jax.lax.fori_loop(
            0, n, body, (params, opt_state, table_state, batch_stats,
                         jnp.float32(0)))
        return out[4]

    args = (model.params, model.opt_state, model.table_state,
            model.batch_stats)
    run(1, *args).item()

    def timed(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(n, *args).item()
            best = min(best, time.perf_counter() - t0)
        return best
    dt = timed(stb.STEPS + 1) - timed(1)
    return stb.BATCH * stb.STEPS / dt


def main():
    maxlens = [int(s) for s in
               os.environ.get("SEQ_MAXLENS", "256").split(",")]
    for maxlen in maxlens:
        for variant in ("full", "noneg", "gru", "din"):
            eps = bench_variant(maxlen, variant)
            print(json.dumps({"maxlen": maxlen, "variant": variant,
                              "eps": round(eps, 1),
                              "step_ms": round(1e3 * stb.BATCH / eps,
                                               3)}), flush=True)


if __name__ == "__main__":
    main()
