"""Dump the OPTIMIZED HLO of the fwd_bisect `emb` probe to a file.

*** WARNING (recorded outage, 2026-08-17): pulling a multi-MB
``compiled.as_text()`` through the ~KB/s axon tunnel took >10 min and the
timed-out kill left the TUNNEL DEAD for hours.  Do NOT run this against
the axon backend unless you accept that risk; it refuses to start
without EMB_HLO_I_ACCEPT_TUNNEL_RISK=1.  Safe on a local CPU/TPU
backend. ***

The axon tunnel compiles remotely, so --xla_dump_to never writes locally;
``compiled.as_text()`` round-trips the optimized module instead.

Usage: EMB_HLO_I_ACCEPT_TUNNEL_RISK=1 BENCH_VOCAB=1000000 \
    python tools/emb_hlo.py /tmp/emb.hlo
"""

import os
import sys

if os.environ.get("EMB_HLO_I_ACCEPT_TUNNEL_RISK") != "1":
    sys.exit("refusing: as_text() through the axon tunnel killed it once "
             "(see docstring); set EMB_HLO_I_ACCEPT_TUNNEL_RISK=1 to run")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_SPARSE, N_DENSE = 26, 13
VOCAB = int(os.environ.get("BENCH_VOCAB", 1000000))
EMB = 16
BATCH = 4096
HIDDEN = (400, 400, 400)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emb.hlo"
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

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (BATCH, N_SPARSE), 0, VOCAB)
    dense = jax.random.uniform(key, (BATCH, N_DENSE))
    X = jnp.concatenate([ids.astype(jnp.float32), dense], axis=1)
    dnn_cols = tuple(model.module.dnn_feature_columns)

    def emb(params, ts):
        p_sub, Xs, aux = transform(params, ts, X)
        se, dv = model.module.apply(
            {"params": p_sub}, Xs, dnn_cols,
            method=lambda mod, Xs, cols: mod.input_from_feature_columns(
                Xs, cols))
        return (sum(jnp.sum(e.astype(jnp.float32)) for e in se)
                + sum(jnp.sum(d.astype(jnp.float32)) for d in dv))

    lowered = jax.jit(emb).lower(model.params, model.table_state)
    txt = lowered.compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print("wrote %s (%d bytes)" % (out_path, len(txt)))


if __name__ == "__main__":
    main()
