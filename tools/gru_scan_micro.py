"""Layer-level GRU scan cost at long maxlen: where do DIEN's ~20ms go?

Times MaskedGRU fwd and fwd+bwd at [B=1024, T, H=32] directly, and A/Bs
jax.checkpoint (remat) on the scan body: the backward of a scan reads
every step's saved gate intermediates back from HBM — remat trades that
traffic for recompute, which is usually a win for a VPU-light body.

Usage: GRU_T=256 python tools/gru_scan_micro.py
"""
import functools, json, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax, jax.numpy as jnp

B = int(os.environ.get("GRU_B", "1024"))
T = int(os.environ.get("GRU_T", "256"))
H = int(os.environ.get("GRU_H", "32"))
STEPS = 20


def main():
    from deepctr_tpu.layers.sequence import MaskedGRU, DynamicGRU
    from deepctr_tpu import config as dc_config
    dc_config.set_compute_dtype("bfloat16")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, H), jnp.bfloat16)
    att = jax.nn.sigmoid(jax.random.normal(key, (B, T), jnp.bfloat16))
    lengths = jnp.full((B, 1), T, jnp.int32)

    gru = MaskedGRU(input_size=H, hidden_size=H)
    params = gru.init(key, x, lengths)
    dyn = DynamicGRU(input_size=H, hidden_size=H, gru_type="AUGRU")
    dparams = dyn.init(key, x, att, lengths)

    def timeit(name, fn, *args):
        @functools.partial(jax.jit, static_argnums=0)
        def run(k, *a):
            def body(i, acc):
                return acc + fn(i, *a)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        run(1, *args).item()
        def t(k):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run(k, *args).item()
                best = min(best, time.perf_counter() - t0)
            return best
        dt = (t(STEPS + 1) - t(1)) / STEPS
        print(json.dumps({"micro": name, "T": T, "ms": round(dt * 1e3, 3)}),
              flush=True)

    def vary(i, a):
        return a + (i % 2).astype(jnp.bfloat16) * 1e-6

    def fwd_masked(i, p, x):
        outs, hf = gru.apply(p, vary(i, x), lengths)
        return jnp.sum(outs.astype(jnp.float32)) + jnp.sum(
            hf.astype(jnp.float32))

    def grad_masked(i, p, x):
        def loss(p):
            outs, hf = gru.apply(p, vary(i, x), lengths)
            return jnp.sum(outs.astype(jnp.float32))
        g = jax.grad(loss)(p)
        return sum(t.astype(jnp.float32).reshape(-1)[0]
                   for t in jax.tree_util.tree_leaves(g))

    def fwd_dyn(i, p, x):
        outs, hf = dyn.apply(p, vary(i, x), att, lengths)
        return jnp.sum(outs.astype(jnp.float32))

    def grad_dyn(i, p, x):
        def loss(p):
            outs, _ = dyn.apply(p, vary(i, x), att, lengths)
            return jnp.sum(outs.astype(jnp.float32))
        g = jax.grad(loss)(p)
        return sum(t.astype(jnp.float32).reshape(-1)[0]
                   for t in jax.tree_util.tree_leaves(g))

    timeit("masked_fwd", fwd_masked, params, x)
    timeit("masked_fwdbwd", grad_masked, params, x)
    os.environ["DEEPCTR_SCAN_REMAT"] = "1"
    timeit("masked_fwdbwd_remat", grad_masked, params, x)
    del os.environ["DEEPCTR_SCAN_REMAT"]
    timeit("augru_fwd", fwd_dyn, dparams, x)
    timeit("augru_fwdbwd", grad_dyn, dparams, x)
    os.environ["DEEPCTR_SCAN_REMAT"] = "1"
    timeit("augru_fwdbwd_remat", grad_dyn, dparams, x)


if __name__ == "__main__":
    main()
