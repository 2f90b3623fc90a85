"""Measure the 'factorized one-hot saves no flops' claim (round-4
verdict #6b / PLAN round-5 #4) instead of asserting it.

DIEN-256's dominant lookup is the [B*T] history read of the item table
(B=1024, T=256 -> 262144 ids over vocab 10000, E=32), lowered as a
bf16 one-hot matmul (ops/onehot_lookup).  The conjectured lever was a
FACTORIZED one-hot: split id = hi*V2 + lo (V = V1*V2), then

    stage1 = onehot(hi) [N, V1] @ table.reshape(V1, V2*E)   # MXU
    out    = einsum('nve,nv->ne', stage1.reshape(N, V2, E),
                    onehot(lo))                              # VPU

FLOP accounting says stage1 alone costs N*V1*(V2*E) MACs — exactly the
direct one-hot's N*V*E — so the factorization saves nothing and ADDS a
[N, V2*E] intermediate the fused direct form never materializes.  This
micro measures both (fwd and fwd+bwd, table gradient) at the DIEN-256
shapes so the floor is recorded as MEASURED.

Usage: python tools/factorized_onehot_micro.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, T, V, E = 1024, 256, 10000, 32
V1, V2 = 100, 100
N = B * T
STEPS = 30


def direct(table, ids):
    oh = jax.nn.one_hot(ids, V, dtype=jnp.bfloat16)
    return jnp.dot(oh, table.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def factorized(table, ids):
    hi = ids // V2
    lo = ids % V2
    oh_hi = jax.nn.one_hot(hi, V1, dtype=jnp.bfloat16)
    stage1 = jnp.dot(oh_hi, table.reshape(V1, V2 * E).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    oh_lo = jax.nn.one_hot(lo, V2, dtype=jnp.bfloat16)
    return jnp.einsum("nve,nv->ne", stage1.reshape(N, V2, E),
                      oh_lo.astype(jnp.float32))


def timed(scalar_fn, table, ids):
    """ms/step: STEPS invocations inside ONE jitted fori_loop (the ids
    roll per step so nothing hoists), scalar-readback sync — the bench
    methodology the axon tunnel requires."""
    @jax.jit
    def run(table, ids, n):
        def body(i, acc):
            return acc + scalar_fn(table, jnp.roll(ids, i))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run(table, ids, 1).item()   # compile

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(table, ids, n).item()
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(STEPS + 1) - t(1)) / STEPS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (V, E), jnp.float32)
    ids = jax.random.randint(key, (N,), 0, V)
    # non-trivial downstream so the table cotangent is a dense random
    # [N, E] (a sum's ones-cotangent lets XLA rewrite the backward
    # one-hot matmul into a histogram and the bwd cost vanishes)
    C = jax.random.normal(jax.random.fold_in(key, 1), (N, E), jnp.float32)

    out = {}
    out["direct_fwd_ms"] = round(timed(
        lambda t, i: jnp.sum(direct(t, i) * C), table, ids), 3)
    out["factorized_fwd_ms"] = round(timed(
        lambda t, i: jnp.sum(factorized(t, i) * C), table, ids), 3)
    out["direct_fwdbwd_ms"] = round(timed(
        lambda t, i: jnp.sum(jax.grad(
            lambda tt: jnp.sum(direct(tt, i) * C))(t)), table, ids), 3)
    out["factorized_fwdbwd_ms"] = round(timed(
        lambda t, i: jnp.sum(jax.grad(
            lambda tt: jnp.sum(factorized(tt, i) * C))(t)), table, ids),
        3)
    out["shapes"] = dict(B=B, T=T, V=V, E=E, V1=V1, V2=V2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
