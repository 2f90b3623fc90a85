"""Can batched searchsorted replace the transform's 2nd/3rd sorts?

Times (fori_loop form, [G=26, n=4104] int32):
  sort2       — two-operand lax.sort (what inv/compact each cost today)
  sort1       — single-array lax.sort (lower bound for any sort)
  ss_scan     — vmapped jnp.searchsorted(keys, queries) default 'scan'
  ss_sort     — method='sort' (ironic control)
"""
import functools, json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp

G, N, STEPS = 26, 4104, 50
key = jax.random.PRNGKey(0)
keys_sorted = jnp.sort(jax.random.randint(key, (G, N), 0, 125000), axis=1)
queries = jax.random.randint(jax.random.PRNGKey(1), (G, N), 0, 125000)
iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (G, N))

def timeit(name, body):
    @functools.partial(jax.jit, static_argnums=0)
    def run(k, a, b, c):
        def step(i, acc):
            return acc + body(i, a, b, c)
        return jax.lax.fori_loop(0, k, step, jnp.float32(0))
    args = (keys_sorted, queries, iota)
    run(1, *args).item()
    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(k, *args).item()
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (t(STEPS + 1) - t(1)) / STEPS
    print(json.dumps({"micro": name, "ms": round(dt*1e3, 4)}), flush=True)

def p(i, x):   # perturb to defeat hoisting
    return (x + i) % 125000

timeit("sort2", lambda i, ks, q, io: jnp.sum(jax.lax.sort(
    (p(i, q), io), dimension=-1, num_keys=1, is_stable=False
)[0].astype(jnp.float32)))
timeit("sort1", lambda i, ks, q, io: jnp.sum(jax.lax.sort(
    p(i, q), dimension=-1, is_stable=False).astype(jnp.float32)))
timeit("ss_scan", lambda i, ks, q, io: jnp.sum(jax.vmap(
    lambda a, v: jnp.searchsorted(a, v))(ks, p(i, q)).astype(jnp.float32)))
timeit("ss_compare_all", lambda i, ks, q, io: jnp.sum(jax.vmap(
    lambda a, v: jnp.searchsorted(a, v, method="compare_all"))(
    ks, p(i, q)).astype(jnp.float32)))

# Measured (TPU v5e, 2026-08-19): sort2 0.107ms, ss_scan 14.46ms,
# ss_compare_all 0.607ms -> the transform's batched sorts are ~0.1ms
# each (NOT its bottleneck) and searchsorted cannot replace them.
