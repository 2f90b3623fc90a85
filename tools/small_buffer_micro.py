"""Small-buffer gather/scatter micro, fori_loop form (tunnel-safe).

Each variant runs STEPS iterations inside one lax.fori_loop; per-step
inputs are perturbed by i so nothing hoists. One scalar .item() sync."""
import functools, json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp

G, N, STEPS = 26, 4104, 50
key = jax.random.PRNGKey(0)
bufs = jax.random.normal(key, (G, N, 128), jnp.float32)
idx = jax.random.randint(key, (G, N), 0, N)
sidx = jnp.sort(idx, axis=1)
iot = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (G, N))

def timeit(name, body):
    @functools.partial(jax.jit, static_argnums=0)
    def run(k, bufs, idx, sidx, iot):
        def step(i, acc):
            return acc + body(i, bufs, idx, sidx, iot)
        return jax.lax.fori_loop(0, k, step, jnp.float32(0))
    run(1, bufs, idx, sidx, iot).item()
    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(k, bufs, idx, sidx, iot).item()
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (t(STEPS + 1) - t(1)) / STEPS
    print(json.dumps({"micro": name, "ms": round(dt*1e3, 4)}), flush=True)

def perturb(i, ix):
    return (ix + i) % N

timeit("loop_gather_unsorted", lambda i, b, ix, s, io: sum(
    jnp.sum(jnp.take(b[g], perturb(i, ix[g]), axis=0)) for g in range(G)))
timeit("loop_gather_sorted", lambda i, b, ix, s, io: sum(
    jnp.sum(b[g].at[jnp.minimum(s[g] + i, N - 1)].get(
        mode="clip", indices_are_sorted=True)) for g in range(G)))
timeit("batched_taa", lambda i, b, ix, s, io: jnp.sum(
    jnp.take_along_axis(b, perturb(i, ix)[:, :, None], axis=1)))
timeit("scatter_set_sorted_unique", lambda i, b, ix, s, io: sum(
    jnp.sum(jnp.zeros((N, 128), jnp.float32).at[
        jnp.minimum(io[g] + (i % 2), N - 1)].set(
        b[g], mode="drop", indices_are_sorted=True, unique_indices=True))
    for g in range(G)))
timeit("scatter_add_dup_f32", lambda i, b, ix, s, io: sum(
    jnp.sum(jnp.zeros((N, 128), jnp.float32).at[perturb(i, ix[g])].add(
        b[g])) for g in range(G)))
timeit("scatter_add_dup_bf16", lambda i, b, ix, s, io: sum(
    jnp.sum(jnp.zeros((N, 128), jnp.bfloat16).at[perturb(i, ix[g])].add(
        b[g].astype(jnp.bfloat16)).astype(jnp.float32)) for g in range(G)))

# Measured (TPU v5e, 2026-08-19): sorted gather 0.170ms, unsorted
# 0.354ms, sorted-unique scatter-SET 0.584ms, duplicate scatter-ADD
# f32 0.982ms (== the lookup backward's cotangent accumulation),
# bf16 2.118ms.  Inputs to the expanded-grad negative (BASELINE.md).
