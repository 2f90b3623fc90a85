#!/bin/bash
# Poll until the axon TPU tunnel answers, then run the queued experiments.
# Each probe runs in a subprocess under `timeout` (the tunnel hang cannot
# be interrupted any other way).  Results append to $LOG.
LOG=${LOG:-/tmp/tpu_queue.log}
echo "[watcher] start $(date)" >> "$LOG"
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: x*2)(jnp.ones(4)).sum().item()" >/dev/null 2>&1; then
    echo "[watcher] TPU back $(date)" >> "$LOG"
    break
  fi
  sleep 240
done
cd /root/repo
{
  echo "=== fwd_bisect emb+full gather-mode CAST $(date)"
  DEEPCTR_GATHER_MODE=cast BENCH_VOCAB=1000000 BISECT_ONLY=transform,emb,full \
    timeout 2400 python tools/fwd_bisect.py 2>&1 | grep -v axon
  echo "=== fwd_bisect emb+full gather-mode ONEHOT $(date)"
  DEEPCTR_GATHER_MODE=onehot BENCH_VOCAB=1000000 BISECT_ONLY=emb,full \
    timeout 2400 python tools/fwd_bisect.py 2>&1 | grep -v axon
  echo "=== fwd_bisect emb CONTROL (mode off) $(date)"
  BENCH_VOCAB=1000000 BISECT_ONLY=emb \
    timeout 1200 python tools/fwd_bisect.py 2>&1 | grep -v axon
  echo "=== fwd_bisect transform_sub,lookup_only (cast off) $(date)"
  BENCH_VOCAB=1000000 BISECT_ONLY=transform_sub,lookup_only \
    timeout 2400 python tools/fwd_bisect.py 2>&1 | grep -v axon
  echo "=== bench.py vocab-1M A/B: onehot vs cast vs off $(date)"
  DEEPCTR_GATHER_MODE=onehot BENCH_VOCAB=1000000 BENCH_EXTRAS=0 \
    timeout 1800 python bench.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=cast BENCH_VOCAB=1000000 BENCH_EXTRAS=0 \
    timeout 1800 python bench.py 2>&1 | grep -v axon
  BENCH_VOCAB=1000000 BENCH_EXTRAS=0 \
    timeout 1800 python bench.py 2>&1 | grep -v axon
  echo "=== bench.py standard A/B: onehot vs cast vs off $(date)"
  DEEPCTR_GATHER_MODE=onehot BENCH_EXTRAS=0 \
    timeout 1800 python bench.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=cast BENCH_EXTRAS=0 \
    timeout 1800 python bench.py 2>&1 | grep -v axon
  BENCH_EXTRAS=0 timeout 1800 python bench.py 2>&1 | grep -v axon
  echo "=== bench.py criteo_real cardinalities $(date)"
  BENCH_MODEL=deepfm_criteo_real timeout 2400 python bench.py 2>&1 \
    | grep -v axon
  echo "=== done $(date)"
} >> "$LOG" 2>&1
