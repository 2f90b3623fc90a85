#!/bin/bash
# Round-3 trimmed measurement queue (TPU tunnel returned 2026-08-19).
# Decisive end-to-end A/Bs first, diagnostics last; each leg under
# `timeout` so a tunnel hang cannot wedge the queue.
LOG=${LOG:-/root/repo/TPU_QUEUE_RESULTS.md}
cd /root/repo
{
  echo
  echo "[queue] TPU back, trimmed round-3 queue start $(date)"
  echo "=== bench.py vocab-1M A/B: off(control) / onehot / cast $(date)"
  BENCH_VOCAB=1000000 BENCH_EXTRAS=0 timeout 1500 python bench.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=onehot BENCH_VOCAB=1000000 BENCH_EXTRAS=0 \
    timeout 1500 python bench.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=cast BENCH_VOCAB=1000000 BENCH_EXTRAS=0 \
    timeout 1500 python bench.py 2>&1 | grep -v axon
  echo "=== bench.py standard A/B: off(control) / onehot / cast $(date)"
  BENCH_EXTRAS=0 timeout 1500 python bench.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=onehot BENCH_EXTRAS=0 \
    timeout 1500 python bench.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=cast BENCH_EXTRAS=0 \
    timeout 1500 python bench.py 2>&1 | grep -v axon
  echo "=== bench.py criteo_real cardinalities $(date)"
  BENCH_MODEL=deepfm_criteo_real timeout 2400 python bench.py 2>&1 | grep -v axon
  echo "=== fwd_bisect emb probe: off / cast / onehot $(date)"
  BENCH_VOCAB=1000000 BISECT_ONLY=emb timeout 1200 python tools/fwd_bisect.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=cast BENCH_VOCAB=1000000 BISECT_ONLY=emb \
    timeout 1200 python tools/fwd_bisect.py 2>&1 | grep -v axon
  DEEPCTR_GATHER_MODE=onehot BENCH_VOCAB=1000000 BISECT_ONLY=emb \
    timeout 1200 python tools/fwd_bisect.py 2>&1 | grep -v axon
  echo "=== fwd_bisect transform_sub,lookup_only (mode off) $(date)"
  BENCH_VOCAB=1000000 BISECT_ONLY=transform_sub,lookup_only \
    timeout 2400 python tools/fwd_bisect.py 2>&1 | grep -v axon
  echo "[queue] done $(date)"
} >> "$LOG" 2>&1
