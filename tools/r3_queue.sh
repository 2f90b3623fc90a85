#!/bin/bash
# Round-3 trimmed measurement queue (TPU tunnel returned 2026-08-19).
# Decisive end-to-end A/Bs first, diagnostics last; each leg under
# `timeout` so a tunnel hang cannot wedge the queue.  `leg` echoes the
# python exit status AFTER the grep (PIPESTATUS[0]) so a timeout-killed
# or crashed leg is distinguishable from one that never ran (round-2
# advisor finding: grep swallowed the exit status).
LOG=${LOG:-/root/repo/TPU_QUEUE_RESULTS.md}
cd /root/repo

leg() {  # leg <timeout_s> <cmd...>
  local t=$1; shift
  timeout "$t" "$@" 2>&1 | grep -v axon
  echo "[leg exit ${PIPESTATUS[0]}: $*]"
}

{
  echo
  echo "[queue] TPU back, trimmed round-3 queue start $(date)"
  echo "=== bench.py vocab-1M A/B: off(control) / onehot / cast $(date)"
  BENCH_VOCAB=1000000 BENCH_EXTRAS=0 leg 1500 python bench.py
  DEEPCTR_GATHER_MODE=onehot BENCH_VOCAB=1000000 BENCH_EXTRAS=0 \
    leg 1500 python bench.py
  DEEPCTR_GATHER_MODE=cast BENCH_VOCAB=1000000 BENCH_EXTRAS=0 \
    leg 1500 python bench.py
  echo "=== bench.py standard A/B: off(control) / onehot / cast $(date)"
  BENCH_EXTRAS=0 leg 1500 python bench.py
  DEEPCTR_GATHER_MODE=onehot BENCH_EXTRAS=0 leg 1500 python bench.py
  DEEPCTR_GATHER_MODE=cast BENCH_EXTRAS=0 leg 1500 python bench.py
  echo "=== bench.py criteo_real cardinalities $(date)"
  BENCH_MODEL=deepfm_criteo_real leg 2400 python bench.py
  echo "=== fwd_bisect emb probe: off / cast / onehot $(date)"
  BENCH_VOCAB=1000000 BISECT_ONLY=emb leg 1200 python tools/fwd_bisect.py
  DEEPCTR_GATHER_MODE=cast BENCH_VOCAB=1000000 BISECT_ONLY=emb \
    leg 1200 python tools/fwd_bisect.py
  DEEPCTR_GATHER_MODE=onehot BENCH_VOCAB=1000000 BISECT_ONLY=emb \
    leg 1200 python tools/fwd_bisect.py
  echo "=== fwd_bisect transform_sub,lookup_only (mode off) $(date)"
  BENCH_VOCAB=1000000 BISECT_ONLY=transform_sub,lookup_only \
    leg 2400 python tools/fwd_bisect.py
  echo "[queue] done $(date)"
} >> "$LOG" 2>&1
