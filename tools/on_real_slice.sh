#!/bin/bash
# One-command multi-chip measurement queue (verdict r3 #7): the moment a
# real TPU slice is available, run this unattended — it settles every
# decision that is blocked on real ICI today and appends the evidence to
# BASELINE.md.  Legs:
#   1. exchange A/B   gspmd / psum / a2a  x  EMB in {32, 128}
#      (decides config.set_embedding_exchange's production default —
#       the CPU-mesh ordering gspmd ~ psum >> a2a measures partitioned-
#       program overhead, not ICI; tools/exchange_bench.py header)
#   2. sharded combined-update A/B (combined (w|acc) + shard-local
#      Pallas scatter vs separate acc + XLA scatter;
#      tools/sharded_update_bench.py)
#   3. scaling efficiency 1 -> N devices, fixed total batch
#      (north star: >= 80%; tools/scaling.py)
#
# Dress rehearsal (no slice needed): RUN_MODE=cpu8 ./tools/on_real_slice.sh
# runs every leg on the 8-virtual-device CPU mesh — proves the queue is
# runnable end-to-end; the numbers it records are overhead readings and
# are labeled as such.
#
# Each leg runs under `timeout`; `leg` echoes the python exit status from
# PIPESTATUS[0] so a killed/crashed leg is distinguishable from one that
# never ran (the r3_queue.sh pattern).
LOG=${LOG:-/root/repo/BASELINE.md}
cd /root/repo || exit 1

if [ "${RUN_MODE:-real}" = "cpu8" ]; then
  # JAX_PLATFORMS env is ignored on this image (axon plugin loads
  # regardless) — jax.config.update is the working switch (CLAUDE.md)
  export XLA_FLAGS="--xla_force_host_platform_device_count=8"
  PYARGS=(-c "import jax; jax.config.update('jax_platforms','cpu'); \
import runpy, sys; sys.argv=sys.argv[1:]; \
runpy.run_path(sys.argv[0], run_name='__main__')")
  MODE_NOTE="CPU 8-virtual-device DRESS REHEARSAL (numbers are \
partitioned-program overhead, NOT ICI scaling)"
else
  PYARGS=(-c "import runpy, sys; sys.argv=sys.argv[1:]; \
runpy.run_path(sys.argv[0], run_name='__main__')")
  MODE_NOTE="real slice"
fi

leg() {  # leg <timeout_s> <script> [args...]
  local t=$1; shift
  timeout "$t" python "${PYARGS[@]}" "$@" 2>&1 | grep -vE 'axon|Warning'
  echo "[leg exit ${PIPESTATUS[0]}: $*]"
}

{
  echo
  echo "## on_real_slice queue ($MODE_NOTE) $(date)"
  echo
  echo '```'
  echo "=== leg 1: exchange A/B (gspmd/psum/a2a x EMB 32,128) $(date)"
  EXCHANGE_EMB=32  leg 2400 tools/exchange_bench.py
  EXCHANGE_EMB=128 leg 2400 tools/exchange_bench.py
  echo "=== leg 2: sharded combined-update A/B $(date)"
  leg 2400 tools/sharded_update_bench.py --mesh 4x2
  echo "=== leg 3: scaling efficiency (fixed total batch) $(date)"
  leg 3600 tools/scaling.py --devices 1,2,4,8
  echo "=== queue done $(date)"
  echo '```'
} >> "$LOG" 2>&1
echo "appended to $LOG"
