#!/bin/bash
# Serial warm-up of every bench (case, backend) pair: populates the
# in-repo XLA compile cache (.jax_cache) and records timings for cap
# tuning. Run AFTER any in-flight heavy compile finishes (single core).
set -u
cd /root/repo
LOG=/tmp/warm_queue.log
echo "=== warm queue start $(date)" >> $LOG

run() {
  local name="$1"; shift
  echo "--- $name start $(date +%H:%M:%S)" >> $LOG
  /usr/bin/time -f "%e s wall" "$@" >> $LOG 2>&1
  echo "--- $name rc=$? end $(date +%H:%M:%S)" >> $LOG
}

# TPU children first (device timing; host mostly idle during compute).
NOPULL_WATCHDOG_S=6500 run thm_tpu  timeout 6600 python tools/diagnostics/nopull_case.py thm
NOPULL_WATCHDOG_S=3500 run berre_tpu timeout 3600 python tools/diagnostics/nopull_case.py berre3d
NOPULL_WATCHDOG_S=1700 run 3d_tpu   timeout 1800 python tools/diagnostics/nopull_case.py 3d
NOPULL_WATCHDOG_S=1700 run biot_tpu timeout 1800 python tools/diagnostics/nopull_case.py biot
NOPULL_WATCHDOG_S=1700 run tracer_tpu timeout 1800 python tools/diagnostics/nopull_case.py tracer

# CPU twins.
JAX_PLATFORMS=cpu NOPULL_WATCHDOG_S=1700 run 3d_cpu   timeout 1800 python tools/diagnostics/nopull_case.py 3d --stats
JAX_PLATFORMS=cpu NOPULL_WATCHDOG_S=1700 run biot_cpu timeout 1800 python tools/diagnostics/nopull_case.py biot --stats
JAX_PLATFORMS=cpu NOPULL_WATCHDOG_S=1700 run tracer_cpu timeout 1800 python tools/diagnostics/nopull_case.py tracer --stats
echo "=== warm queue done $(date)" >> $LOG
