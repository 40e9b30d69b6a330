#!/bin/bash
# Serialize TPU jobs safely in this sandbox:
#   tools/tpu_run.sh <logfile> <cmd...>
# 1. patient ping (never killed) to wait out stale claims
# 2. 60s cool-down after the ping exits (claim release needs to settle —
#    launching immediately after a process exit wedges the next process)
# 3. run the job
set -u
LOG="$1"; shift
python -u - <<'PY' >> "$LOG" 2>&1
import time, jax
t0=time.time()
v = float(jax.jit(lambda v: (v*3+1).sum())(jax.numpy.ones((17,23))))
print(f"[tpu_run] ping ok after {time.time()-t0:.1f}s", flush=True)
PY
sleep 60
exec "$@" >> "$LOG" 2>&1
