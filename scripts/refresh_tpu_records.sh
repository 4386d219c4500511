#!/bin/bash
# Refresh the judged on-chip records at the current HEAD on a live TPU.
#
# Run after kernel-affecting changes (or to re-stamp records at a new
# commit).  Each step is individually time-bounded because first
# executions of new programs compile server-side (minutes) and the
# remote compile helper sometimes 500s — a wedged step must not wedge
# the sweep.  Verify steps use --production-cadence only for fx64
# (the contract cadence); the rest run the fast clamped cadence.
#
# Usage: scripts/refresh_tpu_records.sh [quick]
#   quick = headline bench + fx64 verify only (~15 min warm cache)
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

run() {  # run <timeout_s> <desc> <cmd...>
  local t=$1 d=$2; shift 2
  echo "=== $d"
  timeout "$t" "$@" || echo "!!! $d failed/timed out (exit $?)"
}

# tunnel health first: bench.py no longer exits nonzero on a dead
# tunnel (it emits a stale-marked recorded fallback for the driver), so
# probe backend init explicitly and abort the sweep if it blocks
echo "=== tunnel probe"
$PY - <<'EOF' || { echo "!!! TPU tunnel down — aborting sweep"; exit 3; }
import threading, sys
out = []
t = threading.Thread(target=lambda: out.append(__import__("jax").devices()),
                     daemon=True)
t.start(); t.join(240)
sys.exit(0 if out else 1)
EOF

# 1500 s: bench.py's live xcorr row compiles the production CMAC
# kernel server-side on a cold cache (~10-20 min) — 400 s lost the
# round-5 headline to exit 124
run 1500 "headline bench (F-engine 4k + 1k, writes records)" $PY bench.py

# production cadence is now 2048-spectra chunks / 8192-spectra dumps
# (config.py): the golden window and the tunnel h2d both scale with it,
# so this step gets the biggest budget
run 2700 "verify fx64 (production cadence, record)" \
    $PY -m dc_sand_tpu.cli verify fx64 --production-cadence --record

if [ "${1:-}" = "quick" ]; then exit 0; fi

for cfg in pfb1k pfb4k fx4 fx64 beam64; do
  run 900 "verify $cfg (record)" $PY -m dc_sand_tpu.cli verify $cfg --record
done

# step benches at the contract shapes (scan programs: long compiles on
# a cold cache — these are the 10-25 min compile-roulette programs, so
# they get the biggest budgets and run LAST)
run 2400 "fx step 64-ant 4k" $PY -m dc_sand_tpu.cli bench fx --scale 4096
run 2400 "beam step config-5" $PY -m dc_sand_tpu.cli bench beam-step
run 1200 "xcorr native CMAC" $PY -m dc_sand_tpu.cli bench xcorr
run 1200 "beamform kernels" $PY -m dc_sand_tpu.cli bench beamform
# --spectra 512 bounds the host+replay feed volume (~1.3 GB per path)
# so BOTH e2e records fit the budget on this box's ~0.03-0.1 GB/s
# tunnel; the default 2048-spectra shape times the step out (r5)
run 2400 "e2e at-rate rehearsal (device in the loop)" \
    $PY -m dc_sand_tpu.cli bench e2e --spectra 512

echo "=== regress check"
timeout 120 $PY -m dc_sand_tpu.cli regress || true
