#!/bin/bash
# Session-8 on-chip queue: everything waiting for a tunnel window, in
# priority order.  Each step individually time-bounded (server-side
# compiles of new programs take minutes and sometimes 500).
#
# 1. beamformer re-measure at HEAD (the hi/lo stacking landed in
#    a3cba35 was never timed on chip) + kg occupancy sweep
# 2. round-3 perf probes (z_mode x groups at the 4k contract shape,
#    fx-step 1024-spectra chunks, native-CMAC ablation)
# 3. headline bench at HEAD (fresh records for the driver)
# 4. regress
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

run() {  # run <timeout_s> <desc> <cmd...>
  local t=$1 d=$2; shift 2
  echo "=== $d ($(date -u +%H:%M:%S))"
  timeout "$t" "$@" || echo "!!! $d failed/timed out (exit $?)"
}

echo "=== tunnel probe ($(date -u +%H:%M:%S))"
$PY - <<'EOF' || { echo "!!! TPU tunnel down — aborting queue"; exit 3; }
import threading, sys
out = []
t = threading.Thread(target=lambda: out.append(__import__("jax").devices()),
                     daemon=True)
t.start(); t.join(240)
sys.exit(0 if out else 1)
EOF

run 1800 "beamform kg sweep (stacked weights at HEAD)" \
    $PY scripts/sweep_r3_beam.py
run 1200 "beamform bench (records beamform + beamform_native)" \
    $PY -m dc_sand_tpu.cli bench beamform
run 2400 "r3 perf probes: z_mode x groups @4k" $PY scripts/sweep_r3_perf.py zmode
run 2400 "r3 perf probes: fx step @1024 spectra" $PY scripts/sweep_r3_perf.py fxstep
run 1800 "r3 perf probes: CMAC ablation" $PY scripts/sweep_r3_perf.py ablate
run 600 "headline bench (writes records)" $PY bench.py
echo "=== regress check"
timeout 120 $PY -m dc_sand_tpu.cli regress || true
echo "=== queue done ($(date -u +%H:%M:%S))"
