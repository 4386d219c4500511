#!/bin/bash
# Tunnel watcher: probe every 5 min; when the tunnel answers, run the
# session-8 queue once and exit.  Log everything to the given file.
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
while true; do
  echo "--- probe $(date -u +%H:%M:%S)"
  if timeout 150 $PY - <<'EOF'
import threading, sys
out = []
t = threading.Thread(target=lambda: out.append(__import__("jax").devices()),
                     daemon=True)
t.start(); t.join(120)
sys.exit(0 if out else 1)
EOF
  then
    echo "--- tunnel UP $(date -u +%H:%M:%S) — running queue"
    bash scripts/tpu_queue_s8.sh
    echo "--- watcher exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
  sleep 240
done
