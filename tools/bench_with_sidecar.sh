#!/bin/bash
# Full-contract bench with a vmstat sidecar (round-12 protocol): the
# host's 48g-pinned-heap kernel-thrash pathology (BASELINE.md "Round-11
# ScaleProbe", attribution 5: identical JVM work intermittently 20-30x
# slower at 95-99% SYSTEM cpu) is only diagnosable live — record
# timestamped 5-second vmstat samples alongside the run so a stall
# window in the bench artifact is attributable post-hoc instead of by
# inference. Read the sidecar's `sy` column: sustained >90 during a
# slow query's window = the pathology, not a plan regression.
#
# Usage: [SPARK_GRAFT_SF_DIR=...] tools/bench_with_sidecar.sh [sidecar.log]
set -euo pipefail
cd "$(dirname "$0")/.."
SIDE="${1:-vmstat_sidecar.log}"
vmstat -t 5 > "$SIDE" 2>&1 &
VPID=$!
trap 'kill "$VPID" 2>/dev/null || true' EXIT
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  sbt -batch 'runMain graft.Bench'
