#!/usr/bin/env bash
# Per-round close protocol (standing since the r9 verdict, order #3):
# three-scale full-surface driver_sim sweep + the alternate session
# shape + plan audit, each teeing to tools/simlogs/<tag>_*.log, then
# the bench series LAST (timing runs want a calm box — run this script
# with nothing else heavy on the machine).
#
# Usage: tools/close_protocol.sh r10_close
# The sf0.001 sweep leads because it is cheap and has caught
# cross-engine divergences the larger scales cannot expose (rank-vs-
# value sketch contract, ROUND tie on negatives — r9).
set -u
TAG="${1:?usage: tools/close_protocol.sh <tag>}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/tools/simlogs"
cd "$ROOT"
export PYTHONPATH="$ROOT"

run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  "$@" >"$LOGS/${TAG}_${name}.log" 2>&1
  rc=$?
  tail -1 "$LOGS/${TAG}_${name}.log" | tr '\r' '\n' | tail -1
  [ $rc -ne 0 ] && echo "!!! $name exited $rc"
}

run sf0001 python tools/driver_sim.py /root/testdata/sf0.001
run sf001 python tools/driver_sim.py /root/testdata/sf0.01
SPARK_SIM_CPUS=4 SPARK_SIM_PARTITIONS=200 \
  run sf001_alt python tools/driver_sim.py /root/testdata/sf0.01
run sf01 python tools/driver_sim.py /root/testdata/sf0.1
run plan_audit python tools/plan_audit.py
for i in 1 2 3; do
  run "bench$i" python bench.py
done
echo "=== close protocol done; logs under tools/simlogs/${TAG}_*.log ==="
