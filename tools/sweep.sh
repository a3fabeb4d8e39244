#!/usr/bin/env bash
# Multi-SF oracle sweep: the driver gates only at sf0.01, but scale-dependent
# drift (round-half flips, partition-count-sensitive plans) has historically
# surfaced only at the other SFs. Run per round; all three must be FAIL 0.
set -euo pipefail
cd "$(dirname "$0")/.."
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/sweep_$sf"
  rm -rf "$out"
  echo "== $sf =="
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify /root/testdata/$sf $out" >/dev/null 2>&1
  # sed (not head) so check.py's stdout is drained — head -1 closes the
  # pipe mid-print and the resulting BrokenPipeError traceback buries the
  # summary line it just produced
  python3 tools/check.py "/root/testdata/$sf" "$out" | sed -n '1p'
done
