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
  # capture (not discard) sbt output: under set -e a Verify failure kills
  # the sweep, and without the log there would be zero diagnostics
  if ! SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
      sbt -batch "runMain graft.Verify /root/testdata/$sf $out" \
      >"/tmp/sweep_$sf.log" 2>&1; then
    echo "Verify FAILED at $sf — tail of /tmp/sweep_$sf.log:" >&2
    tail -30 "/tmp/sweep_$sf.log" >&2
    exit 1
  fi
  # sed (not head) so check.py's stdout is drained — head -1 closes the
  # pipe mid-print and the resulting BrokenPipeError traceback buries the
  # summary line it just produced
  python3 tools/check.py "/root/testdata/$sf" "$out" | sed -n '1p'
done
