#!/usr/bin/env bash
# One-command r14-style scale rehearsal: generate the sf1-equivalent
# slices (if absent), bench the full suite at 1x and 10x, and run the
# correctness compare against the 10x slice itself. Findings go in
# tools/plans_appendix.md (spliced into PLANS.md by PlanDump).
#
# Expected shape (r14 baselines): suite-total ratio ~2.2x for 10x data,
# no query super-linear; correctness 92/94 at 10x (the two regime edges
# are analyzed in the appendix and tripwired in SketchRegimeSpec).
set -euo pipefail
cd "$(dirname "$0")/.."

FULL10=/tmp/graft_full10
[ -f "$FULL10/lineitem.parquet" ] || python3 tools/gen_scale_full.py 10 "$FULL10"

for d in /root/testdata/sf0.1 "$FULL10"; do
  echo "== bench $d =="
  if ! SPARK_GRAFT_SF_DIR="$d" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
      SPARK_GRAFT_BENCH_ITERS="${SPARK_GRAFT_BENCH_ITERS:-2}" \
      sbt -batch "runMain graft.Bench" >"/tmp/rehearse_$(basename "$d").log" 2>&1; then
    echo "Bench FAILED at $d — tail of log:" >&2
    tail -20 "/tmp/rehearse_$(basename "$d").log" >&2
    exit 1
  fi
  grep '"metric":"summary"' "/tmp/rehearse_$(basename "$d").log"
done

echo "== correctness at 10x =="
rm -rf /tmp/rehearse_verify10
if ! SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
    sbt -batch "runMain graft.Verify $FULL10 /tmp/rehearse_verify10" \
    >/tmp/rehearse_verify10.log 2>&1; then
  echo "Verify FAILED at 10x — tail of log:" >&2
  tail -20 /tmp/rehearse_verify10.log >&2
  exit 1
fi
python3 tools/check.py "$FULL10" /tmp/rehearse_verify10 | grep -E "^==|^FAIL"
