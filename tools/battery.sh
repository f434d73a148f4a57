#!/usr/bin/env bash
# Round-close gate battery (VERDICT r9 #2: the full transcript must be
# COMMITTED as battery.log — r9's close truncated it to 16 bytes, breaking
# the evidence chain exactly when a judge needed it).
#
# Runs every gate from .claude/skills/verify/SKILL.md, tee-ing to
# battery.log at the repo root. Fuzz seeds are passed as arguments so each
# round's fresh seeds are visible in the transcript; a seed may carry an
# explicit phase as seed:phase (default 5):
#   bash tools/battery.sh 61 67:6
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=battery.log
: > "$LOG"
fail=0

run() {
  echo "=== $*" | tee -a "$LOG"
  # keep the transcript readable: drop Spark's stage-progress \r spam but
  # keep everything else, including WARNs
  "$@" 2>&1 | tr '\r' '\n' | grep -v '^\[Stage' | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  echo "=== exit $rc" | tee -a "$LOG"
  [ "$rc" -ne 0 ] && fail=1
  return 0
}

run python -m pytest tests/ -q
run python -m quarkus_etl_spark.verify /root/testdata/sf0.001
run env SPARK_GRAFT_CPUS=7 python -m quarkus_etl_spark.verify /root/testdata/sf0.001
run python tools/driver_sim.py /root/testdata/sf0.01
run python -m tools.fingerprint --check
run python -m tools.type_audit --check
run python -m tools.plan_audit --check
run python -m tools.fuzz_diff --tiny
for arg in "$@"; do
  seed=${arg%%:*}
  phase=5
  [[ "$arg" == *:* ]] && phase=${arg#*:}
  run python -m tools.fuzz_diff --seed "$seed" --phase "$phase" --base /root/testdata/sf0.01
done

if [ "$fail" -eq 0 ]; then
  echo "=== battery PASS (all gates)" | tee -a "$LOG"
else
  echo "=== battery FAILED (see transcript above)" | tee -a "$LOG"
fi
exit "$fail"
