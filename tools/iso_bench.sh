#!/bin/bash
# Isolated per-query medians: one query per JVM through graft.Bench
# (SPARK_GRAFT_ONLY + WARM_SF). This is the protocol behind
# SF10_ISO_r16.json — at sf10 a round-robin's neighbors perturb each
# other through OS writeback (BENCH_NOTES r16: x67 77s round-robin vs
# 13.2s isolated), so decade points past sf1 measure isolated.
#
#   tools/iso_bench.sh <sfDir> <reps> <out.jsonl> <query> [query ...]
#
# Fails LOUDLY (review r16): a run that produces no artifact line —
# typo'd query name (Bench's SPARK_GRAFT_ONLY require), OOM, crash —
# aborts the script with the sbt log path instead of silently writing
# a shorter file; and the between-query scratch cleanup removes ONLY
# directories created during this script's lifetime, never a
# concurrent run's live shuffle dirs.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:?sfDir}; REPS=${2:?reps}; OUT=${3:?out.jsonl}; shift 3
STAMP=$(mktemp /tmp/iso_bench_stamp.XXXXXX)
: > "$OUT"
for q in "$@"; do
  LOG=$(mktemp /tmp/iso_bench_${q}.XXXXXX.log)
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} SPARK_GRAFT_SF_DIR="$SF" \
  SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_REPS="$REPS" SPARK_GRAFT_WARM_SF=1 \
  SPARK_GRAFT_REP_BUDGET_SEC=${SPARK_GRAFT_REP_BUDGET_SEC:-300} \
  sbt -batch "runMain graft.Bench" > "$LOG" 2>&1 || true
  LINE=$(grep '"metric"' "$LOG" | head -1 || true)
  if [ -z "$LINE" ]; then
    echo "[iso_bench] FAILED: $q produced no artifact line — see $LOG" >&2
    exit 1
  fi
  printf '%s\n' "$LINE" >> "$OUT"
  # scope the scratch cleanup to THIS script's runs (newer than STAMP)
  find /tmp -maxdepth 1 \( -name 'blockmgr-*' -o -name 'spark-*' \) \
    -newer "$STAMP" -exec rm -rf {} + 2>/dev/null || true
  echo "[iso_bench] $q done" >&2
done
rm -f "$STAMP"
echo "wrote $OUT" >&2
