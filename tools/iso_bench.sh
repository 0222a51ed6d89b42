#!/bin/bash
# Isolated per-query medians: one query per JVM through graft.Bench
# (SPARK_GRAFT_ONLY + WARM_SF), spark temp dirs cleaned between runs.
# This is the protocol behind SF10_ISO_r16.json — at sf10 a
# round-robin's neighbors perturb each other through OS writeback
# (BENCH_NOTES r16: x67 77s round-robin vs 13.2s isolated), so decade
# points past sf1 measure isolated. Usage:
#   tools/iso_bench.sh <sfDir> <reps> <out.jsonl> <query> [query ...]
set -e
cd "$(dirname "$0")/.."
SF=${1:?sfDir}; REPS=${2:?reps}; OUT=${3:?out.jsonl}; shift 3
: > "$OUT"
for q in "$@"; do
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} SPARK_GRAFT_SF_DIR="$SF" \
  SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_REPS="$REPS" SPARK_GRAFT_WARM_SF=1 \
  SPARK_GRAFT_REP_BUDGET_SEC=${SPARK_GRAFT_REP_BUDGET_SEC:-300} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | head -1 >> "$OUT"
  rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
  echo "[iso_bench] $q done" >&2
done
echo "wrote $OUT" >&2
