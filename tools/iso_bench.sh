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
# a shorter file. Scratch isolation (review r17): every sbt invocation
# gets a script-PRIVATE SPARK_LOCAL_DIRS (mktemp -d), and only that
# directory is wiped between queries — a concurrent Spark run's live
# shuffle/block-manager dirs in shared /tmp are never touched.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:?sfDir}; REPS=${2:?reps}; OUT=${3:?out.jsonl}; shift 3
SCRATCH=$(mktemp -d /tmp/iso_bench_scratch.XXXXXX)
trap 'rm -rf "$SCRATCH"' EXIT
: > "$OUT"
for q in "$@"; do
  LOG=$(mktemp /tmp/iso_bench_${q}.XXXXXX.log)
  SPARK_LOCAL_DIRS="$SCRATCH" \
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
  # per-query environment evidence (r17: epoch adjudication needs the
  # host state IN the artifact, not reconstructed from memory) — a
  # sidecar JSON line bench_gate's --iso loader skips (metric != total)
  printf '{"metric":"iso_env","query":"%s","loadavg":"%s"}\n' \
    "$q" "$(cut -d' ' -f1-3 /proc/loadavg)" >> "$OUT"
  # wipe ONLY this script's private scratch between queries
  rm -rf "$SCRATCH"/* 2>/dev/null || true
  echo "[iso_bench] $q done" >&2
done
echo "wrote $OUT" >&2
