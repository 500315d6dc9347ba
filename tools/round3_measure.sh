#!/bin/bash
# Round-3 on-chip measurement sequence (run when the TPU relay is up).
#
# Answers the two open round-3 questions in one unattended pass, teeing
# everything to /tmp/r3m/ so a relay drop mid-run loses nothing:
#   1. does the head-conv-FUSED packed decode beat the unfused serving
#      path on chip (float + int8-carrier)?      -> probe_fused_head
#   2. where is the group-max selection crossover? -> bench_select_group
# then re-validates every Pallas kernel (tpu_check) and, if the answers
# warrant flipping defaults, the final bench rows are re-run by hand.
#
# Usage: bash tools/round3_measure.sh [outdir=/tmp/r3m]
set -u
OUT=${1:-/tmp/r3m}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc"
  tail -20 "$OUT/$name.log"
}

run tpu_check        900 python tools/tpu_check.py
run probe_fused_608  1800 python tools/probe_fused_head.py --int8
run select_group     1800 python tools/bench_select_group.py
run probe_fused_tiny 1200 python tools/probe_fused_head.py \
    --cfg yolov3-tiny.cfg --size 416 --batch 128
echo "=== done ($(date +%H:%M:%S)); logs in $OUT ==="
