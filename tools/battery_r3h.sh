#!/bin/sh
# Round-3h TPU battery: finish the unroll x s2d matrix (r3g: spd4u+s2d
# 2978.5 is the champion; unroll returns plateau 4->8) and refresh the
# model family under the winning schedule before shipping it as the
# preset default.
# Runs serially on the real chip — NOTHING else may run on this 1-core
# host while it does (CLAUDE.md bench rule).
#
# Usage: sh tools/battery_r3h.sh [start_index]
set -x
cd "$(dirname "$0")/.."
OUT=BATTERY_r3h.jsonl
START=${1:-0}
i=0
run() {
  i=$((i+1))
  [ "$i" -le "$START" ] && return
  echo "### config $i: $*" >> "$OUT"
  timeout 2400 python bench.py "$@" >> "$OUT" 2>>battery_r3h.err \
    || echo "{\"error\": \"config $i failed rc=$?\"}" >> "$OUT"
}

run --steps-per-dispatch 8 --spd-unroll --stem-s2d   # the open matrix corner
run --steps-per-dispatch 4 --spd-unroll --stem-s2d   # champion, 2nd clock
run --network resnext --depth 50 --steps-per-dispatch 4 --spd-unroll --stem-s2d
run --depth 101 --steps-per-dispatch 4 --spd-unroll --stem-s2d
run --depth 152 --batch-size 192 --steps-per-dispatch 4 --spd-unroll --stem-s2d
