#!/bin/sh
# Round-3i TPU battery: the mask-backward stem maxpool knob
# (ops/pool.py --pool-grad mask) on top of the shipped schedule
# (spd4 unroll + s2d, now the imagenet_resnet50 preset default —
# bench.py with no flags measures it), plus a fine batch probe around
# the bs128 optimum under the new schedule.
# Runs serially on the real chip — NOTHING else may run on this 1-core
# host while it does (CLAUDE.md bench rule).
#
# Usage: sh tools/battery_r3i.sh [start_index]
set -x
cd "$(dirname "$0")/.."
OUT=BATTERY_r3i.jsonl
START=${1:-0}
i=0
run() {
  i=$((i+1))
  [ "$i" -le "$START" ] && return
  echo "### config $i: $*" >> "$OUT"
  timeout 2400 python bench.py "$@" >> "$OUT" 2>>battery_r3i.err \
    || echo "{\"error\": \"config $i failed rc=$?\"}" >> "$OUT"
}

run                       # shipped preset anchor (now spd4u+s2d)
run --pool-grad mask      # the select_and_scatter replacement
run --batch-size 112
run --batch-size 144
run --pool-grad mask --batch-size 144
