#!/bin/sh
# Round-3e TPU battery: multi-step dispatch (train.steps_per_dispatch).
# The bs128 bn-ema trace put the dispatch/idle gap at ~1.2 ms/step
# (43.3 ms traced vs 44.5 ms benched); scanning K steps per dispatched
# program amortizes it. Re-clocks the shipped spd=1 anchor in the same
# session. Runs serially on the real chip — NOTHING else may run on this
# 1-core host while it does (CLAUDE.md bench rule).
#
# Usage: sh tools/battery_r3e.sh [start_index]
set -x
cd "$(dirname "$0")/.."
OUT=BATTERY_r3e.jsonl
START=${1:-0}
i=0
run() {
  i=$((i+1))
  [ "$i" -le "$START" ] && return
  echo "### config $i: $*" >> "$OUT"
  timeout 2400 python bench.py "$@" >> "$OUT" 2>>battery_r3e.err \
    || echo "{\"error\": \"config $i failed rc=$?\"}" >> "$OUT"
}

run                                        # same-session spd=1 anchor (shipped preset)
run --steps-per-dispatch 2
run --steps-per-dispatch 4
run --steps-per-dispatch 8
run --steps-per-dispatch 16
