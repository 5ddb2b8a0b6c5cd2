#!/bin/sh
# Round-3g TPU battery: compose the r3f winners. r3f found unroll is the
# real multi-step win (spd2u 2932 vs spd2 2888) and stem-s2d is +0.8%
# and composes with looped spd2; this battery clocks unroll x {K=4,8},
# unroll x s2d, and one batch-size re-probe under the new best schedule
# (the bs optimum moved once already when bn-ema changed the program).
# Runs serially on the real chip — NOTHING else may run on this 1-core
# host while it does (CLAUDE.md bench rule).
#
# Usage: sh tools/battery_r3g.sh [start_index]
set -x
cd "$(dirname "$0")/.."
OUT=BATTERY_r3g.jsonl
START=${1:-0}
i=0
run() {
  i=$((i+1))
  [ "$i" -le "$START" ] && return
  echo "### config $i: $*" >> "$OUT"
  timeout 2400 python bench.py "$@" >> "$OUT" 2>>battery_r3g.err \
    || echo "{\"error\": \"config $i failed rc=$?\"}" >> "$OUT"
}

run --steps-per-dispatch 2 --spd-unroll --stem-s2d   # compose the two wins
run --steps-per-dispatch 4 --spd-unroll              # deeper cross-step overlap
run --steps-per-dispatch 4 --spd-unroll --stem-s2d
run --steps-per-dispatch 2 --spd-unroll --batch-size 256  # bs re-probe under unroll
run --steps-per-dispatch 8 --spd-unroll              # compile-heaviest last
