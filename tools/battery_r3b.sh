#!/bin/sh
# Round-3b TPU battery: the bn_stat_stride candidate (spatial BN-stats
# subsampling — stats from every s-th pixel row/column of ALL images,
# 1/s^2 stats-sweep traffic with none of bnsub's image-subset bias).
# Re-clocks the shipped baseline in the same session so the stride rows
# have a same-chip-state anchor. Runs serially on the real chip — NOTHING
# else may run on this 1-core host while it does (CLAUDE.md bench rule).
#
# Usage: sh tools/battery_r3b.sh [start_index]
set -x
cd "$(dirname "$0")/.."
OUT=BATTERY_r3b.jsonl
START=${1:-0}
i=0
run() {
  i=$((i+1))
  [ "$i" -le "$START" ] && return
  echo "### config $i: $*" >> "$OUT"
  timeout 2400 python bench.py "$@" >> "$OUT" 2>>battery_r3b.err \
    || echo "{\"error\": \"config $i failed rc=$?\"}" >> "$OUT"
}

run --bn-subsample 1                       # same-session baseline anchor
run --bn-stat-stride 2                     # 1/4 stats traffic
run --bn-stat-stride 4                     # 1/16 stats traffic
run --bn-stat-stride 2 --bn-subsample 8 --bn-grouped  # parity mode + stride
