#!/bin/sh
# Round-3f TPU battery: finish the multi-step-dispatch sweep (r3e was cut
# off by the round snapshot after spd4's anomalous 1286) and clock the two
# new structural candidates:
#   - space-to-depth stem (--stem-s2d): the 7x7/2 C=3 stem conv re-indexed
#     to a 4x4/1 conv on 12 channels (exact; tests/test_stem_s2d.py) — 4x
#     MXU lane occupancy on the one shape-hostile conv in the family;
#   - scan unroll (--spd-unroll): let XLA schedule across the K scanned
#     step bodies instead of looping.
# Runs serially on the real chip — NOTHING else may run on this 1-core
# host while it does (CLAUDE.md bench rule).
#
# Usage: sh tools/battery_r3f.sh [start_index]
set -x
cd "$(dirname "$0")/.."
OUT=BATTERY_r3f.jsonl
START=${1:-0}
i=0
run() {
  i=$((i+1))
  [ "$i" -le "$START" ] && return
  echo "### config $i: $*" >> "$OUT"
  timeout 2400 python bench.py "$@" >> "$OUT" 2>>battery_r3f.err \
    || echo "{\"error\": \"config $i failed rc=$?\"}" >> "$OUT"
}

run                                        # same-session spd=1 anchor (shipped preset)
run --steps-per-dispatch 2                 # r3e: 2890 — confirm
run --steps-per-dispatch 2 --spd-unroll
run --steps-per-dispatch 4                 # r3e: 1286 (anomaly?) — re-clock
run --stem-s2d
run --stem-s2d --steps-per-dispatch 2
run --steps-per-dispatch 8                 # finish the r3e sweep
