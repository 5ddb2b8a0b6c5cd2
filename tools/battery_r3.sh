#!/bin/sh
# Round-3 TPU measurement battery (VERDICT r2 items #1a/#2/#5/#7 + canvas
# sweep + rotate cost). Runs serially on the real chip — NOTHING else may
# run on this 1-core host while it does (CLAUDE.md bench rule). Each line
# appends one bench.py JSON record to BATTERY_r3.jsonl; every fresh config
# pays a 4-15 min remote compile (no warm cache on axon — PERF_NOTES).
#
# Usage: sh tools/battery_r3.sh [start_index]
set -x
cd "$(dirname "$0")/.."
OUT=BATTERY_r3.jsonl
START=${1:-0}
i=0
run() {
  i=$((i+1))
  [ "$i" -le "$START" ] && return
  echo "### config $i: $*" >> "$OUT"
  timeout 2400 python bench.py "$@" >> "$OUT" 2>>battery_r3.err \
    || echo "{\"error\": \"config $i failed rc=$?\"}" >> "$OUT"
}

# --- defaults decision (BN modes under the new shipped input conditions)
run --bn-subsample 1                      # full-batch BN (sync-BN semantics)
run --bn-subsample 8 --bn-grouped        # grouped = per-GPU parity mode
run --bn-subsample 8                      # bnsub8 (fast, convergence-failed)
run --canvas 224 --bn-subsample 8         # r2-conditions continuity check

# --- the missing clock rows (VERDICT #2: no cost-rejected rows left)
run --unit-chain xla
run --unit-chain pallas
run --remat-policy conv --bn-subsample 1
run --host-data --bn-subsample 1

# --- canvas fidelity sweep (VERDICT #5)
run --canvas 288 --bn-subsample 1
run --canvas 320 --bn-subsample 1

# --- ResNeXt confirmation under new conditions (VERDICT #7)
run --network resnext --grouped-dense --grouped-merge 2 --bn-subsample 1

# --- rotate/shear path cost (VERDICT weak #9)
run --bn-subsample 1 --max-rotate-angle 10
