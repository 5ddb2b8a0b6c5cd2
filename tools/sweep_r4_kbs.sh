#!/bin/sh
# Round-4 joint K x batch sweep at the shipped config (VERDICT r3 #1:
# the K=6 optimum was found at FIXED bs128; sweep the cross product at
# median-window resolution). K6/bs128 anchor = 3008.6 (PERF_NOTES 4a).
# Serial on purpose: 1-core host, bench.py must never share the box.
set -x
for args in \
    "--steps-per-dispatch 5" \
    "--steps-per-dispatch 5 --batch-size 120" \
    "--batch-size 120" \
    "--steps-per-dispatch 5 --batch-size 136" \
    "--batch-size 136" \
    "--no-bn-ema --steps-per-dispatch 4" \
    "--no-bn-ema --steps-per-dispatch 8" \
    "--no-bn-ema --unit-chain pallas"; do
  tag=$(echo "$args" | tr -cd '0-9 ' | tr ' ' _)
  timeout 1800 python bench.py $args > "/tmp/sweep_r4_$tag.log" 2>&1
  echo "== $args exit=$?"
  tail -2 "/tmp/sweep_r4_$tag.log" | grep -v WARNING
done
