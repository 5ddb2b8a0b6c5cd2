#!/bin/sh
# Round-4 family refresh: R101/R152 anchors under the round-4 augmentation
# boundary fusions. bench.py family rows (--depth != 50) inherit the R50
# preset knobs at bs256 (bs192 for R152 — bs256 exceeds HBM there), so the
# anchor leg includes fused photometrics + aug_s2d; the --no-aug-s2d leg
# isolates the boundary-fusion delta at family depth. ResNeXt legs live in
# tools/sweep_r4_resnext.sh (merge sweep + aug_s2d, VERDICT r3 #8).
set -x
for args in \
    "--depth 101" \
    "--depth 101 --no-aug-s2d" \
    "--depth 152 --batch-size 192" \
    "--depth 152 --batch-size 192 --no-aug-s2d"; do
  tag=$(echo "$args" | tr -c '0-9a-z' _)
  timeout 2400 python bench.py $args > "/tmp/sweep_r4f$tag.log" 2>&1
  echo "== $args exit=$?"
  tail -2 "/tmp/sweep_r4f$tag.log" | grep -v WARNING
done
