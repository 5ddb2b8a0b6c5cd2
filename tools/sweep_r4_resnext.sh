#!/bin/sh
# Round-4 ResNeXt grouped-dense merge sweep (VERDICT r3 #8): merge 4 and
# merge 8 of _GroupedConvDense were never clocked (only merge-2 and
# full-dense). Fresh merge-2 anchor first — the round-4 fused-photometric
# augmenter default moved every program, so the r3k anchor (1924/1918)
# is stale. Then the aug_s2d candidate on the merge winner.
set -x
for args in \
    "--network resnext" \
    "--network resnext --grouped-merge 4" \
    "--network resnext --grouped-merge 8" \
    "--network resnext --aug-s2d" \
    "--no-bn-ema --batch-size 256"; do
  tag=$(echo "$args" | tr -c '0-9a-z' _)
  timeout 1800 python bench.py $args > "/tmp/sweep_r4x$tag.log" 2>&1
  echo "== $args exit=$?"
  tail -2 "/tmp/sweep_r4x$tag.log" | grep -v WARNING
done
