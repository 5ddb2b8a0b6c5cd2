#!/bin/bash
# Round 3k (cont.): does the R50 K=6 peak transfer to the family?
cd /root/repo
out=BATTERY_r3k.jsonl
run() {
  echo "# $*" >> $out
  python bench.py "$@" 2>>/tmp/battery_r3k.err >> $out
}
run --network resnext --steps-per-dispatch 6
run --depth 101 --steps-per-dispatch 6
run --depth 152 --batch-size 192 --steps-per-dispatch 6
echo done3 >> $out
