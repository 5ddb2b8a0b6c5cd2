#!/bin/bash
cd /root/repo
out=BATTERY_r3k.jsonl
run() {
  echo "# $*" >> $out
  python bench.py "$@" 2>>/tmp/battery_r3k.err >> $out
}
run --steps-per-dispatch 5 --spd-unroll
run --steps-per-dispatch 7 --spd-unroll
run --steps-per-dispatch 6 --spd-unroll     # confirmation clock
echo done2 >> $out
