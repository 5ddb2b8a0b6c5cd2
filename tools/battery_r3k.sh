#!/bin/bash
# Round 3k: precision battery — candidates previously unresolvable at the
# ±2% cross-session band, re-clocked with the median-of-3-windows bench
# (quiet-host window spread ±0.1%). Serial runs; nothing else on the box.
cd /root/repo
out=BATTERY_r3k.jsonl
: > $out
run() {
  echo "# $*" >> $out
  python bench.py "$@" 2>>/tmp/battery_r3k.err >> $out
}
run                                      # anchor: shipped preset
run --steps-per-dispatch 6 --spd-unroll
run --steps-per-dispatch 8 --spd-unroll
run --xla-opts xla_tpu_enable_latency_hiding_scheduler=true
run --xla-opts xla_tpu_rwb_fusion=false
echo done >> $out
