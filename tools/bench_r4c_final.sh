#!/bin/bash
# Round-4 final evidence with edge-budget striping: host roofline micro,
# 10-pair N->4N scaling, canonical full record.  Sequential, idle host.
set -u
cd /root/repo
LOG=BENCH/r4c_final.log
: > "$LOG"

run () {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$LOG"
  env "$@" python bench.py >> "$LOG" 2>&1
  cp BENCH/latest_full.json "BENCH/BENCH_${name}.local.json"
  echo "=== $name done $(date -u +%H:%M:%S) ===" >> "$LOG"
}

echo "=== micro roofline start $(date -u +%H:%M:%S) ===" >> "$LOG"
python tools/micro_gather_scaling.py 2 8 32 > BENCH/MICRO_roofline_r4.json 2>> "$LOG"
echo "=== micro done $(date -u +%H:%M:%S) ===" >> "$LOG"

run r4c_scaling10 SPARK_GRAFT_BENCH_SECTIONS=scaling SPARK_GRAFT_SCALING_REPEATS=10

run r4c SPARK_GRAFT_BENCH_SECTIONS=scaling,dynamic,sweep,ops,tcp

echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
