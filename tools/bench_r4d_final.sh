#!/bin/bash
# Round-4 refreshed canonical record: full sections including the new op
# rows (coreness, louvain, cc/triangles incremental, dsir).  Idle host.
set -u
cd /root/repo
LOG=BENCH/r4d_final.log
: > "$LOG"
echo "=== r4d start $(date -u +%H:%M:%S) ===" >> "$LOG"
env SPARK_GRAFT_BENCH_SECTIONS=scaling,dynamic,sweep,ops,tcp python bench.py >> "$LOG" 2>&1
cp BENCH/latest_full.json BENCH/BENCH_r4d.local.json
echo "=== r4d done $(date -u +%H:%M:%S) ===" >> "$LOG"
