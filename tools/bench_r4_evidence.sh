#!/bin/bash
# Round-4 bench evidence runs, strictly SEQUENTIAL (identical local[32] runs
# swing 33-105ms median under co-tenancy; see BENCH/BASELINE.md).
set -u
cd /root/repo
LOG=BENCH/r4_evidence.log
: > "$LOG"

run () {  # name, env... -> copies latest_full.json to BENCH/BENCH_$name.local.json
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$LOG"
  env "$@" python bench.py >> "$LOG" 2>&1
  cp BENCH/latest_full.json "BENCH/BENCH_${name}.local.json"
  echo "=== $name done $(date -u +%H:%M:%S) ===" >> "$LOG"
}

# 1. settle the N->4N scaling claim: 10 paired repeats (verdict #1)
run r4_scaling10 SPARK_GRAFT_BENCH_SECTIONS=scaling SPARK_GRAFT_SCALING_REPEATS=10

# 2. reference batch regime: 100 batches/fraction (verdict #5)
run r4_sweep100 SPARK_GRAFT_BENCH_SECTIONS=sweep SPARK_GRAFT_DYN_BATCHES=100

# 3. full-bench-size two-JVM TCP dynamic (verdict #6)
run r4_tcp2full SPARK_GRAFT_BENCH_SECTIONS=tcp \
    SPARK_GRAFT_TCP_2PROC_CONVS=200000 \
    "SPARK_GRAFT_TCP_2PROC_MASTER=local-cluster[2,16,8192]"

# 4. canonical full r4 record (all sections, default knobs)
run r4 SPARK_GRAFT_BENCH_SECTIONS=scaling,dynamic,sweep,ops,tcp

echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
