#!/bin/bash
# Round-4b: re-measure N->4N scaling with the cache-blocked gather layout
# (tools/bench_r4_evidence.sh run 1 recorded 0.692 with the row-order
# gather — kept as the control).  Strictly sequential, idle host.
set -u
cd /root/repo
LOG=BENCH/r4b_scaling.log
: > "$LOG"

run () {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$LOG"
  env "$@" python bench.py >> "$LOG" 2>&1
  cp BENCH/latest_full.json "BENCH/BENCH_${name}.local.json"
  echo "=== $name done $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run r4b_scaling10 SPARK_GRAFT_BENCH_SECTIONS=scaling SPARK_GRAFT_SCALING_REPEATS=10

# full-bench-size two-JVM retry: run 3 of r4_evidence heap-OOMed because
# local-cluster worker MB never reached the executor JVMs (-Xmx1024M
# default); bench.py now sets spark.executor.memory from the master string
run r4b_tcp2full SPARK_GRAFT_BENCH_SECTIONS=tcp \
    SPARK_GRAFT_TCP_2PROC_CONVS=200000 \
    "SPARK_GRAFT_TCP_2PROC_MASTER=local-cluster[2,16,8192]"

echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
