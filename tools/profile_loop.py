"""Micro-profile of the iterative-loop fixed cost: what does ONE
gather-join + materialize barrier cost on tiny/medium state, and which
knob moves it (AQE on/off, shuffle partitions, broadcast hint)?

Usage: python tools/profile_loop.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F

from pagerank_cuda_dynamic_spark.plans.barrier import broadcast_state, materialize
from pagerank_cuda_dynamic_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def loop_cost(spark, e, n_verts: int, iters: int = 10, label: str = "") -> float:
    state = e.select(F.col("src").alias("v")).distinct().select(
        "v", F.lit(1.0).alias("s")
    ).transform(materialize)
    t0 = time.time()
    for _ in range(iters):
        state = (
            e.join(broadcast_state(state.withColumnRenamed("v", "src"), n_verts), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("s").alias("s"))
            .transform(materialize)
        )
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.0f} ms/iter  (e parts={e.rdd.getNumPartitions()})")
    return dt


def main() -> None:
    spark = get_spark(
        app_name="profile-loop",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # tiny graph: 100 vertices, 5k edges (events-graph regime)
    tiny = (
        spark.range(5000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(100)).cast("string").alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)).cast("string").alias("dst"),
        )
        .distinct()
        .persist()
    )
    tiny.count()
    # medium graph: 36k vertices, 1.2M edges (entity-graph regime)
    med = (
        spark.range(1200000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(36000)).cast("string").alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(36000)).cast("string").alias("dst"),
        )
        .distinct()
        .persist()
    )
    med.count()

    for name, e, nv in (("tiny", tiny, 100), ("medium", med, 36000)):
        loop_cost(spark, e, nv, label=f"{name} baseline (AQE on, bcast)")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        loop_cost(spark, e, nv, label=f"{name} AQE off")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        loop_cost(spark, e, nv, label=f"{name} AQE off, shufpart=4")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        loop_cost(spark, e, nv, label=f"{name} AQE on, shufpart=4")
        spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))
        # no broadcast hint
        import pagerank_cuda_dynamic_spark.plans.barrier as B

        loop_cost(
            spark, e.repartition(4, "src"), nv,
            label=f"{name} e repart4(src)",
        )
    spark.stop()


if __name__ == "__main__":
    main()
