"""Decompose the hits/salsa per-half-step wall at bench scale.

Times: entity-edge prep, per-half-step materialize walls for the first
K rounds, plus variants: (a) current lazy-norm crossJoin, (b) driver-
collected norm scalar folded as a literal, (c) no norm at all (lower
bound for the gather+materialize job pair).

Usage: python tools/profile_hits.py [K_rounds]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""
from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main() -> None:
    from pagerank_cuda_dynamic_spark.session import get_spark
    from pagerank_cuda_dynamic_spark.sources.edges import derive_entity_edges
    from pagerank_cuda_dynamic_spark.plans.barrier import (
        broadcast_state,
        loop_partitions,
        materialize,
    )

    spark = get_spark(
        app_name="profile-hits",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    edges = derive_entity_edges(spark, SF_DIR)
    e = (
        edges.select("src", "dst")
        .distinct()
        .where(F.col("src") != F.col("dst"))
        .persist()
    )
    m = e.count()
    t_edges = time.time() - t0
    t0 = time.time()
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = verts.count()
    t_verts = time.time() - t0
    print(f"prep: edges={m} ({t_edges:.2f}s) verts={n} ({t_verts:.2f}s)")

    def run_variant(tag, norm_mode):
        with loop_partitions(spark, n):
            hub = verts.select("v", F.lit(1.0 / math.sqrt(n)).alias("s")).transform(
                materialize
            )
            walls = []
            norm_walls = []
            for i in range(K):
                for probe, build in (("src", "dst"), ("dst", "src")):
                    t0 = time.time()
                    raw = (
                        e.join(
                            broadcast_state(hub.withColumnRenamed("v", probe), n),
                            probe,
                        )
                        .groupBy(F.col(build).alias("v"))
                        .agg(F.sum("s").alias("s"))
                        .transform(materialize)
                    )
                    walls.append(time.time() - t0)
                    t0 = time.time()
                    if norm_mode == "lazy":
                        normdf = raw.agg(
                            F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("_l2")
                        )
                        hub = raw.crossJoin(F.broadcast(normdf)).select(
                            "v",
                            F.when(F.col("_l2") > 0, F.col("s") / F.col("_l2"))
                            .otherwise(F.col("s"))
                            .alias("s"),
                        )
                    elif norm_mode == "driver":
                        l2 = raw.agg(
                            F.sqrt(F.sum(F.col("s") * F.col("s")))
                        ).collect()[0][0]
                        hub = raw.select(
                            "v",
                            (F.col("s") / F.lit(l2)).alias("s")
                            if l2 and l2 > 0
                            else F.col("s").alias("s"),
                        )
                    else:
                        hub = raw
                    norm_walls.append(time.time() - t0)
            print(
                f"{tag}: half-step materialize walls "
                f"{[round(w, 3) for w in walls]}"
            )
            print(
                f"{tag}: norm-phase walls {[round(w, 3) for w in norm_walls]}"
            )
            print(
                f"{tag}: mean half-step total "
                f"{sum(walls) / len(walls) + sum(norm_walls) / len(norm_walls):.3f}s"
            )

    run_variant("lazy-norm (current)", "lazy")
    run_variant("driver-norm", "driver")
    run_variant("no-norm", "none")
    spark.stop()


if __name__ == "__main__":
    main()
