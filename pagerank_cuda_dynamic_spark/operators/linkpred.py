"""Neighborhood-overlap link-prediction scores.

Classic link-prediction features over a directed edge table: for every
pair of SOURCE vertices (a, b) sharing at least `min_common`
out-neighbors, emit

  * cn          — |N(a) ∩ N(b)|  (common out-neighbor count)
  * jaccard     — cn / |N(a) ∪ N(b)|
  * adamic_adar — Σ_{p ∈ N(a)∩N(b)} 1 / ln(indeg(p))

(N(·) = out-neighbor set.)  On a bipartite user→item table this is the
co-occurrence / co-purchase similarity; on a symmetrized graph it is the
standard undirected link-prediction triple.

Shape: the pair generation is one self-join of the edge table on the
shared-neighbor key (dst), the same d² wedge pattern as n-gram Jaccard
(dedup.py) and triangle counting (components.py) — and the same skew
cure applies: `max_middle_indeg` drops middle vertices whose in-degree
exceeds the cap BEFORE the self-join, bounding the blowup at hub
neighbors (a p with 10^6 in-edges contributes 10^12 pairs but almost no
signal — every popular item is "shared").  All JVM-side: joins +
hash aggregates + one ln(); no Python anywhere.

Adamic-Adar is well-defined without guards: a shared neighbor has
in-degree ≥ 2 by construction, so ln(indeg) ≥ ln 2 > 0.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def link_prediction(
    edges: DataFrame,
    min_common: int = 2,
    max_middle_indeg: int | None = None,
) -> DataFrame:
    """Score source-vertex pairs by shared out-neighborhood overlap.

    Returns (a, b, cn, jaccard, adamic_adar) with a < b (each unordered
    pair once).  `min_common` bounds the output (HAVING on the pair
    aggregate); `max_middle_indeg` bounds the self-join fan-out at
    skewed shared neighbors (rows through dropped middles are excluded
    from cn/aa but NOT from the union size in the jaccard denominator —
    degrees are computed on the full graph, keeping the score honest
    about how much of each neighborhood overlaps).
    """
    if min_common < 1:
        raise ValueError("link_prediction: min_common must be >= 1")
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    # read 4x below (outdeg, indeg, both self-join legs): materialize so
    # the caller's edge derivation runs once instead of per reference
    e = materialize(edges.select("src", "dst").distinct())
    outdeg = e.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))
    ed = e.join(indeg, "dst")
    if max_middle_indeg is not None:
        ed = ed.where(F.col("indeg") <= max_middle_indeg)
    a = ed.select(
        F.col("dst"), F.col("src").alias("a"), F.col("indeg")
    )
    b = ed.select(F.col("dst"), F.col("src").alias("b"))
    pair_scores = (
        a.join(b, "dst")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(F.lit(1.0) / F.log(F.col("indeg"))).alias("adamic_adar"),
        )
        .where(F.col("cn") >= min_common)
    )
    return (
        pair_scores.join(
            outdeg.select(F.col("v").alias("a"), F.col("outdeg").alias("da")), "a"
        )
        .join(
            outdeg.select(F.col("v").alias("b"), F.col("outdeg").alias("db")), "b"
        )
        .select(
            "a",
            "b",
            "cn",
            (
                F.col("cn") / (F.col("da") + F.col("db") - F.col("cn"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
