"""Deterministic cardinality sketches for corpus profiling.

KMV (k-minimum-values, Bar-Yossef et al. 2002): the k smallest hash
values of a column determine a distinct-count estimate
(k-1)·H / h_k (H = hash space size, h_k = k-th smallest).  Unlike HLL
(whose register layout is engine-private — Spark's approx_count_distinct
cannot be value-checked against any other engine), KMV over a portable
hash is a PURE FUNCTION of the input set:

  * deterministic — any engine with the same hash computes the same
    sketch, so the DuckDB oracles check it exactly (integer estimate via
    floor division, no float anywhere);
  * mergeable — sketch(A ∪ B) = k-smallest of sketch(A) ∪ sketch(B), the
    property that makes per-shard profiling of a 100 TB corpus a
    map-side pass + one tiny reduce;
  * order/layout independent — repartitioning cannot change the result
    (DataFrame.sample and HLL both fail this).

Scale posture: the global variant is distinct→sort→limit(k) —
per-partition top-k (TakeOrderedAndProject) after a hash-distinct, never
a global sort of all rows; the grouped variant is one window partitioned
by the group key (≤ k rows survive per group).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# md5-derived 60-bit hash space (matches __spark_entry__._md5_hash64 and
# every DuckDB oracle's CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT))
HASH_SPACE = 1 << 60


def _portable_hash64(col) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
    hash_fn=None,
) -> DataFrame:
    """Global KMV distinct-count estimate for `col`.

    Returns ONE row (kth_hash, n_sketch, estimate):
      * n_sketch < k  → fewer than k distinct values existed; estimate is
        then EXACT (= n_sketch);
      * else estimate = (k-1)·HASH_SPACE / kth_hash computed in ONE
        IEEE-double division ((k-1)·2^60 is exactly representable, and
        IEEE division is deterministic — identical on any engine, unlike
        libm log/exp).
    """
    if hash_fn is None:
        hash_fn = _portable_hash64
    h = (
        df.select(hash_fn(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return h.agg(
        F.max("h").alias("kth_hash"),
        F.count(F.lit(1)).alias("n_sketch"),
    ).select(
        "kth_hash",
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.lit(float((k - 1) * HASH_SPACE)) / F.col("kth_hash").cast("double")
        )
        .alias("estimate"),
    )


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 256,
    hash_fn=None,
) -> DataFrame:
    """Per-group KMV distinct-count estimates: one row per group value of
    `group_col` with (group, kth_hash, n_sketch, estimate) under the same
    exact/estimate split as kmv_distinct.  One window partitioned by the
    group key — never global."""
    from pyspark.sql import Window

    if hash_fn is None:
        hash_fn = _portable_hash64
    w = Window.partitionBy("g").orderBy("h")
    h = (
        df.select(F.col(group_col).alias("g"), hash_fn(F.col(col)).alias("h"))
        .dropDuplicates(["g", "h"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    return (
        h.groupBy("g")
        .agg(F.max("h").alias("kth_hash"), F.count(F.lit(1)).alias("n_sketch"))
        .select(
            F.col("g").alias(group_col),
            "kth_hash",
            "n_sketch",
            F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
            .otherwise(
                F.lit(float((k - 1) * HASH_SPACE))
                / F.col("kth_hash").cast("double")
            )
            .alias("estimate"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 64,
) -> DataFrame:
    """EXACT φ-heavy hitters (φ = 1/(k+1)) with bounded shuffle state:
    every item whose frequency strictly exceeds n/(k+1), via a per-
    partition Misra–Gries sketch + one exact verification pass.

    Why not a plain groupBy→count→filter: at 100 TB the key space
    (n-grams, URLs) can hold trillions of distinct items, so the full
    groupBy shuffles the entire key universe.  Misra–Gries caps state at
    k counters PER PARTITION and the shuffle at k·P candidate rows.

    Candidate completeness is a theorem, not a heuristic: if
    freq(x) > n/(k+1) globally, then freq_i(x) > n_i/(k+1) in at least
    one partition i (else summing the ≤ inequalities over partitions
    contradicts the global >), and per-partition MG with k counters
    retains every item above its partition's n_i/(k+1).  The second pass
    counts ONLY the ≤ k·P candidates exactly (broadcast semi-join — the
    corpus is scanned once more but never shuffled on the raw key) and
    filters with integer arithmetic: cnt·(k+1) > n.  Output is therefore
    exactly the true heavy-hitter set with exact counts — value-checkable
    against any engine's GROUP BY ... HAVING.

    Returns (item, cnt) for every item with cnt·(k+1) > n.
    """
    import pandas as pd

    src = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf["item"].values:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters.keys())})

    candidates = F.broadcast(
        src.mapInPandas(mg_partition, "item string").distinct()
    )
    n = src.count()
    return (
        src.join(candidates, "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (k + 1) > F.lit(n))
    )


__all__ = ["kmv_distinct", "kmv_distinct_by", "heavy_hitters", "HASH_SPACE"]
