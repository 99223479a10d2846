"""Seeded batch-update generators (batch.hxx:30–139 analog).

The reference samples random edge deletions (random vertex, random out-edge
slot, 5 retries — batch.hxx:30–58) and uniform random insertions
(batch.hxx:76–82).  Distributed equivalents must be deterministic under
re-execution, so sampling is HASH-based (a pure function of the row),
never `rand()` (which is partition-layout dependent under retries).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def sample_deletions(
    edges: DataFrame, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic ~fraction·|E| edge deletions: keep edges whose seeded
    hash falls under the threshold (reproducible under task retries,
    unlike df.sample)."""
    m = max(int(round(1.0 / max(fraction, 1e-12))), 1)
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))  # never delete injected self-loops
        .where(F.pmod(F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")), F.lit(m)) == 0)
    )


def sample_insertions(
    spark, n_vertices: int, k: int, seed: int = 42
) -> DataFrame:
    """k deterministic uniform-random (src, dst) candidate insertions
    (batch.hxx:76–82): hash-derived endpoints over the dense id space,
    self-pairs dropped.  Tidy (existence anti-join) is the caller's job,
    exactly as in the reference (tidyBatchUpdateU)."""
    h1 = F.xxhash64(F.lit(seed), F.col("id"), F.lit("src"))
    h2 = F.xxhash64(F.lit(seed), F.col("id"), F.lit("dst"))
    return (
        spark.range(k)
        .select(
            F.pmod(h1, F.lit(n_vertices)).alias("src"),
            F.pmod(h2, F.lit(n_vertices)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
