"""Deterministic corpus sampling/splitting for training-data pipelines.

`DataFrame.sample`/`sampleBy` are seed-reproducible only for a fixed
partitioning — a repartition or a different input layout changes which
rows are kept.  At 100 TB, sampling must be a PURE FUNCTION of the row
key so reruns, backfills and different cluster layouts agree row-for-row.
These operators key every decision on a Weyl/Knuth multiplicative mix of
the id column — portable integer arithmetic (the same expression runs
verbatim in the DuckDB oracles), uniform enough for rate control, and
fully JVM-side (no Python, no shuffle)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Knuth's 2^32/phi multiplier; products stay < 2^63 for ids < ~3.5e9.
# For wider id spaces, pre-fold with pmod(id, 2**31) at the call site.
_MIX_MULT = 2654435761
_MIX_ADD = 12345
_MOD = 1_000_000


def _mix(id_col: str) -> F.Column:
    return F.pmod(F.col(id_col) * F.lit(_MIX_MULT) + F.lit(_MIX_ADD), F.lit(_MOD))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row kept iff mix(id) < fraction·10^6.  Strata missing from `fractions`
    use `default_fraction`.  The training-mix builder shape (e.g. keep
    100% of en, 30% of de, drop the rest) — one scan, no shuffle, stable
    under repartitioning and reruns."""
    expr = F.lit(default_fraction)
    for stratum, frac in sorted(fractions.items()):
        expr = F.when(F.col(strata_col) == stratum, F.lit(float(frac))).otherwise(expr)
    return docs.where(_mix(id_col) < expr * _MOD)


def split_corpus(
    docs: DataFrame,
    val_fraction: float = 0.01,
    test_fraction: float = 0.01,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a `split` column from
    disjoint mix(id) ranges ([0, val) → val, [val, val+test) → test, rest
    → train).  Every rerun and every layout assigns identically, so a doc
    can never leak between splits across pipeline versions."""
    m = _mix(id_col)
    v = int(val_fraction * _MOD)
    t = int(test_fraction * _MOD)
    return docs.withColumn(
        "split",
        F.when(m < v, F.lit("val"))
        .when(m < v + t, F.lit("test"))
        .otherwise(F.lit("train")),
    )


__all__ = ["stratified_sample", "split_corpus"]
