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


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multilingual temperature resampling (the mT5 / XLM-R balancing
    step): stratum sampling mass ∝ n_s^α, which per DOCUMENT is the
    keep rate  r_s = (n_min / n_s)^(1−α)  — exactly 1.0 for the
    smallest stratum, downsampling large strata toward balance as
    α → 0 (α = 1 keeps the natural distribution, i.e. everything).

    Rates derive from ONE stratum-count aggregate — the #strata-row
    dict a driver should hold — and the keep decision reuses
    `stratified_sample`'s deterministic id-mix predicate, so reruns,
    layouts and other engines agree row-for-row.  Rows whose stratum is
    NULL are dropped (no rate can be keyed to them) and excluded from
    the n_min computation.  Generic-count note: r_s·10⁶ is an
    irrational (√-family) threshold compared against an INTEGER mix, so
    cross-engine pow() ulp differences cannot flip a row.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("temperature_sample: alpha must be in [0, 1]")
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(strata_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return docs.where(F.lit(False))
    n_min = min(counts.values())
    rates = {s: (n_min / n) ** (1.0 - alpha) for s, n in counts.items()}
    return stratified_sample(docs, rates, strata_col=strata_col, id_col=id_col)


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


def dsir_importance(
    docs: DataFrame,
    target_pred: F.Column,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash=None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    over hashed unigram bucket features, in EXACT integer arithmetic:

      bucket(t)   = token_hash(t) mod n_buckets
      ratio(b)    = (ct(b)+1)·(Ns+B)·scale  //  ((cs(b)+1)·(Nt+B))
                    (Laplace-smoothed target/source likelihood ratio,
                     scaled integer division — no log, no libm)
      score(doc)  = Σ over the doc's token OCCURRENCES of ratio(bucket)

    target rows (target_pred true) define the target distribution; all
    other rows are the raw pool and get scored.  Returns (id_col,
    dsir_score:long) for pool docs.  Integer scores are exactly
    reproducible cross-engine, so the driver oracle recomputes them
    bit-for-bit; resampling = deterministic top-k on (score, id).

    100 TB posture: the bucket→ratio map is ≤ n_buckets rows and is
    broadcast; scoring is one map-side join over exploded tokens + one
    groupBy(id) — a single keyed shuffle of (id, partial-sum) rows.  The
    integer products bound: (ct+1)·(Ns+B)·scale < 2^63 needs token counts
    ≲ 3e6 per side at scale=1e6; beyond that drop `scale` (the ratio
    PRECISION knob, not a correctness knob) or pre-aggregate per-partition.
    """
    from pagerank_cuda_dynamic_spark.functions import tokens as _tokens

    if token_hash is None:
        token_hash = F.xxhash64
    B = n_buckets
    tok = docs.select(
        F.col(id_col).alias("id"),
        target_pred.alias("is_target"),
        F.explode(_tokens(text_col)).alias("t"),
    ).select(
        "id", "is_target", F.pmod(token_hash(F.col("t")), F.lit(B)).alias("b")
    )
    tok = tok.persist()
    totals = tok.groupBy("is_target").agg(F.count(F.lit(1)).alias("n"))
    counts = tok.groupBy("b", "is_target").agg(F.count(F.lit(1)).alias("c"))
    tp = {bool(r.is_target): int(r.n) for r in totals.collect()}
    nt, ns = tp.get(True, 0), tp.get(False, 0)
    ct = counts.where(F.col("is_target")).select("b", F.col("c").alias("ct"))
    cs = counts.where(~F.col("is_target")).select("b", F.col("c").alias("cs"))
    spark = docs.sparkSession
    buckets = spark.range(B).select(F.col("id").cast("long").alias("b"))
    ratio = (
        buckets.join(ct, "b", "left")
        .join(cs, "b", "left")
        .select(
            "b",
            (
                (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                * F.lit(ns + B)
                * F.lit(scale)
            ).cast("long").alias("num"),
            ((F.coalesce(F.col("cs"), F.lit(0)) + 1) * F.lit(nt + B))
            .cast("long")
            .alias("den"),
        )
        .select("b", F.expr("num div den").alias("r"))
    )
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    scored = (
        tok.where(~F.col("is_target"))
        .join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(F.sum("r").alias("dsir_score"))
        .select(F.col("id").alias(id_col), "dsir_score")
        .transform(materialize)
    )
    tok.unpersist()
    return scored


def dsir_resample(
    docs: DataFrame,
    target_pred: F.Column,
    n: int,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash=None,
) -> DataFrame:
    """Top-n pool docs by DSIR importance score with the deterministic
    (score DESC, id ASC) tie-break — the resampling step as an exact
    rank selection (integer scores ⇒ no float boundary flips).  Uses
    sort+limit (TakeOrderedAndProject: per-partition top-n then a driver
    merge of n·P rows), never a global window."""
    scores = dsir_importance(
        docs, target_pred, n_buckets, id_col, text_col, token_hash
    )
    return (
        scores.orderBy(F.desc("dsir_score"), F.asc(id_col))
        .limit(n)
        .select(id_col, "dsir_score")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: F.Column,
    rate_num: int,
    rate_den: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep each row with
    probability min(1, w·rate_num/rate_den), where w = `weight_col`
    (an INTEGER expression — cast money to cents etc. at the call site).

    The importance-sampling primitive for training mixes (upweight long /
    high-quality docs without replication): inclusion is the pure-integer
    predicate  mix(id)·rate_den < w·rate_num·10^6  — the same Weyl-mix
    uniform as stratified_sample, so it shares every property: one scan,
    no shuffle, layout/rerun stable, and the identical expression runs in
    the DuckDB oracle (no float threshold, no libm).

    Overflow bound: w·rate_num must stay < 2^63/10^6 ≈ 9.2e12 —
    plenty for per-row weights (cents, token counts).
    """
    w = weight_col.cast("long")
    return df.where(
        _mix(id_col) * F.lit(rate_den) < w * F.lit(rate_num) * F.lit(_MOD)
    )


def interleave_sources(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic stride-scheduling interleave of training sources —
    the data-mixing primitive: a source with weight w is emitted w times
    as often as a weight-1 source, evenly spread (not front-loaded), as
    in stride/lottery scheduling.  Item k of source s (0-based rank,
    ordered by id) gets the virtual time

        vt = ((k + 1) · scale) div w_s        (pure integer arithmetic)

    so the interleaved order is ORDER BY (vt, source, k) — a distributed
    range sort, identical on any engine/layout/rerun.  A global ordinal
    is intentionally NOT materialized (it would be a single-partition
    window); consumers write sorted output or zipWithIndex at sink time.

    `weights` is a (source, w) DataFrame of positive INTEGER weights and
    must cover every source present in `docs` — silently dropping or
    zero-weighting a source would corrupt a training mix, so both are
    rejected.  Per-source ranks come from the two-phase scaled numbering
    (attach_global_seq ordered by (source, id), rebased by a broadcast
    per-source minimum) — no per-source single-task window even when one
    source dominates the corpus.

    Returns (id, source, k, vt).  Overflow bound: per-source row count ·
    scale must stay < 2^63 (safe to ~9.2e12 rows at the default scale).
    """
    d = docs.select(F.col(id_col), F.col(source_col))
    w = weights.select(source_col, F.col("w").cast("long").alias("w"))
    n_bad = w.where(F.col("w") <= 0).count()
    if n_bad:
        raise ValueError(
            f"interleave_sources: {n_bad} weight(s) are not positive"
        )
    n_missing = (
        d.select(source_col).distinct().join(w, source_col, "left_anti").count()
    )
    if n_missing:
        raise ValueError(
            f"interleave_sources: {n_missing} source(s) in docs have no "
            "weight row"
        )
    from pagerank_cuda_dynamic_spark.plans.dictionary import attach_global_seq

    seq = attach_global_seq(d, [source_col, id_col], out_col="_g")
    base = seq.groupBy(source_col).agg(F.min("_g").alias("_b"))
    return (
        seq.join(F.broadcast(base), source_col)
        .withColumn("k", (F.col("_g") - F.col("_b")).cast("long"))
        .join(F.broadcast(w), source_col)
        .select(
            id_col,
            source_col,
            "k",
            F.expr(f"(k + 1) * {scale} div w").alias("vt"),
        )
    )


__all__ = [
    "stratified_sample",
    "split_corpus",
    "dsir_importance",
    "dsir_resample",
    "weighted_sample",
    "interleave_sources",
]
