"""Temporal operators over event streams — gap sessionization and ASOF
joins, both as single-keyed-shuffle declarative plans.

The reference's temporal surface is batch-sequenced edge prefixes
(_utility.hxx:113–119 slices a sorted temporal edge list); a transcript /
event pipeline additionally needs per-entity session boundaries and
"latest state as of t" alignment.  Both are expressed with built-in
window functions over ONE hash-partitioned key (user/entity) — no global
windows, no range cross-joins, no Python in the hot path:

  sessionize : new-session flag via lag(ts) + gap compare, session index
               via a running sum — the classic gap-sessionization plan
  asof_join  : union-tag backward ASOF — right rows sort before left rows
               at equal ts, then one last(ignorenulls) window carries the
               most recent right payload forward onto each left row.
               Equivalent to DuckDB/Polars ASOF JOIN (the driver oracle
               uses DuckDB's native ASOF JOIN), but shaped as one shuffle
               + one ordered window scan, which is the petabyte-scale
               formulation (a per-key sort-merge, never a range product).

Scale posture: both plans shuffle once on the key column; per-key data is
streamed in ts order by the window operator, so skewed keys degrade to a
single fat partition (salt upstream if one user dominates) but memory is
bounded by the window frame (running aggregates, frame = growing prefix,
spilled by Spark's window operator when needed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def epoch_us(col: F.Column) -> F.Column:
    """Integer microseconds since epoch, TIMESTAMP_NTZ-safe (parquet event
    times load as NTZ; unix_micros only accepts TIMESTAMP).  The cast
    interprets NTZ wall time in the session timezone — gap DIFFERENCES are
    invariant to that constant shift (outside DST jumps in non-UTC
    sessions; pipelines should run sessions in UTC, as this repo does)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple = ("event_id",),
) -> DataFrame:
    """Gap sessionization: an event starts a new session when it is the
    key's first event or arrives more than `gap_seconds` after the key's
    previous event.  Adds `session_seq` (1-based per-key session index).

    `order_cols` break ts ties deterministically (same tie-break must be
    used by any oracle).  One window chain over one key partition."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    # integer-microsecond arithmetic: the gap compare is exact (no float
    # boundary flap) and bit-identical to an epoch_us-based SQL oracle
    ts_us = epoch_us(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (ts_us - prev_us > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple = ("event_id",),
) -> DataFrame:
    """Per-session aggregates over the sessionized stream: event count,
    start/end, duration seconds, distinct event types.  The groupBy
    reuses the sessionize shuffle key prefix (key, session_seq)."""
    s = sessionize(events, key_col, ts_col, gap_seconds, order_cols)
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (
            (epoch_us(F.max(ts_col)) - epoch_us(F.min(ts_col))) / 1e6
        ).alias("duration_sec"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward ASOF join: each left row gains, for every `value_cols`
    entry, the value from the LATEST right row of the same key with
    right.ts <= left.ts (null when no such row).

    Union-tag formulation: right rows carry tag 0, left rows tag 1; one
    window ordered by (ts, tag) per key makes `last(value, ignorenulls)`
    over the growing prefix exactly the backward-ASOF payload — right
    rows at the same ts sort BEFORE the left row, so equality matches,
    and later right rows overwrite earlier ones (latest wins).

    The right side must be unique per (key, ts) for deterministic output
    (same requirement DuckDB's ASOF JOIN imposes); callers aggregate
    duplicates away first.  One shuffle on `key_col`, zero range joins.

    The carry is the WHOLE right row (one non-null struct per right
    row), not per-column `last(ignorenulls)` — so a matched right row
    whose payload column is NULL yields NULL, exactly like DuckDB's
    ASOF, instead of leaking an older non-null payload forward.
    """
    from pyspark.sql.types import StructType

    lcols = left.columns
    row_type = StructType([right.schema[c] for c in value_cols])
    tagged_r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r_row"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key_col, ts_col)],
    )
    tagged_l = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(row_type).alias("_r_row"),
        *[F.col(c) for c in lcols if c not in (key_col, ts_col)],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_r.unionByName(tagged_l)
    carried = unioned.select(
        "*", F.last(F.col("_r_row"), ignorenulls=True).over(w).alias("_m")
    )
    return carried.where(F.col("_tag") == 1).select(
        *lcols,
        *[F.col("_m").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel — the product-analytics staple: for each
    user, the earliest completion time of each successive step, where
    step i+1 must happen STRICTLY AFTER the user's earliest completion
    of step i (events of other types in between are ignored — the
    standard "unordered in between" semantics).

        t_0(u) = min ts of step_0 events of u
        t_i(u) = min ts of step_i events of u with ts > t_{i-1}(u)

    Earliest-completion greediness is optimal here: any valid funnel
    assignment can be left-shifted onto the earliest times, so a user
    completes step i under these semantics iff t_i exists.

    Per step: one filtered aggregate over the events table + one
    user-keyed join — |steps| keyed shuffles total, state = one row per
    surviving user, no windows, no Python.  Returns
    (user, step_idx:int, step:string, step_ts) for completed steps only.
    """
    out = None
    prev = None
    for i, step in enumerate(steps):
        ev = events.select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("t"),
            F.col(ts_col).alias("ts"),
        ).where(F.col("t") == step)
        if prev is None:
            cur = ev.groupBy("u").agg(F.min("ts").alias("step_ts"))
        else:
            cur = (
                ev.join(prev.select("u", F.col("step_ts").alias("_pts")), "u")
                .where(F.col("ts") > F.col("_pts"))
                .groupBy("u")
                .agg(F.min("ts").alias("step_ts"))
            )
        row = cur.select(
            F.col("u").alias(user_col),
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            "step_ts",
        )
        out = row if out is None else out.unionByName(row)
        prev = cur
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-cohort retention triangle — the other product-analytics
    staple: users are cohorted by their FIRST-seen calendar day; for
    every (cohort_day, day_offset) cell, how many distinct cohort users
    were active exactly offset days later.

    Two aggregates: first-seen day per user (one user-keyed shuffle),
    then distinct users per (cohort_day, offset) over the
    user-day-deduped activity (map-side combinable after the dedup).
    Offsets are exact integer day differences (datediff) — no float,
    no timezone arithmetic beyond the date cast.  Returns
    (cohort_day:date, day_offset:int, n_users:long); offset 0 row
    equals the cohort size.
    """
    act = events.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    first = act.groupBy("u").agg(F.min("d").alias("cohort_day"))
    return (
        act.join(first, "u")
        .select(
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset"),
            "u",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("u").alias("n_users"))
    )
