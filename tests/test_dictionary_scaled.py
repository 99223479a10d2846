"""Two-phase (range-partitioned) numbering must equal global sorted ranks —
and stay consistent across the multiple jobs that consume it (range
boundary sampling is per-execution; the pinned snapshot makes ids stable)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from pagerank_cuda_dynamic_spark.plans.dictionary import (
    assign_dense_ids_scaled,
    attach_global_seq,
)


def test_assign_dense_ids_equals_sorted_rank(spark):
    rng = np.random.default_rng(61)
    ents = [f"e{int(x):08d}" for x in rng.choice(10**7, 5000, replace=False)]
    df = spark.createDataFrame(pd.DataFrame({"entity": ents}))
    got = assign_dense_ids_scaled(df).toPandas().sort_values("v")
    want = sorted(ents)
    assert list(got["entity"]) == want
    assert list(got["v"]) == list(range(len(ents)))


def test_assign_dense_ids_stable_across_actions(spark):
    rng = np.random.default_rng(67)
    ents = [f"x{int(v):06d}" for v in rng.choice(10**6, 3000, replace=False)]
    df = spark.createDataFrame(pd.DataFrame({"entity": ents}))
    ids = assign_dense_ids_scaled(df)
    # two separate actions over the same DF must see identical ids (the
    # un-pinned version could re-sample range boundaries between jobs)
    a = ids.toPandas().sort_values("entity").reset_index(drop=True)
    b = ids.toPandas().sort_values("entity").reset_index(drop=True)
    assert (a["v"] == b["v"]).all()


def test_attach_global_seq_equals_row_number(spark):
    rng = np.random.default_rng(71)
    n = 4000
    pdf = pd.DataFrame(
        {
            "ts": rng.permutation(n).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "payload": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf)
    got = attach_global_seq(df, ["ts", "event_id"]).toPandas()
    got = got.sort_values("seq").reset_index(drop=True)
    want = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    assert (got["ts"].to_numpy() == want["ts"].to_numpy()).all()
    assert list(got["seq"]) == list(range(n))
    assert set(got.columns) == {"ts", "event_id", "payload", "seq"}
