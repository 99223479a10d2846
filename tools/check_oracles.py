"""Local replica of the driver's correctness gate: run every queries()
entry at the given sf via Spark AND its oracle_sql() via DuckDB; compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from pagerank_cuda_dynamic_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(ex).__name__}: {str(ex)[:200]}")
            continue
        t_duck = time.time() - t0
        g, w = normalize(got), normalize(want)
        status = []
        if list(g.columns) != list(w.columns):
            status.append(f"schema {list(g.columns)} vs {list(w.columns)}")
        if len(g) != len(w):
            status.append(f"rows {len(g)} vs {len(w)}")
        if not status and not g.equals(w):
            diff = (g != w)
            ndiff = int(diff.any(axis=1).sum()) if len(g) else 0
            status.append(f"values differ in {ndiff} rows")
            mism = g[diff.any(axis=1)].head(3)
            mism_w = w[diff.any(axis=1)].head(3)
            print("   spark:", mism.to_dict("records"))
            print("   duck :", mism_w.to_dict("records"))
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)} [{t_spark:.1f}s/{t_duck:.1f}s]")
        else:
            print(f"OK    {name}: {len(g)} rows [{t_spark:.1f}s/{t_duck:.1f}s]")
    print("-" * 60)
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
