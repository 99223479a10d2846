"""Text graph loaders — MatrixMarket (.mtx) and SNAP temporal edge files.

The reference consumes exactly these two formats (mtx.hxx:39–58 header,
mtx.hxx:119–193 body; snap.hxx:41–109 temporal stream), so a user switching
from it can point these loaders at the same files.  The parse itself is
distributed (Spark's text scan ≡ the reference's chunked parallel readers
mtx.hxx:152–193 / snap.hxx:72–109); only the few-line banner is read
driver-side, mirroring readMtxHeader's sequential prologue.

Positional semantics are preserved without any content heuristics:

* the MTX size line is dropped by POSITION (first non-comment line), never
  by pattern — a weighted edge row that textually equals ``rows cols nnz``
  survives;
* the SNAP temporal cursor is the LINE ORDER of edge records
  (snap.hxx:41–53: the stream position is the batch cursor) — ``seq`` is
  assigned by ``zipWithIndex`` over the comment-filtered lines, whose
  ordering follows the file's byte ranges.

Both loaders therefore require a single concrete file (not a directory /
glob): line order across multiple files would depend on listing order.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "MtxHeader",
    "read_mtx_header",
    "read_mtx",
    "read_snap_temporal",
    "snapshot_from_mtx",
    "write_mtx",
]

_COMMENT_PREFIXES = ("%", "#")


@dataclass(frozen=True)
class MtxHeader:
    """Parsed MatrixMarket banner + size line (mtx.hxx:39–58)."""

    symmetric: bool
    weighted: bool  # field != 'pattern'
    rows: int
    cols: int
    nnz: int


def _require_single_file(path: str) -> None:
    if os.path.isdir(path) or any(c in path for c in "*?[{"):
        raise ValueError(
            f"text graph loaders take a single file, got directory/glob: {path!r} "
            "(line order across multiple files is listing-order-dependent)"
        )


def read_mtx_header(path: str) -> MtxHeader:
    """Driver-side banner scan — reads only the comment prologue + size line.

    Accepts ``matrix coordinate {real,integer,pattern} {general,symmetric}``
    (the subset the reference parses; mtx.hxx:39–58 keys on the
    ``symmetric`` token and a ``weighted`` flag supplied by the caller —
    here the field token decides it).
    """
    _require_single_file(path)
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        banner = fh.readline()
        tokens = banner.strip().lower().split()
        if not banner.lower().startswith("%%matrixmarket") or len(tokens) < 5:
            raise ValueError(f"not a MatrixMarket file (bad banner): {banner!r}")
        _, obj, fmt, field, symmetry = tokens[:5]
        if obj != "matrix" or fmt != "coordinate":
            raise ValueError(f"unsupported MTX object/format: {obj} {fmt}")
        if field not in ("real", "integer", "pattern"):
            raise ValueError(f"unsupported MTX field: {field}")
        if symmetry not in ("general", "symmetric"):
            raise ValueError(f"unsupported MTX symmetry: {symmetry}")
        for line in fh:
            s = line.strip()
            if not s or s.startswith("%"):
                continue
            parts = s.split()
            if len(parts) != 3:
                raise ValueError(f"bad MTX size line: {line!r}")
            rows, cols, nnz = (int(p) for p in parts)
            return MtxHeader(
                symmetric=(symmetry == "symmetric"),
                weighted=(field != "pattern"),
                rows=rows,
                cols=cols,
                nnz=nnz,
            )
    raise ValueError(f"MTX file has no size line: {path!r}")


def _indexed_records(spark: SparkSession, path: str) -> DataFrame:
    """(line, idx) over the comment- and blank-filtered lines of one file,
    idx following file order — the distributed analog of the reference's
    ordered chunk walk (mtx.hxx:159–187 / snap.hxx:75–103)."""
    _require_single_file(path)
    rdd = (
        spark.sparkContext.textFile(path)
        .map(lambda ln: ln.strip())
        .filter(lambda ln: bool(ln) and not ln.startswith(_COMMENT_PREFIXES))
        .zipWithIndex()
    )
    return spark.createDataFrame(rdd, schema="line string, idx long")


def _checked_cast(parts, i: int, dtype: str, name: str):
    """Cast token i of a split line, raising (with the offending line) on
    unparseable/missing tokens instead of letting Spark's non-ANSI cast emit
    NULL edges that crash far downstream (e.g. as NULL keys in the degree
    table).  `get` + `try_cast` route every failure mode (short line,
    non-numeric token, ANSI on or off) into the same clear error; the check
    is a per-row expression — no extra pass."""
    val = F.get(parts, i).try_cast(dtype)
    return (
        F.when(
            val.isNull(),
            F.raise_error(
                F.concat(F.lit(f"unparseable graph line (bad {name}): "), F.col("line"))
            ).cast(dtype),
        )
        .otherwise(val)
        .alias(name)
    )


def read_mtx(
    spark: SparkSession,
    path: str,
    zero_index: bool = False,
    header: MtxHeader | None = None,
) -> DataFrame:
    """MatrixMarket coordinate file → edge DataFrame.

    Columns ``(src:long, dst:long)`` plus ``w:double`` when the field is
    real/integer.  Symmetric banners mirror every off-diagonal entry
    (mtx.hxx:130–136 emits the reverse edge under the same flag; the
    diagonal is emitted once — the reference's duplicate collapses in
    LazyBitset.update, _bitset.hxx:285–289).  ``zero_index`` shifts the
    1-indexed MTX ids onto the engine's dense [0, n) space.
    """
    hdr = header or read_mtx_header(path)
    rec = _indexed_records(spark, path)
    parts = F.split(F.col("line"), r"\s+")
    body = rec.where(F.col("idx") > 0)  # drop the size line by position
    shift = 1 if zero_index else 0
    cols = [
        (_checked_cast(parts, 0, "long", "src") - shift).alias("src"),
        (_checked_cast(parts, 1, "long", "dst") - shift).alias("dst"),
    ]
    if hdr.weighted:
        cols.append(_checked_cast(parts, 2, "double", "w"))
    edges = body.select(*cols)
    if hdr.symmetric:
        mirror_cols = [
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
        ] + ([F.col("w")] if hdr.weighted else [])
        edges = edges.unionByName(
            edges.where(F.col("src") != F.col("dst")).select(*mirror_cols)
        )
    return edges


def read_snap_temporal(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    zero_index: bool = False,
) -> DataFrame:
    """SNAP temporal edge file → ``(src, dst[, w], seq)`` DataFrame.

    ``seq`` numbers edge records in file order — the reference's stream
    position (snap.hxx:41–53), so its prefix-batch regime (main.cu:83:
    first 90% = base graph, then batchFraction·|E| slices) is
    ``WHERE seq < base_n`` / ``WHERE seq BETWEEN a AND b`` over this frame.
    Comment lines (``#``/``%``) and blanks are not counted.
    """
    rec = _indexed_records(spark, path)
    parts = F.split(F.col("line"), r"\s+")
    shift = 1 if zero_index else 0
    cols = [
        (_checked_cast(parts, 0, "long", "src") - shift).alias("src"),
        (_checked_cast(parts, 1, "long", "dst") - shift).alias("dst"),
    ]
    if weighted:
        cols.append(_checked_cast(parts, 2, "double", "w"))
    cols.append(F.col("idx").alias("seq"))
    return rec.select(*cols)


def write_mtx(
    edges: DataFrame,
    path: str,
    rows: int | None = None,
    cols: int | None = None,
    one_index: bool = False,
) -> None:
    """Edge DataFrame → MatrixMarket coordinate file (single file, driver-
    streamed) — the S10 debug-dump analog (writeGraph, Graph.hxx:653–718):
    interop/inspection at debug scale, NOT the production sink (that's the
    parquet/checkpoint writers).  Detects a ``w`` column → real field.
    ``one_index`` shifts the engine's dense [0, n) ids onto MTX's 1-indexed
    convention; ids are otherwise written as-is.  Body is in canonical
    (src, dst) order (sortEdgesByIdU, batch.hxx:168–175); rows stream
    through ``toLocalIterator`` so only one partition is resident."""
    weighted = "w" in edges.columns
    sel = ["src", "dst"] + (["w"] if weighted else [])
    e = edges.select(*sel)
    shift = 1 if one_index else 0
    nnz = e.count()
    if rows is None or cols is None:
        mrow = e.agg(
            F.max("src").alias("ms"), F.max("dst").alias("md")
        ).collect()[0]
        hi = max(mrow["ms"] or 0, mrow["md"] or 0) + shift
        rows = rows if rows is not None else hi
        cols = cols if cols is not None else hi
    field = "real" if weighted else "pattern"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        fh.write(f"{rows} {cols} {nnz}\n")
        for r in e.orderBy("src", "dst").toLocalIterator():
            if weighted:
                fh.write(f"{r.src + shift} {r.dst + shift} {r.w:.17g}\n")
            else:
                fh.write(f"{r.src + shift} {r.dst + shift}\n")


def snapshot_from_mtx(
    spark: SparkSession,
    path: str,
    self_loops: bool = True,
    partitions: int | None = None,
):
    """``.mtx`` file → :class:`GraphSnapshot`, reproducing readMtxIfW's
    vertex-range semantics (mtx.hxx:210–249: vertices 1..max(rows, cols)
    exist even when edgeless — the dense span the rank vectors are sized
    by).  Ids are zero-indexed onto [0, n); weights are dropped (the
    reference experiment runs weightless, main.cu:165)."""
    from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot

    hdr = read_mtx_header(path)
    edges = read_mtx(spark, path, zero_index=True, header=hdr).select("src", "dst")
    n = max(hdr.rows, hdr.cols)
    return GraphSnapshot.build(edges, n=n, self_loops=self_loops, partitions=partitions)
