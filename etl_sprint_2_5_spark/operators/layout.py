"""Data-layout operators: multi-dimensional z-order clustering.

At 100 TB, scan cost is dominated by how much data a query can SKIP.
Sorting the write by a z-order (Morton) key over the filter columns
clusters rows so every parquet row-group covers a small hyper-rectangle
of the filter space — min/max stats then prune row-groups for
predicates on ANY prefix-free combination of the dimensions, which a
single-column sort cannot do.

Pure integer bit arithmetic (codegen'd, shuffle-free); the writer-side
use is ``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)``
before the parquet write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative ints, ``bits``
    low bits each (values must fit — mask/bucket beforehand, e.g.
    ``col % (1 << bits)``).

    Bit b of column i lands at position b·n + i. Unrolled into
    bits×n OR-shift expressions — whole-stage codegen folds these
    into straight-line long arithmetic."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            col = F.col(c) if isinstance(c, str) else c
            bit = col.cast("long").bitwiseAND(F.lit(1 << b))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i - b))
    return z


def zorder_layout(
    df: DataFrame, cols: list[str | Column], bits: int = 16, zcol: str = "zkey"
) -> DataFrame:
    """Attach the z-order key column. Write path at scale:
    ``zorder_layout(df, dims).repartitionByRange(N, zcol)
    .sortWithinPartitions(zcol).write...`` — range partitioning keeps
    files disjoint in z-space, the within-partition sort makes
    row-group min/max tight."""
    return df.withColumn(zcol, zorder_key(cols, bits))


def compaction_file_bound(total_bytes: int, target_bytes: int) -> int:
    """Output-file bound for a row-rewriting compaction: rewriting
    (unlike file concatenation) packs perfectly, so the bound is
    ceil(total/target) — the number any OPTIMIZE/compact job should
    hit, modulo compression variance."""
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    return max(1, -(-total_bytes // target_bytes))


def compact_small_files(
    spark,  # noqa: ANN001 — SparkSession
    src: str,
    dest: str,
    target_bytes: int,
    order_by: list[str] | None = None,
) -> tuple[int, int]:
    """Bin-pack a directory of small parquet files into ~target-sized
    files — the nightly maintenance job of any 100 TB store (streaming
    sinks and over-parallel writers leave thousands of KB-files per
    partition; every later scan then pays a task + a footer read per
    file). Rewrites rows into exactly ``compaction_file_bound`` output
    files; with ``order_by`` the rewrite range-partitions + sorts on
    those columns, so compaction REPAIRS clustering (tight row-group
    min/max) instead of destroying it with round-robin.

    Local listing uses the filesystem directly; on a cluster the same
    sizes come from the HDFS/S3 listing (or the table format's file
    manifest) — the packing arithmetic is identical. Returns
    (n_files_out, n_files_in)."""
    from pathlib import Path

    files = [p for p in Path(src).rglob("*.parquet") if p.is_file()]
    total = sum(p.stat().st_size for p in files)
    n_out = compaction_file_bound(total, target_bytes)
    df = spark.read.parquet(src)
    if order_by:
        cols = [F.col(c) for c in order_by]
        shaped = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    else:
        shaped = df.repartition(n_out)
    shaped.write.mode("overwrite").parquet(dest)
    n_written = sum(1 for p in Path(dest).rglob("*.parquet") if p.is_file())
    # round-robin hits the bound exactly; range partitioning may come
    # in UNDER it when the key cardinality is below n_out (fewer
    # non-empty ranges) — only exceeding the bound is a broken pack
    if n_written > n_out:
        raise RuntimeError(
            f"compaction wrote {n_written} files, bin-pack bound is {n_out}"
        )
    return n_written, len(files)


def hilbert_frame(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    out: str = "hkey",
) -> DataFrame:
    """Attach a 2-D Hilbert-curve index column (grid 2^bits × 2^bits).

    The classic xy2d walk (per-level quadrant digit + rotation;
    public-domain formulation popularized via Wikipedia's "Hilbert
    curve" article): for s = 2^(bits-1)..1, d += s²·((3·rx) XOR ry)
    with (x,y) reflected/swapped when ry = 0. Hilbert strictly
    improves on the Morton/z-order key for range locality — every
    curve step moves to an ADJACENT cell, so equal-size key ranges
    cover tighter (x,y) bounding boxes and parquet min/max stats
    prune harder on 2-D predicates (z-order's quadrant jumps inflate
    boxes at every power-of-two seam).

    Implemented as ``bits`` chained projections of integer CASE/bit
    arithmetic — each level is a small codegen'd expression over the
    previous level's materialized columns (nesting the whole
    recursion into one expression tree would explode ~3^bits), so
    the whole key is JVM-side, shuffle-free, and scales like any
    other projection."""
    n = 1 << bits
    cur = df.withColumn("_hx", F.col(xcol).cast("long")).withColumn(
        "_hy", F.col(ycol).cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        cur = cur.select(
            *[c for c in cur.columns if c not in ("_hx", "_hy", out)],
            (
                F.col(out)
                + F.lit(s * s).cast("long")
                * (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
            ).alias(out),
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(n - 1) - F.col("_hy")).otherwise(
                    F.col("_hy")
                ),
            )
            .otherwise(F.col("_hx"))
            .alias("_hx"),
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(n - 1) - F.col("_hx")).otherwise(
                    F.col("_hx")
                ),
            )
            .otherwise(F.col("_hy"))
            .alias("_hy"),
        )
    return cur.drop("_hx", "_hy")


def hilbert_sql(xcol: str, ycol: str, bits: int, src: str) -> str:
    """DuckDB mirror of hilbert_frame: one CTE per level, identical
    reflect/swap arithmetic, so the oracle recomputes the curve from
    scratch rather than trusting the operator."""
    n = 1 << bits
    ctes = [f"h{bits} AS (SELECT *, CAST({xcol} AS BIGINT) AS hx, CAST({ycol} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        prev = f"h{level + 1}"
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        ctes.append(
            f"h{level} AS (SELECT * EXCLUDE (hx, hy, hd), "
            f"hd + {s * s} * xor(3 * {rx}, {ry}) AS hd, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END) ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END) ELSE hy END AS hy "
            f"FROM {prev})"
        )
    return ",\n    ".join(ctes)
