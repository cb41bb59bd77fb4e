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
