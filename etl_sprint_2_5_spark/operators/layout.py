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
