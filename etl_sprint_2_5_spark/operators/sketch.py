"""Count-min sketch — mergeable frequency summaries for streams and
100 TB scans.

Spark ships HLL (approx_count_distinct) and t-digest
(percentile_approx) but no frequency sketch; this fills that slot
with the same design rules as the rest of the engine: the sketch is
an ordinary DataFrame (depth × width count cells) produced by ONE
map-side-combinable aggregation, hashes bottom out in salted md5
(deterministic across engines, retries, and languages), and
estimation is a broadcast join — no driver-side state.

Guarantees (standard CMS): estimate ≥ true count always (no
under-count); overestimate ≤ ε·N with probability 1−δ for
width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉. Sketches over different data
slices MERGE by cell-wise sum (groupBy row,bucket again) — the
property that makes them work as partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: str, row: int, width: int, salt: str):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:{row}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    salt: str = "cms-v1",
) -> DataFrame:
    """Build the sketch: (row, bucket, n) cells, ≤ depth·width rows.

    One posexplode (depth cells per input row) + one groupBy — the
    shuffle carries at most depth·width combiner cells per task
    regardless of input size."""
    hashes = F.array(*[_bucket(key_col, d, width, salt) for d in range(depth)])
    return (
        df.select(F.posexplode(hashes).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the same geometry —
    the mergeability that lets slices/partitions/days combine."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-query the sketch for each key: min over the depth cells.

    The sketch (≤ depth·width rows) broadcasts; missing cells mean
    zero observations, so the min coalesces them to 0."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[_bucket(key_col, d, width, salt) for d in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_count"))
    )
