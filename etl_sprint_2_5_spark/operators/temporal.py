"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join — expressed as compositions of DataFrame ops
with the scale-right shuffle shapes (no pair explosion, no naive
range-condition sort-merge).

No counterpart in the reference (its CDC daemon is purely key-based);
these are the training-pipeline extension surface's temporal tier —
"attach the latest state to each event" and "events within a window
around each incident" are the two temporal primitives every event
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, the right row with the
    greatest ``ts_col`` ≤ the left row's (same keys), or NULLs.

    Execution (the union trick): tag both sides, union, ONE shuffle on
    the key, then a running ``last(ignorenulls)`` per payload column
    over (ts, side) order — right rows sort before left rows at equal
    ts, so "at or before" is exact. Cost is a single exchange + sort,
    independent of match fan-out; the naive formulation (theta-join on
    key + range, then rank) explodes to |left|×|right-per-key| rows
    before pruning. Rows with identical (keys, ts) on the right would
    be tie-ambiguous (as in DuckDB's ASOF JOIN); callers needing that
    must pre-dedupe.

    Output: every left column, plus ``prefix+ts_col`` and
    ``prefix+c`` for each payload column.
    """
    rt = right.select(
        *key_cols,
        F.col(ts_col),
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
        F.lit(0).alias("_side"),
    )
    lt = left.withColumn("_side", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{prefix}{ts_col}"] + [f"{prefix}{c}" for c in payload_cols]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).drop("_side")


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner join of points to intervals with
    ``start ≤ point_ts ≤ end`` on matching keys — via bin bucketing,
    the standard range-join scale pattern.

    Each interval explodes to the time bins it covers (≤ len/bin + 1
    rows — choose ``bin_seconds`` ≈ the typical interval length);
    each point maps to its single bin; the join is then a plain
    EQUI-join on (keys, bin) — hash-partitioned, AQE-skew-splittable —
    followed by the exact range filter. A point meets an interval in
    exactly one bin (its own), so no dedup is needed. Contrast the
    naive range theta-join, which Spark executes as a per-key
    cross-product with a post-filter.
    """
    bin_us = int(bin_seconds) * 1_000_000
    # integer div, not `/`: float division of epoch-micros longs loses
    # precision past 2^53
    p = points.withColumn(
        "_bin", F.expr(f"unix_micros(`{point_ts}`) div {bin_us}")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(`{start_col}`) div {bin_us}"),
                F.expr(f"unix_micros(`{end_col}`) div {bin_us}"),
            )
        ),
    )
    joined = p.join(iv, [*key_cols, "_bin"]).where(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bin")


def scd2_compact(
    df,
    key_cols: tuple[str, ...],
    attr_cols: tuple[str, ...],
    ts_col: str,
    tiebreak_col: str,
):
    """Type-2 slowly-changing-dimension build from an event/change
    log: per key, consecutive rows with identical tracked attributes
    collapse into one VERSION with [valid_from, valid_to) bounds;
    the open version has valid_to NULL and ``is_current`` true.

    Two windows over the same (key, order) partitioning — change
    detection via lag, interval close via lead — so Catalyst plans ONE
    shuffle + sort and both window frames run on it. Order is total
    (``tiebreak_col`` breaks ts ties) or version boundaries would be
    engine-dependent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changes = (
        df.select(*key_cols, ts_col, tiebreak_col, *attr_cols)
        .withColumn("_prev", F.lag(attrs).over(w))
        .where(F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(attrs))
        .drop("_prev")
    )
    out = changes.withColumn("_valid_to", F.lead(F.col(ts_col)).over(w))
    return out.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_valid_to").isNull().alias("is_current"),
    )
