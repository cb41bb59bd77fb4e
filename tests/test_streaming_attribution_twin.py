"""Live last-touch attribution twin: the custom
applyInPandasWithState operator, driven as a registered streaming
query (timeline-split feed), must reproduce the batch rollup AND
demonstrably credit purchases through state carried across the
micro-batch boundary."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans import load_all
from etl_sprint_2_5_spark.plans.registry import REGISTRY
from etl_sprint_2_5_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _rows(df):
    return {
        r["channel"]: (r["n_purchases"], r["attributed_value"])
        for r in df.collect()
    }


def test_stream_attribution_equals_batch(spark):
    load_all()
    want = _rows(REGISTRY["last_touch_attribution"].fn(spark, SF_SMOKE))
    got = _rows(
        REGISTRY["streaming_last_touch_attribution"].fn(spark, SF_SMOKE)
    )
    assert got == want
    assert set(want) >= {"direct"}, want


def test_state_credits_across_the_boundary(spark):
    """There must exist purchases in the SECOND half of the timeline
    whose crediting source sits in the FIRST half — i.e. the stream
    could only attribute them via state carried across micro-batches
    — and the twin equality above therefore proves the carry."""
    ev = load_table(spark, "events", SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = ev.count()
    ranked = ev.withColumn(
        "_rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_src = F.col("event_type").isin("click", "view")
    seq = ranked.select(
        "_rn",
        "event_type",
        F.last(F.when(is_src, F.col("_rn")), ignorenulls=True)
        .over(w)
        .alias("src_rn"),
        F.last(F.when(is_src, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("src_ts_us"),
        F.unix_micros("ts").alias("ts_us"),
    )
    cross = seq.where(
        (F.col("event_type") == "purchase")
        & (F.col("_rn") > n // 2)
        & (F.col("src_rn") <= n // 2)
        & (F.col("ts_us") - F.col("src_ts_us") <= 86_400_000_000)
    ).count()
    # >= 1 at smoke scale (sf0.001 has ~1000 events); the sf0.01
    # verify gate runs the same twin over 10x the timeline
    assert cross >= 1, "no cross-boundary credited purchases in fixture"
