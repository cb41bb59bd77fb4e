"""Live temporal-join twins: the stream-stream interval join and the
applyInPandasWithState as-of operator, driven as registered streaming
queries (timeline-split feeds), must reproduce their batch twins AND
demonstrably pair rows across the micro-batch boundary through
checkpointed join/carry state."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans import load_all
from etl_sprint_2_5_spark.plans.registry import REGISTRY
from etl_sprint_2_5_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _key_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_interval_join_equals_batch(spark):
    load_all()
    cols = ("event_id", "user_id", "err_us", "n_clicks", "click_value")
    want = _key_rows(REGISTRY["interval_burst_join"].fn(spark, SF_SMOKE), cols)
    got = _key_rows(
        REGISTRY["streaming_interval_burst_join"].fn(spark, SF_SMOKE), cols
    )
    assert got == want
    assert any(r[3] > 0 for r in got), "no error got any burst clicks"


def test_stream_asof_equals_batch(spark):
    load_all()
    cols = (
        "event_id",
        "user_id",
        "ts_us",
        "value",
        "last_error_us",
        "last_error_value",
    )
    want = _key_rows(REGISTRY["asof_last_error"].fn(spark, SF_SMOKE), cols)
    got = _key_rows(
        REGISTRY["streaming_asof_last_error"].fn(spark, SF_SMOKE), cols
    )
    assert got == want
    assert any(r[4] is not None for r in got), "no click saw a prior error"


def _midpoint_rank(ev):
    return ev.withColumn(
        "_rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )


def test_interval_pairs_cross_the_boundary(spark):
    """The twin splits both feeds at the timestamp T of a burst click
    whose error strictly precedes it, so whenever such a pair exists
    the error lands in micro-batch 1 and the click in micro-batch 2 —
    producible only from join state carried across the boundary.
    Assert the pair exists at sf0.01, the scale the oracle hash gate
    runs the live twin at (cheap batch check — the equality test
    above proves the carry wherever such pairs exist)."""
    ev = load_table(spark, "events", "/root/testdata/sf0.01")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"), F.unix_micros("ts").alias("err_us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.unix_micros("ts").alias("click_us")
    )
    strict_pairs = (
        errors.join(clicks, "u")
        .where(
            (F.col("click_us") > F.col("err_us"))
            & (F.col("click_us") <= F.col("err_us") + 600 * 1_000_000)
        )
        .count()
    )
    assert strict_pairs >= 1, "no strict burst pairs at the gate scale"


def test_asof_state_crosses_the_boundary(spark):
    """Clicks in the second half whose most recent error is in the
    first half force the as-of annotation through carried state."""
    ev = load_table(spark, "events", SF_SMOKE).where(
        F.col("event_type").isin("click", "error")
    )
    n_all = load_table(spark, "events", SF_SMOKE).count()
    # rank over the SAME (filtered) feed the twin stages
    ranked = ev.withColumn(
        "_rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    n = ev.count()
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = ranked.select(
        "_rn",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "error", F.col("_rn")),
            ignorenulls=True,
        )
        .over(w)
        .alias("err_rn"),
    )
    cross = seq.where(
        (F.col("event_type") == "click")
        & (F.col("_rn") > n // 2)
        & (F.col("err_rn") <= n // 2)
    ).count()
    assert cross >= 1, "no cross-boundary as-of annotations in fixture"
    assert n_all >= n


def test_stream_outer_interval_join_equals_batch(spark):
    """The LEFT OUTER twin reproduces the batch left join exactly, and
    the fixture is adversarial for the outer path: at least one error
    has zero clicks (its row can ONLY come from a watermark-evicted
    null emission — no post-drain batch patch exists in this twin)
    and at least one has matches (the inner path also fires)."""
    load_all()
    cols = ("event_id", "user_id", "err_us", "n_clicks", "click_value")
    want = _key_rows(REGISTRY["interval_burst_join"].fn(spark, SF_SMOKE), cols)
    got = _key_rows(
        REGISTRY["streaming_outer_interval_join"].fn(spark, SF_SMOKE), cols
    )
    assert got == want
    assert any(r[3] == 0 for r in got), "fixture has no unmatched error"
    assert any(r[3] > 0 for r in got), "fixture has no matched error"
