"""Live session-window streaming twin (streaming_session_window_agg):
the stream's native session_window state must MERGE sessions whose
events arrive in different micro-batches, and the drained result must
equal the batch gaps-and-islands query row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans import load_all
from etl_sprint_2_5_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def _rows(df):
    return {
        (r["user_id"], r["session_seq"]): (
            r["session_start_us"],
            r["n_events"],
            r["total_value"],
            r["duration_s"],
        )
        for r in df.collect()
    }


def test_stream_session_equals_batch(spark):
    load_all()
    want = _rows(REGISTRY["session_windows"].fn(spark, SF_SMOKE))
    got = _rows(REGISTRY["streaming_session_window_agg"].fn(spark, SF_SMOKE))
    assert got == want
    assert len(want) > 0


def test_sessions_span_the_microbatch_boundary(spark):
    """The feed is split by event_id parity (one file per parity, one
    micro-batch per file). Reconstruct batch session membership and
    assert that MANY sessions contain both parities — i.e. the
    streaming state store had to merge a session started in batch 1
    with events arriving in batch 2 — and that each such session's
    merged n_events survives into the streaming output."""
    load_all()
    from etl_sprint_2_5_spark.plans.events_queries import SESSION_GAP_MIN
    from etl_sprint_2_5_spark.sources.parquet import load_table
    from pyspark.sql import Window

    ev = load_table(spark, "events", SF_SMOKE)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    member = flagged.withColumn("session_seq", F.sum("new_session").over(run))
    mixed = (
        member.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(F.col("event_id") % 2).alias("parities"),
        )
        .where(F.col("parities") == 2)
    )
    mixed_rows = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in mixed.collect()
    }
    assert len(mixed_rows) >= 10, "fixture has no cross-batch sessions?"

    got = _rows(REGISTRY["streaming_session_window_agg"].fn(spark, SF_SMOKE))
    for key, n_events in mixed_rows.items():
        assert got[key][1] == n_events, key
