"""Watermarked event-time window aggregations — the streaming twins of
the batch window queries in plans/events_queries.py (SURVEY.md §7
phase 6; generalizes the reference daemon's T1 poll cycle and makes
the T5 lateness bound explicit instead of silently dropping backdated
rows).

Append output mode emits a window exactly once — when the watermark
passes its end — which is what makes the downstream sink contract
simple (closed windows are immutable facts; no retraction handling).
State for open windows lives in the checkpoint's state store, bounded
by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    lateness: str = "10 minutes",
    window: str = "5 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) count/sum per
    event-time window, tolerating ``lateness`` of out-of-order data."""
    w = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(w.alias("w"))
        .count()
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            F.col("count").alias("n"),
        )
    )


def watermarked_session_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows per key via the NATIVE
    ``F.session_window`` — the streaming twin of the batch
    ``session_windows`` query (which re-derives the same sessions with
    a lag/cumsum window so DuckDB can oracle-check them).

    Spark merges overlapping per-key session state as events arrive;
    a session closes — and, in append mode, emits exactly once — when
    the watermark passes (last_event + gap). Session state per key is
    bounded by the watermark horizon, same as the tumbling case."""
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(
            F.session_window(ts_col, gap).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )
