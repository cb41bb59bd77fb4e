"""Temporal-join queries over the events table: as-of state
attachment and interval (range) joins, oracle-checked against
DuckDB's native ASOF JOIN / inequality join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.temporal import asof_join, interval_join_binned
from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.sources.parquet import load_table

BURST_WINDOW_S = 600  # clicks within 10 min after an error


@query(
    "asof_last_error",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ), errors AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'error'
    )
    SELECT c.event_id, c.user_id,
           epoch_us(c.ts)              AS ts_us,
           c.value,
           epoch_us(e.ts)              AS last_error_us,
           e.value                     AS last_error_value
    FROM clicks c ASOF LEFT JOIN errors e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    ORDER BY c.event_id
    """,
    covers=("X-temporal-asof",),
)
def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click annotated with the user's most
    recent error at-or-before it (NULLs when none). The union-trick
    operator shuffles once on user_id — no pair expansion — vs
    DuckDB's native ASOF JOIN as the oracle."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof_join(clicks, errors, ["user_id"], "ts", ["value"], prefix="last_error_")
    return (
        out.select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            F.unix_micros("last_error_ts").alias("last_error_us"),
            F.col("last_error_value"),
        )
        .orderBy("event_id")
    )


@query(
    "interval_burst_join",
    oracle=f"""
    WITH errors AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT e.event_id, e.user_id,
           epoch_us(e.ts) AS err_us,
           count(c.ts)    AS n_clicks,
           round(coalesce(sum(c.value), 0), 2) AS click_value
    FROM errors e LEFT JOIN clicks c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts
     AND c.ts <= e.ts + INTERVAL {BURST_WINDOW_S} SECOND
    GROUP BY e.event_id, e.user_id, e.ts
    ORDER BY e.event_id
    """,
    covers=("X-temporal-range",),
)
def interval_burst_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: clicks landing in the 10 minutes after each
    error, counted per error. Spark side runs the bin-bucketed
    equi-join (one hash shuffle on (user, bin)); errors with no
    clicks survive via the aggregate-then-left-join-back shape."""
    ev = load_table(spark, "events", sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("err_ts")
    )
    intervals = errors.withColumn(
        "end_ts",
        F.timestamp_micros(F.unix_micros("err_ts") + BURST_WINDOW_S * 1_000_000),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    hits = interval_join_binned(
        clicks,
        intervals,
        ["user_id"],
        "ts",
        "err_ts",
        "end_ts",
        bin_seconds=BURST_WINDOW_S,
    )
    per_error = hits.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum("value").alias("_sum_value"),
    )
    return (
        errors.join(per_error, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("err_ts").alias("err_us"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.round(F.coalesce("_sum_value", F.lit(0.0)), 2).alias("click_value"),
        )
        .orderBy("event_id")
    )
