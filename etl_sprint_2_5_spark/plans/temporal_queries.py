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


@query(
    "scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE user_id % 10 = 0
    ), changes AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    ), versions AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS valid_from_us,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS valid_to_us
      FROM changes
    )
    SELECT user_id, event_type, valid_from_us, valid_to_us,
           (valid_to_us IS NULL) AS is_current
    FROM versions
    ORDER BY user_id, valid_from_us
    """,
    covers=("X-temporal-scd2",),
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD build over the event log (user_id % 10 cohort):
    consecutive same-type events collapse into versions with
    [valid_from, valid_to) bounds and an is_current flag — the
    dimension-history primitive of every warehouse load."""
    from etl_sprint_2_5_spark.operators.temporal import scd2_compact

    ev = load_table(spark, "events", sf_dir).where(F.col("user_id") % 10 == 0)
    scd = scd2_compact(ev, ("user_id",), ("event_type",), "ts", "event_id")
    return scd.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    ).orderBy("user_id", "valid_from_us")
