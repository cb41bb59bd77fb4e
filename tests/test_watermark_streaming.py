"""Watermark + tumbling-window aggregation on a real stream: append
mode only emits a window once the watermark passes its end, and data
later than the watermark is dropped — the Spark-native answer to the
reference's T5 backdating blind spot (SURVEY §2.8: the daemon silently
misses backdated rows; a watermark makes the lateness bound explicit).
"""

from __future__ import annotations

import datetime as dt

SCHEMA = "event_id long, ts timestamp, user_id long"
T = dt.datetime(2024, 6, 1, 10, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T + dt.timedelta(minutes=minutes)


def _drain(spark, feed, ckpt, out):
    from etl_sprint_2_5_spark.streaming.windows import watermarked_window_agg

    stream = spark.readStream.schema(SCHEMA).parquet(feed)
    agg = watermarked_window_agg(
        stream, "ts", lateness="10 minutes", window="5 minutes"
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")  # emit only closed (watermark-passed) windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_closes_windows_and_drops_late_rows(spark, tmp_path):
    tmp = str(tmp_path)
    feed, ckpt, out = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/out"

    # batch 1: four events in [10:00, 10:05) + one at 10:20 that pushes
    # the watermark to 10:10, closing the first window
    rows = [(i, _m(i), 1) for i in range(4)] + [(99, _m(20), 1)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(feed)
    _drain(spark, feed, ckpt, out)
    got = {(r["w_start"], r["n"]) for r in spark.read.parquet(out).collect()}
    assert (T, 4) in got, got

    # batch 2: a LATE row for the closed window (10:01 << watermark
    # 10:10) must be dropped; an event at 10:40 closes 10:20-10:25
    late_and_new = [(100, _m(1), 1), (101, _m(40), 1)]
    spark.createDataFrame(late_and_new, SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain(spark, feed, ckpt, out)

    by_window = {r["w_start"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert by_window[T] == 4, "late row leaked into a closed window"
    assert by_window[_m(20)] == 1  # the 10:20 window closed by 10:40's arrival
    assert _m(40) not in by_window  # last window never closes (no later data)


def _drain_sessions(spark, feed, ckpt, out):
    from etl_sprint_2_5_spark.streaming.windows import watermarked_session_agg

    stream = spark.readStream.schema(SCHEMA).parquet(feed)
    agg = watermarked_session_agg(
        stream, "ts", "user_id", gap="5 minutes", lateness="5 minutes"
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_native_session_window_merges_and_closes(spark, tmp_path):
    """session_window merges events within the gap into one session
    per key and emits it once the watermark passes last_event + gap;
    a separate burst after the gap becomes a second session."""
    tmp = str(tmp_path)
    feed, ckpt, out = f"{tmp}/sfeed", f"{tmp}/sckpt", f"{tmp}/sout"

    # user 1: events at 0,2,4 min (one session, gap 5m); user 2: one
    # event at 3m; then a far-future event advances the watermark past
    # every session end so everything closes.
    rows = (
        [(i, _m(2 * i), 1) for i in range(3)]
        + [(10, _m(3), 2)]
        + [(99, _m(120), 3)]
    )
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(feed)
    _drain_sessions(spark, feed, ckpt, out)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, T, 3) in got          # merged 0-4m burst
    assert (2, _m(3), 1) in got      # singleton session
    # second burst for user 1 after the gap -> NEW session
    rows2 = [(20, _m(200), 1), (21, _m(201), 1), (98, _m(400), 3)]
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain_sessions(spark, feed, ckpt, out)
    got2 = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, _m(200), 2) in got2
