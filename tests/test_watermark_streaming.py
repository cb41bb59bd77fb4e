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
