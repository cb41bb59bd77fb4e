"""applyInPandasWithState operators under a real file-source stream:
state must survive across micro-batches and across query restarts
(checkpointed state store)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.streaming.stateful import (
    running_user_counts_stream,
    stateful_dedup_stream,
)

T0 = dt.datetime(2024, 6, 1)
SCHEMA = "event_id long, ts timestamp, user_id long"


def _write_feed(spark, path, rows, mode):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(mode).parquet(path)


def _drain(spark, feed, ckpt, out, build):
    stream = spark.readStream.schema(SCHEMA).parquet(feed)

    def sink(batch_df, batch_id):  # update-mode emissions -> append files
        batch_df.write.mode("append").parquet(out)

    q = (
        build(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    tmp = str(tmp_path)
    feed, ckpt, out = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/out"
    # batch 1: ids 1,2 with an in-batch duplicate of 1
    _write_feed(spark, feed, [(1, T0, 10), (1, T0, 10), (2, T0, 11)], "overwrite")
    _drain(spark, feed, ckpt, out, stateful_dedup_stream)
    got = spark.read.parquet(out)
    assert {r["event_id"] for r in got.collect()} == {1, 2}
    assert {r["event_id"]: r["n_duplicates"] for r in got.collect()}[1] == 1

    # batch 2 (restarted query, same checkpoint): re-delivery of 1 and
    # 2 must be suppressed by state; only 3 is new
    _write_feed(spark, feed, [(1, T0, 10), (2, T0, 11), (3, T0, 12)], "append")
    _drain(spark, feed, ckpt, out, stateful_dedup_stream)
    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3}
    ids = [r["event_id"] for r in spark.read.parquet(out).collect()]
    assert len(ids) == len(set(ids)), "a re-delivered id was emitted twice"


def test_running_user_counts_accumulate(spark, tmp_path):
    tmp = str(tmp_path)
    feed, ckpt, out = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/out"
    t1 = T0 + dt.timedelta(minutes=5)
    _write_feed(
        spark, feed, [(1, T0, 10), (2, T0, 10), (3, T0, 11)], "overwrite"
    )
    _drain(spark, feed, ckpt, out, running_user_counts_stream)
    _write_feed(spark, feed, [(4, t1, 10)], "append")
    _drain(spark, feed, ckpt, out, running_user_counts_stream)

    # latest emission per user carries the full running state
    latest = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("last_ts").alias("ts"))
    )
    got = {r["user_id"]: (r["n"], r["ts"]) for r in latest.collect()}
    assert got[10] == (3, t1)  # 2 in batch 1 + 1 in batch 2, ts advanced
    assert got[11] == (1, T0)
