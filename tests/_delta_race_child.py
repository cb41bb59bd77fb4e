"""Spawned-process workers for the delta-append-vs-compact race test
(tests/test_sink_crash.py::test_two_process_delta_append_vs_compact).

Each worker builds its OWN SparkSession (spawn start method — no
inherited JVM gateway, the in-process fork hazard) and drives the real
sink functions, so the race exercised is the production code path
across real process boundaries, not a pyarrow re-enactment. The two
workers align their manifest publishes with a barrier placed
immediately before the FIRST publish attempt of each top-level sink
call, making same-version CAS collisions effectively certain; retry
attempts skip the barrier so the optimistic loops run at full speed.
"""

from __future__ import annotations

import os


def _session(tag: str, tmp: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[2]")
        .appName(f"delta-race-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", os.path.join(tmp, f"wh-{tag}"))
        .config("spark.local.dir", os.path.join(tmp, f"sl-{tag}"))
        .getOrCreate()
    )


def _barriered_publish(sink, barrier, losses, gate):
    """Wrap sink._publish_manifest: wait for the peer right before the
    first publish attempt of each top-level call (gate[0] set by the
    caller per round), count lost CASes, never deadlock — a peer that
    skips its publish (e.g. compact with nothing pending) just costs
    the other side the barrier timeout once; broken barriers pass."""
    orig = sink._publish_manifest

    def wrapped(path, doc):
        if gate[0]:
            gate[0] = False
            try:
                barrier.wait(timeout=15)
            except Exception:
                pass
        r = orig(path, doc)
        if r is None:
            with losses.get_lock():
                losses.value += 1
        return r

    sink._publish_manifest = wrapped


def append_worker(view, tmp, rounds, start_barrier, pub_barrier, losses):
    """Each round: append ONE delta commit carrying a brand-new key
    (1000 + i -> -i), so any lost commit is a missing key in the final
    merged read."""
    from etl_sprint_2_5_spark.streaming import sink

    spark = _session("append", tmp)
    gate = [False]
    _barriered_publish(sink, pub_barrier, losses, gate)
    try:
        for i in range(rounds):
            start_barrier.wait(timeout=120)
            batch = spark.createDataFrame(
                [(1000 + i, -i)], "id long, val long"
            )
            gate[0] = True
            sink.upsert_keyed_parquet_delta(
                spark, batch, view, "id", keep_versions=4
            )
    finally:
        spark.stop()


def compact_worker(view, tmp, rounds, start_barrier, pub_barrier, losses,
                   n_compacted):
    """Each round: fold whatever delta commits are pending back into
    the bases through the same CAS the appender is racing."""
    from etl_sprint_2_5_spark.streaming import sink

    spark = _session("compact", tmp)
    gate = [False]
    _barriered_publish(sink, pub_barrier, losses, gate)
    try:
        for _ in range(rounds):
            start_barrier.wait(timeout=120)
            gate[0] = True
            n = sink.compact_bucketed_view(spark, view, keep_versions=4)
            with n_compacted.get_lock():
                n_compacted.value += n
    finally:
        spark.stop()
