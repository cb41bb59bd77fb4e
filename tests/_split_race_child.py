"""Spawned-process workers for the split-vs-upsert race test
(tests/test_sink_crash.py::test_two_process_split_vs_upsert).

One worker migrates the view's bucket count one old bucket per round
(``split_buckets(buckets_per_call=1)``) while the other runs
rewrite-mode keyed upserts against the SAME view — each with its OWN
SparkSession (spawn start method) driving the real sink functions, so
the mixed-layout routing, marker carry-forward, and CAS restaging are
exercised across real process boundaries. Publishes are barrier-
aligned immediately before each top-level call's FIRST CAS attempt so
same-version collisions actually happen; internal retries skip the
barrier so the optimistic loops run at full speed.
"""

from __future__ import annotations

import os


def _session(tag: str, tmp: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[2]")
        .appName(f"split-race-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", os.path.join(tmp, f"wh-{tag}"))
        .config("spark.local.dir", os.path.join(tmp, f"sl-{tag}"))
        .getOrCreate()
    )


def _barriered_publish(sink, barrier, losses, gate):
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


def split_worker(view, tmp, rounds, start_barrier, pub_barrier, losses,
                 n_split):
    """Each round: split ONE old bucket of the 4->8 migration. With
    rounds == the base bucket count the migration completes exactly at
    the last round — a CAS loss inside a round restages within
    split_buckets' own retry loop (unbarriered), so every round still
    lands its one bucket."""
    from etl_sprint_2_5_spark.streaming import sink

    spark = _session("split", tmp)
    gate = [False]
    _barriered_publish(sink, pub_barrier, losses, gate)
    try:
        for _ in range(rounds):
            start_barrier.wait(timeout=120)
            gate[0] = True
            n = sink.split_buckets(
                spark, view, factor=2, buckets_per_call=1, keep_versions=8
            )
            with n_split.get_lock():
                n_split.value += n
    finally:
        spark.stop()


def upsert_worker(view, tmp, rounds, start_barrier, pub_barrier, losses):
    """Each round: rewrite-mode upsert updating one existing key
    (i -> -i) and inserting one brand-new key (2000+i -> -i), so a
    routing fork or a dropped migration marker shows up as a
    duplicated or missing key in the final read."""
    from etl_sprint_2_5_spark.streaming import sink

    spark = _session("upsert", tmp)
    gate = [False]
    _barriered_publish(sink, pub_barrier, losses, gate)
    try:
        for i in range(rounds):
            start_barrier.wait(timeout=120)
            batch = spark.createDataFrame(
                [(i, -i), (2000 + i, -i)], "id long, val long"
            )
            gate[0] = True
            sink.upsert_keyed_parquet_bucketed(
                spark, batch, view, "id", keep_versions=8
            )
    finally:
        spark.stop()
