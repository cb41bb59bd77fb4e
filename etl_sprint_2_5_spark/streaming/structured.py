"""Structured Streaming wrapper for the IVM pipelines — SURVEY.md §7
phase 5's second half: the same rebuild logic under Spark's own
checkpointing instead of the hand-rolled offset store.

Source: a change-feed directory per base table (each micro-batch =
newly arrived files of changed rows — the file-source analog of the
reference's keyset poll, daemon.py:90-129). Spark's
``checkpointLocation`` persists which files were consumed, replacing
OffsetStore; ``foreachBatch`` runs the identical fan-out → restricted
rebuild → idempotent upsert, so the exactly-once-effect argument (T3)
carries over unchanged: a replayed micro-batch re-upserts the same
documents.

``Trigger.AvailableNow`` drains the backlog then stops (batch-
incremental mode); drop the trigger for a resident daemon with
``processingTime`` polling (T1, daemon.py:537-542).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from etl_sprint_2_5_spark.streaming.ivm import Pipeline, TableLoader


def stream_pipeline(
    spark: SparkSession,
    p: Pipeline,
    feed_dir: str,
    feed_schema: StructType,
    load: TableLoader,
    checkpoint_dir: str,
    available_now: bool = True,
    row_counter: list | None = None,
):
    """Run one pipeline as a Structured Streaming query over its
    change-feed directory; returns the StreamingQuery.

    ``row_counter``: optional list the per-batch row counts are
    appended to — the exact consumed-row accounting. (The progress
    API's numInputRows is NOT that number under foreachBatch: every
    action on batch_df re-reads the micro-batch's files and each read
    adds to numInputRows, so a body that probes emptiness and then
    aggregates reports up to 2× the real rows.)"""

    changed_stream = spark.readStream.schema(feed_schema).parquet(feed_dir)
    return stream_pipeline_from(
        spark, p, changed_stream, load, checkpoint_dir,
        available_now=available_now, row_counter=row_counter,
    )


def stream_pipeline_from(
    spark: SparkSession,
    p: Pipeline,
    changed_stream,  # noqa: ANN001 - streaming DataFrame of changed rows
    load: TableLoader,
    checkpoint_dir: str,
    available_now: bool = True,
    row_counter: list | None = None,
):
    """The pipeline body over an ARBITRARY change-feed stream — same
    foreachBatch fan-out → restricted rebuild → idempotent upsert as
    :func:`stream_pipeline`, source-agnostic: file feeds, Kafka, or a
    registered Python data source (sources/pg_stream's live-PG keyset
    source). ``available_now=False`` leaves the trigger default —
    callers drain with ``processAllAvailable()`` when the source does
    not support Trigger.AvailableNow (Python data sources)."""

    def process(batch_df, batch_id: int) -> None:  # noqa: ANN001
        n = batch_df.count()
        if row_counter is not None:
            row_counter.append(n)
        if not n:
            return
        # persist only when the bucketed sink's probe executes the
        # frame a second time (rewrite-bucketed path): ids then feeds
        # the probe AND the rebuild's broadcast (and source-native
        # rebuilds collect it) — without the persist a bridge fan-out
        # re-executes its bridge scan+join per use. Delta/flat sinks
        # consume ids once; persisting there is pure overhead. Bounded
        # by the micro-batch's fan-out.
        ids = p.fanout.affected_ids(batch_df, load)
        if p.sink_mode != "delta" and p.n_buckets > 0:
            ids = ids.persist()
        try:
            docs = p.rebuild(load, ids)
            # flat or bucket-pruned per p.n_buckets; ids is the
            # bucketed sink's touched-bucket probe hint (rebuild
            # restricts docs to exactly these ids; the sink checks the
            # superset contract)
            p.upsert(spark, docs, probe_keys=ids)
        finally:
            ids.unpersist()

    writer = (
        changed_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
