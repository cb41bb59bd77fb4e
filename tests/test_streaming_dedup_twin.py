"""Live keyed-dedup streaming twin (streaming_stateful_event_dedup):
first-occurrence state must merge across the micro-batch boundary —
a key first seen in batch 1 keeps its min event id through batch 2
re-observations, and occurrence counts accumulate across both."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans import load_all
from etl_sprint_2_5_spark.plans.registry import REGISTRY
from etl_sprint_2_5_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _rows(df):
    return {
        (r["user_id"], r["event_type"]): (
            r["first_event_id"],
            r["first_ts_us"],
            r["n_occurrences"],
        )
        for r in df.collect()
    }


def test_stream_dedup_equals_batch_and_merges_state(spark):
    load_all()
    want = _rows(REGISTRY["stateful_event_dedup"].fn(spark, SF_SMOKE))
    got = _rows(REGISTRY["streaming_stateful_event_dedup"].fn(spark, SF_SMOKE))
    assert got == want and len(want) > 0

    # keys observed in BOTH feed parities forced a cross-batch merge;
    # their counts/min-ids in the stream output must be the global ones
    ev = load_table(spark, "events", SF_SMOKE)
    both = {
        (r["user_id"], r["event_type"]): (r["mn"], r["n"])
        for r in ev.groupBy("user_id", "event_type")
        .agg(
            F.countDistinct(F.col("event_id") % 2).alias("p"),
            F.min("event_id").alias("mn"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("p") == 2)
        .collect()
    }
    assert len(both) >= 10, "fixture has no cross-batch keys?"
    for key, (mn, n) in both.items():
        assert got[key][0] == mn and got[key][2] == n, key


def test_streaming_ann_equals_batch(spark):
    """The live foreachBatch ANN serving twin must return cell-for-cell
    the batch ann_ivf_topk answer: queries are row-independent, so
    chopping them into micro-batches may not change a single
    (query_id, neighbor_id, cos, rank) row."""
    import etl_sprint_2_5_spark.plans.similarity_queries  # noqa: F401
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    batch = [
        tuple(r)
        for r in REGISTRY["ann_ivf_topk"].fn(spark, SF_SMOKE).collect()
    ]
    live = [
        tuple(r)
        for r in REGISTRY["streaming_ann_topk"].fn(spark, SF_SMOKE).collect()
    ]
    assert live == batch and len(live) > 0
