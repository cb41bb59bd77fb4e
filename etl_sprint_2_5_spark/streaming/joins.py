"""Streaming joins — the two shapes the rest of the streaming surface
was missing:

- **stream-static enrichment**: each micro-batch hash-joins against a
  (small) dimension snapshot; broadcast per batch, no state kept.
  This is the streaming face of the batch prefetch+annotate join
  (J10) — the reference's daemon re-reads dims every cycle the same
  way (postgres_to_es/daemon.py enrichment queries).
- **stream-stream interval join**: both sides are watermarked and the
  join condition carries an EVENT-TIME bound, so Spark can size and
  evict the join state; without the bound, state grows forever (the
  planner rejects it in append mode). This is the streaming twin of
  the batch interval_join_binned (operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame, dim_df: DataFrame, keys: tuple[str, ...], how: str = "inner"
) -> DataFrame:
    """Stream-static join. The dim is broadcast into every micro-batch
    — re-resolved each batch, so a dim refresh (overwritten parquet)
    is picked up without restarting the query. Stateless: nothing is
    buffered across batches."""
    return stream_df.join(F.broadcast(dim_df), list(keys), how)


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    lateness: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right-side rows match a left row with
    the same key whose timestamp precedes them by at most
    ``max_delay`` (view→click attribution, request→response pairing).

    Both sides get watermarks; the two-sided time bound in the join
    condition is what lets Spark EVICT buffered rows once the
    watermark passes ``ts + max_delay`` — state is bounded by
    (arrival rate × horizon), independent of stream age.

    ``how="leftOuter"`` is the CDC-join shape production pipelines
    rely on: a left row that found no match emits ONCE, null-padded,
    when the watermark proves no matching right row can still arrive
    (i.e. at state eviction time) — matched results still stream out
    immediately. The emission is therefore delayed by up to
    ``max_delay + lateness`` of event time; a stream that simply ends
    without its watermark passing that point never flushes the tail
    (drive test feeds with a trailing sentinel past the horizon)."""
    l_ = left.withWatermark(left_ts, lateness)
    r_ = right.withWatermark(right_ts, lateness)
    cond = (
        (l_[key] == r_[key])
        & (r_[right_ts] >= l_[left_ts])
        & (r_[right_ts] <= F.expr(f"{left_ts} + interval {max_delay}"))
    )
    return l_.join(r_, cond, how)
