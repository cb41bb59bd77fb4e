"""Custom stateful streaming operators via ``applyInPandasWithState``
— the Spark-native generalization of the reference daemon's hand-kept
state (SURVEY.md §2.8; the daemon's only state is its cursor, so these
go beyond parity into the streaming surface the brief requires).

``applyInPandasWithState`` is the arbitrary-stateful-processing hook:
the stream is grouped by key, each micro-batch hands the group's new
rows (as Arrow batches) plus its persisted ``GroupState`` to a Python
function, and whatever state is ``update()``d survives to the next
batch in the checkpoint's state store. Exactly the tool for operators
watermark+dropDuplicates can't express (first-seen payload capture,
running per-key aggregates with custom emit logic, session carry-over).

Scale shape: state lives partitioned by key in the state store
(RocksDB/HDFS-backed on a cluster); each task only loads its keys.
The Python functions below are Arrow-batched per group — keep per-key
state small (a scalar or tiny dict), never an unbounded row list.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEDUP_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("n_duplicates", LongType()),
    ]
)
DEDUP_STATE = StructType(
    [StructField("seen", LongType())]
)


def _dedup_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit each event_id once (on first sight), then count suppressed
    re-deliveries in state. State per key: one int."""
    seen = state.get[0] if state.exists else 0
    total = sum(len(p) for p in pdfs)
    if seen == 0:
        yield pd.DataFrame({"event_id": [key[0]], "n_duplicates": [total - 1]})
        state.update((total,))
    else:
        state.update((seen + total,))
        yield pd.DataFrame({"event_id": [], "n_duplicates": []}).astype(
            {"event_id": "int64", "n_duplicates": "int64"}
        )


def stateful_dedup_stream(events: DataFrame) -> DataFrame:
    """First-seen dedup across micro-batches AND restarts (state lives
    in the checkpoint): the streaming twin of the batch
    ``stateful_event_dedup`` query, keyed by event_id."""
    return events.groupBy("event_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)
RUNNING_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _running_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user event count + latest timestamp, emitted every
    batch the key appears in (the incrementally-maintained-aggregate
    shape of the reference daemon, as true streaming state)."""
    n, last_us = state.get if state.exists else (0, 0)
    for p in pdfs:
        n += len(p)
        if len(p):
            last_us = max(
                last_us, int(p["ts"].max().value // 1_000)
            )  # pandas ns -> us
    state.update((n, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_ts": [pd.Timestamp(last_us * 1_000)],
        }
    )


def running_user_counts_stream(events: DataFrame) -> DataFrame:
    """Per-user running aggregate via custom state (count + max ts)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_fn,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("last_error_ts", TimestampType()),
        StructField("last_error_value", DoubleType()),
    ]
)
ASOF_STATE = StructType(
    [
        StructField("err_ts_us", LongType()),
        StructField("err_value", DoubleType()),
    ]
)


def _asof_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming as-of: carry the latest error (ts, value) per user in
    state; annotate every click with it. Rows are processed in ts
    order WITHIN the group's micro-batch; cross-batch ordering is the
    stream's arrival order (the batch asof_join is the exact-order
    reference for reconciliation)."""
    err_us, err_v = (tuple(state.get) if state.exists else (None, None))
    # event_id tiebreak (matching _attrib_fn): same-ts error/click pairs
    # would otherwise process in pandas-quicksort order — run-unstable
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = {c: [] for c in ("event_id", "user_id", "ts", "value",
                           "last_error_ts", "last_error_value")}
    for r in rows.itertuples():
        if r.event_type == "error":
            err_us, err_v = int(r.ts.value // 1_000), float(r.value)
        else:
            out["event_id"].append(r.event_id)
            out["user_id"].append(key[0])
            out["ts"].append(r.ts)
            out["value"].append(r.value)
            out["last_error_ts"].append(
                pd.to_datetime(err_us, unit="us") if err_us is not None else pd.NaT
            )
            out["last_error_value"].append(err_v)
    if err_us is not None:
        state.update((err_us, err_v))
    yield pd.DataFrame(out)


def asof_state_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of operators/temporal.asof_join: clicks annotated
    with the user's most recent error, state = ONE (ts, value) pair per
    user in the checkpointed state store — constant per key, restart-
    safe. Expects columns (event_id, ts, user_id, event_type, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _asof_fn,
        outputStructType=ASOF_OUTPUT,
        stateStructType=ASOF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTRIB_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_ts", TimestampType()),
        StructField("channel", StringType()),
        StructField("value", DoubleType()),
    ]
)
ATTRIB_STATE = StructType(
    [
        StructField("src_ts_us", LongType()),
        StructField("src_type", StringType()),
    ]
)

_ATTRIB_WINDOW_US = 86_400_000_000  # 24h, same bound as the batch query


def _attrib_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming last-touch attribution: carry the user's most recent
    click/view (ts, type) in state; each purchase is credited to it
    when within 24h, else 'direct'. State per key: one (long, string)
    pair. Rows are processed in ts order within the micro-batch."""
    src_us, src_type = (tuple(state.get) if state.exists else (None, None))
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = {c: [] for c in ("user_id", "purchase_ts", "channel", "value")}
    for r in rows.itertuples():
        ts_us = int(r.ts.value // 1_000)
        if r.event_type in ("click", "view"):
            src_us, src_type = ts_us, r.event_type
        elif r.event_type == "purchase":
            within = src_us is not None and ts_us - src_us <= _ATTRIB_WINDOW_US
            out["user_id"].append(key[0])
            out["purchase_ts"].append(r.ts)
            out["channel"].append(src_type if within else "direct")
            out["value"].append(float(r.value))
    if src_us is not None:
        state.update((src_us, src_type))
    yield pd.DataFrame(out)


def attribution_state_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``last_touch_attribution`` query:
    per-purchase channel credit with ONE (ts, channel) pair of state
    per user — the carry-forward window function re-expressed as
    keyed state so it runs incrementally forever (the batch query is
    the exact-order reconciliation reference). Expects columns
    (event_id, ts, user_id, event_type, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _attrib_fn,
        outputStructType=ATTRIB_OUTPUT,
        stateStructType=ATTRIB_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_OUTPUT = StructType(
    [
        StructField("g", LongType()),
        StructField("ver", LongType()),
        StructField("hvs", ArrayType(LongType())),
    ]
)
KMV_STATE = StructType(
    [
        StructField("ver", LongType()),
        StructField("hvs", ArrayType(LongType())),
    ]
)


def _make_kmv_fn(k: int):
    def _kmv_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Fold the batch's hashes into the group's bottom-k sample.
        State per group: ≤ k sorted longs + a version counter — the
        fixed-memory contract that lets the sketch run on an unbounded
        stream (an exact distinct would grow state without bound)."""
        ver, hvs = state.get if state.exists else (0, [])
        s = set(hvs)
        for p in pdfs:
            s.update(int(x) for x in p["hv"])
        bottom = sorted(s)[:k]
        ver += 1
        state.update((ver, bottom))
        yield pd.DataFrame({"g": [key[0]], "ver": [ver], "hvs": [bottom]})

    return _kmv_fn


def kmv_bottomk_stream(hashed: DataFrame, k: int = 256) -> DataFrame:
    """Streaming KMV/theta sketch: maintain a bottom-k distinct-hash
    sample per hash-partition group ``g`` (input columns: g, hv). The
    global sketch is the bottom-k of the union of the group samples —
    EXACTLY the batch sketch, because any hash among the k smallest
    overall has fewer than k smaller hashes globally, hence fewer than
    k smaller within its own group (the KMV fold property, partition
    flavor). Groups keep the state-store entries small (≤ k longs
    each) and the fold parallel — the same sharding a 1000-executor
    cluster would use. Emits (g, ver, hvs) every batch the group sees
    rows; readers take each group's highest ver."""
    return hashed.groupBy("g").applyInPandasWithState(
        _make_kmv_fn(k),
        outputStructType=KMV_OUTPUT,
        stateStructType=KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
