"""Incremental view maintenance driver — the reference CDC daemon in
Spark terms (SURVEY.md §2.8, §3.2, §7 phase 5).

The reference runs 7 coroutine pipelines, each: keyset-scan a source
table after its cursor → map changed rows to affected document ids →
rebuild those documents with the lateral-join query → bulk-upsert to
ES → advance the cursor (/root/reference/postgres_to_es/
daemon.py:90-129,132-152,155-200,426-535).

Here each pipeline is a config over ordinary Catalyst plans:

- **producer** = keyset_batch (S2/P6): composite (ts, id) cursor
  predicate, pushable into the parquet/JDBC scan;
- **fan-out** (J7/J8) = changed-rows → affected fact ids, either a
  column pluck or a broadcast semi-join through the bridge table —
  stays distributed, nothing but the cursor row is ever collected;
- **rebuild** = the gold builder restricted by the affected-id
  semi-join (J6) — same code as the full build, so incremental ==
  batch by construction;
- **sink** = idempotent upsert by doc id (T3);
- **commit** = offset advanced only after the sink returns (T2's
  commit-after-sink ordering, daemon.py:118-129) ⇒ crash anywhere
  re-delivers an already-upserted batch: no loss, no duplicates.

Unlike the reference's one-batch-per-poll quirk (T8, max 500 rows/s),
``run_to_completion`` drains the full backlog — a documented superset.
"""

from __future__ import annotations

import datetime as dt
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.keyset import keyset_batch
from etl_sprint_2_5_spark.streaming.sink import (
    upsert_keyed_parquet,
    upsert_keyed_parquet_bucketed,
)
from etl_sprint_2_5_spark.streaming.state import OffsetStore

TableLoader = Callable[[str], DataFrame]  # table name -> current snapshot
Rebuild = Callable[[TableLoader, DataFrame], DataFrame]  # (tables, ids) -> docs


@dataclass
class FanOut:
    """Changed source rows → affected document ids (J7/J8).

    ``id_field``: column of the changed row carrying the doc key
    (identity for the fact table itself, the FK for bridge rows).
    ``bridge``/``join_field``/``select_field``: for dimension changes,
    route through the bridge: docs whose bridge row references a
    changed dim id (get_table_ids_by_join, daemon.py:139-152).
    """

    id_field: str = "id"
    bridge: str | None = None
    join_field: str | None = None
    select_field: str | None = None
    # optional source-native bridge pushdown: given the distinct
    # changed-id frame (bounded by batch_size — the reference daemon
    # collects exactly this list into an IN clause,
    # daemon.py:139-152), returns the affected doc-id frame. Set when
    # the bridge lives in an external database (live PG) so the
    # dimension fan-out runs on the SOURCE planner and only the
    # affected ids cross the wire, instead of shipping the bridge
    # table per cycle.
    bridge_fn: Callable[[DataFrame], DataFrame] | None = None

    def affected_ids(self, changed: DataFrame, load: TableLoader) -> DataFrame:
        picked = changed.select(F.col(self.id_field).alias("id")).distinct()
        if self.bridge is None:
            return picked
        if self.bridge_fn is not None:
            return self.bridge_fn(picked)
        b = load(self.bridge)
        return (
            b.join(F.broadcast(picked), b[self.join_field] == picked.id, "left_semi")
            .select(F.col(self.select_field).alias("id"))
            .distinct()
        )


@dataclass
class Pipeline:
    """One maintenance pipeline: source table → target doc view."""

    name: str
    source: str
    cursor_field: str
    id_field: str
    fanout: FanOut
    rebuild: Rebuild
    sink_path: str
    doc_key: str = "id"
    batch_size: int = 1000
    # >0 routes the sink through the bucket-pruned upsert
    # (upsert_keyed_parquet_bucketed): cost per cycle becomes
    # proportional to the buckets the CHANGE lands in, not the view —
    # the flat whole-view rewrite is untenable at 100 TB. 0 = flat.
    n_buckets: int = 0
    # 'rewrite' (default) pays O(touched buckets) per cycle; 'delta'
    # appends log-structured delta commits instead — O(batch) bytes
    # per cycle, merge-on-read — and folds the log back into bases
    # every ``compact_every`` upserts (0 = never inline; run
    # compact_bucketed_view on a maintenance schedule). The delta mode
    # is what a high-churn CDC cadence wants at 100 TB: a cycle that
    # touches one doc per bucket pays doc-size, not bucket-size, I/O.
    sink_mode: str = "rewrite"
    compact_every: int = 0
    # optional source-native keyset producer: (cursor_ts, cursor_id,
    # batch_size) -> bounded batch DataFrame. When set it replaces the
    # Spark-side keyset_batch over ``load(source)`` — the cursor
    # predicate + ORDER BY + LIMIT run on the SOURCE's planner (live
    # PostgreSQL via COPY, the reference daemon's own query shape,
    # daemon.py:110-117), so one cycle ships only the batch over the
    # wire, never the table.
    batch_fn: Callable[[object, object, int], DataFrame] | None = None
    _delta_upserts: int = 0

    def upsert(
        self,
        spark: SparkSession,
        docs: DataFrame,
        probe_keys: DataFrame | None = None,
    ) -> None:
        """``probe_keys``: the affected-id frame the rebuild was
        restricted by — a guaranteed superset of ``docs``' keys, so
        the bucketed sink can probe touched buckets over this cheap
        bounded frame instead of executing the (join/agg-heavy)
        rebuild plan an extra time. The sink checks the superset
        contract structurally (stray staged buckets abort the
        commit), so a rebuild that ever emitted an out-of-set key
        would fail loudly, not lose rows."""
        if self.sink_mode == "delta":
            from etl_sprint_2_5_spark.streaming.sink import (
                compact_bucketed_view,
                upsert_keyed_parquet_delta,
            )

            upsert_keyed_parquet_delta(
                spark, docs, self.sink_path, self.doc_key,
                self.n_buckets or 16,
            )
            self._delta_upserts += 1
            if (
                self.compact_every > 0
                and self._delta_upserts % self.compact_every == 0
            ):
                compact_bucketed_view(spark, self.sink_path)
        elif self.n_buckets > 0:
            upsert_keyed_parquet_bucketed(
                spark, docs, self.sink_path, self.doc_key, self.n_buckets,
                probe_keys=probe_keys,
            )
        else:
            upsert_keyed_parquet(spark, docs, self.sink_path, self.doc_key)

    def read_view(self, spark: SparkSession) -> DataFrame:
        from etl_sprint_2_5_spark.streaming.sink import (
            read_bucketed_view,
            read_view,
        )

        if self.n_buckets > 0 or self.sink_mode == "delta":
            return read_bucketed_view(spark, self.sink_path)
        return read_view(spark, self.sink_path)


def with_backoff(
    fn: Callable[[], None],
    retries: int = 5,
    start: float = 0.1,
    factor: float = 2.0,
    border: float = 10.0,
) -> None:
    """Capped exponential backoff around a remote call — the bounded
    version of the reference's retry wrapper (postgres_to_es/
    utils.py:19-53: 0.1 s start, ×2, 10 s cap; infinite there, bounded
    here so a dead sink fails the cycle loudly instead of hanging the
    daemon). Safe to combine with commit-after-sink: a retried
    delivery re-runs the idempotent upsert, so effects stay
    exactly-once and the offset still advances exactly once."""
    delay = start
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception:  # noqa: BLE001 — transient sink/IO errors
            if attempt == retries:
                raise
            time.sleep(min(delay, border))
            delay *= factor
    return None


def run_cycle(
    spark: SparkSession,
    p: Pipeline,
    load: TableLoader,
    offsets: OffsetStore,
) -> int:
    """One micro-batch for one pipeline; returns rows consumed."""
    ts, last_id = offsets.get(p.name)
    if p.batch_fn is not None:
        batch = p.batch_fn(ts, last_id, p.batch_size)
    else:
        batch = keyset_batch(
            load(p.source), p.cursor_field, p.id_field, ts, last_id,
            p.batch_size,
        )
    # cache: the batch feeds the fan-out AND the cursor computation;
    # bounded by batch_size so it is safely materializable
    batch = batch.cache()
    try:
        # ONE aggregation job yields both the consumed-row count and
        # the cursor tail (max over the composite (ts, id) — struct
        # comparison is lexicographic, identical to ORDER BY ts DESC,
        # id DESC LIMIT 1). The previous sort-then-first plus separate
        # count() cost two scheduler round-trips per cycle; at ~20
        # cycles per maintenance scenario the fixed per-job latency
        # was a measurable slice of the loop.
        head = batch.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.struct(
                    F.col(p.cursor_field).alias("ts"),
                    F.col(p.id_field).alias("id"),
                )
            ).alias("tail"),
        ).first()
        if not head["n"]:
            return 0
        tail = head["tail"]
        n = head["n"]
        # persist ONLY when the sink's touched-bucket probe will
        # execute the frame a second time (rewrite-bucketed path): the
        # affected-id frame then feeds the probe AND the rebuild's
        # broadcast semi-join (AND, on source-native rebuilds, an
        # eager collect), and without the persist a bridge fan-out
        # re-runs its bridge-table scan+join per execution. The
        # delta/flat sinks consume ids exactly once (the broadcast) —
        # persisting there is pure overhead. Bounded by the batch's
        # fan-out, same persistability argument as ``batch``.
        ids = p.fanout.affected_ids(batch, load)
        if p.sink_mode != "delta" and p.n_buckets > 0:
            ids = ids.persist()
        try:
            docs = p.rebuild(load, ids)
            # T6: transient sink failures are retried with capped
            # backoff; only a still-failing sink aborts the cycle
            # (offset unmoved). ids rides along as the touched-bucket
            # probe hint: the rebuild restricted docs to exactly these
            # ids, so the sink can probe over the bounded id frame and
            # execute the rebuild plan only once — inside the merge
            # write
            with_backoff(lambda: p.upsert(spark, docs, probe_keys=ids))
            # T2: ONLY after the sink returned do we advance the cursor
            ts_val = tail["ts"]
            if isinstance(ts_val, str):
                ts_val = dt.datetime.fromisoformat(ts_val)
            offsets.set(p.name, ts_val, tail["id"])
            return n
        finally:
            ids.unpersist()
    finally:
        batch.unpersist()


def _merge_key(p: Pipeline) -> tuple:
    """Identity under which pipelines may share ONE rebuild + ONE sink
    commit per drain round: same sink (path/key/bucketing/mode) and
    the same rebuild plan builder. Delta-mode pipelines never merge —
    their compaction cadence is counted in UPSERTS (compact_every), so
    collapsing a round's k upserts into one would shift when the log
    folds back into bases (the mixed base+delta final state the delta
    gate exists to cross)."""
    return (p.sink_path, p.doc_key, p.n_buckets, p.sink_mode, id(p.rebuild))


def _run_round_merged(
    spark: SparkSession,
    plist: list[Pipeline],
    load: TableLoader,
    offsets: OffsetStore,
) -> list[int]:
    """One drain round for a group of same-sink pipelines: each member
    contributes its keyset batch, head aggregation and fan-out exactly
    as in :func:`run_cycle`, but the group pays ONE restricted rebuild
    and ONE sink commit over the UNION of the members' affected-id
    frames (guide §1.2: remove redundant passes — the per-pipeline
    loop re-ran the same rebuild sources and re-committed the same
    view k times per round with identical per-key results, since
    sources are quiescent during a drain and the rebuild depends only
    on the source snapshots and the id set). Result-identical to the
    sequential per-pipeline cycles: rebuild(ids_a ∪ ids_b) row-for-row
    equals rebuild(ids_a) upserted then rebuild(ids_b) upserted —
    overlapping ids rebuild to the same row either way.

    Cursor discipline is unchanged per member: every cursor advances
    only AFTER the (single) sink call returned — a sink failure leaves
    every member's offset unmoved and the whole round re-delivers,
    idempotently. Returns the per-member consumed-row counts, aligned
    with ``plist``."""
    live: list[tuple[Pipeline, DataFrame | None, int, object]] = []
    try:
        for p in plist:
            ts, last_id = offsets.get(p.name)
            if p.batch_fn is not None:
                batch = p.batch_fn(ts, last_id, p.batch_size)
            else:
                batch = keyset_batch(
                    load(p.source), p.cursor_field, p.id_field, ts,
                    last_id, p.batch_size,
                )
            batch = batch.cache()
            head = batch.agg(
                F.count(F.lit(1)).alias("n"),
                F.max(
                    F.struct(
                        F.col(p.cursor_field).alias("ts"),
                        F.col(p.id_field).alias("id"),
                    )
                ).alias("tail"),
            ).first()
            if not head["n"]:
                batch.unpersist()
                live.append((p, None, 0, None))
                continue
            live.append((p, batch, head["n"], head["tail"]))
        if all(b is None for _, b, _, _ in live):
            return [0] * len(plist)
        ids: DataFrame | None = None
        for p, batch, _, _ in live:
            if batch is None:
                continue
            part = p.fanout.affected_ids(batch, load)
            ids = part if ids is None else ids.unionByName(part)
        ids = ids.distinct()
        rep = plist[0]  # group members share sink config + rebuild
        # same conditional-persist rule as run_cycle: only the
        # rewrite-bucketed sink's probe executes ids a second time
        if rep.sink_mode != "delta" and rep.n_buckets > 0:
            ids = ids.persist()
        try:
            docs = rep.rebuild(load, ids)
            with_backoff(lambda: rep.upsert(spark, docs, probe_keys=ids))
            # T2: cursors advance only after the shared sink returned
            for p, batch, _, tail in live:
                if batch is None:
                    continue
                ts_val = tail["ts"]
                if isinstance(ts_val, str):
                    ts_val = dt.datetime.fromisoformat(ts_val)
                offsets.set(p.name, ts_val, tail["id"])
            return [n for _, _, n, _ in live]
        finally:
            ids.unpersist()
    finally:
        for _, batch, _, _ in live:
            if batch is not None:
                batch.unpersist()


def run_to_completion(
    spark: SparkSession,
    pipelines: list[Pipeline],
    load: TableLoader,
    offsets: OffsetStore,
    max_cycles: int = 10_000,
) -> int:
    """Drain every pipeline until all report an empty batch.

    Equivalent to the daemon's poll loop (daemon.py:537-542) with
    Trigger.AvailableNow semantics instead of one-batch-per-poll.

    Short-circuit: a cycle that returned FEWER rows than its
    batch_size proves the keyset scan is past the last row — the
    producer is ``ORDER BY (ts, id) LIMIT batch_size``, so a partial
    batch means nothing remains after the advanced cursor. That
    pipeline is not re-polled within THIS drain (sources are
    quiescent during a drain — the CDC writes land between calls),
    which removes the confirm-empty cycle per pipeline (a full
    keyset-scan plan + aggregation job each) the moved==0 exit used
    to cost. The drained set is per-call: the next call re-polls
    everything, so post-drain mutations are picked up exactly as
    before.

    Round merging: pipelines sharing one sink AND one rebuild builder
    (see :func:`_merge_key`; delta mode excluded) drain as a GROUP —
    per round each member still reads its own bounded batch and fans
    out its own affected ids, but the group runs one rebuild and one
    sink commit over the union (``_run_round_merged`` proves result
    identity). The reference daemon's seven coroutines behave the same
    way five-at-a-time into the movies index; here it cuts the
    dominant per-round cost (the merge commit and the rebuild's source
    scans) from k per round to one."""
    total = 0
    drained: set[int] = set()
    groups: dict[tuple, list[int]] = {}
    for i, p in enumerate(pipelines):
        if p.sink_mode != "delta":
            groups.setdefault(_merge_key(p), []).append(i)
    group_of: dict[int, list[int]] = {
        i: idxs for idxs in groups.values() if len(idxs) > 1 for i in idxs
    }
    for _ in range(max_cycles):
        moved = 0
        seen: set[int] = set()
        for i, p in enumerate(pipelines):
            if i in drained or i in seen:
                continue
            members = group_of.get(i)
            if members is not None:
                alive = [j for j in members if j not in drained]
                seen.update(alive)
                counts = _run_round_merged(
                    spark, [pipelines[j] for j in alive], load, offsets
                )
                for j, n in zip(alive, counts):
                    moved += n
                    if n < pipelines[j].batch_size:
                        drained.add(j)
            else:
                n = run_cycle(spark, p, load, offsets)
                moved += n
                if n < p.batch_size:
                    drained.add(i)
        total += moved
        if len(drained) == len(pipelines):
            return total
    raise RuntimeError("IVM did not converge within max_cycles")


def agg_delta(
    old_rows: DataFrame,
    new_rows: DataFrame,
    group_cols: list[str],
    measure_cols: list[str],
) -> DataFrame:
    """Retraction deltas for an incrementally-maintained AGGREGATE
    view (the Flink-style retract/add pair Spark has no native
    operator for): every changed row contributes (-1, -old measures)
    under its OLD group key and (+1, +new measures) under its NEW one
    — so group moves, measure changes, and rows that do both are all
    one uniform arithmetic. Returns one row per (group, ±image) with
    ``_dn`` (count delta) and ``d_<measure>`` columns, ready to merge
    with ``merge_agg_state``. Input frames carry only the CHANGED
    rows (before- and after-images), never the base table."""
    neg = old_rows.select(
        *group_cols,
        F.lit(-1).cast("long").alias("_dn"),
        *[(-F.col(m)).cast("long").alias(f"d_{m}") for m in measure_cols],
    )
    pos = new_rows.select(
        *group_cols,
        F.lit(1).cast("long").alias("_dn"),
        *[F.col(m).cast("long").alias(f"d_{m}") for m in measure_cols],
    )
    return neg.unionByName(pos)


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    measure_cols: list[str],
) -> DataFrame:
    """Apply an ``agg_delta`` batch to the aggregate state: full-outer
    merge on the group key, sums coalesced, groups whose count reaches
    zero dropped (the retraction that empties a group must REMOVE it —
    the correctness detail naive incremental sums get wrong). A group
    whose count would go NEGATIVE is a protocol violation — a retract
    for a row the state never absorbed (misordered changelog batches,
    a skipped insert batch) — and raises loudly instead of being
    silently dropped, so the root cause surfaces instead of a
    confusing downstream hash mismatch. At scale this is one
    co-partitioned shuffle on the group key; on a real cluster the
    state table is Delta/Iceberg and this is the MERGE."""
    d = delta.groupBy(*group_cols).agg(
        F.sum("_dn").alias("_dn"),
        *[F.sum(f"d_{m}").alias(f"d_{m}") for m in measure_cols],
    )
    n_new = F.coalesce("n_rows", F.lit(0)) + F.coalesce("_dn", F.lit(0))
    merged = state.join(d, group_cols, "full_outer").select(
        *group_cols,
        F.when(
            n_new < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "merge_agg_state: group count went negative "
                        "(retract without matching insert — misordered "
                        "or dropped changelog batch?) for group "
                    ),
                    # coalesce each key to the literal 'NULL': concat_ws
                    # SKIPS nulls, which would silently drop the null
                    # position ("a/b" for ("a", NULL, "b")) and lose the
                    # group identity the error exists to surface
                    F.concat_ws(
                        "/",
                        *[
                            F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
                            for c in group_cols
                        ],
                    ),
                )
            ).cast("long"),
        )
        .otherwise(n_new)
        .alias("n_rows"),
        *[
            (F.coalesce(m, F.lit(0)) + F.coalesce(f"d_{m}", F.lit(0))).alias(m)
            for m in measure_cols
        ],
    )
    return merged.where(F.col("n_rows") > 0)


def _recover_agg_state(path: str) -> None:
    """Heal an interrupted aggregate-state swap. Unlike the keyed doc
    sink (sink.recover_swap), completeness is gated on the LEDGER
    file, not Spark's _SUCCESS marker: a delta application is only
    complete once the applied-batch id sits INSIDE the new directory,
    because promoting a merged state without its ledger would let a
    replayed batch re-apply non-idempotent deltas (double-count).

    Why this keeps the rename-swap while the corpus-sized bucketed
    sink moved to manifest commits (sink.py): aggregate state is
    GROUP-CARDINALITY-sized (thousands of rows, one small directory),
    so the whole-state rewrite the swap implies is already the cheap
    path, there is nothing to bucket-prune, and the heal covers every
    crash window. Contract: the swap depends on POSIX rename atomicity
    — this ledger layout is for real filesystems ONLY. On an object
    store the same ledger rides the manifest sink unchanged (the
    ledger becomes a manifest field; see sink.py's module docstring
    for the routing rule)."""
    import os
    import shutil

    tmp, bak = path + ".swap", path + ".old"
    if not os.path.exists(path):
        if os.path.exists(os.path.join(tmp, "_ledger.json")):
            os.replace(tmp, path)
        elif os.path.exists(bak):
            os.replace(bak, path)
    if os.path.exists(bak):
        shutil.rmtree(bak, ignore_errors=True)
    if os.path.exists(tmp):
        shutil.rmtree(tmp, ignore_errors=True)


def apply_agg_delta_batch(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    group_cols: list[str],
    measure_cols: list[str],
    batch_id: int,
) -> bool:
    """Exactly-once application of one changelog micro-batch to the
    aggregate state at ``path``. Deltas are NOT idempotent (applying
    a retract/add pair twice double-counts), so at-least-once
    delivery needs a transactional guard: the applied-batch id lives
    in a ledger file INSIDE the state directory and moves atomically
    with the data in one directory swap — a replayed foreachBatch
    (same batch_id after crash recovery) reads the ledger and skips.
    This is the standard foreachBatch exactly-once recipe
    (batch-id-keyed transactional write), with the keyed-parquet
    directory swap as the transaction. Returns True if applied,
    False if skipped as a duplicate."""
    import json
    import os
    import shutil

    _recover_agg_state(path)
    ledger = os.path.join(path, "_ledger.json")
    if os.path.exists(ledger):
        with open(ledger) as f:
            if batch_id <= json.load(f)["last_batch"]:
                return False
    if os.path.exists(path):
        state = spark.read.parquet(path)
    else:
        # empty state with types inherited from the delta schema
        state = delta.select(
            *group_cols,
            F.col("_dn").alias("n_rows"),
            *[F.col(f"d_{m}").alias(m) for m in measure_cols],
        ).limit(0)
    merged = merge_agg_state(state, delta, group_cols, measure_cols)
    tmp, bak = path + ".swap", path + ".old"
    # materialize BEFORE touching the target (merged reads the target)
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_ledger.json"), "w") as f:
        json.dump({"last_batch": batch_id}, f)
    # ledger now inside tmp → tmp is provably complete from here on
    if os.path.exists(path):
        os.replace(path, bak)
    os.replace(tmp, path)
    shutil.rmtree(bak, ignore_errors=True)
    return True
