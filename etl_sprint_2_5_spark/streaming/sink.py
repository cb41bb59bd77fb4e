"""Idempotent keyed sink — SURVEY.md §2.1 S5 / §2.8 T3.

The reference gets exactly-once *effect* from at-least-once delivery
plus ES ``_id = doc.id`` overwrite semantics
(/root/reference/postgres_to_es/daemon.py:358-381). The parquet
equivalent is upsert-by-key: replace existing rows sharing a key with
the incoming batch, keep the rest. Re-delivering the same batch is a
no-op — which is what makes commit-AFTER-sink safe.

Local implementation: read-old → anti-join on incoming keys → union →
atomic directory swap. On a real cluster this is a Delta/Iceberg
``MERGE INTO`` (file-level rewrite pruned by key stats) or the
es-hadoop connector's ``es.mapping.id`` upsert — the call shape here
is the same, swap the one function.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def recover_swap(path: str) -> None:
    """Heal an interrupted swap so no crash window loses data.

    States a crash can leave behind (see ``upsert_keyed_parquet``):
    - target + ``.swap``: write finished but swap never started →
      discard the ``.swap`` (its offset was never committed; the batch
      will be re-delivered and the upsert is idempotent).
    - no target, ``.swap`` present AND provably complete: the old dir
      was renamed aside but the new one not yet moved in → promote the
      ``.swap`` (it is the complete merged dataset). "Provably
      complete" = the ``.old`` backup exists (the rename-aside only
      happens after the write finished) or the dir carries Spark's
      ``_SUCCESS`` commit marker. A first-ever write that crashed
      mid-write leaves a partial ``.swap`` with neither — promoting it
      would wedge every subsequent read on a corrupt target, so it is
      discarded instead: its offset was never committed, redelivery
      regenerates it.
    - no target, only ``.old``: restore the backup.
    - target + ``.old``: swap completed, cleanup didn't → drop ``.old``.
    """
    tmp, bak = path + ".swap", path + ".old"
    if not os.path.exists(path):
        tmp_complete = os.path.exists(tmp) and (
            os.path.exists(bak) or os.path.exists(os.path.join(tmp, "_SUCCESS"))
        )
        if tmp_complete:
            os.replace(tmp, path)
        elif os.path.exists(bak):
            os.replace(bak, path)
    if os.path.exists(bak):
        shutil.rmtree(bak, ignore_errors=True)
    if os.path.exists(tmp):
        shutil.rmtree(tmp, ignore_errors=True)


def upsert_keyed_parquet(
    spark: SparkSession, batch: DataFrame, path: str, key: str
) -> None:
    """Upsert ``batch`` into the parquet dir at ``path`` by ``key``.

    Crash-safe swap: the previous version is renamed aside (never
    deleted before the new one is in place), so at every instant either
    the target or a recoverable copy exists on disk. ``recover_swap``
    heals any leftover intermediate state on the next call.
    """
    tmp, bak = path + ".swap", path + ".old"
    recover_swap(path)
    if os.path.exists(path):
        old = spark.read.parquet(path)
        keys = batch.select(key).distinct()
        merged = old.join(F.broadcast(keys), key, "left_anti").unionByName(batch)
    else:
        merged = batch
    # materialize BEFORE touching the target (merged reads the target)
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        os.replace(path, bak)  # crash here → recover_swap promotes tmp
    os.replace(tmp, path)
    shutil.rmtree(bak, ignore_errors=True)


def read_view(spark: SparkSession, path: str) -> DataFrame:
    recover_swap(path)
    return spark.read.parquet(path)


def buckets_for(view_bytes: int, target_bucket_bytes: int = 1 << 30) -> int:
    """Size the bucket count from a TARGET BUCKET SIZE, not a magic
    count. Pruning saves ``1 - touched/n_buckets`` of the rewrite
    volume, and each touched bucket is read + rewritten whole — so the
    sizing rule is "one bucket ≈ one executor-task-sized unit of
    rewrite": ~1 GiB (a few parquet row groups). The 100-TB math: a
    100 TB view / 1 GiB → ~100k buckets, so a maintenance batch
    touching 1,000 keys rewrites ≲1,000 GiB (≈1%) instead of 100 TB;
    with a magic count of 16 a single "pruned" bucket would be
    ~6 TB — no better than the flat rewrite. Floors at 16 (tiny test
    views) and rounds up to a power of two so counts stay stable and
    splittable as the view grows."""
    import math

    n = max(16, math.ceil(max(view_bytes, 1) / target_bucket_bytes))
    return 1 << (n - 1).bit_length()


def dir_bytes(path: str) -> int:
    """Recursive byte size of a directory (0 if absent) — the input
    ``buckets_for`` sizes from."""
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def upsert_keyed_parquet_bucketed(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str,
    n_buckets: int = 16,
) -> int:
    """Bucket-pruned keyed upsert — the file-level-pruned MERGE shape
    (what Delta/Iceberg do with file stats) expressed on plain
    parquet: documents live under ``path/kb=<hash(key) % n>`` and a
    batch only reads and rewrites the buckets its keys land in. A
    maintenance batch touching 0.1% of keys then rewrites ~0.1% of
    buckets instead of the whole table — the lever that keeps IVM
    upsert cost proportional to the CHANGE, not the corpus
    (upsert_keyed_parquet rewrites everything; fine for small views,
    untenable at 100 TB).

    Execution shape: ONE Spark job regardless of how many buckets are
    touched — the existing touched buckets are read as one pruned
    scan, merged with the batch (anti-join on incoming keys), and
    written partitioned by bucket in a single pass; promoting each
    bucket is then a metadata-only directory rename. (A per-bucket
    upsert loop would run O(touched) driver-coordinated jobs — at
    1000 buckets that's 1000 job launches per maintenance cycle.)

    Crash contract: each bucket's promote reuses the flat sink's
    swap state machine (``.swap``/``.old`` + ``recover_swap``), so
    every bucket is always either old or new, never torn. A crash
    BETWEEN bucket promotes leaves a mix of updated and stale buckets
    with the offset uncommitted — redelivery re-upserts the same
    batch and every bucket converges (the same idempotent-upsert
    argument as the flat sink, applied per bucket). Bucket assignment
    is Spark's deterministic murmur3 ``hash`` — stable across
    sessions, so a redelivered row always lands in the same bucket.
    Returns the number of buckets touched."""
    kb_of = F.pmod(F.hash(F.col(key)), F.lit(n_buckets))
    # persist: the batch plan (often a rebuild join+agg) feeds BOTH the
    # touched-bucket probe and the merge write — without the cache it
    # would execute twice per cycle. The batch is the change, not the
    # corpus, so caching it is bounded by CDC volume.
    b = batch.withColumn("_kb", kb_of).persist()
    try:
        touched = sorted(r["_kb"] for r in b.select("_kb").distinct().collect())
        if not touched:
            return 0
        return _merge_touched_buckets(spark, b, touched, path, key, kb_of)
    finally:
        b.unpersist()


def _merge_touched_buckets(
    spark: SparkSession,
    b: DataFrame,
    touched: list[int],
    path: str,
    key: str,
    kb_of,  # noqa: ANN001
) -> int:
    existing = []
    for kb in touched:
        d = f"{path}/kb={kb}"
        recover_swap(d)
        if os.path.exists(d):
            existing.append(d)
    if existing:
        # bucket id recomputed from the key (deterministic hash) so the
        # pruned multi-dir read needs no partition-column inference
        old = spark.read.parquet(*existing).withColumn("_kb", kb_of)
        keys = b.select(key).distinct()
        merged = old.join(F.broadcast(keys), key, "left_anti").unionByName(b)
    else:
        merged = b
    stage = f"{path}.stage"
    shutil.rmtree(stage, ignore_errors=True)
    # one shuffle on the bucket id → exactly one file per touched
    # bucket (partitionBy without it writes |tasks|×|buckets| files)
    merged.repartition(len(touched), F.col("_kb")).write.mode(
        "overwrite"
    ).partitionBy("_kb").parquet(stage)
    for kb in touched:
        src, dst = f"{stage}/_kb={kb}", f"{path}/kb={kb}"
        tmp, bak = dst + ".swap", dst + ".old"
        if not os.path.exists(src):
            continue  # batch had the key set but every row was replaced-away
        os.makedirs(path, exist_ok=True)
        os.replace(src, tmp)
        # same crash windows as upsert_keyed_parquet: .swap without a
        # backup is discarded on recovery (offset uncommitted →
        # redelivery), .swap with .old is promoted
        if os.path.exists(dst):
            os.replace(dst, bak)
        os.replace(tmp, dst)
        shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    return len(touched)


def read_bucketed_view(spark: SparkSession, path: str) -> DataFrame:
    """Read the bucketed keyed view, healing any interrupted bucket
    swap first (per-bucket recover_swap, same states as the flat
    sink).

    Recovery must derive the bucket set from ``kb=*.swap`` /
    ``kb=*.old`` remnants too, not just live ``kb=*`` dirs: a crash
    between a bucket's demote (``kb=N`` → ``kb=N.old``) and promote
    (``kb=N.swap`` → ``kb=N``) leaves NO live dir for that bucket —
    globbing only live dirs would skip recover_swap and silently
    return the view minus that bucket's rows."""
    import glob as _glob

    bases = set()
    for d in _glob.glob(os.path.join(path, "kb=*")):
        for suf in (".swap", ".old"):
            if d.endswith(suf):
                d = d[: -len(suf)]
                break
        bases.add(d)
    for d in sorted(bases):
        recover_swap(d)
    dirs = sorted(d for d in bases if os.path.exists(d))
    if not dirs:
        raise FileNotFoundError(
            f"bucketed keyed view at {path!r} has no kb=* buckets — "
            "either nothing was ever upserted or the path is wrong"
        )
    return spark.read.parquet(*dirs)
