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

import hashlib
import json
import os
import re
import shutil
import uuid

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


# --------------------------------------------------------------------
# Manifest-committed bucketed sink
#
# The bucketed upsert used to promote each touched bucket with a
# per-directory rename swap (kb=N.swap → kb=N). That protocol leans on
# POSIX rename atomicity — which object stores (S3/GCS) do not give
# you: their "rename" is copy-then-delete, so a crash mid-rename can
# leave a torn directory and the multi-bucket commit has O(touched)
# separate atomicity points. This is the Iceberg/Delta commit idea
# without the format:
#
#   path/_manifests/manifest-<v>.json   (versioned, checksummed)
#   path/data/kb=<N>/c-<commit>/part-*.parquet  (immutable, write-once)
#
# A commit writes NEW immutable data dirs (invisible — nothing
# references them yet, so the moves need no atomicity at all), then
# publishes ONE new manifest file naming exactly the live dir per
# bucket. The single atomicity point is the manifest publish, and even
# that doesn't need an atomic rename: manifests are versioned + carry
# a payload checksum, and readers take the HIGHEST version that
# parses and checksums clean — a torn half-copied manifest file fails
# the checksum and the reader falls back to the previous version.
# (On a real object store the publish is one object PUT, which is
# atomic per-object everywhere.) Recovery is therefore a no-op:
# unreferenced data dirs are garbage, swept by the next successful
# commit's GC; there is no heal step and no crash window that loses
# or tears data.
# --------------------------------------------------------------------

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
_MANIFEST_RE = re.compile(r"^manifest-(\d{20})\.json$")


def _manifest_checksum(doc: dict) -> str:
    body = {k: v for k, v in doc.items() if k != "checksum"}
    return hashlib.sha256(
        json.dumps(body, sort_keys=True).encode()
    ).hexdigest()


def load_manifest(path: str, version: int | None = None) -> dict | None:
    """Resolve a committed state: the highest-version manifest that
    parses AND checksums clean — or, with ``version``, exactly that
    version (time travel over retained versions). A torn manifest (a
    non-atomic rename/PUT that crashed mid-copy) fails one of those
    and is skipped — the reader lands on the previous committed
    version, which by the commit ordering is always intact."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    names = sorted(
        (n for n in os.listdir(mdir) if _MANIFEST_RE.match(n)), reverse=True
    )
    if version is not None:
        names = [n for n in names if int(_MANIFEST_RE.match(n)[1]) == version]
    for n in names:
        try:
            with open(os.path.join(mdir, n)) as f:
                doc = json.load(f)
        except (json.JSONDecodeError, OSError, UnicodeDecodeError):
            continue
        if doc.get("checksum") == _manifest_checksum(doc):
            return doc
    return None


def _cas_create(src: str, dst: str) -> bool:
    """Create ``dst`` from ``src`` FAIL-IF-EXISTS — the compare-and-swap
    under optimistic concurrency: two writers racing to publish the
    same version number can't silently overwrite each other; exactly
    one wins, the loser re-merges against the winner's manifest. POSIX:
    hard link (atomic create-exclusive). Object stores: a conditional
    PUT (If-None-Match:*) — same call shape, swap this one function.
    Returns False when dst already exists (lost the race)."""
    try:
        os.link(src, dst)
        return True
    except FileExistsError:
        return False


def _publish_manifest(path: str, doc: dict) -> bool:
    """Publish a new manifest version: write to a hidden tmp name,
    fsync, then create-exclusive at the final versioned name (the
    CAS). Returns False if that version number was already published
    by a concurrent writer — the caller re-merges against the newer
    manifest. Atomicity of the create is NOT a correctness dependence
    for readers: if a torn write leaves a partial file at the final
    name (object-store PUT dying midway), it fails the checksum in
    load_manifest and the previous version still wins; the torn file
    is replaced on the publisher's retry of the NEXT version or swept
    with its version by GC."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    doc = dict(doc)
    doc["checksum"] = _manifest_checksum(doc)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(mdir, f"manifest-{doc['version']:020d}.json")
    # a TORN file at this version (crashed non-atomic publish, detected
    # via checksum) is garbage, not a competing commit — reclaim the
    # name so redelivery can publish the good version
    if os.path.exists(final) and load_manifest(path, doc["version"]) is None:
        try:
            os.remove(final)
        except OSError:
            pass
    won = _cas_create(tmp, final)
    try:
        os.remove(tmp)
    except OSError:
        pass
    return won


def _gc_unreferenced(path: str, current: dict, keep_versions: int = 1) -> None:
    """Sweep everything the just-published manifest supersedes:
    manifest versions older than the ``keep_versions`` most recent,
    leftover tmp files, orphan stage dirs (crashed mid-write), and
    data dirs referenced by NO retained manifest (either replaced by
    this commit or orphaned by a crash before a previous publish).
    Runs only AFTER a successful publish, so a crash inside GC just
    leaves garbage for the next commit to sweep — readers are already
    on the new version. ``keep_versions > 1`` retains older snapshots
    for time-travel reads (read_bucketed_view(version=...)) — the
    incremental cost is only the buckets the retained commits
    rewrote, since untouched buckets share their immutable dirs
    across versions."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    floor_v = int(current["version"]) - max(1, keep_versions) + 1
    live: set[str] = set()
    for n in list(os.listdir(mdir)):
        m = _MANIFEST_RE.match(n)
        if n.startswith(".tmp-") or (m and int(m[1]) < floor_v):
            try:
                os.remove(os.path.join(mdir, n))
            except OSError:
                pass
        elif m:
            doc = load_manifest(path, version=int(m[1]))
            if doc:
                live.update(doc["buckets"].values())
    for n in os.listdir(path):
        if n.startswith("_stage-"):
            shutil.rmtree(os.path.join(path, n), ignore_errors=True)
    droot = os.path.join(path, _DATA_DIR)
    if os.path.isdir(droot):
        for kb_dir in os.listdir(droot):
            kb_path = os.path.join(droot, kb_dir)
            if not os.path.isdir(kb_path):
                continue
            for commit_dir in os.listdir(kb_path):
                rel = f"{_DATA_DIR}/{kb_dir}/{commit_dir}"
                if rel not in live:
                    shutil.rmtree(os.path.join(droot, kb_dir, commit_dir),
                                  ignore_errors=True)


def upsert_keyed_parquet_bucketed(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str,
    n_buckets: int = 16,
    keep_versions: int = 1,
) -> int:
    """Bucket-pruned keyed upsert with a manifest-based commit — the
    file-level-pruned MERGE shape (what Delta/Iceberg do with file
    stats) on plain parquet: documents live in immutable per-commit
    dirs under ``path/data/kb=<hash(key) % n>/`` and a batch only
    reads and rewrites the buckets its keys land in. A maintenance
    batch touching 0.1% of keys then rewrites ~0.1% of buckets instead
    of the whole table — the lever that keeps IVM upsert cost
    proportional to the CHANGE, not the corpus (upsert_keyed_parquet
    rewrites everything; fine for small views, untenable at 100 TB).

    Execution shape: ONE Spark job regardless of how many buckets are
    touched — the touched buckets' live dirs (resolved from the
    manifest) are read as one pruned scan, merged with the batch
    (anti-join on incoming keys), and written partitioned by bucket in
    a single pass; the commit is then file moves of invisible new dirs
    plus ONE manifest publish (see the module block above for the
    crash contract — no rename atomicity required anywhere).

    ``n_buckets`` is STAMPED into the manifest at view creation and
    the stamped count wins on every later call — so a caller that
    re-derives a different count (e.g. ``buckets_for`` after the view
    crossed a power-of-two boundary) cannot fork the layout into two
    coexisting hash%n schemes with duplicate keys. Bucket assignment
    is Spark's deterministic murmur3 ``hash`` — stable across
    sessions, so a redelivered row always lands in the same bucket,
    and a crash before the publish leaves the offset uncommitted →
    redelivery re-runs the same idempotent merge. Returns the number
    of buckets touched."""
    # optimistic-concurrency loop: each attempt merges against the
    # manifest it read and publishes version+1 via compare-and-swap;
    # losing the CAS to a concurrent writer means re-merging against
    # THEIR manifest (the losing attempt's data dirs are unreferenced
    # garbage, swept by the next successful GC). Single-writer callers
    # never loop.
    for _ in range(5):
        man = load_manifest(path)
        nb = n_buckets
        if man is not None:
            if man["key"] != key:
                raise ValueError(
                    f"bucketed view at {path!r} is keyed by {man['key']!r}, "
                    f"not {key!r}"
                )
            nb = int(man["n_buckets"])  # stamped count wins — no drift
        kb_of = F.pmod(F.hash(F.col(key)), F.lit(nb))
        # persist: the batch plan (often a rebuild join+agg) feeds BOTH
        # the touched-bucket probe and the merge write — without the
        # cache it would execute twice per cycle. The batch is the
        # change, not the corpus, so caching it is bounded by CDC
        # volume.
        b = batch.withColumn("_kb", kb_of).persist()
        try:
            touched = sorted(
                r["_kb"] for r in b.select("_kb").distinct().collect()
            )
            if not touched:
                return 0
            n = _commit_touched_buckets(
                spark, b, touched, path, key, kb_of, nb, man, keep_versions
            )
            if n is not None:
                return n
        finally:
            b.unpersist()
    raise RuntimeError(
        f"bucketed upsert at {path!r} lost the manifest publish race 5 "
        "times — pathological writer contention"
    )


def _commit_touched_buckets(
    spark: SparkSession,
    b: DataFrame,
    touched: list[int],
    path: str,
    key: str,
    kb_of,  # noqa: ANN001
    n_buckets: int,
    man: dict | None,
    keep_versions: int = 1,
) -> int | None:
    buckets: dict[str, str] = dict(man["buckets"]) if man else {}
    existing = [
        os.path.join(path, buckets[str(kb)])
        for kb in touched
        if str(kb) in buckets
    ]
    if existing:
        # bucket id recomputed from the key (deterministic hash) so the
        # pruned multi-dir read needs no partition-column inference
        old = spark.read.parquet(*existing).withColumn("_kb", kb_of)
        keys = b.select(key).distinct()
        merged = old.join(F.broadcast(keys), key, "left_anti").unionByName(b)
    else:
        merged = b
    commit_id = uuid.uuid4().hex[:12]
    stage = os.path.join(path, f"_stage-{commit_id}")
    # one shuffle on the bucket id → exactly one file per touched
    # bucket (partitionBy without it writes |tasks|×|buckets| files)
    merged.repartition(len(touched), F.col("_kb")).write.mode(
        "overwrite"
    ).partitionBy("_kb").parquet(stage)
    for kb in touched:
        src = os.path.join(stage, f"_kb={kb}")
        if not os.path.exists(src):
            # batch had the key set but every row was replaced-away:
            # keep the bucket's current manifest entry
            continue
        rel = f"{_DATA_DIR}/kb={kb}/c-{commit_id}"
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        # dst is a fresh uuid — nothing references it until the
        # manifest below does, so this move needs no atomicity
        os.replace(src, dst)
        buckets[str(kb)] = rel
    shutil.rmtree(stage, ignore_errors=True)
    doc = {
        "version": (int(man["version"]) + 1) if man else 1,
        "key": key,
        "n_buckets": n_buckets,
        "buckets": buckets,
    }
    if not _publish_manifest(path, doc):  # THE commit point (CAS)
        return None  # lost to a concurrent writer — caller re-merges
    _gc_unreferenced(path, doc, keep_versions)
    return len(touched)


def read_bucketed_view(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the bucketed keyed view as of its last committed manifest
    — or, with ``version``, as of a retained older snapshot (time
    travel; the writer's ``keep_versions`` sets the retention window).

    No heal step: the manifest IS the committed state. Data dirs from
    a crashed uncommitted upsert are simply never referenced, and a
    torn manifest write fails its checksum in load_manifest so the
    previous version is served — both without touching disk."""
    man = load_manifest(path, version=version)
    if man is None or not man["buckets"]:
        raise FileNotFoundError(
            f"bucketed keyed view at {path!r} has no committed manifest"
            + (f" at version {version}" if version is not None else "")
            + " — nothing upserted, version GC'd, or the path is wrong"
        )
    dirs = sorted(os.path.join(path, rel) for rel in man["buckets"].values())
    return spark.read.parquet(*dirs)
