"""Crash-window safety of the keyed parquet upsert sink.

The swap protocol must never lose previously-upserted rows: at every
instant either the target dir or a recoverable copy (``.old`` backup
or complete ``.swap``) exists. Each test constructs the exact on-disk
state a crash at one point of ``upsert_keyed_parquet`` leaves behind,
then asserts ``recover_swap`` / the next call heals it with no loss.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from etl_sprint_2_5_spark.streaming.sink import (
    read_view,
    recover_swap,
    upsert_keyed_parquet,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, v int")


def _rows(spark, path):
    return {(r["id"], r["v"]) for r in read_view(spark, path).collect()}


def _seed(spark, path):
    upsert_keyed_parquet(spark, _df(spark, [("a", 1), ("b", 2)]), path, "id")
    assert _rows(spark, path) == {("a", 1), ("b", 2)}


def test_crash_between_rename_aside_and_swap_in(spark, tmp_path):
    """Old dir renamed to .old, new dir still at .swap, no target.

    The pre-fix rmtree-based swap would leave NO copy at all here; the
    recovery must promote the complete merged .swap.
    """
    path = str(tmp_path / "view")
    _seed(spark, path)
    # build the merged .swap exactly as the sink would, then "crash"
    # after os.replace(path, bak) and before os.replace(tmp, path)
    merged = _df(spark, [("a", 1), ("b", 20), ("c", 3)])
    merged.write.mode("overwrite").parquet(path + ".swap")
    os.replace(path, path + ".old")

    recover_swap(path)
    assert _rows(spark, path) == {("a", 1), ("b", 20), ("c", 3)}
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".swap")


def test_crash_with_only_backup_left(spark, tmp_path):
    """No target, no .swap, only .old → restore the backup verbatim."""
    path = str(tmp_path / "view")
    _seed(spark, path)
    os.replace(path, path + ".old")

    recover_swap(path)
    assert _rows(spark, path) == {("a", 1), ("b", 2)}
    assert not os.path.exists(path + ".old")


def test_stale_swap_with_target_is_discarded(spark, tmp_path):
    """Write finished but swap never started → target wins, .swap is
    dropped (its offset was never committed; redelivery re-merges)."""
    path = str(tmp_path / "view")
    _seed(spark, path)
    _df(spark, [("z", 99)]).write.mode("overwrite").parquet(path + ".swap")

    recover_swap(path)
    assert _rows(spark, path) == {("a", 1), ("b", 2)}
    assert not os.path.exists(path + ".swap")
    # and the next real upsert proceeds normally
    upsert_keyed_parquet(spark, _df(spark, [("b", 20)]), path, "id")
    assert _rows(spark, path) == {("a", 1), ("b", 20)}


def test_leftover_backup_after_completed_swap(spark, tmp_path):
    """Swap completed but .old cleanup didn't run → .old is dropped,
    target untouched."""
    path = str(tmp_path / "view")
    _seed(spark, path)
    shutil.copytree(path, path + ".old")
    upsert_keyed_parquet(spark, _df(spark, [("c", 3)]), path, "id")
    assert _rows(spark, path) == {("a", 1), ("b", 2), ("c", 3)}
    assert not os.path.exists(path + ".old")


def test_first_write_partial_swap_is_discarded(spark, tmp_path):
    """Crash DURING the first-ever merged.write: no target, no .old,
    and a PARTIAL .swap (no _SUCCESS marker). Promoting it would wedge
    every later read on a corrupt target; it must be discarded — the
    offset was never committed, so redelivery regenerates the batch."""
    path = str(tmp_path / "view")
    _df(spark, [("a", 1)]).write.mode("overwrite").parquet(path + ".swap")
    os.remove(path + ".swap/_SUCCESS")  # simulate the interrupted write

    recover_swap(path)
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".swap")
    # the redelivered batch then seeds the view normally
    _seed(spark, path)


def test_first_write_complete_swap_is_promoted(spark, tmp_path):
    """Crash BETWEEN the first-ever write finishing and the swap-in:
    no target, no .old, .swap carries _SUCCESS → it is the complete
    dataset and must be promoted (discarding would be safe but wasteful;
    promoting must at least not corrupt)."""
    path = str(tmp_path / "view")
    _df(spark, [("a", 1), ("b", 2)]).write.mode("overwrite").parquet(path + ".swap")

    recover_swap(path)
    assert _rows(spark, path) == {("a", 1), ("b", 2)}
    assert not os.path.exists(path + ".swap")


def test_no_deletion_before_replacement_exists(spark, tmp_path, monkeypatch):
    """The sink never rmtree's the live target: inject a failure into
    the post-write rename and assert the original data is recoverable."""
    path = str(tmp_path / "view")
    _seed(spark, path)

    real_replace = os.replace
    calls = {"n": 0}

    def flaky_replace(src, dst):
        real_replace(src, dst)
        calls["n"] += 1
        if calls["n"] == 1:  # crash right after renaming target aside
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(os, "replace", flaky_replace)
    try:
        upsert_keyed_parquet(spark, _df(spark, [("b", 20)]), path, "id")
    except RuntimeError:
        pass
    monkeypatch.setattr(os, "replace", real_replace)

    # target is gone, but recovery restores the merged result
    recover_swap(path)
    assert _rows(spark, path) == {("a", 1), ("b", 20)}


def _bucketed_imports():
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.streaming import sink

    return F, sink


def _full_view(spark):
    from pyspark.sql import functions as F

    return spark.range(0, 200).select(F.col("id"), (F.col("id") * 10).alias("val"))


def _rows_of(df):
    return sorted((r.id, r.val) for r in df.collect())


def test_bucketed_upsert_equivalence_and_pruning(spark, tmp_path):
    """The bucket-pruned upsert (a) equals the flat keyed upsert on
    the same batch sequence, (b) leaves UNTOUCHED buckets' manifest
    entries (and thus their immutable data dirs) unchanged — the
    pruning is real, only affected buckets get new dirs — and (c)
    re-delivering a batch converges to the same state."""
    F, sink = _bucketed_imports()

    flat, buck = f"{tmp_path}/flat", f"{tmp_path}/buck"
    full = _full_view(spark)
    sink.upsert_keyed_parquet(spark, full, flat, "id")
    n0 = sink.upsert_keyed_parquet_bucketed(spark, full, buck, "id", n_buckets=8)
    assert n0 == 8  # 200 keys cover all 8 buckets

    before = dict(sink.load_manifest(buck)["buckets"])
    before_files = {
        kb: sorted(os.listdir(f"{buck}/{rel}")) for kb, rel in before.items()
    }

    # small update batch: 3 keys → at most 3 buckets rewritten
    upd = spark.createDataFrame([(5, -1), (6, -2), (7, -3)], "id long, val long")
    sink.upsert_keyed_parquet(spark, upd, flat, "id")
    n1 = sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", n_buckets=8)
    assert 1 <= n1 <= 3
    touched = {
        str(r["kb"])
        for r in upd.withColumn("kb", F.pmod(F.hash(F.col("id")), F.lit(8)))
        .select("kb")
        .distinct()
        .collect()
    }
    after = sink.load_manifest(buck)["buckets"]
    for kb in map(str, range(8)):
        if kb in touched:
            assert after[kb] != before[kb], f"bucket {kb} not rewritten"
        else:
            assert after[kb] == before[kb], f"bucket {kb} re-pointed needlessly"
            # immutability: the untouched bucket's dir is byte-stable
            assert (
                sorted(os.listdir(f"{buck}/{after[kb]}")) == before_files[kb]
            ), f"bucket {kb} files mutated"

    assert _rows_of(sink.read_bucketed_view(spark, buck)) == _rows_of(
        sink.read_view(spark, flat)
    )

    # redelivery: same batch again → same final state
    sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", n_buckets=8)
    assert _rows_of(sink.read_bucketed_view(spark, buck)) == _rows_of(
        sink.read_view(spark, flat)
    )


def test_bucketed_crash_before_manifest_publish(spark, tmp_path, monkeypatch):
    """Crash AFTER the new immutable data dirs are in place but BEFORE
    the manifest publish: the old manifest still names the old dirs,
    so the read serves the pre-upsert state untorn; redelivery then
    converges. The orphan dirs were never referenced by ANY manifest,
    so the per-commit INCREMENTAL GC deliberately leaves them (it
    never lists the data tree); the explicit vacuum() sweeps them."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(spark, _full_view(spark), buck, "id", 8)
    expect_old = _rows_of(sink.read_bucketed_view(spark, buck))

    upd = spark.createDataFrame([(5, -1), (6, -2)], "id long, val long")

    def crash_publish(path, doc):
        raise RuntimeError("simulated crash before manifest publish")

    monkeypatch.setattr(sink, "_publish_manifest", crash_publish)
    try:
        sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", 8)
    except RuntimeError:
        pass
    monkeypatch.undo()

    # nothing committed — the view is exactly the old state
    assert _rows_of(sink.read_bucketed_view(spark, buck)) == expect_old
    # orphan data dirs exist (the crashed commit's output)...
    man = sink.load_manifest(buck)
    live = set(man["buckets"].values())
    all_dirs = {
        f"data/{kb}/{c}"
        for kb in os.listdir(f"{buck}/data")
        for c in os.listdir(f"{buck}/data/{kb}")
    }
    assert all_dirs - live, "expected orphan dirs from the crashed commit"

    # ...redelivery converges; vacuum() then sweeps the orphans
    sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", 8)
    got = dict(_rows_of(sink.read_bucketed_view(spark, buck)))
    assert got[5] == -1 and got[6] == -2 and got[7] == 70
    counts = sink.vacuum(buck, keep_versions=1, grace_seconds=0.0)
    assert counts["data_dirs"] > 0, "vacuum found no crash orphans"
    man = sink.load_manifest(buck)
    live = set(man["buckets"].values())
    all_dirs = {
        f"data/{kb}/{c}"
        for kb in os.listdir(f"{buck}/data")
        for c in os.listdir(f"{buck}/data/{kb}")
    }
    assert all_dirs == live, "vacuum left unreferenced data dirs behind"
    # and the view still reads clean after the sweep
    got = dict(_rows_of(sink.read_bucketed_view(spark, buck)))
    assert got[5] == -1 and got[6] == -2 and got[7] == 70


def test_bucketed_torn_manifest_rename_not_atomic(spark, tmp_path, monkeypatch):
    """THE object-store window the manifest protocol exists for: the
    manifest publish's rename is NOT atomic (copy-then-delete, crashes
    mid-copy), leaving a PARTIAL highest-version manifest file. The
    reader must detect the tear (checksum/parse failure) and fall back
    to the previous committed version — never serve a torn commit,
    never lose the old rows."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(spark, _full_view(spark), buck, "id", 8)
    expect_old = _rows_of(sink.read_bucketed_view(spark, buck))
    v_old = sink.load_manifest(buck)["version"]

    def torn_cas(src, dst):
        # simulate a non-atomic publish (object-store PUT): half the
        # bytes land at the final name, then the "machine dies"
        data = open(src, "rb").read()
        with open(dst, "wb") as f:
            f.write(data[: len(data) // 2])
        raise RuntimeError("simulated crash mid-PUT")

    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    monkeypatch.setattr(sink, "_cas_create", torn_cas)
    try:
        sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", 8)
    except RuntimeError:
        pass
    monkeypatch.undo()

    # the torn higher-version manifest exists on disk...
    mdir = f"{buck}/_manifests"
    torn = [n for n in os.listdir(mdir) if n.endswith(f"{v_old + 1:020d}.json")]
    assert torn, "expected the torn manifest file to be present"
    # ...but the reader skips it and serves the previous version intact
    assert sink.load_manifest(buck)["version"] == v_old
    assert _rows_of(sink.read_bucketed_view(spark, buck)) == expect_old

    # redelivery publishes a GOOD manifest. The torn file's NAME is
    # never reclaimed (check-then-remove would be a TOCTOU that can
    # delete a competitor's committed manifest) — the publisher bumps
    # PAST it and readers take the highest version that checksums clean
    sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", 8)
    assert sink.load_manifest(buck)["version"] == v_old + 2
    assert os.path.exists(f"{mdir}/manifest-{v_old + 1:020d}.json"), (
        "torn name must be bumped past, not deleted (TOCTOU)"
    )
    got = dict(_rows_of(sink.read_bucketed_view(spark, buck)))
    assert got[5] == -1 and got[6] == 60


def test_bucketed_concurrent_publish_loses_cas_and_remerges(
    spark, tmp_path, monkeypatch
):
    """Optimistic concurrency: writer A merges against manifest v1;
    before A publishes v2, a COMPETING writer publishes its own v2.
    A's create-exclusive CAS must fail (no silent overwrite — that
    would discard the competitor's commit), and A must re-merge
    against the competitor's manifest and land at v3 with BOTH
    writers' rows present."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(spark, _full_view(spark), buck, "id", 8)

    competing = spark.createDataFrame([(7, -9)], "id long, val long")
    state = {"fired": False}
    real_publish = sink._publish_manifest

    def racing_publish(path, doc):
        if not state["fired"]:
            state["fired"] = True
            # the competitor lands v2 first (recursive upsert uses the
            # real publish via the restored attribute inside)
            monkeypatch.setattr(sink, "_publish_manifest", real_publish)
            sink.upsert_keyed_parquet_bucketed(spark, competing, buck, "id", 8)
            monkeypatch.setattr(sink, "_publish_manifest", racing_publish)
        return real_publish(path, doc)

    monkeypatch.setattr(sink, "_publish_manifest", racing_publish)
    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", 8)
    monkeypatch.undo()

    man = sink.load_manifest(buck)
    assert man["version"] == 3  # v1 seed, v2 competitor, v3 re-merged A
    got = dict(_rows_of(sink.read_bucketed_view(spark, buck)))
    assert got[5] == -1, "writer A's row lost"
    assert got[7] == -9, "competing writer's row silently overwritten"
    assert len(got) == 200


def test_bucketed_stamped_bucket_count_wins(spark, tmp_path):
    """A later caller passing a DIFFERENT n_buckets (e.g. buckets_for
    re-derived after the view grew past a power-of-two boundary) must
    not fork the layout into two coexisting hash%n schemes: the count
    stamped in the manifest at creation wins, so keys keep landing in
    their original buckets and no duplicates appear on read."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(spark, _full_view(spark), buck, "id", 8)
    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    # drifted caller: passes 32, stamped count is 8
    sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", n_buckets=32)
    man = sink.load_manifest(buck)
    assert man["n_buckets"] == 8
    assert set(man["buckets"]) <= {str(i) for i in range(8)}
    rows = _rows_of(sink.read_bucketed_view(spark, buck))
    assert len(rows) == 200  # no duplicate keys from a forked layout
    assert dict(rows)[5] == -1

    # and a mismatched KEY is refused outright
    import pytest

    with pytest.raises(ValueError, match="keyed by"):
        sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "val", 8)


def test_buckets_for_sizing_rule():
    """Bucket count derives from a TARGET BUCKET SIZE (~1 GiB): floors
    at 16 for toy views, rounds up to powers of two, and lands near
    view_bytes/1GiB at scale — the 100-TB math in the docstring."""
    from etl_sprint_2_5_spark.streaming.sink import buckets_for

    assert buckets_for(0) == 16
    assert buckets_for(10 * 1024 * 1024) == 16  # 10 MB toy view
    gib = 1 << 30
    assert buckets_for(100 * gib) == 128  # 100 buckets -> next pow2
    n = buckets_for(100 * 1024 * gib)  # 100 TB
    assert 100_000 <= n <= 1 << 17  # ~100k buckets, pow2-rounded
    assert n & (n - 1) == 0  # power of two
    # custom target bucket size is respected
    assert buckets_for(64 * gib, target_bucket_bytes=4 * gib) == 16


def test_bucketed_time_travel_reads_retained_versions(spark, tmp_path):
    """keep_versions > 1 retains older manifests (and the data dirs
    they reference) for time-travel reads: version v-1 serves the
    pre-upsert snapshot, versions past the retention window are GC'd
    and raise, and retention costs only the REWRITTEN buckets — the
    untouched ones share their immutable dirs across versions."""
    import pytest

    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(
        spark, _full_view(spark), buck, "id", 8, keep_versions=2
    )  # v1
    v1_rows = _rows_of(sink.read_bucketed_view(spark, buck))

    upd2 = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(spark, upd2, buck, "id", 8, keep_versions=2)  # v2
    v2_rows = _rows_of(sink.read_bucketed_view(spark, buck))

    # time travel: v1 snapshot still readable, intact
    assert _rows_of(sink.read_bucketed_view(spark, buck, version=1)) == v1_rows
    assert dict(v2_rows)[5] == -1 and dict(v1_rows)[5] == 50

    # retention shares untouched buckets: v1 and v2 manifests differ
    # only in the bucket upd2's key landed in
    m1, m2 = sink.load_manifest(buck, version=1), sink.load_manifest(buck, version=2)
    diff = {kb for kb in m2["buckets"] if m2["buckets"][kb] != m1["buckets"][kb]}
    assert len(diff) == 1

    upd3 = spark.createDataFrame([(6, -2)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(spark, upd3, buck, "id", 8, keep_versions=2)  # v3

    # v1 is now past the retention window: manifest gone, read raises
    assert sink.load_manifest(buck, version=1) is None
    with pytest.raises(FileNotFoundError, match="version 1"):
        sink.read_bucketed_view(spark, buck, version=1)
    # v2 still readable and intact (its replaced dirs were retained)
    assert _rows_of(sink.read_bucketed_view(spark, buck, version=2)) == v2_rows
    got = dict(_rows_of(sink.read_bucketed_view(spark, buck)))
    assert got[5] == -1 and got[6] == -2


# ------------------------------------------------------------------
# Round-10 hardening: incremental GC, vacuum, TOCTOU-free publish,
# reader grace window + re-resolve retry.
# ------------------------------------------------------------------


def test_gc_incremental_never_lists_data_tree(spark, tmp_path, monkeypatch):
    """The per-commit GC must be O(changed buckets): at the 100-TB
    sizing (~100k buckets) a full-tree sweep is ~100k object-store
    LISTs per commit. Instrument os.listdir and assert a commit never
    lists anything under data/ — only the (small) manifest dir."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(spark, _full_view(spark), buck, "id", 8)

    listed = []
    real_listdir = os.listdir

    def spying_listdir(p="."):
        listed.append(str(p))
        return real_listdir(p)

    monkeypatch.setattr(os, "listdir", spying_listdir)
    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", 8)
    monkeypatch.undo()

    data_lists = [p for p in listed if f"{buck}/data" in p]
    assert not data_lists, f"commit listed the data tree: {data_lists}"
    # the superseded bucket's old dir was still swept (set algebra on
    # the manifests in hand, no listing needed): run to keep_versions=1
    # depth and verify the replaced dir is gone
    sink.upsert_keyed_parquet_bucketed(
        spark, upd, buck, "id", 8, keep_versions=1
    )


def test_gc_spares_foreign_stage_and_tmp(spark, tmp_path):
    """A CONCURRENT writer's in-flight _stage-* dir and .tmp-* manifest
    must survive another writer's commit+GC — sweeping them would break
    the concurrent write or orphan its about-to-be-published data dirs
    (committed data loss). Only the explicit vacuum() sweeps them, and
    only past its grace window."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(spark, _full_view(spark), buck, "id", 8)

    foreign_stage = f"{buck}/_stage-feedface0001"
    os.makedirs(foreign_stage)
    open(f"{foreign_stage}/part-00000.parquet", "wb").write(b"inflight")
    foreign_tmp = f"{buck}/_manifests/.tmp-feedface0001"
    open(foreign_tmp, "w").write("{}")

    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(spark, upd, buck, "id", 8)

    assert os.path.isdir(foreign_stage), "commit GC swept a foreign stage dir"
    assert os.path.exists(foreign_tmp), "commit GC swept a foreign tmp manifest"

    # a graced vacuum (grace >> in-flight write time) also spares them
    counts = sink.vacuum(buck, grace_seconds=3600)
    assert os.path.isdir(foreign_stage) and os.path.exists(foreign_tmp)
    assert counts["stage"] == 0 and counts["tmp"] == 0
    # an aged sweep (grace elapsed -> the writer is dead) removes them
    counts = sink.vacuum(buck, grace_seconds=0.0)
    assert counts["stage"] == 1 and counts["tmp"] == 1
    assert not os.path.exists(foreign_stage) and not os.path.exists(foreign_tmp)


def test_publish_never_overwrites_committed_version(spark, tmp_path):
    """The CAS contract without the TOCTOU: when a GOOD manifest holds
    the requested version, _publish_manifest must lose (return None)
    and leave the committed file byte-identical — never check-then-
    remove it (the round-9 reclaim could delete a competitor's commit
    published between the check and the remove)."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(spark, _full_view(spark), buck, "id", 8)
    man = sink.load_manifest(buck)
    fp = f"{buck}/_manifests/manifest-{man['version']:020d}.json"
    before = open(fp, "rb").read()

    rival = {k: v for k, v in man.items() if k != "checksum"}
    rival["buckets"] = dict(man["buckets"])  # same version, rival content
    assert sink._publish_manifest(buck, rival) is None
    assert open(fp, "rb").read() == before, "committed manifest was touched"

    # and a torn file at the requested version is bumped PAST, not
    # deleted: the publish lands at version+1 with the torn file intact
    torn_fp = f"{buck}/_manifests/manifest-{man['version'] + 1:020d}.json"
    open(torn_fp, "w").write('{"version": ')  # torn half-write
    rival["version"] = man["version"] + 1
    got_v = sink._publish_manifest(buck, rival)
    assert got_v == man["version"] + 2
    assert open(torn_fp).read() == '{"version": ', "torn file was reclaimed"
    assert sink.load_manifest(buck)["version"] == man["version"] + 2


def test_gc_grace_window_defers_sweep(spark, tmp_path):
    """gc_grace_seconds is the reader grace window: even with
    keep_versions=1, snapshots superseded more recently than the grace
    survive the commit's GC (an in-flight reader can finish its scan);
    once the grace elapses a later commit sweeps them."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(
        spark, _full_view(spark), buck, "id", 8, keep_versions=1
    )  # v1
    v1_rows = _rows_of(sink.read_bucketed_view(spark, buck))

    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(
        spark, upd, buck, "id", 8, keep_versions=1, gc_grace_seconds=3600
    )  # v2 — v1 superseded but inside the grace window
    assert sink.load_manifest(buck, version=1) is not None
    assert _rows_of(sink.read_bucketed_view(spark, buck, version=1)) == v1_rows

    upd3 = spark.createDataFrame([(6, -2)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(
        spark, upd3, buck, "id", 8, keep_versions=1, gc_grace_seconds=0.0
    )  # v3 — grace elapsed: v1 and v2 swept
    assert sink.load_manifest(buck, version=1) is None
    assert sink.load_manifest(buck, version=2) is None
    got = dict(_rows_of(sink.read_bucketed_view(spark, buck)))
    assert got[5] == -1 and got[6] == -2 and len(got) == 200


def test_stale_reader_reresolves_after_commit_gc(spark, tmp_path):
    """The residual reader race: a DataFrame resolved at version v
    scans lazily; a concurrent writer publishes v+1 and GC sweeps v's
    replaced dirs (keep_versions=1, no grace) before the reader
    actions. The returned view must catch the vanished-file failure,
    re-resolve the LATEST manifest once, and serve the fresh result —
    not die with FileNotFoundException."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(
        spark, _full_view(spark), buck, "id", 8, keep_versions=1
    )
    stale = sink.read_bucketed_view(spark, buck)  # resolves v1's dirs

    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(
        spark, upd, buck, "id", 8, keep_versions=1
    )  # v2 + GC: v1's replaced dir is gone

    got = dict((r.id, r.val) for r in stale.collect())  # re-resolved
    assert got[5] == -1 and len(got) == 200
    assert stale.count() == 200


def test_stale_pinned_version_read_raises_after_gc(spark, tmp_path):
    """A version-PINNED stale reader past the retention window must
    fail loudly (the snapshot is genuinely gone — re-resolving to a
    different version would silently change query semantics)."""
    import pytest

    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(
        spark, _full_view(spark), buck, "id", 8, keep_versions=1
    )
    pinned = sink.read_bucketed_view(spark, buck, version=1)

    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(
        spark, upd, buck, "id", 8, keep_versions=1
    )

    with pytest.raises(Exception) as ei:
        pinned.collect()
    assert "version 1" in str(ei.value) or "FileNotFound" in str(ei.value)


def test_bucketed_sink_model_based_op_sequences(spark, tmp_path):
    """Model-based property test of the manifest sink: hypothesis
    drives random upsert sequences and the sink must agree, at every
    retained version, with a plain dict model maintained alongside.

    Each generated example is a sequence of 1-5 upsert batches (dicts,
    so intra-batch keys are unique — the sink's merge contract).
    Invariants checked after the sequence:
    - the latest view equals the model exactly (count AND values);
    - every retained version's time-travel read equals the model
      snapshot taken right after that commit — and a version inside
      the keep_versions window MUST be readable (a FileNotFound there
      is over-eager GC);
    - a version read that raises FileNotFoundError is only legal past
      the retention window (under-retention is the data-loss side);
    - an explicit vacuum(grace=0) changes NOTHING visible: latest and
      newest-retained reads are bit-identical after the sweep.

    This generalizes the hand-constructed crash-window tests above:
    those pin specific torn states; this pins the sink's end-to-end
    snapshot algebra over arbitrary commit sequences."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_sprint_2_5_spark.streaming import sink

    KEEP = 3
    keys = st.sampled_from(list("abcdefgh"))
    batch = st.dictionaries(keys, st.integers(0, 99), min_size=1, max_size=4)
    seq = st.lists(batch, min_size=1, max_size=5)
    counter = iter(range(10**6))

    @given(batches=seq)
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def run(batches):
        path = str(tmp_path / f"model_view_{next(counter)}")
        model: dict[str, int] = {}
        snaps: dict[int, dict[str, int]] = {}
        for b in batches:
            df = spark.createDataFrame(
                sorted(b.items()), "id string, val int"
            )
            sink.upsert_keyed_parquet_bucketed(
                spark, df, path, "id", n_buckets=4, keep_versions=KEEP
            )
            model.update(b)
            snaps[len(snaps) + 1] = dict(model)
        latest = len(snaps)

        got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
        assert got == model

        for v, snap in snaps.items():
            try:
                at_v = dict(
                    _rows_of(sink.read_bucketed_view(spark, path, version=v))
                )
            except FileNotFoundError:
                assert v <= latest - KEEP, (
                    f"version {v} of {latest} GC'd inside keep_versions={KEEP}"
                )
                continue
            assert at_v == snap, f"time-travel read of v{v} diverged"

        sink.vacuum(path, keep_versions=KEEP, grace_seconds=0.0)
        assert dict(_rows_of(sink.read_bucketed_view(spark, path))) == model
        newest_retained = max(1, latest - KEEP + 1)
        assert (
            dict(
                _rows_of(
                    sink.read_bucketed_view(
                        spark, path, version=newest_retained
                    )
                )
            )
            == snaps[newest_retained]
        )

    run()


def _bdf(spark, rows):
    return spark.createDataFrame(rows, "id string, val int")


def _keys_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_delete_keys_bucketed_basic(spark, tmp_path):
    """DELETE removes exactly the doomed keys, bumps the version, and
    (within keep_versions) leaves the pre-delete snapshot time-travel
    readable; deleting keys that don't exist is a no-op that rewrites
    nothing when no doomed key maps to a live bucket."""
    from etl_sprint_2_5_spark.streaming import sink

    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, [("a", 1), ("b", 2), ("c", 3), ("d", 4)]),
        path, "id", n_buckets=4, keep_versions=3,
    )
    n = sink.delete_keys_bucketed(
        spark, _keys_df(spark, ["b", "d"]), path, "id", keep_versions=3
    )
    assert n >= 1
    assert _rows_of(sink.read_bucketed_view(spark, path)) == [
        ("a", 1), ("c", 3)
    ]
    # pre-delete snapshot retained for time travel
    assert _rows_of(sink.read_bucketed_view(spark, path, version=1)) == [
        ("a", 1), ("b", 2), ("c", 3), ("d", 4)
    ]
    # deleting an absent key leaves the view untouched
    before = _rows_of(sink.read_bucketed_view(spark, path))
    sink.delete_keys_bucketed(spark, _keys_df(spark, ["zz"]), path, "id")
    assert _rows_of(sink.read_bucketed_view(spark, path)) == before
    # delete on a never-committed view is a 0-bucket no-op
    assert (
        sink.delete_keys_bucketed(
            spark, _keys_df(spark, ["a"]), str(tmp_path / "nope"), "id"
        )
        == 0
    )


def test_delete_empties_bucket_and_whole_view(spark, tmp_path):
    """A bucket whose every row is deleted DROPS OUT of the manifest
    (the upsert path's keep-old-entry rule would resurrect the dead
    rows); deleting every key leaves buckets == {} and the documented
    no-committed-view FileNotFoundError on read."""
    import pytest as _pytest

    from etl_sprint_2_5_spark.streaming import sink

    path = str(tmp_path / "view")
    rows = [(f"k{i}", i) for i in range(12)]
    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, rows), path, "id", n_buckets=3, keep_versions=1
    )
    man = sink.load_manifest(path)
    # pick one live bucket and delete exactly its keys
    kb_target = int(next(iter(man["buckets"])))
    import pyspark.sql.functions as _F

    full = sink.read_bucketed_view(spark, path)
    mine = [
        r["id"]
        for r in full.withColumn(
            "_kb", _F.pmod(_F.hash(_F.col("id")), _F.lit(3))
        )
        .where(_F.col("_kb") == kb_target)
        .collect()
    ]
    assert mine
    sink.delete_keys_bucketed(
        spark, _keys_df(spark, mine), path, "id", keep_versions=1
    )
    man2 = sink.load_manifest(path)
    assert str(kb_target) not in man2["buckets"]
    survivors = _rows_of(sink.read_bucketed_view(spark, path))
    assert survivors == sorted(
        (k, v) for k, v in rows if k not in set(mine)
    )
    # erase everything that's left
    sink.delete_keys_bucketed(
        spark,
        _keys_df(spark, [k for k, _ in rows]),
        path,
        "id",
        keep_versions=1,
    )
    assert sink.load_manifest(path)["buckets"] == {}
    with _pytest.raises(FileNotFoundError):
        sink.read_bucketed_view(spark, path)


def test_delete_physical_erasure_outside_retention(spark, tmp_path):
    """With keep_versions=1 the delete commit's own GC removes the
    superseded dirs: afterwards EVERY c-* dir on disk is referenced by
    the sole retained manifest (orphan-free), so the forgotten rows
    are physically gone, and the old version is unreadable."""
    import glob as _glob

    import pytest as _pytest

    from etl_sprint_2_5_spark.streaming import sink

    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, [(f"u{i}", i) for i in range(20)]),
        path, "id", n_buckets=4, keep_versions=1,
    )
    sink.delete_keys_bucketed(
        spark,
        _keys_df(spark, [f"u{i}" for i in range(0, 20, 2)]),
        path,
        "id",
        keep_versions=1,
    )
    man = sink.load_manifest(path)
    referenced = {
        os.path.normpath(os.path.join(path, rel))
        for rel in man["buckets"].values()
    }
    on_disk = {
        os.path.normpath(p)
        for p in _glob.glob(os.path.join(path, "data", "kb=*", "c-*"))
    }
    assert on_disk == referenced  # orphan-free ⇒ erasure is physical
    # survivors intact, forgotten keys gone from every retained byte
    got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got == {f"u{i}": i for i in range(1, 20, 2)}
    with _pytest.raises(FileNotFoundError):
        sink.read_bucketed_view(spark, path, version=1)


# Round-11 hardening: below-latest publish detection, per-successor
# GC grace, conservative vacuum default, narrowed vanished-file
# matcher, and the genuine two-process CAS race.


def test_publish_below_latest_is_lost_race(tmp_path):
    """The lost-update hole: GC frees superseded manifest FILE NAMES,
    so a stale writer that loaded v1 and stalled while v2/v3 published
    and GC ran finds the name v2 free. Its publish must be reported as
    a LOST RACE (None) — not a 'success' at a version below latest
    that no reader will ever take."""
    from etl_sprint_2_5_spark.streaming import sink

    path = str(tmp_path / "view")
    for v in (1, 2, 3):
        doc = {
            "version": v,
            "key": "id",
            "n_buckets": 1,
            "buckets": {"0": f"data/kb=0/c-{v}"},
        }
        assert sink._publish_manifest(path, doc) == v
    mdir = os.path.join(path, sink._MANIFEST_DIR)
    for v in (1, 2):  # what keep_versions=1 GC does: frees the names
        os.remove(os.path.join(mdir, f"manifest-{v:020d}.json"))

    stale = {
        "version": 2,  # based on the long-gone v1
        "key": "id",
        "n_buckets": 1,
        "buckets": {"0": "data/kb=0/c-stale"},
    }
    assert sink._publish_manifest(path, stale) is None
    latest = sink.load_manifest(path)
    assert int(latest["version"]) == 3
    assert latest["buckets"]["0"] == "data/kb=0/c-3"
    # and no stray below-latest manifest file was left behind
    names = sorted(os.listdir(mdir))
    assert names == ["manifest-00000000000000000003.json"]


def test_gc_grace_gates_per_successor_not_globally(spark, tmp_path):
    """With commits faster than the grace, a GLOBAL youngest-retained
    gate would never sweep anything (unbounded accumulation). The
    per-successor gate must sweep v1 once its successor v2 has aged
    past the grace — while v2's own replaced dirs, superseded only by
    the fresh v3, stay readable."""
    F, sink = _bucketed_imports()

    buck = f"{tmp_path}/buck"
    sink.upsert_keyed_parquet_bucketed(
        spark, _full_view(spark), buck, "id", 8, keep_versions=1
    )  # v1
    refs1 = sink._manifest_refs(sink.load_manifest(buck))

    upd = spark.createDataFrame([(5, -1)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(
        spark, upd, buck, "id", 8, keep_versions=1, gc_grace_seconds=3600
    )  # v2 — v1 superseded but successor (v2) fresh: nothing swept
    refs2 = sink._manifest_refs(sink.load_manifest(buck))
    assert all(os.path.exists(os.path.join(buck, r)) for r in refs1)

    # age v2's manifest past the grace → v1 becomes sweepable; v2's
    # dirs (superseded by the imminent fresh v3) must survive
    mdir = os.path.join(buck, sink._MANIFEST_DIR)
    v2fp = os.path.join(mdir, "manifest-00000000000000000002.json")
    old = time.time() - 7200
    os.utime(v2fp, (old, old))

    upd3 = spark.createDataFrame([(5, -2)], "id long, val long")
    sink.upsert_keyed_parquet_bucketed(
        spark, upd3, buck, "id", 8, keep_versions=1, gc_grace_seconds=3600
    )  # v3
    refs3 = sink._manifest_refs(sink.load_manifest(buck))
    dead1 = refs1 - refs2 - refs3  # v1's replaced dir(s)
    dead2 = refs2 - refs3  # v2's replaced dir(s), inside grace
    assert dead1 and dead2
    assert not any(os.path.exists(os.path.join(buck, r)) for r in dead1)
    assert all(os.path.exists(os.path.join(buck, r)) for r in dead2)


def test_vacuum_default_grace_spares_inflight_writers(tmp_path):
    """vacuum() with DEFAULT args must never sweep a concurrent
    writer's fresh _stage-* dirs or .tmp-* manifests (the old 0.0
    default made a default-arg call destructive); explicit grace 0 is
    the quiesced-view opt-in."""
    from etl_sprint_2_5_spark.streaming import sink

    path = str(tmp_path / "view")
    os.makedirs(os.path.join(path, "_stage-abc"))
    mdir = os.path.join(path, sink._MANIFEST_DIR)
    os.makedirs(mdir)
    with open(os.path.join(mdir, ".tmp-xyz"), "w") as f:
        f.write("{}")

    counts = sink.vacuum(path)  # default grace: conservative
    assert counts == {"stage": 0, "tmp": 0, "manifests": 0, "data_dirs": 0}
    assert os.path.isdir(os.path.join(path, "_stage-abc"))

    counts = sink.vacuum(path, grace_seconds=0.0)
    assert counts["stage"] == 1 and counts["tmp"] == 1
    assert not os.path.exists(os.path.join(path, "_stage-abc"))


def test_vanished_file_matcher_is_narrow():
    """Only file-scan markers may trigger the silent re-resolve retry
    — a generic 'does not exist' would also catch analysis/wrong-path
    errors and mask the real error class behind a NEWER snapshot."""
    from etl_sprint_2_5_spark.streaming.sink import _is_vanished_file_error

    assert _is_vanished_file_error(
        Exception("java.io.FileNotFoundException: /x/part-0.parquet")
    )
    assert _is_vanished_file_error(
        Exception("[FAILED_READ_FILE.FILE_NOT_EXIST] File /x does not exist")
    )
    assert _is_vanished_file_error(Exception("[PATH_NOT_FOUND] Path ..."))
    assert not _is_vanished_file_error(
        Exception("Table or view `t` does not exist")
    )
    assert not _is_vanished_file_error(Exception("column v does not exist"))


def _cas_race_writer(path, who, rounds, barrier, losses):
    """Forked-child writer: the REAL manifest protocol (load, merge,
    publish via os.link CAS) with pyarrow doing the data I/O — no
    Spark in the child, no serialization shims between the racers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_sprint_2_5_spark.streaming import sink

    for i in range(rounds):
        barrier.wait()  # release both writers into the same commit
        while True:
            man = sink.load_manifest(path)
            rows: dict[str, int] = {}
            if man and man["buckets"]:
                t = pq.read_table(os.path.join(path, man["buckets"]["0"]))
                rows = dict(
                    zip(t.column("id").to_pylist(), t.column("v").to_pylist())
                )
            rows[who] = i  # the keyed upsert (re-merge each attempt)
            commit = uuid.uuid4().hex[:12]
            rel = f"data/kb=0/c-{commit}"
            os.makedirs(os.path.join(path, rel), exist_ok=True)
            ids = sorted(rows)
            pq.write_table(
                pa.table({"id": ids, "v": [rows[k] for k in ids]}),
                os.path.join(path, rel, "part-0.parquet"),
            )
            doc = {
                "version": (int(man["version"]) + 1) if man else 1,
                "key": "id",
                "n_buckets": 1,
                "buckets": {"0": rel},
            }
            if sink._publish_manifest(path, doc) is not None:
                break
            with losses.get_lock():
                losses.value += 1


def test_two_process_cas_race(tmp_path):
    """Two REAL processes race the manifest CAS over 20 barriered
    rounds: every version must be won by exactly one writer, the
    loser's re-merge must preserve BOTH row sets, and the final view
    must hold each writer's last value. In-process interleavings can't
    prove os.link create-exclusivity across processes — this does."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    from etl_sprint_2_5_spark.streaming import sink

    ctx = mp.get_context("fork")
    path = str(tmp_path / "view")
    ROUNDS = 20
    barrier = ctx.Barrier(2)
    losses = ctx.Value("i", 0)
    procs = [
        ctx.Process(
            target=_cas_race_writer, args=(path, who, ROUNDS, barrier, losses)
        )
        for who in ("A", "B")
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0, f"writer died: exitcode={p.exitcode}"

    man = sink.load_manifest(path)
    # 2 writers x 20 rounds, every publish a distinct version, none
    # lost, none below latest: exactly 2*ROUNDS commits
    assert int(man["version"]) == 2 * ROUNDS
    t = pq.read_table(os.path.join(path, man["buckets"]["0"]))
    final = dict(zip(t.column("id").to_pylist(), t.column("v").to_pylist()))
    assert final == {"A": ROUNDS - 1, "B": ROUNDS - 1}
    # the barrier makes same-version collisions effectively certain
    # across 20 rounds; zero losses would mean the race never happened
    assert losses.value >= 1, "no CAS contention was exercised"


def test_two_process_delta_append_vs_compact(spark, tmp_path):
    """Two REAL processes race the delta path's cheap half of
    optimistic concurrency: one appends delta commits (each a brand-new
    key) while the other compacts the log, publishes aligned by a
    barrier placed immediately before each side's first CAS attempt so
    same-version collisions actually happen. Must hold: no delta
    commit is ever lost (every appended key survives into the final
    merged read, whether its commit is still pending or was folded),
    no key duplicates (a blind re-append after a lost CAS would leave
    a key twice in the log), and at least one real CAS loss occurred
    (otherwise the race was never exercised). The in-process suite
    covers these interleavings with monkeypatches; this covers them
    with os.link create-exclusivity across process boundaries, each
    child driving the REAL sink functions under its own SparkSession
    (tests/_delta_race_child.py)."""
    import multiprocessing as mp

    from etl_sprint_2_5_spark.streaming import sink
    from tests import _delta_race_child as child

    path = str(tmp_path / "view")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(40)], "id long, val long"
    )
    sink.upsert_keyed_parquet_bucketed(
        spark, base, path, "id", 4, keep_versions=4
    )
    model = {i: i * 10 for i in range(40)}

    ROUNDS = 6
    ctx = mp.get_context("spawn")  # clean children: no inherited JVM
    start_barrier = ctx.Barrier(2)
    pub_barrier = ctx.Barrier(2)
    losses = ctx.Value("i", 0)
    n_compacted = ctx.Value("i", 0)
    pa = ctx.Process(
        target=child.append_worker,
        args=(path, str(tmp_path), ROUNDS, start_barrier, pub_barrier,
              losses),
    )
    pc = ctx.Process(
        target=child.compact_worker,
        args=(path, str(tmp_path), ROUNDS, start_barrier, pub_barrier,
              losses, n_compacted),
    )
    pa.start()
    pc.start()
    for p, who in ((pa, "appender"), (pc, "compactor")):
        p.join(timeout=420)
        if p.is_alive():
            p.terminate()
            p.join(10)
            pytest.fail(f"{who} hung")
        assert p.exitcode == 0, f"{who} died: exitcode={p.exitcode}"

    for i in range(ROUNDS):
        model[1000 + i] = -i
    got = {}
    dup = []
    for r in sink.read_bucketed_view(spark, path).collect():
        if r.id in got:
            dup.append(r.id)
        got[r.id] = r.val
    assert not dup, f"duplicated keys after the race: {dup}"
    assert got == model, (
        "delta commit lost or corrupted across the append/compact race: "
        f"missing={sorted(set(model) - set(got))} "
        f"wrong={[k for k in got if got.get(k) != model.get(k)]}"
    )
    # the race must have actually happened: the publish barrier makes
    # same-version CAS collisions near-certain across 6 aligned rounds
    assert losses.value >= 1, "no CAS contention was exercised"
    assert n_compacted.value >= 1, "compactor never folded anything"


def test_two_process_split_vs_upsert(spark, tmp_path):
    """Two REAL processes race an ONLINE bucket-count migration against
    rewrite-mode upserts: one splits one old bucket per round
    (4->8, buckets_per_call=1) while the other updates an existing key
    and inserts a brand-new key per round, publishes aligned by a
    barrier before each side's first CAS attempt. Must hold: the
    migration COMPLETES (n_buckets=8, marker dropped) even though
    upserts kept landing mid-migration; every upsert survives (updated
    values and new keys present — a dropped rebucket marker would fork
    split buckets' keys into duplicate dirs, a stale-layout commit
    would orphan them); no key is duplicated; and at least one real
    CAS loss occurred. The in-process suite proves these interleavings
    with monkeypatches; this proves them with os.link
    create-exclusivity across process boundaries, each child driving
    the REAL sink functions under its own SparkSession
    (tests/_split_race_child.py)."""
    import multiprocessing as mp

    from etl_sprint_2_5_spark.streaming import sink
    from tests import _split_race_child as child

    path = str(tmp_path / "view")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(60)], "id long, val long"
    )
    sink.upsert_keyed_parquet_bucketed(
        spark, base, path, "id", 4, keep_versions=8
    )
    model = {i: i * 10 for i in range(60)}

    ROUNDS = 4  # == base bucket count: the migration completes exactly
    ctx = mp.get_context("spawn")  # clean children: no inherited JVM
    start_barrier = ctx.Barrier(2)
    pub_barrier = ctx.Barrier(2)
    losses = ctx.Value("i", 0)
    n_split = ctx.Value("i", 0)
    ps = ctx.Process(
        target=child.split_worker,
        args=(path, str(tmp_path), ROUNDS, start_barrier, pub_barrier,
              losses, n_split),
    )
    pu = ctx.Process(
        target=child.upsert_worker,
        args=(path, str(tmp_path), ROUNDS, start_barrier, pub_barrier,
              losses),
    )
    ps.start()
    pu.start()
    for p, who in ((ps, "splitter"), (pu, "upserter")):
        p.join(timeout=420)
        if p.is_alive():
            p.terminate()
            p.join(10)
            pytest.fail(f"{who} hung")
        assert p.exitcode == 0, f"{who} died: exitcode={p.exitcode}"

    for i in range(ROUNDS):
        model[i] = -i
        model[2000 + i] = -i
    man = sink.load_manifest(path)
    assert int(man["n_buckets"]) == 8, "migration did not complete"
    assert "rebucket" not in man, "migration marker left behind"
    assert n_split.value == 4
    got = {}
    dup = []
    for r in sink.read_bucketed_view(spark, path).collect():
        if r.id in got:
            dup.append(r.id)
        got[r.id] = r.val
    assert not dup, f"duplicated keys after the race: {dup}"
    assert got == model, (
        "upsert lost or misrouted across the migration race: "
        f"missing={sorted(set(model) - set(got))} "
        f"wrong={[k for k in got if got.get(k) != model.get(k)]}"
    )
    assert losses.value >= 1, "no CAS contention was exercised"
