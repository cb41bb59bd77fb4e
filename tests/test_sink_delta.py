"""Log-structured delta commits in the manifest sink.

The rewrite-mode upsert pays O(touched buckets) I/O per commit — at
the 100-TB sizing that is ~1 GiB per touched bucket even for a 1-row
change. ``upsert_keyed_parquet_delta`` / ``delete_keys_delta`` must
pay O(batch) instead (append a delta commit, merge on read), and
``compact_bucketed_view`` must fold the log back into bases through
the same CAS with nothing visible changing. These tests pin:

- merge semantics (newest commit's row-SET wins per key, tombstones
  drop, multi-row-per-key batches preserved);
- the O(batch) write-cost claim (a 1-key delta writes a sliver of the
  bytes the bucket rewrite pays, and touches NO base dir);
- mode exclusivity (rewrite-mode calls raise on pending deltas);
- compaction (touched-buckets-only rewrite, emptied buckets drop,
  read-back identical, physical erasure of tombstoned bytes once
  superseded snapshots leave retention);
- crash/GC behavior (unpublished delta dirs invisible; vacuum sweeps
  them; time-travel across delta versions inside retention).
"""

from __future__ import annotations

import json
import os

import pytest


def _imports():
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.streaming import sink

    return F, sink


def _bdf(spark, rows):
    return spark.createDataFrame(rows, "id long, val long")


def _rows_of(df):
    return sorted((r.id, r.val) for r in df.collect())


def _dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _seed_base(spark, sink, path, n=200, n_buckets=8):
    from pyspark.sql import functions as F

    base = spark.range(0, n).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )
    sink.upsert_keyed_parquet_bucketed(
        spark, base, path, "id", n_buckets, keep_versions=3
    )
    return {i: i * 10 for i in range(n)}


def test_delta_upsert_merge_and_time_travel(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    model = _seed_base(spark, sink, path)  # v1 (base)

    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -1), (6, -2)]), path, "id", keep_versions=3
    )  # v2
    model[5], model[6] = -1, -2
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -100), (300, 7)]), path, "id", keep_versions=3
    )  # v3: later delta beats earlier delta; new key inserted
    model[5], model[300] = -100, 7

    got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got == model

    # time travel: v2 sees the first delta only, v1 the pure base
    at2 = dict(_rows_of(sink.read_bucketed_view(spark, path, version=2)))
    assert at2[5] == -1 and at2[6] == -2 and 300 not in at2
    at1 = dict(_rows_of(sink.read_bucketed_view(spark, path, version=1)))
    assert at1[5] == 50 and 300 not in at1


def test_delta_delete_tombstones(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    model = _seed_base(spark, sink, path)

    doomed = spark.createDataFrame([(7,), (11,), (9999,)], "id long")
    n = sink.delete_keys_delta(spark, doomed, path, "id", keep_versions=3)
    assert n >= 1
    del model[7], model[11]  # 9999 absent — idempotent no-op
    got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got == model

    # delete then re-insert: the newer upsert delta must win
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(7, 777)]), path, "id", keep_versions=3
    )
    model[7] = 777
    assert dict(_rows_of(sink.read_bucketed_view(spark, path))) == model

    # deleting on a view with no manifest is a no-op, not a crash
    assert (
        sink.delete_keys_delta(
            spark, doomed, str(tmp_path / "nothing"), "id"
        )
        == 0
    )


def test_delta_only_view_no_base(spark, tmp_path):
    _, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(1, 10), (2, 20)]), path, "id", n_buckets=4
    )
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(2, 21), (3, 30)]), path, "id"
    )
    got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got == {1: 10, 2: 21, 3: 30}
    man = sink.load_manifest(path)
    assert man["buckets"] == {} and len(man["delta_commits"]) == 2


def test_delta_multirow_per_key_set_semantics(spark, tmp_path):
    """Per key the newest commit's whole row-SET wins — the rewrite
    path's replace-the-set contract, which a row_number()-style merge
    would silently break."""
    _, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(1, 10), (1, 11), (2, 20)]), path, "id"
    )
    got = sorted(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got == [(1, 10), (1, 11), (2, 20)]

    sink.upsert_keyed_parquet_delta(spark, _bdf(spark, [(1, 99)]), path, "id")
    got = sorted(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got == [(1, 99), (2, 20)]


def test_one_key_delta_writes_batch_not_bucket(spark, tmp_path):
    """THE delta-log claim: a 1-key upsert writes O(1 key) bytes, not
    O(bucket) — and rewrites no base dir at all."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    _seed_base(spark, sink, path, n=2000, n_buckets=4)

    man_before = sink.load_manifest(path)
    refs_before = sink._manifest_refs(man_before)
    bucket_bytes = min(
        _dir_bytes(os.path.join(path, rel))
        for rel in man_before["buckets"].values()
    )

    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -1)]), path, "id", keep_versions=2
    )

    man_after = sink.load_manifest(path)
    # every base entry untouched — the delta commit rewrote nothing
    assert man_after["buckets"] == man_before["buckets"]
    new_refs = sink._manifest_refs(man_after) - refs_before
    assert len(new_refs) == 1  # one delta dir, the 1 touched bucket
    delta_bytes = sum(
        _dir_bytes(os.path.join(path, rel)) for rel in new_refs
    )
    # a 1-row parquet footprint vs a 500-row bucket: well under half
    assert delta_bytes < bucket_bytes / 2, (
        f"delta wrote {delta_bytes}B vs smallest bucket {bucket_bytes}B"
    )


def test_rewrite_mode_raises_on_pending_deltas(spark, tmp_path):
    _, sink = _imports()
    path = str(tmp_path / "view")
    _seed_base(spark, sink, path)
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -1)]), path, "id"
    )
    with pytest.raises(ValueError, match="pending delta"):
        sink.upsert_keyed_parquet_bucketed(
            spark, _bdf(spark, [(6, -2)]), path, "id", 8
        )
    with pytest.raises(ValueError, match="pending delta"):
        sink.delete_keys_bucketed(
            spark, spark.createDataFrame([(6,)], "id long"), path, "id"
        )
    # compaction clears the log and re-enables rewrite mode
    sink.compact_bucketed_view(spark, path, keep_versions=1)
    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, [(6, -2)]), path, "id", 8
    )
    got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got[5] == -1 and got[6] == -2


def test_compact_folds_touched_buckets_only(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    model = _seed_base(spark, sink, path, n=200, n_buckets=8)
    man0 = sink.load_manifest(path)

    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -1), (6, -2)]), path, "id", keep_versions=3
    )
    doomed = spark.createDataFrame([(7,)], "id long")
    sink.delete_keys_delta(spark, doomed, path, "id", keep_versions=3)
    model[5], model[6] = -1, -2
    del model[7]

    before = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert before == model

    touched_kbs = {
        kb
        for dc in sink.load_manifest(path)["delta_commits"]
        for kb in dc["buckets"]
    }
    n = sink.compact_bucketed_view(spark, path, keep_versions=3)
    assert n == len(touched_kbs)

    man = sink.load_manifest(path)
    assert not man.get("delta_commits")
    # untouched buckets keep their original immutable dirs
    for kb, rel in man0["buckets"].items():
        if kb not in touched_kbs:
            assert man["buckets"][kb] == rel
        else:
            assert man["buckets"][kb] != rel
    after = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert after == model


def test_compact_drops_fully_tombstoned_bucket(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    # tiny view: every key deleted → all buckets empty after compact
    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, [(1, 10), (2, 20)]), path, "id", 4,
        keep_versions=1,
    )
    sink.delete_keys_delta(
        spark, spark.createDataFrame([(1,), (2,)], "id long"), path, "id",
        keep_versions=1,
    )
    sink.compact_bucketed_view(spark, path, keep_versions=1)
    man = sink.load_manifest(path)
    assert man["buckets"] == {} and not man.get("delta_commits")
    with pytest.raises(FileNotFoundError):
        sink.read_bucketed_view(spark, path)


def test_compact_physical_erasure_after_retention(spark, tmp_path):
    """Tombstoned bytes must stop existing on disk once compaction
    lands and superseded snapshots leave retention (keep_versions=1)
    — the delta-mode erasure endgame."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    _seed_base(spark, sink, path, n=50, n_buckets=4)
    sink.delete_keys_delta(
        spark, spark.createDataFrame([(13,)], "id long"), path, "id",
        keep_versions=1,
    )
    sink.compact_bucketed_view(spark, path, keep_versions=1)
    sink.vacuum(path, keep_versions=1, grace_seconds=0.0)

    # scan EVERY parquet file left under the view for the doomed key
    import pyarrow.parquet as pq

    seen = set()
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f), columns=["id"])
                seen.update(t.column("id").to_pylist())
    assert 13 not in seen
    got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert 13 not in got and len(got) == 49


def test_unpublished_delta_dirs_invisible_and_vacuumable(
    spark, tmp_path, monkeypatch
):
    """A delta commit that crashes before its manifest publish leaves
    only unreferenced d-* dirs: readers never see them and vacuum
    sweeps them."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    model = _seed_base(spark, sink, path, n=50, n_buckets=4)

    monkeypatch.setattr(sink, "_publish_manifest", lambda *a, **k: None)
    with pytest.raises(RuntimeError, match="publish race"):
        sink.upsert_keyed_parquet_delta(
            spark, _bdf(spark, [(5, -1)]), path, "id"
        )
    monkeypatch.undo()

    assert dict(_rows_of(sink.read_bucketed_view(spark, path))) == model
    counts = sink.vacuum(path, keep_versions=1, grace_seconds=0.0)
    assert counts["data_dirs"] >= 1  # the orphaned d-* dir(s)
    assert dict(_rows_of(sink.read_bucketed_view(spark, path))) == model


def test_gc_retains_delta_refs_for_time_travel(spark, tmp_path):
    """Retained superseded manifests reference delta dirs; GC after a
    compaction must keep those dirs alive while the versions are
    inside keep_versions — a time-travel read through the delta log
    must still work."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    _seed_base(spark, sink, path, n=50, n_buckets=4)  # v1
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -1)]), path, "id", keep_versions=3
    )  # v2
    sink.compact_bucketed_view(spark, path, keep_versions=3)  # v3

    at2 = dict(_rows_of(sink.read_bucketed_view(spark, path, version=2)))
    assert at2[5] == -1 and len(at2) == 50
    at1 = dict(_rows_of(sink.read_bucketed_view(spark, path, version=1)))
    assert at1[5] == 50


def test_delta_manifest_checksum_and_torn_fallback(spark, tmp_path):
    """The delta entries ride the same checksummed manifest: a torn
    (corrupted) latest manifest is skipped and the previous good
    version — including its delta log — is served."""
    _, sink = _imports()
    path = str(tmp_path / "view")
    _seed_base(spark, sink, path, n=50, n_buckets=4)
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -1)]), path, "id", keep_versions=3
    )  # v2 with one delta commit
    mdir = os.path.join(path, sink._MANIFEST_DIR)
    torn = os.path.join(mdir, "manifest-00000000000000000003.json")
    with open(torn, "w") as f:
        f.write(json.dumps({"version": 3, "buckets": {}})[: 20])
    got = dict(_rows_of(sink.read_bucketed_view(spark, path)))
    assert got[5] == -1 and len(got) == 50


def test_snapshot_diff_prunes_untouched_buckets(spark, tmp_path):
    """changed_buckets/snapshot_diff_views: immutable dirs mean two
    manifests prove which buckets can contain changes — the diff scan
    must exclude every untouched bucket's files, handle one-sided
    (insert-only new bucket) subsets, and return a zero-scan empty
    diff for identical versions."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    _seed_base(spark, sink, path, n=200, n_buckets=8)  # v1
    man1 = sink.load_manifest(path)

    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, [(5, -1)]), path, "id", 8, keep_versions=3
    )  # v2: exactly one bucket re-pointed
    man2 = sink.load_manifest(path)

    chg = sink.changed_buckets(man1, man2)
    assert len(chg) == 1
    old_df, new_df, n = sink.snapshot_diff_views(spark, path, 1, 2)
    assert n == 1
    scanned = set(old_df.inputFiles()) | set(new_df.inputFiles())
    untouched = {
        os.path.join(path, rel)
        for kb, rel in man1["buckets"].items()
        if kb not in chg
    }
    for f in scanned:
        assert not any(f.replace("file:", "").startswith(d) for d in untouched), (
            f"diff scanned untouched bucket file {f}"
        )
    # the pruned diff still sees the one change
    old_k = {(r.id, r.val) for r in old_df.collect()}
    new_k = {(r.id, r.val) for r in new_df.collect()}
    assert (5, 50) in old_k and (5, -1) in new_k
    assert {k for k, _ in old_k} == {k for k, _ in new_k}  # same bucket

    # identical versions: empty diff, zero changed buckets
    o2, n2, z = sink.snapshot_diff_views(spark, path, 2, 2)
    assert z == 0 and o2.count() == 0 and n2.count() == 0

    # one-sided subset: a brand-new bucket exists only in the new
    # version; the old side must come back empty with the right schema
    tiny = str(tmp_path / "tiny")
    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, [(0, 0)]), tiny, "id", 8, keep_versions=3
    )
    kb0 = next(iter(sink.load_manifest(tiny)["buckets"]))
    new_key = next(
        i for i in range(1, 64)
        if spark.createDataFrame([(i,)], "id long")
        .select(F.pmod(F.hash("id"), F.lit(8)).alias("kb"))
        .first()
        .kb != int(kb0)
    )
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(new_key, 1)]), tiny, "id", keep_versions=3
    )
    o3, n3, z3 = sink.snapshot_diff_views(spark, tiny, 1, 2)
    assert z3 == 1
    assert o3.count() == 0 and o3.columns == ["id", "val"]
    assert {(r.id, r.val) for r in n3.collect()} == {(new_key, 1)}
