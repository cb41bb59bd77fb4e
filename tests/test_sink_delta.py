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


def test_read_prunes_untouched_buckets_from_merge(spark, tmp_path):
    """Bucket-pruned merge-on-read: a read under a pending delta log
    must restrict the sequence-resolve window (and its exchange on the
    view key) to the buckets some delta touched — every other bucket's
    base dir is provably current and scans directly. Pinned at the
    physical layer: the frame that feeds the merge window references
    ONLY touched-bucket files (inputFiles), the plan has exactly one
    Window, and the result still matches the full model."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    model = _seed_base(spark, sink, path, n=200, n_buckets=8)  # v1

    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(5, -1)]), path, "id", keep_versions=3
    )  # one key -> one touched bucket
    model[5] = -1

    man = sink.load_manifest(path)
    assert len(man["delta_commits"]) == 1
    touched = set(man["delta_commits"][0]["buckets"])
    assert len(touched) == 1 and len(man["buckets"]) == 8

    captured = {}
    orig = sink._merged_delta_read

    def spy(spark_, path_, man_, only_buckets=None):
        captured["only_buckets"] = only_buckets
        captured["df"] = orig(spark_, path_, man_, only_buckets)
        return captured["df"]

    try:
        sink._merged_delta_read = spy
        df = sink.read_bucketed_view(spark, path)
        got = dict(_rows_of(df))
    finally:
        sink._merged_delta_read = orig

    assert got == model
    # the merge was restricted to exactly the delta-touched buckets
    assert captured["only_buckets"] == touched
    # ...and physically scans only their files
    tkb = next(iter(touched))
    for f in captured["df"].inputFiles():
        assert f"/kb={tkb}/" in f, f"merge branch scanned {f}"
    # the full read still covers every base dir (untouched ones scan
    # directly, below the window)
    scanned = set(df.inputFiles())
    for kb, rel in man["buckets"].items():
        assert any(os.path.join(path, rel) in s for s in scanned), (
            f"bucket {kb} missing from the pruned read"
        )
    # exactly one sequence-resolve window in the plan — the untouched
    # branch unions in without one
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") == 1


def test_max_pending_deltas_cap_and_warn(spark, tmp_path):
    """Nothing in the protocol bounds delta-log growth, so the budget
    must be loud: writers with max_pending_deltas raise at the cap
    (compact first), and past DELTA_LOG_WARN_PENDING an uncapped write
    warns instead of silently deepening every reader's scan fan."""
    import warnings as _w

    F, sink = _imports()
    path = str(tmp_path / "view")
    _seed_base(spark, sink, path, n=50, n_buckets=4)
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(1, -1)]), path, "id", keep_versions=3
    )
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(2, -2)]), path, "id", keep_versions=3
    )  # 2 pending

    with pytest.raises(ValueError, match="max_pending_deltas=2"):
        sink.upsert_keyed_parquet_delta(
            spark, _bdf(spark, [(3, -3)]), path, "id",
            keep_versions=3, max_pending_deltas=2,
        )
    with pytest.raises(ValueError, match="compact_bucketed_view"):
        sink.delete_keys_delta(
            spark, _bdf(spark, [(3, 0)]).select("id"), path, "id",
            keep_versions=3, max_pending_deltas=2,
        )
    # under the cap: accepted
    assert sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(3, -3)]), path, "id",
        keep_versions=3, max_pending_deltas=5,
    ) == 1  # 3 pending now

    old = sink.DELTA_LOG_WARN_PENDING
    try:
        sink.DELTA_LOG_WARN_PENDING = 3
        with pytest.warns(RuntimeWarning, match="pending commit"):
            sink.upsert_keyed_parquet_delta(
                spark, _bdf(spark, [(4, -4)]), path, "id", keep_versions=3
            )
    finally:
        sink.DELTA_LOG_WARN_PENDING = old
    # compaction resets the budget: capped writes pass again
    sink.compact_bucketed_view(spark, path, keep_versions=3)
    with _w.catch_warnings():
        _w.simplefilter("error")  # any warning -> test failure
        assert sink.upsert_keyed_parquet_delta(
            spark, _bdf(spark, [(5, -5)]), path, "id",
            keep_versions=3, max_pending_deltas=2,
        ) == 1


def test_merge_side_column_names_reserved(spark, tmp_path):
    """_merged_delta_read claims _delta_seq/_max_seq transiently via
    withColumn/drop, so a user batch carrying either name would be
    stamped into 'fields' yet silently overwritten and dropped on
    every merged read. Writers must reject ALL sink-materialized
    names up front, in both write modes."""
    F, sink = _imports()
    for col in ("_delta_seq", "_max_seq", "_deleted", "_kb"):
        bad = spark.createDataFrame(
            [(1, 10, 0)], f"id long, val long, `{col}` long"
        )
        with pytest.raises(ValueError, match="reserved"):
            sink.upsert_keyed_parquet_delta(
                spark, bad, str(tmp_path / "v1"), "id"
            )
        with pytest.raises(ValueError, match="reserved"):
            sink.upsert_keyed_parquet_bucketed(
                spark, bad, str(tmp_path / "v2"), "id", 4
            )


def test_lost_cas_does_not_duplicate_delta_entry(spark, tmp_path):
    """The retract-after-copy window: our delta publish wins v, a racer
    reads v (our entry included) and publishes v+1 on top, our publish
    detects latest>v and retracts -> returns None. The retry loop must
    recognize its commit id already riding in the racer's manifest and
    STOP — a blind re-append would duplicate the entry (rows stay
    correct, but reads scan the dirs twice and changed_buckets reports
    phantom churn)."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    model = _seed_base(spark, sink, path, n=50, n_buckets=4)

    orig = sink._publish_manifest
    state = {"fired": False}

    def lose_once(path_, doc):
        if state["fired"] or not doc.get("delta_commits"):
            return orig(path_, doc)
        state["fired"] = True
        v = orig(path_, doc)  # our publish lands...
        assert v is not None
        racer = {
            "version": v + 1,
            "key": doc["key"],
            "n_buckets": doc["n_buckets"],
            "buckets": dict(doc["buckets"]),
            "delta_commits": list(doc["delta_commits"]),  # incl. ours
        }
        if doc.get("fields"):
            racer["fields"] = doc["fields"]
        assert orig(path_, racer) is not None  # ...racer builds on it
        # retraction: our v sits below latest, no reader takes it
        os.remove(
            os.path.join(
                path_, sink._MANIFEST_DIR, f"manifest-{v:020d}.json"
            )
        )
        return None

    try:
        sink._publish_manifest = lose_once
        n = sink.upsert_keyed_parquet_delta(
            spark, _bdf(spark, [(7, -7)]), path, "id", keep_versions=3
        )
    finally:
        sink._publish_manifest = orig
    model[7] = -7

    assert state["fired"] and n == 1
    man = sink.load_manifest(path)
    ids = [dc["id"] for dc in man["delta_commits"]]
    assert len(ids) == 1 and len(set(ids)) == 1, (
        f"duplicated delta entry after lost CAS: {ids}"
    )
    assert dict(_rows_of(sink.read_bucketed_view(spark, path))) == model
