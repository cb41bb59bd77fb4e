"""Schema evolution through the manifest-committed bucketed sink.

The manifest stamps the view's payload schema; upserts may WIDEN it
additively (new columns — old generations' dirs NULL-fill under the
stamped read schema, no mergeSchema footer sweep), while type changes
and missing stamped columns are rejected loudly. Without the stamp a
widened batch would silently mix schemas across buckets' dirs and a
reader would see a different shape depending on which buckets its
filter happened to touch.
"""

from __future__ import annotations

import json
import os

import pytest


def _imports():
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.streaming import sink

    return F, sink


def _narrow(spark, rows):
    return spark.createDataFrame(rows, "id long, val long")


def _wide(spark, rows):
    return spark.createDataFrame(rows, "id long, val long, tag string")


def test_additive_widening_rewrite_mode(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(1, 10), (2, 20)]), path, "id", 4
    )
    man = sink.load_manifest(path)
    assert man["fields"] == [["id", "bigint"], ["val", "bigint"]]

    sink.upsert_keyed_parquet_bucketed(
        spark, _wide(spark, [(2, 21, "x"), (3, 30, "y")]), path, "id", 4
    )
    man = sink.load_manifest(path)
    assert man["fields"] == [
        ["id", "bigint"], ["val", "bigint"], ["tag", "string"],
    ]

    got = sink.read_bucketed_view(spark, path)
    assert got.columns == ["id", "val", "tag"]
    rows = {r.id: (r.val, r.tag) for r in got.collect()}
    # generation-1 row NULL-fills the widened column
    assert rows == {1: (10, None), 2: (21, "x"), 3: (30, "y")}


def test_additive_widening_delta_mode_and_compact(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(1, 10), (2, 20)]), path, "id", 4,
        keep_versions=1,
    )
    sink.upsert_keyed_parquet_delta(
        spark, _wide(spark, [(2, 21, "x"), (3, 30, "y")]), path, "id",
        keep_versions=1,
    )
    man = sink.load_manifest(path)
    assert [f[0] for f in man["fields"]] == ["id", "val", "tag"]

    expect = {1: (10, None), 2: (21, "x"), 3: (30, "y")}
    got = {
        r.id: (r.val, r.tag)
        for r in sink.read_bucketed_view(spark, path).collect()
    }
    assert got == expect

    sink.compact_bucketed_view(spark, path, keep_versions=1)
    got = {
        r.id: (r.val, r.tag)
        for r in sink.read_bucketed_view(spark, path).collect()
    }
    assert got == expect
    assert sink.read_bucketed_view(spark, path).columns == ["id", "val", "tag"]


def test_type_change_rejected_both_modes(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(1, 10)]), path, "id", 4
    )
    bad = spark.createDataFrame([(2, "not-a-long")], "id long, val string")
    with pytest.raises(ValueError, match="type changes are not additive"):
        sink.upsert_keyed_parquet_bucketed(spark, bad, path, "id", 4)
    with pytest.raises(ValueError, match="type changes are not additive"):
        sink.upsert_keyed_parquet_delta(spark, bad, path, "id")
    # nothing was committed by the rejected attempts
    assert int(sink.load_manifest(path)["version"]) == 1


def test_missing_stamped_column_rejected(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(1, 10)]), path, "id", 4
    )
    keys_only = spark.createDataFrame([(2,)], "id long")
    with pytest.raises(ValueError, match="missing stamped column"):
        sink.upsert_keyed_parquet_bucketed(spark, keys_only, path, "id", 4)
    with pytest.raises(ValueError, match="missing stamped column"):
        sink.upsert_keyed_parquet_delta(spark, keys_only, path, "id")


def test_delete_on_widened_view_and_key_type_guard(spark, tmp_path):
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(1, 10), (2, 20)]), path, "id", 4,
        keep_versions=1,
    )
    sink.upsert_keyed_parquet_bucketed(
        spark, _wide(spark, [(3, 30, "y")]), path, "id", 4, keep_versions=1
    )
    # delete across mixed-generation buckets reads under the stamp
    sink.delete_keys_bucketed(
        spark, spark.createDataFrame([(1,)], "id long"), path, "id",
        keep_versions=1,
    )
    got = {
        r.id: (r.val, r.tag)
        for r in sink.read_bucketed_view(spark, path).collect()
    }
    assert got == {2: (20, None), 3: (30, "y")}

    wrong_key = spark.createDataFrame([("2",)], "id string")
    with pytest.raises(ValueError, match="key column"):
        sink.delete_keys_bucketed(spark, wrong_key, path, "id")
    with pytest.raises(ValueError, match="key column"):
        sink.delete_keys_delta(spark, wrong_key, path, "id")


def test_pre_evolution_manifest_back_compat(spark, tmp_path):
    """Views committed before schema stamping (no 'fields') must keep
    working: the next upsert stamps the UNION of what the existing
    dirs carry and what the batch brings (one-time mergeSchema sweep),
    so no on-disk column ever goes dark."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(1, 10)]), path, "id", 4
    )
    # strip the stamp from the committed manifest (what a round-10
    # manifest looks like), re-checksum so it still loads clean
    mdir = os.path.join(path, sink._MANIFEST_DIR)
    fp = os.path.join(mdir, sorted(os.listdir(mdir))[-1])
    doc = json.load(open(fp))
    doc.pop("fields")
    doc.pop("checksum")
    doc["checksum"] = sink._manifest_checksum(doc)
    with open(fp, "w") as f:
        json.dump(doc, f, sort_keys=True)
    assert "fields" not in sink.load_manifest(path)

    assert {(r.id, r.val) for r in
            sink.read_bucketed_view(spark, path).collect()} == {(1, 10)}
    sink.upsert_keyed_parquet_bucketed(
        spark, _wide(spark, [(2, 20, "z")]), path, "id", 4
    )
    man = sink.load_manifest(path)
    assert [f[0] for f in man["fields"]] == ["id", "val", "tag"]
    rows = {
        r.id: (r.val, r.tag)
        for r in sink.read_bucketed_view(spark, path).collect()
    }
    assert rows == {1: (10, None), 2: (20, "z")}


def _strip_stamp(sink, path):
    """Rewrite the latest manifest without 'fields' (what a pre-round-11
    manifest looks like), re-checksummed so it still loads clean."""
    mdir = os.path.join(path, sink._MANIFEST_DIR)
    fp = os.path.join(mdir, sorted(os.listdir(mdir))[-1])
    doc = json.load(open(fp))
    doc.pop("fields", None)
    doc.pop("checksum")
    doc["checksum"] = sink._manifest_checksum(doc)
    with open(fp, "w") as f:
        json.dump(doc, f, sort_keys=True)
    assert "fields" not in sink.load_manifest(path)


def test_legacy_stamp_unions_existing_columns(spark, tmp_path):
    """The first stamp on a pre-evolution view must not be the batch
    schema verbatim: if existing dirs carry columns the batch lacks, a
    batch-verbatim stamp would make those columns INVISIBLE under
    every later stamped-schema read (data on disk, silently hidden)
    while a later narrowing batch gets a loud reject — an inconsistent
    and lossy upgrade. The stamp must union disk and batch."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _wide(spark, [(1, 10, "keep")]), path, "id", 4
    )
    _strip_stamp(sink, path)

    # NARROW batch onto the legacy wide view: accepted, union-stamped
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(2, 20)]), path, "id", 4
    )
    man = sink.load_manifest(path)
    assert [f[0] for f in man["fields"]] == ["id", "val", "tag"]
    rows = {
        r.id: (r.val, r.tag)
        for r in sink.read_bucketed_view(spark, path).collect()
    }
    assert rows == {1: (10, "keep"), 2: (20, None)}, (
        "legacy column went dark after the first stamp"
    )

    # same upgrade through the DELTA writer
    path2 = str(tmp_path / "view2")
    sink.upsert_keyed_parquet_bucketed(
        spark, _wide(spark, [(1, 10, "keep")]), path2, "id", 4
    )
    _strip_stamp(sink, path2)
    sink.upsert_keyed_parquet_delta(
        spark, _narrow(spark, [(2, 20)]), path2, "id"
    )
    man2 = sink.load_manifest(path2)
    assert [f[0] for f in man2["fields"]] == ["id", "val", "tag"]
    rows2 = {
        r.id: (r.val, r.tag)
        for r in sink.read_bucketed_view(spark, path2).collect()
    }
    assert rows2 == {1: (10, "keep"), 2: (20, None)}


def test_legacy_stamp_type_conflict_rejected(spark, tmp_path):
    """Upgrading a legacy view cannot smuggle in a type change: a
    batch whose column type disagrees with the existing dirs raises
    the same loud evolution error as the stamped path."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    sink.upsert_keyed_parquet_bucketed(
        spark, _narrow(spark, [(1, 10)]), path, "id", 4
    )
    _strip_stamp(sink, path)
    bad = spark.createDataFrame([(2, "oops")], "id long, val string")
    with pytest.raises(ValueError, match="existing dirs carry"):
        sink.upsert_keyed_parquet_bucketed(spark, bad, path, "id", 4)
    with pytest.raises(ValueError, match="existing dirs carry"):
        sink.upsert_keyed_parquet_delta(spark, bad, path, "id")


def test_snapshot_read_zero_path_guard(spark, tmp_path):
    """A legacy manifest (no stamped fields) whose bucket map is ALSO
    empty has no path to derive a schema from — the empty-subset
    fallback must fail with the actual cause, not an opaque zero-path
    spark.read.parquet analysis error."""
    F, sink = _imports()
    path = str(tmp_path / "view")
    os.makedirs(path)
    doc = {"version": 1, "key": "id", "n_buckets": 4, "buckets": {}}
    assert sink._publish_manifest(path, doc) == 1
    man = sink.load_manifest(path)
    assert man is not None and not man["buckets"]
    with pytest.raises(FileNotFoundError, match="no stamped schema"):
        sink._snapshot_read(spark, path, man)
