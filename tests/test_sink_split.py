"""Online bucket-count migration (``split_buckets``).

A bucketed view's bucket count is stamped at creation so writers can't
fork the layout — which also means a view that grew 100× is stuck with
oversized buckets. ``split_buckets`` migrates the count online,
linear-hashing style: the target count is ``factor × n``, so a key's
new bucket id (hash % f·n) is congruent to its old id (mod n) — each
old bucket splits into exactly its ``{kb + j·n}`` children LOCALLY and
one step pays one old bucket of I/O. These tests pin:

- full + incremental migration read-equivalence, completion stamps
  ``n_buckets = to`` and drops the ``rebucket`` marker;
- a step moves ONLY its batch's buckets (untouched manifest entries
  are byte-identical — no data movement);
- every writer (rewrite upsert/delete, delta append, compactor)
  routes through the MIXED layout mid-migration and carries the
  marker forward (dropping it would fork split buckets' keys into
  duplicate dirs);
- a pending delta log blocks a split (stale bucket ids otherwise) and
  a mid-flight layout change makes a delta writer RESTAGE;
- CAS interleavings restage instead of corrupt; time travel to the
  pre-split version keeps working inside retention; the change feed
  across a pure split sees changed buckets but ZERO changed rows.
"""

from __future__ import annotations

import pytest


def _imports():
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.streaming import sink

    return F, sink


def _bdf(spark, rows):
    return spark.createDataFrame(rows, "id long, val long")


def _rows_of(df):
    return sorted((r.id, r.val) for r in df.collect())


def _seed(spark, sink, path, n=120, n_buckets=4):
    from pyspark.sql import functions as F

    base = spark.range(0, n).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )
    sink.upsert_keyed_parquet_bucketed(
        spark, base, path, key="id", n_buckets=n_buckets
    )
    return {(i, i * 10) for i in range(n)}


def test_full_migration_read_equivalence(spark, tmp_path):
    _, sink = _imports()
    view = str(tmp_path / "v")
    exp = _seed(spark, sink, view, n_buckets=4)
    n = sink.split_buckets(spark, view, factor=2)
    assert n == 4  # every old bucket split in one call
    man = sink.load_manifest(view)
    assert man["n_buckets"] == 8
    assert "rebucket" not in man
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp
    # a completed migration is splittable again (8 -> 24, factor 3)
    assert sink.split_buckets(spark, view, factor=3) == 8
    man = sink.load_manifest(view)
    assert man["n_buckets"] == 24 and "rebucket" not in man
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp


def test_incremental_steps_midstate_reads(spark, tmp_path):
    _, sink = _imports()
    view = str(tmp_path / "v")
    exp = _seed(spark, sink, view, n_buckets=4)
    done_sizes = []
    while True:
        n = sink.split_buckets(spark, view, factor=2, buckets_per_call=1)
        man = sink.load_manifest(view)
        if "rebucket" not in man:
            break
        assert n == 1
        done_sizes.append(len(man["rebucket"]["done"]))
        # EVERY mid-state must read complete and correct
        assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp
    assert done_sizes == [1, 2, 3]  # one old bucket per step
    assert man["n_buckets"] == 8
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp


def test_step_moves_only_its_buckets(spark, tmp_path):
    _, sink = _imports()
    view = str(tmp_path / "v")
    _seed(spark, sink, view, n_buckets=4)
    before = dict(sink.load_manifest(view)["buckets"])
    sink.split_buckets(spark, view, factor=2, buckets_per_call=1)
    man = sink.load_manifest(view)
    split_id = man["rebucket"]["done"][0]
    after = man["buckets"]
    # the split bucket's children (same id at the new modulus + the
    # sibling id) reference NEW dirs; every other entry is
    # byte-identical — i.e. the step moved no other bucket's data
    children = {str(split_id), str(split_id + 4)}
    assert any(kb in after for kb in children)
    for kb, rel in after.items():
        if kb in children:
            assert rel != before.get(kb)
        else:  # untouched bucket: manifest entry carried verbatim
            assert rel == before[kb]


def test_writers_route_mixed_layout_mid_migration(spark, tmp_path):
    F, sink = _imports()
    view = str(tmp_path / "v")
    _seed(spark, sink, view, n=120, n_buckets=4)
    sink.split_buckets(spark, view, factor=2, buckets_per_call=2)
    man = sink.load_manifest(view)
    assert man.get("rebucket")
    # rewrite upsert: update existing keys + insert a brand-new key
    sink.upsert_keyed_parquet_bucketed(
        spark, _bdf(spark, [(5, -5), (77, -77), (500, -500)]), view, key="id"
    )
    # rewrite delete
    sink.delete_keys_bucketed(
        spark, spark.createDataFrame([(11,)], "id long"), view, key="id"
    )
    man2 = sink.load_manifest(view)
    # interleaved writers must CARRY the migration marker forward
    assert man2.get("rebucket") == man["rebucket"]
    exp = {(i, i * 10) for i in range(120) if i != 11}
    exp -= {(5, 50), (77, 770)}
    exp |= {(5, -5), (77, -77), (500, -500)}
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp
    # no key may exist in two dirs (the fork the marker carry prevents):
    dup = (
        sink.read_bucketed_view(spark, view)
        .groupBy("id").count().where(F.col("count") > 1).count()
    )
    assert dup == 0
    # finishing the migration folds everything into the new layout
    sink.split_buckets(spark, view, factor=2)
    man3 = sink.load_manifest(view)
    assert man3["n_buckets"] == 8 and "rebucket" not in man3
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp


def test_delta_writers_mid_migration(spark, tmp_path):
    F, sink = _imports()
    view = str(tmp_path / "v")
    _seed(spark, sink, view, n=120, n_buckets=4)
    sink.split_buckets(spark, view, factor=2, buckets_per_call=2)
    man = sink.load_manifest(view)
    to, done = int(man["rebucket"]["to"]), set(man["rebucket"]["done"])
    # delta upsert + tombstone land under the MIXED routing
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(3, -3), (42, -42)]), view, key="id"
    )
    sink.delete_keys_delta(
        spark, spark.createDataFrame([(9,)], "id long"), view, key="id"
    )
    man2 = sink.load_manifest(view)
    assert man2.get("rebucket") == man["rebucket"]
    # every delta entry's bucket id must be valid under the mixed layout
    valid = {kb for kb in range(4) if kb not in done} | {
        kb + j * 4 for kb in done for j in range(to // 4)
    }
    for dc in man2["delta_commits"]:
        assert all(int(kb) in valid for kb in dc["buckets"])
    exp = {(i, i * 10) for i in range(120) if i != 9}
    exp -= {(3, 30), (42, 420)}
    exp |= {(3, -3), (42, -42)}
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp
    # split over a pending log must refuse (stale bucket ids otherwise)
    with pytest.raises(ValueError, match="pending delta"):
        sink.split_buckets(spark, view, factor=2)
    # compact (mixed routing) then finish the migration
    sink.compact_bucketed_view(spark, view)
    sink.split_buckets(spark, view, factor=2)
    man3 = sink.load_manifest(view)
    assert man3["n_buckets"] == 8 and "rebucket" not in man3
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp


def test_delta_writer_restages_on_layout_change(spark, tmp_path):
    """A split that lands between a delta writer's staging and its
    publish makes the staged bucket ids stale — the writer must detect
    the layout change and RESTAGE, not publish dirs under dead ids."""
    _, sink = _imports()
    view = str(tmp_path / "v")
    _seed(spark, sink, view, n=120, n_buckets=4)
    real_publish = sink._publish_manifest
    fired = {"n": 0}

    def hijack(path, doc):
        if doc.get("delta_commits") and not fired["n"]:
            fired["n"] = 1
            sink._publish_manifest = real_publish  # split publishes real
            sink.split_buckets(spark, view, factor=2, buckets_per_call=2)
            return None  # the delta's publish "lost" to the split
        return real_publish(path, doc)

    sink._publish_manifest = hijack
    try:
        sink.upsert_keyed_parquet_delta(
            spark, _bdf(spark, [(0, -1), (1, -2), (2, -3), (3, -4)]),
            view, key="id",
        )
    finally:
        sink._publish_manifest = real_publish
    man = sink.load_manifest(view)
    assert man.get("rebucket")  # migration half-done, delta on top
    done = set(man["rebucket"]["done"])
    valid = {kb for kb in range(4) if kb not in done} | {
        kb + j * 4 for kb in done for j in range(2)
    }
    for dc in man["delta_commits"]:
        assert all(int(kb) in valid for kb in dc["buckets"])
    exp = {(i, i * 10) for i in range(4, 120)} | {
        (0, -1), (1, -2), (2, -3), (3, -4)
    }
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp


def test_split_cas_loss_restages(spark, tmp_path):
    """An upsert that lands between the split's staging and its publish
    wins the version CAS; the split restages against the winner — the
    upserted row must survive into the post-split view."""
    _, sink = _imports()
    view = str(tmp_path / "v")
    _seed(spark, sink, view, n=120, n_buckets=4)
    real_publish = sink._publish_manifest
    fired = {"n": 0}

    def hijack(path, doc):
        if "rebucket" in doc or doc.get("n_buckets") == 8:
            if not fired["n"]:
                fired["n"] = 1
                sink._publish_manifest = real_publish
                sink.upsert_keyed_parquet_bucketed(
                    spark, _bdf(spark, [(7, -7)]), view, key="id"
                )
                sink._publish_manifest = hijack
                return None  # split lost the CAS — must restage
        return real_publish(path, doc)

    sink._publish_manifest = hijack
    try:
        sink.split_buckets(spark, view, factor=2)
    finally:
        sink._publish_manifest = real_publish
    assert fired["n"] == 1
    man = sink.load_manifest(view)
    assert man["n_buckets"] == 8 and "rebucket" not in man
    exp = {(i, i * 10) for i in range(120) if i != 7} | {(7, -7)}
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp


def test_time_travel_and_feed_across_split(spark, tmp_path):
    _, sink = _imports()
    view = str(tmp_path / "v")
    exp = _seed(spark, sink, view, n=120, n_buckets=4)
    v_pre = sink.load_manifest(view)["version"]
    sink.split_buckets(spark, view, factor=2, keep_versions=4)
    v_post = sink.load_manifest(view)["version"]
    # pre-split snapshot stays readable inside retention
    old = sink.read_bucketed_view(spark, view, version=v_pre)
    assert set(_rows_of(old)) == exp
    # the change feed across a PURE split: bucket entries changed
    # (dirs re-pointed) but zero ROWS changed — diffing the pruned
    # inputs must come up empty
    old_df, new_df, n_chg = sink.snapshot_diff_views(
        spark, view, v_pre, v_post
    )
    assert n_chg > 0  # the split did re-point buckets...
    assert old_df.exceptAll(new_df).count() == 0  # ...but moved no rows
    assert new_df.exceptAll(old_df).count() == 0


def test_factor_validation(spark, tmp_path):
    _, sink = _imports()
    view = str(tmp_path / "v")
    _seed(spark, sink, view, n_buckets=4)
    with pytest.raises(ValueError, match="factor"):
        sink.split_buckets(spark, view, factor=1)
    with pytest.raises(FileNotFoundError):
        sink.split_buckets(spark, str(tmp_path / "nope"))
    sink.split_buckets(spark, view, factor=2, buckets_per_call=1)
    # changing the factor mid-migration would fork the target layout
    with pytest.raises(ValueError, match="in progress"):
        sink.split_buckets(spark, view, factor=3)


def test_maintain_view_compacts_then_migrates(spark, tmp_path):
    """maintain_bucketed_view is one self-managing slot: fold pending
    deltas, then drift the layout toward the byte target — starting a
    migration when the sampled average bucket exceeds it, advancing a
    pending one, and going quiet once buckets are back under target."""
    _, sink = _imports()
    view = str(tmp_path / "v")
    exp = _seed(spark, sink, view, n=400, n_buckets=4)
    sink.upsert_keyed_parquet_delta(
        spark, _bdf(spark, [(1, -1)]), view, key="id"
    )
    exp = (exp - {(1, 10)}) | {(1, -1)}
    # slot 1: compacts the delta AND starts the migration (tiny target)
    r = sink.maintain_bucketed_view(
        spark, view, target_bucket_bytes=1, buckets_per_call=1
    )
    assert r["compacted"] >= 1 and r["split"] == 1
    assert r["migration_pending"]
    # slots 2..4: advance one old bucket each, no deltas to fold
    for i in range(3):
        r = sink.maintain_bucketed_view(
            spark, view, target_bucket_bytes=1, buckets_per_call=1
        )
        assert r["compacted"] == 0 and r["split"] == 1
    assert not r["migration_pending"]
    man = sink.load_manifest(view)
    assert man["n_buckets"] == 8 and "rebucket" not in man
    assert set(_rows_of(sink.read_bucketed_view(spark, view))) == exp
    # with a sane target the view is quiet: no compact, no split
    r = sink.maintain_bucketed_view(
        spark, view, target_bucket_bytes=1 << 30
    )
    assert r == {"compacted": 0, "split": 0, "migration_pending": False}


def test_mixed_routing_is_constant_size_in_plan(spark, tmp_path):
    """split_buckets takes the smallest pending ids, so the done set
    is a contiguous prefix and mid-migration routing must compile to
    ONE comparison (old_id < m), not an O(n_buckets) isin literal —
    at ~100k buckets the array form would bloat every writer's plan."""
    _, sink = _imports()
    view = str(tmp_path / "v")
    _seed(spark, sink, view, n=120, n_buckets=4)
    sink.split_buckets(spark, view, factor=2, buckets_per_call=2)
    man = sink.load_manifest(view)
    assert man["rebucket"]["done"] == [0, 1]  # the prefix invariant
    layout = sink._layout_of(man, 4)
    expr = sink._kb_expr(layout, "id")
    df = spark.range(0, 10).select(expr.alias("kb"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert " IN " not in plan and "isin" not in plan.lower()
    # and the routing still lands every key in a live bucket
    got = sorted(r.kb for r in df.distinct().collect())
    assert all(0 <= kb < 8 for kb in got)
