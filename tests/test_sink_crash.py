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


def test_bucketed_upsert_equivalence_and_pruning(spark, tmp_path):
    """The bucket-pruned upsert (a) equals the flat keyed upsert on
    the same batch sequence, (b) leaves UNTOUCHED buckets' files
    byte-identical (the pruning is real — only affected buckets are
    rewritten), and (c) re-delivering a batch is a per-bucket no-op."""
    import os

    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.streaming.sink import (
        read_bucketed_view,
        read_view,
        upsert_keyed_parquet,
        upsert_keyed_parquet_bucketed,
    )

    flat, buck = f"{tmp_path}/flat", f"{tmp_path}/buck"
    full = spark.range(0, 200).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )
    upsert_keyed_parquet(spark, full, flat, "id")
    n0 = upsert_keyed_parquet_bucketed(spark, full, buck, "id", n_buckets=8)
    assert n0 == 8  # 200 keys cover all 8 buckets

    def files(kb):
        d = f"{buck}/kb={kb}"
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    before = {kb: files(kb) for kb in range(8)}

    # small update batch: 3 keys → at most 3 buckets rewritten
    upd = spark.createDataFrame([(5, -1), (6, -2), (7, -3)], "id long, val long")
    upsert_keyed_parquet(spark, upd, flat, "id")
    n1 = upsert_keyed_parquet_bucketed(spark, upd, buck, "id", n_buckets=8)
    assert 1 <= n1 <= 3
    touched = {
        r["kb"]
        for r in upd.withColumn(
            "kb", F.pmod(F.hash(F.col("id")), F.lit(8))
        ).select("kb").distinct().collect()
    }
    after = {kb: files(kb) for kb in range(8)}
    for kb in range(8):
        if kb in touched:
            assert after[kb] != before[kb], f"bucket {kb} not rewritten"
        else:
            assert after[kb] == before[kb], f"bucket {kb} rewritten needlessly"

    def rows(df):
        return sorted((r.id, r.val) for r in df.collect())

    assert rows(read_bucketed_view(spark, buck)) == rows(read_view(spark, flat))

    # redelivery: same batch again → same final state
    upsert_keyed_parquet_bucketed(spark, upd, buck, "id", n_buckets=8)
    assert rows(read_bucketed_view(spark, buck)) == rows(read_view(spark, flat))


def test_bucketed_read_heals_demoted_unpromoted_bucket(spark, tmp_path):
    """Crash window between a bucket's demote (kb=N -> kb=N.old) and
    promote (kb=N.swap -> kb=N): no live dir exists for that bucket,
    only the .old/.swap remnants. read_bucketed_view must derive the
    bucket from the remnants and promote the complete .swap — a glob
    over live dirs only would silently drop the bucket's rows."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.streaming.sink import (
        read_bucketed_view,
        upsert_keyed_parquet_bucketed,
    )

    buck = f"{tmp_path}/buck"
    full = spark.range(0, 200).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )
    upsert_keyed_parquet_bucketed(spark, full, buck, "id", n_buckets=8)
    expect = sorted((r.id, r.val) for r in read_bucketed_view(spark, buck).collect())

    # simulate: bucket 3's promote never happened — the new version sits
    # in .swap, the old one was renamed aside to .old, no live dir
    d = f"{buck}/kb=3"
    shutil.copytree(d, d + ".swap")
    os.replace(d, d + ".old")
    assert not os.path.exists(d)

    got = sorted((r.id, r.val) for r in read_bucketed_view(spark, buck).collect())
    assert got == expect  # no rows lost
    assert os.path.exists(d)  # the bucket was promoted back
    assert not os.path.exists(d + ".swap") and not os.path.exists(d + ".old")


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
