"""Temporal join operator edge cases: as-of tie/ordering semantics and
interval-join bin boundaries (corpus-level results are oracle-checked
by the registered queries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.temporal import asof_join, interval_join_binned

T = dt.datetime(2024, 5, 1, 12, 0, 0)


def _ts(sec):
    return T + dt.timedelta(seconds=sec)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("l1", 1, _ts(10)), ("l2", 1, _ts(20)), ("l3", 2, _ts(5)), ("l4", 3, _ts(9))],
        "id string, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(6), 60.0)],
        "k int, ts timestamp, v double",
    )
    got = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()
    }
    assert got["l1"] == (_ts(10), 100.0)  # equal ts matches (at-or-before)
    assert got["l2"] == (_ts(15), 150.0)  # most recent, not first
    assert got["l3"] == (None, None)      # right row is AFTER the left row
    assert got["l4"] == (None, None)      # key with no right rows at all


def test_interval_join_binned_edges(spark):
    points = spark.createDataFrame(
        [("p0", 1, _ts(0)), ("p1", 1, _ts(600)), ("p2", 1, _ts(601)),
         ("p3", 1, _ts(1800)), ("p4", 2, _ts(300))],
        "pid string, k int, ts timestamp",
    )
    # one interval spanning multiple 600s bins: [0, 600]
    intervals = spark.createDataFrame(
        [("i1", 1, _ts(0), _ts(600))],
        "iid string, k int, s timestamp, e timestamp",
    )
    hits = interval_join_binned(
        points, intervals, ["k"], "ts", "s", "e", bin_seconds=600
    )
    got = sorted((r["pid"], r["iid"]) for r in hits.collect())
    # start and end are inclusive; p2 is 1s past the end; p4 wrong key
    assert got == [("p0", "i1"), ("p1", "i1")]
    # exactly once each even though the interval covers two bins
    assert hits.count() == 2


def test_interval_join_binned_matches_naive_theta(spark):
    """Property: the binned plan equals the naive range join on a
    random-ish fixture (bin width deliberately mismatched to interval
    length to exercise multi-bin explosion)."""
    import random

    rng = random.Random(7)
    points = spark.createDataFrame(
        [(f"p{i}", rng.randint(1, 5), _ts(rng.randint(0, 5000))) for i in range(200)],
        "pid string, k int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (f"i{j}", rng.randint(1, 5), _ts(s), _ts(s + rng.randint(10, 900)))
            for j in range(40)
            for s in [rng.randint(0, 4500)]
        ],
        "iid string, k int, s timestamp, e timestamp",
    )
    binned = {
        (r["pid"], r["iid"])
        for r in interval_join_binned(
            points, intervals, ["k"], "ts", "s", "e", bin_seconds=120
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("p.ts") >= F.col("i.s"))
            & (F.col("p.ts") <= F.col("i.e")),
        )
        .collect()
    }
    assert binned == naive and len(binned) > 0


def test_scd2_compact_versions(spark):
    from etl_sprint_2_5_spark.operators.temporal import scd2_compact

    rows = [
        # key, ts, seq, attr — runs: a,a -> b -> a ; second key constant
        (1, "2024-01-01 00:00:00", 1, "a"),
        (1, "2024-01-01 01:00:00", 2, "a"),
        (1, "2024-01-01 02:00:00", 3, "b"),
        (1, "2024-01-01 03:00:00", 4, "a"),
        (2, "2024-01-01 00:30:00", 5, "x"),
        (2, "2024-01-01 05:00:00", 6, "x"),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts string, seq int, attr string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = scd2_compact(df, ("k",), ("attr",), "ts", "seq").collect()
    by_key = {}
    for r in sorted(out, key=lambda r: (r["k"], r["valid_from"])):
        by_key.setdefault(r["k"], []).append(
            (r["attr"], r["valid_to"] is None, r["is_current"])
        )
    assert by_key[1] == [("a", False, False), ("b", False, False), ("a", True, True)]
    assert by_key[2] == [("x", True, True)]
    # version intervals chain: valid_to of v_i == valid_from of v_{i+1}
    k1 = sorted((r for r in out if r["k"] == 1), key=lambda r: r["valid_from"])
    for a, b in zip(k1, k1[1:]):
        assert a["valid_to"] == b["valid_from"]


def test_snapshot_diff_classification(spark):
    from etl_sprint_2_5_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", None), (4, "D", 40.0)],
        "k int, s string, p double",
    )
    new = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 25.0), (3, "C", None), (5, "E", 50.0)],
        "k int, s string, p double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ("k",), ("s", "p")).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL <=> NULL is unchanged
        4: "removed",
        5: "added",
    }
