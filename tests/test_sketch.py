"""Count-min sketch: no undercount, bounded overcount, mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)

W, D = 512, 4


def _zipfish(spark, n_rows: int, offset: int = 0):
    # key k appears ~ n_rows/(k+1) times — a deterministic heavy tail
    return (
        spark.range(offset, offset + n_rows)
        .select((F.col("id") % 50).alias("grp"), F.col("id"))
        .select(
            F.when(F.col("grp") < 25, F.lit(0))
            .when(F.col("grp") < 37, F.lit(1))
            .when(F.col("grp") < 44, F.lit(2))
            .otherwise(F.col("grp"))
            .cast("string")
            .alias("key")
        )
    )


def test_cms_never_undercounts_and_bounds_overcount(spark):
    data = _zipfish(spark, 20_000)
    truth = {
        r["key"]: r["n"]
        for r in data.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sketch = cms_build(data, "key", width=W, depth=D)
    keys = data.select("key").distinct()
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(sketch, keys, "key", width=W, depth=D).collect()
    }
    n_total = sum(truth.values())
    for k, true_n in truth.items():
        assert est[k] >= true_n, (k, est[k], true_n)
        # standard bound e/width * N, with generous slack for depth=4
        assert est[k] - true_n <= 3 * n_total / W, (k, est[k], true_n)


def test_cms_merge_equals_single_build(spark):
    a, b = _zipfish(spark, 5_000), _zipfish(spark, 5_000, offset=5_000)
    merged = cms_merge(
        cms_build(a, "key", width=W, depth=D),
        cms_build(b, "key", width=W, depth=D),
    )
    single = cms_build(a.unionByName(b), "key", width=W, depth=D)
    lhs = {(r["row"], r["bucket"]): r["n"] for r in merged.collect()}
    rhs = {(r["row"], r["bucket"]): r["n"] for r in single.collect()}
    assert lhs == rhs


def test_cms_unseen_key_estimates_small(spark):
    data = _zipfish(spark, 10_000)
    sketch = cms_build(data, "key", width=W, depth=D)
    unseen = spark.createDataFrame([("never-seen-key",)], "key string")
    est = cms_estimate(sketch, unseen, "key", width=W, depth=D).first()
    assert est["est_count"] <= 3 * 10_000 / W
