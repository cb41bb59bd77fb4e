"""Approximate aggregates — the 100 TB swap-ins the exact queries
document (approx_count_distinct for COUNT(DISTINCT), approx_percentile
for percentile): error-bound and merge properties on the fixtures.

These are sketch-backed (HyperLogLog++, t-digest): mergeable partial
aggregates that never hold a group's values in memory, which is the
property that makes them safe at any cardinality. No DuckDB oracle —
sketch internals differ by engine — so the contract here is bounded
relative error against the exact answer, plus determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    o = load_table(spark, "orders", SF)
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).first()
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err < 0.05, (row["exact"], row["approx"])
    # deterministic: same sketch result on re-run
    again = o.agg(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert again == row["approx"]


def test_approx_percentile_error_bound(spark):
    o = load_table(spark, "orders", SF)
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("approx"),
    ).first()
    # percentile_approx returns an actual data value near the true rank
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err < 0.01, (row["exact"], row["approx"])


def test_approx_count_distinct_grouped_matches_scale(spark):
    """Grouped HLL: every group's estimate within the bound — the
    shape a 100 TB per-partition cardinality report uses."""
    o = load_table(spark, "orders", SF)
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert len(rows) == 5
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) < 0.06, r
