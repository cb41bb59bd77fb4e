"""Profiling operators: column profile, k-anonymity audit, and the
unigram-LM surprisal scorer."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.profile import (
    k_anonymity_audit,
    profile_columns,
)
from etl_sprint_2_5_spark.operators.textops import unigram_nll


def test_profile_columns_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "id bigint, tag string",
    )
    rows = {
        r["column_name"]: r
        for r in profile_columns(df, ("id", "tag")).collect()
    }
    assert rows["id"]["n_nulls"] == 1
    assert rows["id"]["n_distinct"] == 3
    assert rows["tag"]["n_nulls"] == 1
    assert rows["tag"]["n_distinct"] == 2


def test_profile_columns_single_aggregate_plan(spark):
    """The profile must be ONE aggregate over the input, not one scan
    per column: exactly one Scan appears in the physical plan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    plan = profile_columns(df, ("id", "m"))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") + plan.count("Range (") <= 2  # one source


def test_k_anonymity_flags_small_groups(spark):
    df = spark.createDataFrame(
        [("US", "A")] * 12 + [("US", "B")] * 3 + [("DE", "A")] * 10,
        "country string, seg string",
    )
    rows = {
        (r["country"], r["seg"]): r
        for r in k_anonymity_audit(df, ("country", "seg"), k=10).collect()
    }
    assert rows[("US", "A")]["at_risk"] == 0
    assert rows[("US", "B")]["at_risk"] == 1
    assert rows[("US", "B")]["group_size"] == 3
    assert rows[("DE", "A")]["at_risk"] == 0


def test_unigram_nll_matches_closed_form(spark):
    """Tiny corpus where the smoothed unigram model is computable by
    hand: costs come from floor(-ln((c+1)/(N+V))*1e6 + 0.5)."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id bigint, text string"
    )
    # counts: a=2 b=2 c=1; N=5, V=3 -> denom 8
    def cost(c: int) -> int:
        return math.floor(-math.log((c + 1) / 8.0) * 1e6 + 0.5)

    rows = {r["doc_id"]: r for r in unigram_nll(docs, "text", "doc_id").collect()}
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["total_nll_ppm"] == 2 * cost(2) + cost(2)
    assert rows[2]["total_nll_ppm"] == cost(2) + cost(1)
    assert rows[2]["avg_nll_ppm"] == (cost(2) + cost(1)) // 2
    # rare token => higher surprisal
    assert rows[2]["avg_nll_ppm"] > rows[1]["avg_nll_ppm"]


def test_unigram_nll_empty_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "...")], "doc_id bigint, text string"
    )
    out = unigram_nll(docs, "text", "doc_id").collect()
    assert {r["doc_id"] for r in out} == {1}


def test_expectation_audit_catches_planted_violations(spark, tmp_path):
    """Every check in the Deequ-style suite fires on exactly its
    planted violation: a duplicated order key, an orphan o_custkey,
    an orphan l_orderkey, one negative price, one out-of-range
    quantity and discount, and a duplicated (orderkey, linenumber)."""
    import datetime as dt

    import etl_sprint_2_5_spark.plans.profiling_queries  # noqa: F401
    from etl_sprint_2_5_spark.plans.registry import REGISTRY

    d0 = dt.datetime(2024, 1, 1)
    orders = [
        (1, 10, "O", 100.0, d0, "1-URGENT"),
        (1, 10, "O", 100.0, d0, "1-URGENT"),  # dup orderkey (2 extra rows -> 1 violation)
        (2, 99, "O", 100.0, d0, "1-URGENT"),  # orphan custkey
        (3, 10, "F", -5.0, d0, "1-URGENT"),   # non-positive price
    ]
    lineitem = [
        (1, 1, 1, 1, 10.0, 1.0, 0.05, 0.0, "N", "O", d0),
        (1, 1, 1, 1, 10.0, 1.0, 0.05, 0.0, "N", "O", d0),  # dup pk
        (9, 1, 1, 2, 10.0, 1.0, 0.05, 0.0, "N", "O", d0),  # orphan orderkey
        (2, 1, 1, 3, 99.0, 1.0, 0.05, 0.0, "N", "O", d0),  # quantity > 50
        (3, 1, 1, 4, 10.0, 1.0, 0.50, 0.0, "N", "O", d0),  # discount > 0.1
    ]
    customer = [(10, "c10", 1, 0.0, "BUILDING")]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        customer,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    got = {
        r["check_name"]: (r["n_checked"], r["n_violations"])
        for r in REGISTRY["expectation_audit"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "lineitem_discount_range": (5, 1),
        "lineitem_fk_orders": (5, 1),
        "lineitem_pk_unique": (5, 1),
        "lineitem_quantity_range": (5, 1),
        "orders_custkey_fk_customer": (4, 1),
        "orders_orderkey_unique": (4, 1),
        "orders_totalprice_positive": (4, 1),
    }, got
