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
