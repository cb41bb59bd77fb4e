"""Physical-plan regression pins for the core lazy queries — the
"is this the plan you'd want, not the first one that passed" check,
enforced in CI instead of asserted in prose.

Each pin is a property that, if lost, silently degrades the 100-TB
shape long before any correctness gate notices: a filter that stops
reaching the parquet scan re-reads the corpus; a projection that stops
pruning drags every column through the scan; a small dim that stops
broadcasting turns a map-side join into a full shuffle; a join that
degenerates to a cartesian product is a cluster outage.

Only LAZY registry entries appear here (scenario queries materialize
on construction); the formatted plan is compiled, never executed.
"""

from __future__ import annotations

import pytest

from etl_sprint_2_5_spark.plans import REGISTRY, load_all

load_all()

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pricing_summary_scan_is_pruned_and_pushed(spark):
    """TPC-H Q1 shape: the shipdate filter reaches the parquet scan
    and ReadSchema carries only the 7 needed lineitem columns — not
    the full 17-column table."""
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_comment" not in scan and "l_partkey" not in scan
    assert "l_quantity" in scan and "l_returnflag" in scan


def test_top_revenue_orders_broadcasts_the_small_side(spark):
    """TPC-H Q3 shape: customer-side restriction broadcasts; the big
    fact table is never on the build side of a shuffle join."""
    plan = _plan(spark, "top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_snowflake_join_broadcasts_both_dims(spark):
    """J1/J9: region→nation→customer snowflake — BOTH dim hops are
    broadcast (map-side), leaving at most the aggregation shuffle."""
    plan = _plan(spark, "snowflake_join")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_semi_join_is_a_semi_join(spark):
    """J6: the id-list restriction compiles to a LeftSemi broadcast
    join — not an inner join + distinct (which would shuffle the fact
    table to dedup it)."""
    plan = _plan(spark, "semi_join_affected")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name",
    [
        "pricing_summary",
        "top_revenue_orders",
        "snowflake_join",
        "nested_doc_rollup",
        "semi_join_affected",
        "point_lookup",
        "anti_join_orphans",
        "fanout_affected_keys",
        "conditional_agg_roles",
        "distinct_set_agg",
        "dim_dedup_build",
        "union_distinct_actives",
        "sentinel_clean_cast",
        "split_explode_wordcount",
        "json_extract_agg",
        "paginated_listing",
        "topk_per_group",
        "nation_trade_volume",
        "nation_market_share",
        "returned_item_revenue",
        "promo_revenue_monthly",
    ],
)
def test_no_cartesian_products_in_core_plans(spark, name):
    """No registered core/TPC-H plan may contain a cartesian product
    or a broadcast nested-loop join on the hot path — either one means
    a join condition fell out of the plan."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_point_lookup_pushes_the_key(spark):
    """Q1/Q5 serving shape: the equality key reaches PushedFilters so
    a parquet reader can row-group-skip on it."""
    plan = _plan(spark, "point_lookup")
    assert "EqualTo(o_orderkey," in plan
