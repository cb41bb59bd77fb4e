"""OLAP analytics queries — exact percentiles, ROLLUP grouping sets,
and ntile bucketing — with exact DuckDB oracles.

These widen the engine's reporting surface beyond the reference's
operator set (the reference serves point/list/search queries; a
warehouse consumer of the same gold tables runs exactly these shapes).

Determinism notes baked into the oracles:
- exact percentile interpolation: both engines compute linear
  interpolation between 2-decimal prices, so the ideal result has ≤ 3
  decimals; round(4) is therefore ulp-safe on both sides.
- ntile needs a TOTAL order (ties broken by key) or bucket membership
  would be engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.sources.parquet import load_table


@query(
    "revenue_percentiles",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    covers=("X-olap-percentiles",),
)
def revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-price percentiles per priority class. Exact
    percentile is the oracle-able correctness baseline; the 100 TB
    path swaps in approx_percentile (t-digest, mergeable partial
    aggregation) with the same call shape."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "sales_rollup",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT)
             AS grp_id,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY grp_id, priority, status
    """,
    covers=("X-olap-rollup",),
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP(priority, status): detail
    rows, per-priority subtotals, and the grand total in one pass —
    Spark plans grouping sets as a single expand + hash aggregate
    (one shuffle), not one job per level."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("grp_id"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "grp_id",
            "n_orders",
            "revenue",
        )
        .orderBy("grp_id", "priority", "status")
    )


@query(
    "customer_balance_deciles",
    oracle="""
    WITH tiled AS (
      SELECT c_mktsegment, c_acctbal,
             ntile(10) OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    )
    SELECT c_mktsegment, decile,
           count(*) AS n_customers,
           round(min(c_acctbal), 2) AS bal_min,
           round(max(c_acctbal), 2) AS bal_max
    FROM tiled
    GROUP BY c_mktsegment, decile
    ORDER BY c_mktsegment, decile
    """,
    covers=("X-olap-ntile",),
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles per market segment (ntile over a TOTAL
    order — c_custkey tiebreak keeps bucket membership engine-
    independent), reported as per-decile count and balance range."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    tiled = c.select(
        "c_mktsegment", "c_acctbal", F.ntile(10).over(w).alias("decile")
    )
    return (
        tiled.groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("bal_min"),
            F.round(F.max("c_acctbal"), 2).alias("bal_max"),
        )
        .orderBy("c_mktsegment", "decile")
    )


@query(
    "regional_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    covers=("X-olap-q5",),
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table snowflake join (local-supplier
    revenue by nation, ASIA, 2 years). The plan the optimizer should
    find — and the plan audit asserts — is: date + region filters
    pushed into the scans, region/nation/supplier/customer broadcast
    up the chain, ONE shuffle for the final aggregate."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


@query(
    "status_priority_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_total,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS rev_f,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS rev_o,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS rev_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    covers=("X-olap-pivot",),
)
def status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status×priority pivot with EXPLICIT pivot values — df.pivot with
    declared values compiles to one hash aggregate (no extra pass to
    discover columns, which is what implicit pivot costs at scale)."""
    o = load_table(spark, "orders", sf_dir)
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("rev"),
        )
    )
    totals = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        p.join(totals, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_total",
            F.coalesce("F_n", F.lit(0)).alias("n_f"),
            F.coalesce("O_n", F.lit(0)).alias("n_o"),
            F.coalesce("P_n", F.lit(0)).alias("n_p"),
            F.round(F.coalesce("F_rev", F.lit(0.0)), 2).alias("rev_f"),
            F.round(F.coalesce("O_rev", F.lit(0.0)), 2).alias("rev_o"),
            F.round(F.coalesce("P_rev", F.lit(0.0)), 2).alias("rev_p"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "monthly_revenue_trend",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1999-01-01'
      GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT epoch_us(mon) AS month_us, n_orders, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY mon), 2) AS revenue_delta
    FROM monthly
    ORDER BY month_us
    """,
    covers=("X-olap-trend",),
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue with lag deltas (2 years) — the
    reporting time-series shape. The lag window is over the ALREADY
    AGGREGATED 24 monthly rows, so the global window is trivially
    single-partition by construction, not a scale hazard."""
    o = load_table(spark, "orders", sf_dir)
    monthly = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    w = Window.orderBy("mon")
    return (
        monthly.select(
            F.unix_micros("mon").alias("month_us"),
            "n_orders",
            "revenue",
            F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias(
                "revenue_delta"
            ),
        )
        .orderBy("month_us")
    )
