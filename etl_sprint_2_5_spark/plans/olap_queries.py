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
    "order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
    covers=("X-olap-q13",),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution INCLUDING
    zero-order customers — the left outer join + count-of-counts
    histogram. The join filter lives on the right side (pre-filtering
    orders before the join is plan-equivalent to the ON-clause filter
    for a left join, and lets the predicate push into the scan); both
    aggregations are map-side-combinable counts."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    # Aggregate orders BEFORE the join: the shuffle then carries one
    # row per ordering customer instead of one per order (fan-out ×
    # smaller), and the left join against customer only zero-fills.
    counts = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_cust = c.join(
        counts, c.c_custkey == counts.o_custkey, "left"
    ).select(
        "c_custkey", F.coalesce("cnt", F.lit(0)).alias("n_orders")
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@query(
    "large_order_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS orderdate_us,
           round(o.o_totalprice, 2) AS total_price,
           big.sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_price DESC, o_orderkey
    LIMIT 100
    """,
    covers=("X-olap-q18",),
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-gated aggregate joined back to the
    detail tables (customers holding the largest-quantity orders).
    The quantity rollup is the only lineitem-sized shuffle; the
    surviving 'big' keys then join orders, and the (small) result
    broadcasts against customer. l_quantity is integral-valued, so
    CAST(sum AS BIGINT) is exact on both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros("o_orderdate").alias("orderdate_us"),
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "price_histogram",
    oracle="""
    SELECT least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(avg(o_totalprice), 4) AS mean_price
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
    covers=("X-olap-histogram",),
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (20 × 25k buckets, top bucket
    clamped open-ended) — one map-side-combinable aggregate, no
    sort until the 20-row result. The bucket id is floor division
    of the same IEEE doubles on both engines, so bucket membership
    is engine-exact; an approx variant would swap in width_bucket +
    sampling without changing the call shape."""
    o = load_table(spark, "orders", sf_dir)
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0).cast("bigint"), F.lit(19)
    ).alias("bucket")
    return (
        o.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 4).alias("mean_price"),
        )
        .orderBy("bucket")
    )


@query(
    "timeseries_gapfill",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '1997-03-01',
                                    TIMESTAMP '1997-06-30',
                                    INTERVAL 1 DAY)) AS day
    ),
    daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             count(*) AS n,
             round(sum(o_totalprice), 2) AS rev
      FROM orders
      WHERE o_totalprice > 450000
        AND o_orderdate >= TIMESTAMP '1997-03-01'
        AND o_orderdate <  TIMESTAMP '1997-07-01'
      GROUP BY date_trunc('day', o_orderdate)
    )
    SELECT epoch_us(s.day) AS day_us,
           coalesce(d.n, 0) AS n_orders,
           coalesce(d.rev, 0.0) AS revenue,
           coalesce(last_value(d.rev IGNORE NULLS) OVER (
             ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS last_known_rev
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY day_us
    """,
    covers=("X-olap-gapfill",),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling + forward fill: generate the full
    day spine with sequence()/explode (no data-dependent holes), left
    join the sparse daily aggregate, zero-fill the additive columns,
    and forward-fill the last observed value with last(ignorenulls)
    over a running window. The global window is over the 122-row
    spine (already aggregated), not the fact table — at 100 TB the
    spine stays tiny, so the single-partition window is safe; per-key
    spines would partition the window by key."""
    o = load_table(spark, "orders", sf_dir)
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-03-01").cast("timestamp"),
                F.lit("1997-06-30").cast("timestamp"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    daily = (
        o.where(
            (F.col("o_totalprice") > 450000)
            & (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            F.unix_micros("day").alias("day_us"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
            F.coalesce("rev", F.lit(0.0)).alias("revenue"),
            F.coalesce(
                F.last("rev", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("last_known_rev"),
        )
        .orderBy("day_us")
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


@query(
    "pareto_frontier",
    oracle="""
    WITH best AS (
      SELECT p_size, min(p_retailprice) AS bp
      FROM part GROUP BY p_size
    ),
    frontier AS (
      SELECT p_size, bp,
             min(bp) OVER (ORDER BY p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_min
      FROM best
    )
    SELECT p.p_partkey, p.p_size, round(p.p_retailprice, 2) AS price
    FROM part p
    JOIN frontier f
      ON p.p_size = f.p_size AND p.p_retailprice = f.bp
    WHERE f.prev_min IS NULL OR f.bp < f.prev_min
    ORDER BY p.p_size DESC, p.p_partkey
    """,
    covers=("X-olap-skyline",),
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not strictly dominated on
    (maximize p_size, minimize p_retailprice). Computed as
    grid-reduce → tiny window: per-size min price (one map-side-
    combinable shuffle, ≤ |distinct sizes| rows), then a cummin over
    sizes descending keeps a size only if it beats every larger
    size's best price, then a broadcast join back tags the surviving
    rows. Equivalent to the oracle's NOT-EXISTS dominance test but
    O(n) + O(sizes·log sizes) instead of O(n²). Equal (size, price)
    ties are all non-dominated and all kept."""
    p = load_table(spark, "part", sf_dir)
    best = p.groupBy("p_size").agg(F.min("p_retailprice").alias("bp"))
    w = Window.orderBy(F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        best.select("p_size", "bp", F.min("bp").over(w).alias("prev_min"))
        .where(F.col("prev_min").isNull() | (F.col("bp") < F.col("prev_min")))
        .select(F.col("p_size").alias("f_size"), F.col("bp").alias("f_price"))
    )
    return (
        p.join(
            F.broadcast(frontier),
            (p.p_size == F.col("f_size"))
            & (p.p_retailprice == F.col("f_price")),
        )
        .select(
            "p_partkey",
            "p_size",
            F.round("p_retailprice", 2).alias("price"),
        )
        .orderBy(F.desc("p_size"), F.asc("p_partkey"))
    )


@query(
    "rolling_7day_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_us(date_trunc('day', o_orderdate))
                  // 86400000000 AS BIGINT) AS day_num,
             count(*) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5e0) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY day_num
    )
    SELECT day_num * 86400000000 AS day_us,
           n_orders,
           rev_cents / 100.0 AS revenue,
           CAST(sum(rev_cents) OVER (
             ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) / 100.0 AS revenue_7d
    FROM daily
    ORDER BY day_us
    """,
    covers=("X-olap-rolling",),
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue over the daily aggregate — RANGE frame on
    integer day numbers, so calendar gaps shorten the window instead
    of silently widening it (ROWS BETWEEN 6 PRECEDING would be wrong
    on sparse days). Revenue crosses the engines as exact integer
    cents (floor(x·100+0.5) per row, BIGINT sums all the way), so no
    double accumulation order can break the hash; the single global
    window runs over 365 pre-aggregated rows, not the fact table."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.expr(
                "unix_micros(date_trunc('day', o_orderdate)) div 86400000000"
            ).alias("day_num")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("rev_cents"),
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.select(
            (F.col("day_num") * 86400000000).alias("day_us"),
            "n_orders",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            (F.sum("rev_cents").over(w).cast("bigint") / 100.0).alias(
                "revenue_7d"
            ),
        )
        .orderBy("day_us")
    )


@query(
    "segment_price_balance_corr",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(corr(o.o_totalprice, c.c_acctbal), 4)       AS price_balance_corr,
           round(regr_slope(o.o_totalprice, c.c_acctbal), 4) AS slope,
           round(regr_intercept(o.o_totalprice, c.c_acctbal), 2) AS intercept
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    covers=("X-olap-corr",),
)
def segment_price_balance_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / least-squares diagnostics per market segment
    (does account balance predict order size?) — corr, regr_slope,
    regr_intercept are all single-pass mergeable aggregates (partial
    moments combine associatively), so the plan is one broadcast join
    + one shuffle regardless of fact size. Rounded on both sides: the
    moments differ between engines only at accumulation-noise level,
    orders of magnitude below the rounding grid."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.corr("o_totalprice", "c_acctbal"), 4).alias(
                "price_balance_corr"
            ),
            F.round(F.regr_slope("o_totalprice", "c_acctbal"), 4).alias(
                "slope"
            ),
            F.round(F.regr_intercept("o_totalprice", "c_acctbal"), 2).alias(
                "intercept"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "top_supplier_quarter",
    oracle="""
    WITH srev AS (
      SELECT l.l_suppkey,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                                 + 0.5e0) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l.l_suppkey
    ),
    ranked AS (
      SELECT l_suppkey, rev_cents,
             max(rev_cents) OVER () AS max_rev
      FROM srev
    )
    SELECT s.s_suppkey, s.s_name, r.rev_cents / 100.0 AS total_revenue
    FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_cents = r.max_rev
    ORDER BY s.s_suppkey
    """,
    covers=("X-olap-q15",),
)
def top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view per supplier for one quarter,
    return the supplier(s) hitting the global max (ALL ties kept —
    the reason Q15 is a view + equality, not an ORDER BY ... LIMIT 1).
    The global max runs over the already-aggregated per-supplier rows
    via an empty-frame window; revenue is fixed-pointed to integer
    cents per item so the aggregate is order-independent."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    srev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("rev_cents")
        )
    )
    ranked = srev.withColumn(
        "max_rev", F.max("rev_cents").over(Window.partitionBy())
    )
    return (
        ranked.where(F.col("rev_cents") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents") / 100.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "revenue_share_by_nation",
    oracle="""
    WITH nrev AS (
      SELECT n.n_regionkey, n.n_name AS nation,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                                 + 0.5e0) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT r.r_name AS region, nation,
           rev_cents / 100.0 AS revenue,
           round(rev_cents / CAST(sum(rev_cents) OVER (
             PARTITION BY n_regionkey) AS DOUBLE), 6) AS region_share
    FROM nrev JOIN region r ON nrev.n_regionkey = r.r_regionkey
    ORDER BY region, nation
    """,
    covers=("X-olap-share",),
)
def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: each nation's share of its region's revenue
    — the ratio-to-window-sum BI staple. The fact-table aggregate
    reduces to 25 nation rows BEFORE the share window runs, so the
    window cost is constant; integer-cents accumulation keeps the
    numerator and denominator engine-exact, and the one double
    division at the end is IEEE-identical on both sides."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("bigint")
    nrev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = Window.partitionBy("n_regionkey")
    return (
        nrev.join(F.broadcast(r), nrev.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            "nation",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            F.round(
                F.col("rev_cents")
                / F.sum("rev_cents").over(w).cast("double"),
                6,
            ).alias("region_share"),
        )
        .orderBy("region", "nation")
    )


@query(
    "part_affinity_pairs",
    oracle="""
    WITH baskets AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT count(DISTINCT l_orderkey) AS n FROM baskets
    ),
    part_freq AS MATERIALIZED (
      SELECT l_partkey, count(*) AS f FROM baskets GROUP BY l_partkey
    ),
    pairs AS MATERIALIZED (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_together
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
      HAVING count(*) >= 3
    )
    SELECT p.part_a, p.part_b, p.n_together,
           round(p.n_together / CAST(n.n AS DOUBLE), 6) AS support,
           round(p.n_together * CAST(n.n AS DOUBLE)
                 / (fa.f * CAST(fb.f AS DOUBLE)), 4) AS lift
    FROM pairs p
    JOIN part_freq fa ON fa.l_partkey = p.part_a
    JOIN part_freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n_orders n
    ORDER BY n_together DESC, part_a, part_b
    LIMIT 50
    """,
    covers=("X-olap-affinity",),
)
def part_affinity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: parts co-ordered in the same order,
    with support and lift. The pair space is generated per basket
    (collect the basket's sorted parts, expand in-array pairs — the
    same bounded local-quadratic idiom as the LSH buckets; baskets
    are small, so no order-key self-join materializes the fact table
    twice), then one count aggregate; marginals broadcast back.
    support = P(a,b); lift = P(a,b)/(P(a)·P(b)) — both computed from
    exact integer counts and divided once at the end."""
    li = load_table(spark, "lineitem", sf_dir)
    # baskets feeds four consumers (pair expansion, both marginals, the
    # order count) — cache the one distinct pass instead of recomputing
    # the scan+shuffle per branch
    baskets = li.select("l_orderkey", "l_partkey").distinct().cache()
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    part_freq = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    grouped = baskets.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("parts")
    )
    from etl_sprint_2_5_spark.operators.dedup import pairs_within_bucket

    pairs = (
        grouped.select(
            F.explode(pairs_within_bucket(F.col("parts"))).alias("p")
        )
        .select(F.col("p.id_a").alias("part_a"), F.col("p.id_b").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_together"))
        .where(F.col("n_together") >= 3)
    )
    fa = part_freq.select(
        F.col("l_partkey").alias("part_a"), F.col("f").alias("fa")
    )
    fb = part_freq.select(
        F.col("l_partkey").alias("part_b"), F.col("f").alias("fb")
    )
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_together",
            F.round(
                F.col("n_together") / F.col("n").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("n_together")
                * F.col("n").cast("double")
                / (F.col("fa") * F.col("fb").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_together"), F.asc("part_a"), F.asc("part_b"))
        .limit(50)
    )


@query(
    "late_shipment_orders",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    covers=("X-olap-q4",),
)
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality across
    both tables (orders having any lineitem shipped >90 days after
    the order date), decorrelated to a LEFT SEMI join — each order
    contributes once no matter how many qualifying items, and the
    semi join stops probing a key at first match instead of
    materializing the fan-out."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    qualified = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("interval 90 days")),
        "left_semi",
    )
    return (
        qualified.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "order_value_window_stats",
    oracle="""
    WITH w AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             round(o_totalprice - lag(o_totalprice) OVER win, 2) AS prev_diff,
             CAST(floor(percent_rank() OVER win * 1e6 + 0.5e0) AS BIGINT)
               AS pct_rank_ppm,
             CAST(floor(cume_dist() OVER win * 1e6 + 0.5e0) AS BIGINT)
               AS cume_dist_ppm
      FROM orders
      WINDOW win AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    )
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           coalesce(prev_diff, 0.0) AS prev_diff,
           pct_rank_ppm, cume_dist_ppm
    FROM w
    ORDER BY o_orderkey
    LIMIT 200
    """,
    covers=("X-olap-window-rank",),
)
def order_value_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window suite over orders: within each priority class
    (ordered by price with an orderkey tiebreak — a TOTAL order),
    the gap to the previous order's price (lag), percent_rank, and
    cume_dist. Rank ratios cross the oracle boundary as ppm
    fixed-point — (rank-1)/(n-1) is an exact int/int division giving
    the identical IEEE double on both engines, but round()ing it
    could straddle a decimal halfway point.

    One shuffle (the window partition); the output page is a bounded
    TakeOrdered, computed after the full-partition window."""
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir)
    win = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.coalesce(
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(win), 2
            ),
            F.lit(0.0),
        ).alias("prev_diff"),
        F.floor(F.percent_rank().over(win) * 1e6 + 0.5)
        .cast("long")
        .alias("pct_rank_ppm"),
        F.floor(F.cume_dist().over(win) * 1e6 + 0.5)
        .cast("long")
        .alias("cume_dist_ppm"),
    )
    return w.orderBy("o_orderkey").limit(200)


@query(
    "sales_cube",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT)
             AS grp_id,
           count(*) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY grp_id, priority, status
    """,
    covers=("X-olap-cube",),
)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(priority, status): all four grouping sets — detail, each
    single-axis margin, and the grand total — in ONE expand + hash
    aggregate (rollup's completion; same single-shuffle plan)."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.cube("o_orderpriority", "o_orderstatus")
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
    "yearly_customer_overlap",
    oracle="""
    WITH c96 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    ), c97 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT 'both' AS cohort, count(*) AS n_customers
    FROM (SELECT o_custkey FROM c96 INTERSECT SELECT o_custkey FROM c97)
    UNION ALL
    SELECT 'only_1996', count(*)
    FROM (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c97)
    UNION ALL
    SELECT 'only_1997', count(*)
    FROM (SELECT o_custkey FROM c97 EXCEPT SELECT o_custkey FROM c96)
    ORDER BY cohort
    """,
    covers=("X-olap-setops",),
)
def yearly_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra: customers active in both 1996
    and 1997, or only one. Spark plans set ops as aggregate-based
    joins over the distinct key sets; the two year cohorts come from
    one orders scan each with the date filter pushed down."""
    o = load_table(spark, "orders", sf_dir)

    def cohort(lo: str, hi: str) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    c96 = cohort("1996-01-01", "1997-01-01")
    c97 = cohort("1997-01-01", "1998-01-01")
    rows = [
        ("both", c96.intersect(c97)),
        ("only_1996", c96.subtract(c97)),
        ("only_1997", c97.subtract(c96)),
    ]
    out = None
    for tag, df in rows:
        piece = df.agg(F.count(F.lit(1)).alias("n_customers")).select(
            F.lit(tag).alias("cohort"), "n_customers"
        )
        out = piece if out is None else out.unionByName(piece)
    return out.orderBy("cohort")


@query(
    "price_outliers",
    oracle="""
    WITH cents AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
      FROM orders
    ),
    stats AS (
      SELECT o_orderpriority,
             count(*) AS n,
             CAST(sum(c) AS HUGEINT)     AS s,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sq
      FROM cents GROUP BY o_orderpriority
    )
    SELECT c.o_orderpriority,
           CAST(st.n AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN 4 * (c.c * st.n - st.s) * (c.c * st.n - st.s)
                              > 9 * (st.n * st.sq - st.s * st.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM cents c JOIN stats st USING (o_orderpriority)
    GROUP BY c.o_orderpriority, st.n
    ORDER BY c.o_orderpriority
    """,
    covers=("X-olap-sigma-outliers",),
)
def price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1.5-sigma price-outlier census per priority class (prices are
    near-uniform, so a 3-sigma rule would be degenerate — uniform
    support ends at 1.73 sigma). The entire test runs in EXACT
    arithmetic: prices become integer cents, and
    |x - mean| > 1.5*sigma is algebraically rearranged to
    4*(x*n - s)^2 > 9*(n*sq - s^2) — integer-only, no division, no
    floating point anywhere, so the boundary can never flip on an
    ulp. Spark carries the wide products as decimal(38,0) (exact to
    1e38); DuckDB as HUGEINT.

    Scale shape: one aggregate per group (5 rows, broadcast back),
    then a second map-side pass — classic two-pass z-score at 100 TB
    with no global sort and no per-row state."""
    o = load_table(spark, "orders", sf_dir)
    cents = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    )
    dec = lambda col: col.cast("decimal(38,0)")
    stats = cents.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("c"))).cast("decimal(38,0)").alias("s"),
        F.sum(dec(F.col("c")) * dec(F.col("c"))).cast("decimal(38,0)").alias("sq"),
    )
    j = cents.join(F.broadcast(stats), "o_orderpriority")
    dev = dec(F.col("c")) * dec(F.col("n")) - F.col("s")
    var_num = dec(F.col("n")) * F.col("sq") - F.col("s") * F.col("s")
    return (
        j.groupBy("o_orderpriority", "n")
        .agg(
            F.sum(
                F.when(4 * dev * dev > 9 * var_num, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "o_orderpriority",
            F.col("n").cast("long").alias("n_orders"),
            "n_outliers",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "pivot_unpivot_roundtrip",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, o_orderstatus
    """,
    covers=("X-olap-unpivot",),
)
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long with df.unpivot (the melt half the pivot family was
    missing), proven by ROUND-TRIP: the status×priority matrix from
    status_priority_pivot's shape is melted back to long form and the
    oracle is simply the plain long GROUP BY — if either direction
    bent a cell, the hash gate fails. Empty (status, priority)
    combinations the pivot materialized as zero-count cells are
    filtered back out, since the long form never had them.

    unpivot is a zero-shuffle Expand on the already-aggregated wide
    table (3 columns→rows per input row), so the round-trip costs the
    pivot's single hash aggregate — the cheap direction at any
    scale."""
    o = load_table(spark, "orders", sf_dir)
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    counts = wide.unpivot(
        ["o_orderpriority"],
        ["F_n", "O_n", "P_n"],
        "status_col",
        "n_orders",
    ).select(
        "o_orderpriority",
        F.substring("status_col", 1, 1).alias("o_orderstatus"),
        "n_orders",
    )
    revs = wide.unpivot(
        ["o_orderpriority"],
        ["F_rev", "O_rev", "P_rev"],
        "rev_col",
        "revenue",
    ).select(
        "o_orderpriority",
        F.substring("rev_col", 1, 1).alias("o_orderstatus"),
        "revenue",
    )
    return (
        counts.join(revs, ["o_orderpriority", "o_orderstatus"])
        .where(F.col("n_orders").isNotNull() & (F.col("n_orders") > 0))
        .select("o_orderpriority", "o_orderstatus", "n_orders", "revenue")
        .orderBy("o_orderpriority", "o_orderstatus")
    )


@query(
    "observed_pipeline_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS rows_in,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END)
                AS BIGINT)          AS rows_kept,
           round(sum(CASE WHEN o_totalprice > 100000 THEN o_totalprice
                          ELSE 0 END), 2) AS revenue_kept
    FROM orders
    """,
    covers=("X-observe",),
)
def observed_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via df.observe (the production metrics
    hook the driver-side count()-everything anti-pattern replaces):
    named aggregate metrics piggyback on the SAME pass that computes
    the real result — no second scan, no extra action — and are read
    off the Observation handle after the action fires. Here the
    filter pipeline's input size, kept size, and kept revenue are
    observed while the query computes its (discarded) filtered
    result; the oracle recomputes the three metrics declaratively,
    so the hash gate proves observe() saw every row exactly once.
    At scale this is how an ETL job emits row-accounting metrics
    without doubling its IO."""
    from pyspark.sql import Observation

    o = load_table(spark, "orders", sf_dir)
    obs = Observation("pipeline_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum((F.col("o_totalprice") > 100000).cast("long")).alias("rows_kept"),
        F.round(
            F.sum(
                F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
                .otherwise(0.0)
            ),
            2,
        ).alias("revenue_kept"),
    )
    # the action that drives the pass; the filtered frame is the real
    # pipeline output, the metrics ride along
    observed.where(F.col("o_totalprice") > 100000).write.format(
        "noop"
    ).mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["rows_in"], m["rows_kept"], m["revenue_kept"])],
        "rows_in long, rows_kept long, revenue_kept double",
    )
