"""Classic TPC-H query shapes (Q2/Q6/Q7/Q8/Q9/Q10/Q11/Q12/Q14/Q16/
Q17/Q19/Q20/Q21/Q22) adapted to the fixture schema, each with an exact
DuckDB oracle. (Q1=pricing_summary, Q3=top_revenue_orders,
Q4=late_shipment_orders, Q5=regional_supplier_volume,
Q13=order_count_distribution, Q15=top_supplier_quarter,
Q18=large_order_customers live in their own modules — all 22 classic
shapes are covered.)

These are the canonical OLAP join/agg patterns a warehouse user of the
reference's gold tables would run (the reference itself serves the
transform side — see /root/reference/sqlite_to_postgres/load_data.py
and postgres_to_es/etl.py for its join+denormalize shapes); here they
exercise the engine's multi-join planning at scale:

- Q7/Q8: snowflake joins with TWO independent nation lookups (aliased
  dims) — broadcast both, one shuffle for the final agg.
- Q10: join + top-k with a total order (rounded revenue, key tiebreak).
- Q14: conditional-aggregate share — map-side combinable.
- Q17: correlated per-group average rewritten as agg + self-join.
- Q19: disjunctive multi-bracket predicate — pushed as a single OR
  filter below the join.
- Q22: global scalar threshold + anti join, in exact integer cents so
  the comparison is engine-independent.
- Q2: correlated argmin subquery as aggregate + per-part row_number.
- Q6: no-join filtered scan, full predicate pushdown.
- Q9: multi-dim broadcast join with a modeled supply cost.
- Q11: per-group aggregate HAVING'd against a global scalar (integer).
- Q12/Q16: conditional counts and distinct-supplier counts with an
  anti-join exclusion list.
- Q20/Q21: aggregate-threshold semi-join and the exactly-one-culprit
  double-exists rewrite.

Determinism conventions (see plans/registry.py): every computed column
aliased identically on both sides; double sums rounded; shares crossed
as ppm fixed-point (floor(x*1e6+0.5) over already-rounded sums —
pure IEEE, engine-exact); money compared in integer cents where a
threshold comparison could sit on an ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.sources.parquet import load_table


@query(
    "nation_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5e0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    covers=("X-tpch-q7",),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation dim is joined TWICE under different aliases
    (supplier side and customer side); both are broadcast, and the
    nation-pair filter prunes before the aggregate. One shuffle total
    (the groupBy) once the fact-to-orders join is done. Revenue gates
    as per-row integer cents — a SUM(double)-then-round gate flips
    its last cent with partition order once group sums grow past the
    point where float association error crosses the half-cent
    boundary (caught by the sf1 gate; invisible at sf0.01)."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "nation_market_share",
    oracle="""
    WITH vols AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol
                               ELSE 0 END) AS DOUBLE), 2) AS nation_vol,
           round(CAST(sum(vol) AS DOUBLE), 2) AS total_vol,
           CAST(floor(round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                          THEN vol ELSE 0 END) AS DOUBLE), 2)
                      / round(CAST(sum(vol) AS DOUBLE), 2) * 1e6 + 0.5e0)
                AS BIGINT) AS share_ppm
    FROM vols
    GROUP BY o_year
    ORDER BY o_year
    """,
    covers=("X-tpch-q8",),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue sold
    into ASIA, by order year. Eight-table snowflake; every dim is
    broadcast so the only shuffles are lineitem->orders and the final
    one-row-per-year aggregate. The share crosses the oracle boundary
    as ppm fixed-point over the two ROUNDED sums (floor(x*1e6+0.5) is
    pure IEEE on both engines)."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).where(F.col("p_type") == "ECONOMY")
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vols = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
            "supp_nation",
        )
    )
    agg = vols.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(0.0)),
            2,
        ).alias("nation_vol"),
        F.round(F.sum("vol"), 2).alias("total_vol"),
    )
    return agg.select(
        "o_year",
        "nation_vol",
        "total_vol",
        F.floor(F.col("nation_vol") / F.col("total_vol") * 1e6 + 0.5)
        .cast("long")
        .alias("share_ppm"),
    ).orderBy("o_year")


@query(
    "returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(*) AS n_items,
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    covers=("X-tpch-q10",),
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in one year. Returnflag + date filters push into the scans;
    the top-k orders by the ROUNDED revenue with a custkey tiebreak so
    the cut line is a total order on both engines."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return (
        j.groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "promo_revenue_monthly",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l.l_shipdate) * 100
                + EXTRACT(month FROM l.l_shipdate) AS BIGINT) AS ship_month,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                         * 100 + 0.5e0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5e0) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                         * 100 + 0.5e0) AS BIGINT)
                         ELSE 0 END) * 1000000
                // sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                                  + 0.5e0) AS BIGINT))
                AS BIGINT) AS promo_ppm
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
    covers=("X-tpch-q14",),
)
def promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from PROMO parts.
    Part broadcasts into the fact scan; the conditional aggregate is
    map-side combinable so the shuffle carries one partial row per
    (partition, month). Money gates as per-row integer cents (the
    SUM(double)-then-round form flips its last cent with partition
    order at scale — sf1 gate finding); the share crosses as ppm via
    pure int64 division (cents*1e6 fits int64 through ~sf10)."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("long")
            .alias("ship_month")
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("promo_cents"),
            F.sum(cents).cast("bigint").alias("total_cents"),
        )
    )
    return agg.select(
        "ship_month",
        "promo_cents",
        "total_cents",
        F.expr("promo_cents * 1000000L div total_cents").alias("promo_ppm"),
    ).orderBy("ship_month")


@query(
    "small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT count(*) AS n_small,
           round(CAST(sum(l.l_extendedprice) AS DOUBLE), 2) AS rev_small
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < 0.2e0 * a.avg_qty
    """,
    covers=("X-tpch-q17",),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity line items, where
    "small" is relative to the PER-PART average quantity — the
    correlated scalar subquery decorrelated into an aggregate +
    self-join. The comparison 0.2*avg(qty) is engine-exact because
    l_quantity is integral: avg = exact-int-sum / exact count gives
    the identical IEEE double on both engines.

    Scale note: the per-part average is computed over the FULL
    lineitem (not just the brand) exactly as Q17 specifies; the brand
    filter prunes the probe side before the join, and the aggregate
    side reuses the same shuffle key (l_partkey) so AQE plans it as
    one exchange feeding both."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).where(F.col("p_brand") == "Brand#11")
    part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.round(F.sum("l_extendedprice"), 2).alias("rev_small"),
    )


@query(
    "disjunctive_bracket_revenue",
    oracle="""
    SELECT count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5e0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 1 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    covers=("X-tpch-q19",),
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three disjunctive brand/size/quantity brackets
    ORed together. The single-table parts of the predicate (brand IN,
    size <= max) are derivable and push below the join; the cross-table
    residual evaluates post-join inside codegen. Single-row aggregate,
    no second shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).where(
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#16")
            & F.col("p_size").between(1, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_items"),
        # per-row integer cents: scale-stable gate (see nation_trade_volume)
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("revenue_cents"),
    )


@query(
    "idle_rich_customers",
    oracle="""
    WITH cents AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer
    ),
    thresh AS (
      SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
             count(*) AS n_pos
      FROM cents WHERE bal_cents > 0
    )
    SELECT c.c_mktsegment,
           count(*) AS n_customers,
           round(CAST(sum(c.c_acctbal) AS DOUBLE), 2) AS total_bal
    FROM cents c, thresh t
    WHERE c.bal_cents * t.n_pos > t.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    covers=("X-tpch-q22",),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    RECENT orders (none since 2000 — the fixture has no fully
    order-less customers), per market segment. The global
    average-balance threshold is a one-row broadcast; the "no recent
    orders" test is a left-anti join against the date-pruned orders
    scan.

    The threshold comparison runs in exact integer cents
    (bal_cents * n_pos > sum_cents) instead of comparing against the
    floating average — the result is bit-for-bit engine-independent,
    where `c_acctbal > avg(...)` could flip on an ulp."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    thresh = c.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    rich = c.join(F.broadcast(thresh)).where(
        F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "forecast_revenue",
    oracle="""
    SELECT count(*) AS n_items,
           round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05e0 AND l_discount <= 0.07e0
      AND l_quantity < 24
    """,
    covers=("X-tpch-q6",),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue delta from dropping a discount
    band — a single filtered scan with NO join and a one-row global
    aggregate. The whole predicate (date range, discount band,
    quantity cap) pushes down to the parquet scan; at 100 TB this is
    the canonical "filters reach the reader" query — nothing shuffles
    but one partial-agg row per task."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
    )


@query(
    "min_cost_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS mu
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, l_suppkey, mu,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY mu, l_suppkey) AS rn
      FROM unit
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS supp_nation,
           CAST(floor(b.mu * 100 + 0.5e0) AS BIGINT) AS min_unit_cents
    FROM best b
    JOIN part p     ON b.l_partkey = p.p_partkey
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE b.rn = 1 AND p.p_size <= 10
    ORDER BY p.p_partkey
    """,
    covers=("X-tpch-q2",),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every small part, the supplier quoting the
    lowest unit price — the classic correlated `= (SELECT min(...))`
    subquery, rewritten as an aggregate + per-part row_number (ties
    broken by suppkey: a TOTAL order, so the argmin is engine-
    independent). min() over identical per-row doubles is order-
    independent, unlike avg(); the price crosses the oracle boundary
    as floor(x*100+0.5) integer cents.

    Scale shape: the (part, supplier) aggregate and the per-part
    window share the l_partkey shuffle key; part/supplier/nation dims
    are broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).where(F.col("p_size") <= 10)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("mu")
    )
    w = Window.partitionBy("l_partkey").orderBy("mu", "l_suppkey")
    best = unit.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.floor(F.col("mu") * 100 + 0.5).cast("long").alias("min_unit_cents"),
        )
        .orderBy("p_partkey")
    )


@query(
    "nation_profit_by_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                                - p.p_retailprice * l.l_quantity * 0.1e0)
                               * 100 + 0.5e0) AS BIGINT)) AS BIGINT)
             AS profit_cents
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    covers=("X-tpch-q9",),
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): revenue minus a modeled
    supply cost (10% of retail price per unit — the fixture has no
    partsupp table) for red parts, grouped by supplier nation and
    ship year. Part/supplier/nation broadcast; ONE shuffle for the
    (nation, year) aggregate; the p_name LIKE filter prunes the part
    side before the join, so only matching partkeys reach the hash
    table."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).where(F.col("p_name").like("%red%"))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(
            # per-row cents (incl. negative margins: floor(x*100+0.5) is
            # the same half-up on both engines for x<0 too) — the
            # SUM(double)+round form broke its last cent at the sf1 gate
            F.sum(
                F.floor(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
                    )
                    * 100
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("profit_cents")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "important_part_stock",
    oracle="""
    WITH part_val AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5e0) AS BIGINT))
                  AS BIGINT) AS val_cents
      FROM lineitem
      GROUP BY l_partkey
    ),
    total AS (
      SELECT CAST(sum(val_cents) AS BIGINT) AS total_cents FROM part_val
    )
    SELECT pv.l_partkey AS p_partkey, pv.val_cents
    FROM part_val pv, total t
    WHERE pv.val_cents * 1000000 > t.total_cents * 60
    ORDER BY pv.val_cents DESC, pv.l_partkey
    LIMIT 100
    """,
    covers=("X-tpch-q11",),
)
def important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose traded value
    exceeds 60 ppm of the whole market (1.2x the sf0.01 mean
    share; stays non-degenerate as part count grows with SF) — a per-part aggregate HAVING'd
    against a GLOBAL scalar aggregate. The scalar is a one-row
    broadcast joined under every executor; the threshold test runs in
    exact integer cents (val*1e6 > total*60), bit-identical on both
    engines where a float fraction could flip on an ulp.

    At 100 TB: two passes over the same shuffled aggregate (the part
    rollup feeds both the total and the filter), then a bounded
    top-100 TakeOrdered."""
    li = load_table(spark, "lineitem", sf_dir)
    part_val = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).alias("val_cents")
    )
    total = part_val.agg(F.sum("val_cents").alias("total_cents"))
    return (
        part_val.join(F.broadcast(total))
        .where(F.col("val_cents") * 1000000 > F.col("total_cents") * 60)
        .select(F.col("l_partkey").alias("p_partkey"), "val_cents")
        .orderBy(F.col("val_cents").desc(), "p_partkey")
        .limit(100)
    )


@query(
    "linestatus_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    covers=("X-tpch-q12",),
)
def linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode priority split — the fixture has no
    l_shipmode, so l_linestatus stands in): per line status, how many
    1997 shipments belonged to urgent/high-priority orders vs the
    rest. Pure integer conditional aggregation after an equi join;
    the date filter pushes below the join so only the 1997 slice of
    lineitem is shuffled against orders."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@query(
    "supplier_part_variety",
    oracle="""
    SELECT p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0e0)
    GROUP BY p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_type, p.p_size
    """,
    covers=("X-tpch-q16",),
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers ship each (type, size) bucket, excluding one
    brand and suppliers in arrears (negative balance — the fixture's
    stand-in for the complaint subquery). The exclusion list is a
    left-anti join against a tiny filtered supplier scan (broadcast);
    count(DISTINCT) over the surviving pairs is the one real
    shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).where(
        (F.col("p_brand") != "Brand#2")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        load_table(spark, "supplier", sf_dir)
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_type", "p_size")
    )


@query(
    "heavy_part_suppliers",
    oracle="""
    WITH q AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        AND p.p_name LIKE '%red%'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    tot AS (
      SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
      FROM q GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM q
    JOIN tot ON q.l_partkey = tot.l_partkey
    JOIN supplier s ON q.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE q.qty * 2 > tot.total_qty
    ORDER BY s.s_suppkey
    """,
    covers=("X-tpch-q20",),
)
def heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who
    dominated the 1997 supply of some red part — shipped more than
    half that part's total quantity. The per-(part, supplier) and
    per-part aggregates share the l_partkey shuffle key, the
    dominance test is exact integer math (qty*2 > total, quantities
    are integral), and the final DISTINCT collapses multi-part
    dominators. The nested-subquery-with-aggregate-threshold is the
    Q20 signature."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir).where(F.col("p_name").like("%red%"))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    q = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    tot = q.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    return (
        q.join(tot, "l_partkey")
        .where(F.col("qty") * 2 > F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "sole_late_shipper",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    stats AS (
      SELECT l_orderkey,
             max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM li GROUP BY l_orderkey
    ),
    winners AS (
      SELECT li.l_orderkey, li.l_suppkey
      FROM li
      JOIN stats st ON li.l_orderkey = st.l_orderkey
      WHERE li.l_shipdate = st.max_ship
        AND st.n_supp >= 2
        AND st.max_ship > li.o_orderdate + INTERVAL 90 DAY
      GROUP BY li.l_orderkey, li.l_suppkey
    ),
    sole AS (
      SELECT l_orderkey, min(l_suppkey) AS l_suppkey
      FROM winners GROUP BY l_orderkey HAVING count(*) = 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM sole w
    JOIN supplier s ON w.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    covers=("X-tpch-q21",),
)
def sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): in
    finished multi-supplier orders, the supplier who uniquely shipped
    last, and late (>90 days after the order date — the fixture has
    no commit/receipt dates). The EXISTS/NOT-EXISTS pair of the
    original is rewritten as one window-free aggregate chain: per-
    order max shipdate + supplier count, equality join back to find
    the shippers at the max, HAVING count(*)=1 for 'exactly one
    culprit'. Everything after the orders join shuffles on
    l_orderkey once and reuses that partitioning."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(F.col("o_orderstatus") == "F")
    s = load_table(spark, "supplier", sf_dir)
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    stats = base.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    winners = (
        base.join(stats, "l_orderkey")
        .where(
            (F.col("l_shipdate") == F.col("max_ship"))
            & (F.col("n_supp") >= 2)
            & (F.col("max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        winners.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count(F.lit(1)).alias("nw"))
        .where(F.col("nw") == 1)
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
