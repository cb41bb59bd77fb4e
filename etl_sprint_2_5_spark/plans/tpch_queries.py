"""Classic TPC-H query shapes (Q7/Q8/Q10/Q14/Q17/Q19/Q22) adapted to
the fixture schema, each with an exact DuckDB oracle.

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

Determinism conventions (see plans/registry.py): every computed column
aliased identically on both sides; double sums rounded; shares crossed
as ppm fixed-point (floor(x*1e6+0.5) over already-rounded sums —
pure IEEE, engine-exact); money compared in integer cents where a
threshold comparison could sit on an ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2)
             AS revenue
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
    (the groupBy) once the fact-to-orders join is done."""
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
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
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
           round(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END) AS DOUBLE), 2) AS promo_rev,
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2)
             AS total_rev,
           CAST(floor(round(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                          THEN l.l_extendedprice * (1 - l.l_discount)
                                          ELSE 0 END) AS DOUBLE), 2)
                      / round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                                   AS DOUBLE), 2) * 1e6 + 0.5e0)
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
    (partition, month). Share crosses as ppm over rounded sums."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("long")
            .alias("ship_month")
        )
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2
            ).alias("promo_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
    )
    return agg.select(
        "ship_month",
        "promo_rev",
        "total_rev",
        F.floor(F.col("promo_rev") / F.col("total_rev") * 1e6 + 0.5)
        .cast("long")
        .alias("promo_ppm"),
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
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2)
             AS revenue
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
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
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
