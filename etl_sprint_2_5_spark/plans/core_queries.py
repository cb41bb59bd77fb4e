"""Core relational query surface — SURVEY.md §2.1-2.7 operators wired
to the driver's testdata tables, each with a DuckDB oracle.

The testdata star schema stands in for the reference's movie star
schema (FIXTURES.md §D): orders ≅ film_work (fact), lineitem ≅
person_film_work (bridge), part/supplier ≅ person/genre (dims),
customer⨝nation⨝region ≅ the dim snowflake, events ≅ the CDC change
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions.kernel import clean_sentinels
from etl_sprint_2_5_spark.operators.keyset import keyset_batch
from etl_sprint_2_5_spark.operators.pagination import paginate, top_k_per_group
from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.sources.parquet import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Scans + aggregation (S1, P1, A-family, W1)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                              AS sum_qty,
           round(sum(l_extendedprice), 2)                         AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
           round(avg(l_quantity), 4)                              AS avg_qty,
           round(avg(l_discount), 4)                              AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    covers=("S1", "P1", "A6", "W1"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped scan→filter→groupBy→multi-agg→sort.

    The filter and the two projected columns reach the parquet scan
    (PushedFilters / ReadSchema); aggregation is partial (map-side)
    then final — no row leaves an executor before being combined.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Joins (J1, J2, J6-J8), sort+limit (W2, W3)
# ---------------------------------------------------------------------------


@query(
    "top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           epoch_us(o.o_orderdate)                               AS orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 20
    """,
    covers=("J1", "J2", "A6", "W2", "W3"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped dim⨝fact⨝bridge with broadcast dim.

    customer (filtered) is explicitly broadcast — the J1 'bridge joins
    small dim' shape; lineitem⨝orders shuffles on orderkey once and the
    groupBy reuses that partitioning (no second shuffle).
    """
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate")).alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS o_totalprice,
           o_orderpriority
    FROM orders WHERE o_orderkey = 42
    """,
    covers=("P4", "Q1", "Q5"),
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key (search_api/api.py:41-60 GET /movies/<id>).

    The equality predicate is pushed to the scan (min/max row-group
    pruning); at scale this is a partition-pruned O(1)-ish read, not a
    full table pass.
    """
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") == 42)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderpriority",
        )
    )


@query(
    "semi_join_affected",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49.5)
    ORDER BY o_orderkey
    """,
    covers=("J6", "P5"),
)
def semi_join_affected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affected-id semi join (daemon.py:195 ``id = ANY(:ids)``).

    left_semi never materializes the right side's payload columns; the
    changed-id set is the small side and broadcasts.
    """
    o = t(spark, sf_dir, "orders")
    changed = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 49.5)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(changed), o.o_orderkey == changed.l_orderkey, "left_semi")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "anti_join_orphans",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
    covers=("P3",),
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid/orphan exclusion as left_anti (P3's complement —
    etl.py:69-93 drops bridge rows pointing at excluded dims)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "fanout_affected_keys",
    oracle="""
    SELECT DISTINCT l_orderkey AS affected_id
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 50)
    ORDER BY affected_id
    """,
    covers=("J7", "J8"),
)
def fanout_affected_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change fan-out of incremental view maintenance (daemon.py:139-152):
    changed dim ids → bridge rows → affected fact ids.

    part is 'the changed dim batch' (broadcast); lineitem is the bridge;
    output is the distinct affected fact-key set. This is the exact join
    the IVM driver runs per micro-batch."""
    changed_dims = (
        t(spark, sf_dir, "part").where(F.col("p_size") == 50).select("p_partkey")
    )
    bridge = t(spark, sf_dir, "lineitem")
    return (
        bridge.join(
            F.broadcast(changed_dims),
            bridge.l_partkey == changed_dims.p_partkey,
            "left_semi",
        )
        .select(F.col("l_orderkey").alias("affected_id"))
        .distinct()
        .orderBy("affected_id")
    )


@query(
    "snowflake_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*)                    AS n_customers,
           round(sum(c.c_acctbal), 2)  AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
    covers=("J1", "J9", "A6"),
)
def snowflake_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level dim snowflake with both dims broadcast (J9's
    hash-map-lookup join is exactly a broadcast hash join)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Nested-document aggregation (J3/J4/J5, A1-A3) — string-encoded arrays
# ---------------------------------------------------------------------------


@query(
    "nested_doc_rollup",
    oracle="""
    SELECT o.o_orderkey,
           count(l.l_partkey)                                       AS n_items,
           coalesce(string_agg(DISTINCT l.l_partkey::VARCHAR, ','
                               ORDER BY l.l_partkey::VARCHAR), '')  AS part_ids,
           round(coalesce(sum(l.l_extendedprice), 0), 2)            AS total_price
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'P'
    GROUP BY o.o_orderkey
    ORDER BY o.o_orderkey
    """,
    covers=("J3", "A1", "P7", "F3", "F10"),
)
def nested_doc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decorrelated LEFT-JOIN-LATERAL of the gold doc build
    (daemon.py:160-196): aggregate the bridge per fact key, left-join
    onto the fact, NULL → empty collection (P7).

    The nested array is encoded as a sorted comma-joined string so the
    DuckDB hash compare is order-insensitive-safe; the true
    array<struct> shape is exercised by entry() and the movie-domain
    pipeline tests."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("l_partkey").alias("n_items"),
        F.array_join(
            F.array_sort(F.collect_set(F.col("l_partkey").cast("string"))), ","
        ).alias("part_ids"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
            F.coalesce("part_ids", F.lit("")).alias("part_ids"),
            F.coalesce("total_price", F.lit(0.0)).alias("total_price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "conditional_agg_roles",
    oracle="""
    SELECT l_orderkey,
           count(CASE WHEN l_returnflag = 'R' THEN 1 END)           AS n_returned,
           count(CASE WHEN l_returnflag = 'A' THEN 1 END)           AS n_accepted,
           count(CASE WHEN l_returnflag = 'N' THEN 1 END)           AS n_none,
           round(coalesce(sum(CASE WHEN l_returnflag = 'R'
                             THEN l_quantity END), 0), 2)           AS qty_returned
    FROM lineitem
    GROUP BY l_orderkey
    HAVING count(CASE WHEN l_returnflag = 'R' THEN 1 END) > 0
    ORDER BY l_orderkey
    """,
    covers=("A2", "P5"),
)
def conditional_agg_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation ×3 categories in ONE pass over the bridge —
    the Django ``ArrayAgg(filter=Q(role=...))`` pattern
    (movie_admin views.py:30-36), returnflag standing in for role."""
    li = t(spark, sf_dir, "lineitem")
    flag = F.col("l_returnflag")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.when(flag == "R", 1)).alias("n_returned"),
            F.count(F.when(flag == "A", 1)).alias("n_accepted"),
            F.count(F.when(flag == "N", 1)).alias("n_none"),
            F.round(
                F.coalesce(F.sum(F.when(flag == "R", F.col("l_quantity"))), F.lit(0.0)),
                2,
            ).alias("qty_returned"),
        )
        .where(F.col("n_returned") > 0)
        .orderBy("l_orderkey")
    )


@query(
    "distinct_set_agg",
    oracle="""
    SELECT l_suppkey,
           string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags,
           count(DISTINCT l_orderkey)                                   AS n_orders
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
    covers=("A3", "A5"),
)
def distinct_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set semantics (roles-per-person, daemon.py:283-286),
    encoded as a sorted joined string for the oracle compare."""
    li = t(spark, sf_dir, "lineitem")
    # size(collect_set) instead of countDistinct: mixing a distinct agg
    # with collect_set triggers Catalyst's expand (one input copy per
    # distinct branch); one set serves both outputs
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias(
                "flags"
            ),
            F.size(F.collect_set("l_orderkey")).alias("n_orders"),
        )
        .orderBy("l_suppkey")
    )


@query(
    "dim_dedup_build",
    oracle="""
    SELECT p_brand AS name, min(p_partkey) AS first_key, count(*) AS n_parts
    FROM part
    GROUP BY p_brand
    ORDER BY name
    """,
    covers=("A4", "U2"),
)
def dim_dedup_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-key dimension build (etl.py:120-125 first-seen genre →
    id). uuid() minting is nondeterministic across recomputation (the
    §7 hard part), so the surrogate exposed for comparison is min(key);
    the uuid path is exercised in the normalization pipeline tests."""
    p = t(spark, sf_dir, "part")
    return (
        p.groupBy(F.col("p_brand").alias("name"))
        .agg(
            F.min("p_partkey").alias("first_key"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("name")
    )


# ---------------------------------------------------------------------------
# Set ops (U1, U2)
# ---------------------------------------------------------------------------


@query(
    "union_distinct_actives",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_acctbal < -900
    ) u
    ORDER BY custkey
    """,
    covers=("U1", "U2"),
)
def union_distinct_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of three role-sources then distinct — the person-universe
    build (etl.py:168-185 directors ∪ actors ∪ writers)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    a = o.where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    d = c.where(F.col("c_acctbal") < -900).select(F.col("c_custkey").alias("custkey"))
    return a.unionByName(b).unionByName(d).distinct().orderBy("custkey")


# ---------------------------------------------------------------------------
# Sort / limit / pagination (W1-W4)
# ---------------------------------------------------------------------------


@query(
    "keyset_cursor_batch",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
    FROM events
    WHERE (ts = TIMESTAMP '2024-01-15 00:00:00' AND event_id > 0)
       OR ts > TIMESTAMP '2024-01-15 00:00:00'
    ORDER BY ts, event_id
    LIMIT 500
    """,
    covers=("S2", "P6", "W1", "W2", "T2"),
)
def keyset_cursor_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One CDC producer batch: strictly-after-composite-cursor filter +
    stable (ts, id) order + batch cap (daemon.py:110-117)."""
    ev = t(spark, sf_dir, "events")
    batch = keyset_batch(ev, "ts", "event_id", "2024-01-15 00:00:00", 0, 500)
    return batch.select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type"
    )


@query(
    "paginated_listing",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
    covers=("W3", "W4", "Q2", "P8"),
)
def paginated_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 (50/page) of the sorted listing — the API pagination
    surface (api.py:84-92, views.py:44-46) via row_number."""
    o = t(spark, sf_dir, "orders")
    page = paginate(
        o,
        order_by=[F.desc("o_totalprice")],
        tiebreak=F.asc("o_orderkey"),
        page=3,
        limit=50,
    )
    return page.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    covers=("W4",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via partitioned row_number — distributes by
    group key (no global sort), the scale-safe ranking pattern."""
    o = t(spark, sf_dir, "orders")
    top = top_k_per_group(
        o,
        partition_by=[F.col("o_custkey")],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )
    return top.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "rn",
    ).orderBy("o_custkey", "rn")


# ---------------------------------------------------------------------------
# Scalar kernel on real columns (P2, F1-F4, explode)
# ---------------------------------------------------------------------------


@query(
    "sentinel_clean_cast",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(CASE WHEN (CASE WHEN lang IN ('N/A', '') THEN NULL
                            ELSE lang END) IS NULL THEN 1 END) AS n_null_lang,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    covers=("P2", "F4"),
)
def sentinel_clean_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel-to-NULL cleansing (etl.py:38-59) applied as a column
    expression; dirty-fixture behavior is property-tested in tests/."""
    d = t(spark, sf_dir, "documents")
    return (
        d.withColumn("lang_clean", clean_sentinels("lang"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("lang_clean").isNull(), 1)).alias("n_null_lang"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("source")
    )


@query(
    "split_explode_wordcount",
    oracle="""
    SELECT word, count(*) AS freq
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    WHERE word <> ''
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 25
    """,
    covers=("F1",),
)
def split_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode — the Spark-native inverse of the reference's
    comma-separated-list columns (models.py:17-23, etl.py:160-164)."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(25)
    )


@query(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    covers=("F2", "F3"),
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string parsing (etl.py:99 json.loads) via get_json_object
    — stays in codegen, no Python."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("double").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Z-order layout (X-infra-zorder)


def _zorder_sql(cols: tuple[str, str], bits: int) -> str:
    """DuckDB mirror of zorder_key: OR of per-bit shifted terms."""
    n = len(cols)
    terms = [
        f"(({c} & {1 << b}) << {b * n + i - b})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return " | ".join(terms)


@query(
    "zorder_layout",
    oracle=f"""
    WITH dims AS (
      SELECT l_partkey % 256 AS dx, l_suppkey % 256 AS dy, l_quantity
      FROM lineitem
    ), keyed AS (
      SELECT {_zorder_sql(('dx', 'dy'), 8)} AS zkey, l_quantity FROM dims
    )
    SELECT zkey >> 10 AS zbucket,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(min(zkey) AS BIGINT) AS z_min,
           CAST(max(zkey) AS BIGINT) AS z_max
    FROM keyed
    GROUP BY zbucket
    ORDER BY zbucket
    """,
    covers=("X-infra-zorder",),
)
def zorder_layout_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over two bucketed dimensions of
    lineitem, rolled up per z-bucket — the write-layout primitive that
    makes row-group min/max stats prune multi-dimensional predicates.
    The rollup's tight per-bucket z ranges ARE the locality property
    the layout exists for."""
    from etl_sprint_2_5_spark.operators.layout import zorder_key

    li = t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("dx"),
        (F.col("l_suppkey") % 256).alias("dy"),
        "l_quantity",
    )
    keyed = li.select(
        zorder_key(["dx", "dy"], bits=8).alias("zkey"), "l_quantity"
    )
    return (
        keyed.groupBy(F.shiftright("zkey", 10).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.min("zkey").alias("z_min"),
            F.max("zkey").alias("z_max"),
        )
        .orderBy("zbucket")
    )


@query(
    "snapshot_reconciliation",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.5
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    ), diff AS (
      SELECT coalesce(n.o_orderstatus, o.o_orderstatus) AS status,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                        AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
                       THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             coalesce(n.o_totalprice, 0) - coalesce(o.o_totalprice, 0) AS delta
      FROM old o FULL JOIN new n USING (o_orderkey)
    )
    SELECT change_type, status,
           count(*) AS n_orders,
           round(sum(delta), 2) AS revenue_delta
    FROM diff
    GROUP BY change_type, status
    ORDER BY change_type, status
    """,
    covers=("X-infra-diff",),
)
def snapshot_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff audit: yesterday's orders (keys % 7 removed) vs
    today's (keys % 5 removed, prices bumped on % 11), classified
    added/removed/changed/unchanged with revenue deltas — the backfill
    / CDC sign-off primitive, one full-outer hash join."""
    from etl_sprint_2_5_spark.operators.diff import snapshot_diff

    o = t(spark, sf_dir, "orders")
    old = o.select("o_orderkey", "o_orderstatus", "o_totalprice").where(
        F.col("o_orderkey") % 7 != 0
    )
    new = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.5
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    ).where(F.col("o_orderkey") % 5 != 0)
    d = snapshot_diff(
        old, new, ("o_orderkey",), ("o_orderstatus", "o_totalprice")
    )
    return (
        d.select(
            F.coalesce("new_o_orderstatus", "old_o_orderstatus").alias("status"),
            "change_type",
            (
                F.coalesce("new_o_totalprice", F.lit(0))
                - F.coalesce("old_o_totalprice", F.lit(0))
            ).alias("delta"),
        )
        .groupBy("change_type", "status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("delta"), 2).alias("revenue_delta"),
        )
        .orderBy("change_type", "status")
    )


@query(
    "fuzzy_supplier_pairs",
    oracle="""
    WITH s AS (
      SELECT s_suppkey, lower(s_name) AS nm FROM supplier
    ), pairs AS (
      SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
             levenshtein(a.nm, b.nm) AS dist
      FROM s a JOIN s b
        ON substr(a.nm, 1, 16) = substr(b.nm, 1, 16)
       AND length(a.nm) = length(b.nm)
       AND a.s_suppkey < b.s_suppkey
    )
    SELECT id_a, id_b, CAST(dist AS INT) AS dist
    FROM pairs WHERE dist <= 1
    ORDER BY id_a, id_b
    """,
    covers=("X-infra-fuzzy",),
)
def fuzzy_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs over supplier names:
    block on (16-char prefix, length), verify with Levenshtein ≤ 1 —
    the blocked fuzzy-join that replaces an all-pairs comparison.
    Integer edit distance keeps the oracle engine-exact."""
    from etl_sprint_2_5_spark.operators.fuzzy import blocked_fuzzy_pairs

    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.lower("s_name").alias("nm")
    )
    out = blocked_fuzzy_pairs(
        s,
        "s_suppkey",
        "nm",
        [F.substring("nm", 1, 16), F.length("nm")],
        max_dist=1,
    )
    return out.orderBy("id_a", "id_b")


@query(
    "sorted_neighborhood_pairs",
    oracle="""
    WITH s AS (
      SELECT s_suppkey, lower(s_name) AS nm FROM supplier
    ), r AS (
      SELECT s_suppkey, nm,
             row_number() OVER (ORDER BY nm, s_suppkey) AS rk
      FROM s
    ), pairs AS (
      SELECT a.s_suppkey AS ka, b.s_suppkey AS kb,
             levenshtein(a.nm, b.nm) AS dist
      FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3
    )
    SELECT least(ka, kb) AS id_a, greatest(ka, kb) AS id_b,
           CAST(dist AS INT) AS dist
    FROM pairs WHERE dist <= 2
    ORDER BY id_a, id_b
    """,
    covers=("X-infra-snm",),
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernandez & Stolfo
    1995) — the OTHER classic blocking family next to
    fuzzy_supplier_pairs' key blocking: sort once on the match key,
    compare each record only with its w-1=3 sorted successors, verify
    with Levenshtein <= 2. Key blocking misses pairs that differ
    inside the block prefix; sorted-neighborhood misses pairs sorted
    far apart — production linkage runs both and unions candidates,
    which these two queries jointly demonstrate.

    The successors come from lead() over the global (name, key) order
    — ONE range exchange + one window pass produce all three
    neighbors, no self-join; Spark's WindowExec handles the
    partition-boundary rows of the range-partitioned sort, which is
    exactly the multi-pass overlap trick the SNM literature does by
    hand. Cost at any scale: one sort of the dimension, w-1 lead
    columns, a codegen edit-distance filter."""
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.lower("s_name").alias("nm")
    )
    w = Window.orderBy("nm", "s_suppkey")
    r = s.select(
        "s_suppkey",
        "nm",
        *[F.lead("s_suppkey", i).over(w).alias(f"nk_{i}") for i in (1, 2, 3)],
        *[F.lead("nm", i).over(w).alias(f"nn_{i}") for i in (1, 2, 3)],
    )
    parts = [
        r.where(F.col(f"nk_{i}").isNotNull()).select(
            F.least("s_suppkey", f"nk_{i}").alias("id_a"),
            F.greatest("s_suppkey", f"nk_{i}").alias("id_b"),
            F.levenshtein("nm", f"nn_{i}").alias("dist"),
        )
        for i in (1, 2, 3)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.where(F.col("dist") <= 2).orderBy("id_a", "id_b")


_SQL_SURFACE = """
    SELECT n.n_name AS nation,
           count(DISTINCT c.c_custkey)   AS n_customers,
           count(*)                      AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    ORDER BY nation
"""


@query(
    "sql_surface_revenue",
    oracle=_SQL_SURFACE,
    covers=("S3", "X-sql-surface"),
)
def sql_surface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() text surface under the hash gate: the EXACT
    SQL string the DuckDB oracle runs is executed by Spark over the
    registered temp views (sources/parquet.register_views — the S3
    parameterized-execution path every plans/ query rides implicitly,
    here exercised explicitly). One string, two engines, one hash:
    the strongest possible statement that the SQL dialect surface
    agrees — aggregation, multi-join, DISTINCT, rounding and ORDER BY
    semantics all included. Catalyst plans it identically to the
    DataFrame construction (broadcast dims, partial aggs), since both
    lower to the same logical plan."""
    from etl_sprint_2_5_spark.sources.parquet import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE)


@query(
    "set_operator_churn",
    oracle="""
    WITH y1 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1998
    ), y2 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1999
    )
    SELECT 'churned' AS cohort,
           (SELECT count(*) FROM (SELECT * FROM y1 EXCEPT SELECT * FROM y2))
             AS n_customers
    UNION ALL
    SELECT 'new',
           (SELECT count(*) FROM (SELECT * FROM y2 EXCEPT SELECT * FROM y1))
    UNION ALL
    SELECT 'retained',
           (SELECT count(*) FROM (SELECT * FROM y1 INTERSECT SELECT * FROM y2))
    ORDER BY cohort
    """,
    covers=("X-set-operators",),
)
def set_operator_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer churn through the relational SET
    OPERATORS themselves — df.intersect and df.exceptAll(distinct),
    the last ANSI surface the registry exercised only via joins:
    1998's customer set against 1999's yields retained / churned /
    new cohorts, and BOTH engines run their native INTERSECT/EXCEPT
    implementations (Spark lowers them to left-semi/anti aggregates —
    same shuffle shape as the join formulation, which is why using
    the clearer operator costs nothing at scale)."""
    o = load_table(spark, "orders", sf_dir)

    def year_keys(y: int) -> DataFrame:
        return o.where(F.year("o_orderdate") == y).select("o_custkey").distinct()

    y1, y2 = year_keys(1998), year_keys(1999)
    rows = [
        ("churned", y1.exceptAll(y2).distinct()),
        ("new", y2.exceptAll(y1).distinct()),
        ("retained", y1.intersect(y2)),
    ]
    parts = [
        df.agg(F.lit(name).alias("cohort"), F.count(F.lit(1)).alias("n_customers"))
        for name, df in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("cohort")


@query(
    "boolean_aggregate_flags",
    oracle="""
    SELECT event_type,
           count(*)                   AS n_events,
           bool_or(value > 400)       AS any_large,
           bool_and(value > 0)        AS all_positive,
           CAST(sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT)
                                      AS n_large
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    covers=("X-bool-aggs",),
)
def boolean_aggregate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_or / bool_and (ANSI ANY/EVERY) — quantifier aggregates as
    first-class citizens instead of count(CASE)>0 circumlocutions;
    the exact large-value count rides along so the boolean flags are
    cross-checked against the arithmetic they summarize. Both fold
    map-side like any other aggregate."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("bool_or(value > 400)").alias("any_large"),
            F.expr("bool_and(value > 0)").alias("all_positive"),
            F.sum((F.col("value") > 400).cast("long")).alias("n_large"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Hilbert layout (X-infra-hilbert)

from etl_sprint_2_5_spark.operators.layout import hilbert_sql as _hilbert_sql  # noqa: E402


@query(
    "hilbert_layout",
    oracle=f"""
    WITH dims AS (
      SELECT l_partkey % 256 AS dx, l_suppkey % 256 AS dy, l_quantity
      FROM lineitem
    ),
    {_hilbert_sql('dx', 'dy', 8, 'dims')},
    keyed AS (SELECT dx, dy, l_quantity, hd AS hkey FROM h0),
    rolled AS (
      SELECT hkey // 768 AS hbucket,
             count(*) AS n_rows,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(min(hkey) AS BIGINT) AS h_min,
             CAST(max(hkey) AS BIGINT) AS h_max,
             (max(dx) - min(dx) + 1) * (max(dy) - min(dy) + 1) AS bbox_area
      FROM keyed
      GROUP BY hbucket
    ),
    htot AS (SELECT CAST(sum(bbox_area) AS BIGINT) AS total_bbox_hilbert FROM rolled),
    zkeyed AS (
      SELECT {_zorder_sql(('dx', 'dy'), 8)} AS zkey, dx, dy FROM dims
    ),
    zrolled AS (
      SELECT zkey // 768 AS zbucket,
             (max(dx) - min(dx) + 1) * (max(dy) - min(dy) + 1) AS bbox_area
      FROM zkeyed
      GROUP BY zbucket
    ),
    ztot AS (SELECT CAST(sum(bbox_area) AS BIGINT) AS total_bbox_zorder FROM zrolled)
    SELECT r.hbucket, r.n_rows, r.sum_qty, r.h_min, r.h_max,
           CAST(r.bbox_area AS BIGINT) AS bbox_area,
           h.total_bbox_hilbert, z.total_bbox_zorder
    FROM rolled r, htot h, ztot z
    ORDER BY r.hbucket
    """,
    covers=("X-infra-hilbert",),
)
def hilbert_layout_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key beside the z-order one — the
    strictly-better space-filling curve for min/max pruning: every
    curve step moves to an ADJACENT grid cell, so an equal-size key
    range covers a tighter (dx, dy) bounding box than Morton's
    quadrant-jumping key (operators/layout.py hilbert_frame; per-level
    reflect/swap arithmetic mirrored from-scratch in the oracle's CTE
    chain, so Spark and DuckDB each walk the curve independently).

    Buckets are 768-cell key ranges — deliberately NOT a power of
    four: aligned 4^k ranges are perfect subsquares under BOTH
    curves (the totals tie), while real writers range-partition into
    arbitrary boundaries, where Morton's quadrant jumps inflate the
    boxes and Hilbert's adjacency keeps them tight (measured here:
    ~34% lower total bbox area at sf0.01).

    The gate rolls lineitem up per 768-cell Hilbert bucket — counts,
    quantity sums, exact key ranges AND the bucket's (dx, dy)
    bounding-box area, the quantity min/max stats would prune on —
    and attaches both curves' total bbox areas as scalar columns:
    the measured locality win (hilbert < zorder) crosses the hash
    gate as data, not as prose. At 100 TB this key is a shuffle-free
    chained projection feeding repartitionByRange + sortWithinPartitions
    at write time, identical cost shape to the z-order path."""
    from etl_sprint_2_5_spark.operators.layout import (
        hilbert_frame,
        zorder_key,
    )

    dims = t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("dx"),
        (F.col("l_suppkey") % 256).alias("dy"),
        "l_quantity",
    )
    keyed = hilbert_frame(dims, "dx", "dy", bits=8, out="hkey")
    rolled = (
        keyed.groupBy(F.expr("hkey div 768").alias("hbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.min("hkey").alias("h_min"),
            F.max("hkey").alias("h_max"),
            (
                (F.max("dx") - F.min("dx") + 1)
                * (F.max("dy") - F.min("dy") + 1)
            ).alias("bbox_area"),
        )
    )
    htot = rolled.agg(
        F.sum("bbox_area").cast("long").alias("total_bbox_hilbert")
    )
    ztot = (
        dims.select(
            zorder_key(["dx", "dy"], bits=8).alias("zkey"), "dx", "dy"
        )
        .groupBy(F.expr("zkey div 768").alias("zbucket"))
        .agg(
            (
                (F.max("dx") - F.min("dx") + 1)
                * (F.max("dy") - F.min("dy") + 1)
            ).alias("bbox_area")
        )
        .agg(F.sum("bbox_area").cast("long").alias("total_bbox_zorder"))
    )
    return (
        rolled.crossJoin(htot)
        .crossJoin(ztot)
        .select(
            "hbucket", "n_rows", "sum_qty", "h_min", "h_max",
            F.col("bbox_area").cast("long").alias("bbox_area"),
            "total_bbox_hilbert", "total_bbox_zorder",
        )
        .orderBy("hbucket")
    )
