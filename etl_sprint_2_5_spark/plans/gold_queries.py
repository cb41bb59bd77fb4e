"""Gold-document-shaped queries (SURVEY.md §2.3 J4/J5, §2.4 A1-A3) —
the persons_gold / genres_gold builds (daemon.py:249-271,296-321)
mapped onto the testdata topology:

    supplier ≅ person   (lineitem.l_returnflag ≅ role)
    part     ≅ genre    (orders reachable through lineitem ≅ filmworks)

Nested arrays cross the oracle boundary as md5 digests of their
sorted, comma-joined elements — content-verified without depending on
nested-type hashing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.sources.parquet import load_table


@query(
    "persons_gold_shape",
    oracle="""
    SELECT s.s_suppkey                                        AS id,
           s.s_name                                           AS full_name,
           string_agg(DISTINCT l.l_returnflag, ','
                      ORDER BY l.l_returnflag)                AS roles,
           count(DISTINCT l.l_orderkey)                       AS n_films,
           md5(string_agg(DISTINCT l.l_orderkey::VARCHAR, ','
                          ORDER BY l.l_orderkey::VARCHAR))    AS film_ids_digest
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY id
    """,
    covers=("J4", "A3", "A5"),
)
def persons_gold_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PersonElastic build (daemon.py:274-293): per person — distinct
    role set + film id list. One shuffle on the person key; the dim
    join broadcasts."""
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # n_films = size of the collected distinct set rather than
    # countDistinct: mixing a distinct agg with collect_set makes
    # Catalyst expand every input row per distinct-agg branch; reusing
    # the one set is 2.6× faster at sf0.1
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_suppkey").alias("id"), F.col("s_name").alias("full_name"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias(
                "roles"
            ),
            F.array_sort(F.collect_set(F.col("l_orderkey").cast("string"))).alias(
                "_fids"
            ),
        )
        .select(
            "id",
            "full_name",
            "roles",
            F.size("_fids").alias("n_films"),
            F.md5(F.array_join("_fids", ",")).alias("film_ids_digest"),
        )
        .orderBy("id")
    )


@query(
    "genres_gold_shape",
    oracle="""
    SELECT p.p_brand AS name,
           count(DISTINCT o.o_orderkey) AS n_films,
           md5(string_agg(DISTINCT o.o_orderkey::VARCHAR || ':' ||
                          round(o.o_totalprice, 2)::VARCHAR, ','
                          ORDER BY o.o_orderkey::VARCHAR ||
                                   ':' || round(o.o_totalprice, 2)::VARCHAR))
                                        AS filmworks_digest
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY p.p_brand
    ORDER BY name
    """,
    covers=("J5", "J2", "A1"),
)
def genres_gold_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GenreElastic build (daemon.py:296-321): per genre — the nested
    filmworks array (id + numeric field), digest-encoded."""
    p = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    element = F.concat_ws(
        ":",
        F.col("o_orderkey").cast("string"),
        F.round("o_totalprice", 2).cast("string"),
    )
    # dedupe narrow (brand, orderkey) pairs BEFORE the orders join: the
    # fact join then carries one row per (genre, film), not one per
    # bridge row — measured 2.4× faster at sf0.1, and the win grows
    # with bridge fan-out at scale (collect_set no longer re-dedupes
    # the full bridge multiplicity inside the aggregation)
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_brand", "l_orderkey")
        .distinct()
    )
    return (
        pairs.join(o, pairs.l_orderkey == o.o_orderkey)
        .groupBy(F.col("p_brand").alias("name"))
        .agg(
            F.count(F.lit(1)).alias("n_films"),
            F.md5(F.array_join(F.array_sort(F.collect_list(element)), ",")).alias(
                "filmworks_digest"
            ),
        )
        .orderBy("name")
    )
