"""Gold denormalized nested-document views — SURVEY.md §2.3 J3-J5 /
§2.4 A1-A3, the shape the CDC daemon rebuilds per batch
(/root/reference/postgres_to_es/daemon.py:160-196,249-271,296-321).

Pattern: decorrelate the reference's LEFT JOIN LATERAL into
``bridge ⨝ dim → groupBy(fact_key) → collect_list(struct(...))`` then
left-join onto the fact and coalesce NULL → empty array (P7,
daemon.py:210-213). Catalyst plans the same thing for a lateral join;
writing it explicitly keeps the plan obvious.

Scale: the bridge⨝dim join broadcasts the dim; the groupBy and the
fact join share the fact-key partitioning, so one shuffle builds the
whole document. Arrays are sorted for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.sources.parquet import load_table


def nested_children(
    bridge: DataFrame,
    fact_key: str,
    child_struct: list,
    out_col: str,
) -> DataFrame:
    """Aggregate child structs per fact key, deterministically sorted."""
    return bridge.groupBy(fact_key).agg(
        F.array_sort(F.collect_list(F.struct(*child_struct))).alias(out_col)
    )


def order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """movies_gold-shaped document build on the testdata topology:
    orders ≅ film_work, lineitem ≅ person_film_work, part ≅ person.

    Output per order: scalar fields + items array<struct> + plucked
    name arrays — mirroring MovieElastic (daemon.py:43-56) with
    actors → items, actors_names → part_names.
    """
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)

    enriched = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    children = nested_children(
        enriched,
        "l_orderkey",
        [
            F.col("p_partkey").alias("id"),
            F.col("p_name").alias("name"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_linenumber").alias("linenumber"),
        ],
        "items",
    )
    return (
        o.join(children, o.o_orderkey == children.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.coalesce("items", F.array()).alias("items"),
            F.transform(F.coalesce("items", F.array()), lambda x: x["name"]).alias(
                "item_names"
            ),
            F.size(F.coalesce("items", F.array())).alias("n_items"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
