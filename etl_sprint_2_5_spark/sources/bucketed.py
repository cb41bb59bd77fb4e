"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins
— the storage-layout half of the 100 TB design (SURVEY.md §4: the
reference leans on PostgreSQL indexes; Spark's equivalent for repeated
big-big joins is bucketing).

Writing both sides of a recurring join bucketed BY THE JOIN KEY into
the same bucket count lets every subsequent join/groupBy on that key
skip its Exchange entirely — the single biggest repeated-cost saving
for a fact table joined daily. Verified in tests by asserting the
joined plan contains no shuffle.

Bucketing requires the session catalog (``saveAsTable``) — bucket
metadata lives in the metastore, not the parquet footer.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed catalog table (overwrites).

    Drops any previous table AND its leftover managed location first —
    a fresh in-memory catalog with a stale warehouse dir (e.g. across
    test sessions) otherwise fails with LOCATION_ALREADY_EXISTS."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[5:]
    leftover = os.path.join(warehouse, table.lower())
    if warehouse and os.path.isdir(leftover):
        shutil.rmtree(leftover)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans SortMergeJoin with NO Exchange on
    either side."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on, how)
