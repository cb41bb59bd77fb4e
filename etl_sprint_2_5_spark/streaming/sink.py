"""Idempotent keyed sink — SURVEY.md §2.1 S5 / §2.8 T3.

The reference gets exactly-once *effect* from at-least-once delivery
plus ES ``_id = doc.id`` overwrite semantics
(/root/reference/postgres_to_es/daemon.py:358-381). The parquet
equivalent is upsert-by-key: replace existing rows sharing a key with
the incoming batch, keep the rest. Re-delivering the same batch is a
no-op — which is what makes commit-AFTER-sink safe.

Local implementation: read-old → anti-join on incoming keys → union →
atomic directory swap. On a real cluster this is a Delta/Iceberg
``MERGE INTO`` (file-level rewrite pruned by key stats) or the
es-hadoop connector's ``es.mapping.id`` upsert — the call shape here
is the same, swap the one function.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_keyed_parquet(
    spark: SparkSession, batch: DataFrame, path: str, key: str
) -> None:
    """Upsert ``batch`` into the parquet dir at ``path`` by ``key``."""
    tmp = path + ".swap"
    if os.path.exists(path):
        old = spark.read.parquet(path)
        keys = batch.select(key).distinct()
        merged = old.join(F.broadcast(keys), key, "left_anti").unionByName(batch)
    else:
        merged = batch
    # materialize BEFORE touching the target (merged reads the target)
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def read_view(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
