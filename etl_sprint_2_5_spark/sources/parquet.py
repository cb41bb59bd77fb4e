"""Parquet source for the driver's testdata tables.

Schema is asserted, not inferred (SURVEY.md §1.2: the reference is
schema-on-write everywhere — ``dynamic: strict`` ES mappings, pydantic
validation). Readers return plain DataFrames so every downstream
filter/projection is visible to Catalyst for pushdown into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

from etl_sprint_2_5_spark.schemas import TESTDATA_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one testdata table; verify the declared schema matches.

    Columns are selected explicitly so a renamed/reordered parquet file
    fails fast instead of silently shifting semantics.

    Timestamp normalization: parquet NANOS columns (events.ts) are
    illegal for Spark's vectorized reader, so they are read as long
    (``nanosAsLong``) and floored to microsecond timestamps; NTZ
    columns are cast to session-tz (UTC) timestamps so downstream
    epoch arithmetic matches the naive-UTC semantics of the data.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TESTDATA_SCHEMAS)}")
    if name == "events":
        # session.py sets this too; re-assert for externally-built sessions
        # (e.g. the driver's) — it is a runtime-settable SQL conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    expected = [f.name for f in TESTDATA_SCHEMAS[name].fields]
    missing = set(expected) - set(df.columns)
    if missing:
        raise ValueError(f"table {name}: missing columns {sorted(missing)}")
    df = df.select(*expected)
    for field in TESTDATA_SCHEMAS[name].fields:
        actual = df.schema[field.name].dataType
        if isinstance(field.dataType, TimestampType) and not isinstance(
            actual, TimestampType
        ):
            if isinstance(actual, LongType):  # nanos-as-long
                # integer div: long/1000 via `/` would round-trip through
                # double and lose precision above 2^53 ns (~1970+104 days)
                df = df.withColumn(
                    field.name,
                    F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
                )
            else:  # TIMESTAMP_NTZ → session-UTC timestamp
                df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, names: list[str] | None = None, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in (names or list(TESTDATA_SCHEMAS))}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name, df in load_tables(spark, sf_dir=sf_dir).items():
        df.createOrReplaceTempView(name)


def spread_partitions(df: DataFrame, key: str) -> DataFrame:
    """Fan a low-partition scan out to the session's parallelism for
    CPU-bound downstream stages.

    Splittable-format partitioning is BYTE-driven
    (``spark.sql.files.maxPartitionBytes``), which is the wrong unit
    for compute-heavy text/blob operators: a well-compressed corpus
    shard can be <1 MB on disk yet cost minutes of per-token hashing —
    scanned as ONE partition, the whole map stage runs on one core.
    This helper hash-repartitions on ``key`` only when the scan came
    back with fewer partitions than the session's parallelism; at real
    corpus sizes (many input splits) it is a no-op, so it costs
    nothing where the cluster is already busy and fixes exactly the
    small-file × heavy-CPU corner.

    Hash partitioning (not round-robin) keeps placement deterministic
    under task retry without the local sort Spark inserts for
    round-robin determinism.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))


def load_documents_spread(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """documents table pre-spread for per-token compute (tokenize /
    shingle / hash operators are CPU-bound, not IO-bound)."""
    return spread_partitions(load_table(spark, "documents", sf_dir), "doc_id")
