"""JSONL / CSV ingestion with strict schemas and corrupt-record
quarantine — the file-drop side door every production pipeline grows
(the reference's equivalent surface is its schema-on-write ES mappings
and pydantic-validated rows; here the same contract is applied to
semi-structured file input).

Design rules:

- **Schema is declared, never inferred.** Inference is a full extra
  pass over the data (fatal at 100 TB) and non-deterministic under
  corpus growth. Callers pass a StructType.
- **PERMISSIVE + quarantine, not fail-fast.** Bad rows land in a
  ``_corrupt_record`` column; ``split_corrupt`` separates them so the
  pipeline keeps moving and the reject stream is auditable (the
  reference's coroutine ETL skips+logs bad rows the same way —
  postgres_to_es/etl.py transform loop).
- The returned DataFrames are plain scans: Catalyst pushes filters
  and projections into the file source (CSV/JSON support column
  pruning; JSON additionally prunes parsed fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, multiline: bool = False
) -> DataFrame:
    """Newline-delimited JSON with a declared schema. Unparseable lines
    and type-mismatched fields surface in ``_corrupt_record``.

    JSONL splits by line, so a single huge file still fans out across
    executors (unlike ``multiLine=true``, which is one task per file —
    only use it for small config-ish payloads)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", str(multiline).lower())
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with a declared schema, PERMISSIVE corrupt-record capture,
    RFC-4180 quoting. Like JSONL, plain CSV is line-splittable; with
    ``multiLine`` (quoted newlines) it would not be."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): good rows with the corrupt column dropped,
    quarantined rows as (raw_record) for the reject/audit sink.

    Spark requires the parsed DataFrame to be cached (or re-read) to
    reference the corrupt column in a filter — see SPARK-21610; the
    cache here is the documented pattern."""
    cached = df.cache()
    good = cached.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad
