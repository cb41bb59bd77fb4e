"""JSONL/CSV ingestion: declared-schema parsing, corrupt-record
quarantine, and the good/bad split contract."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_sprint_2_5_spark.sources.text_files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_jsonl_good_and_corrupt(spark, tmp_path):
    p = os.path.join(tmp_path, "in.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "a", "score": 0.5}\n')
        f.write('{"id": 2, "name": "b", "score": 1.5}\n')
        f.write("this is not json\n")
        f.write('{"id": "not-a-number", "name": "c", "score": 2.0}\n')
    df = read_jsonl(spark, p, SCHEMA)
    assert CORRUPT_COL in df.columns
    good, bad = split_corrupt(df)
    rows = {r["id"]: (r["name"], r["score"]) for r in good.collect()}
    assert rows == {1: ("a", 0.5), 2: ("b", 1.5)}
    quarantined = [r["raw_record"] for r in bad.collect()]
    assert len(quarantined) == 2
    assert any("not json" in q for q in quarantined)
    assert any("not-a-number" in q for q in quarantined)


def test_csv_good_and_corrupt(spark, tmp_path):
    p = os.path.join(tmp_path, "in.csv")
    with open(p, "w") as f:
        f.write("id,name,score\n")
        f.write('1,"alpha, the first",0.5\n')
        f.write("2,beta,oops\n")  # bad double
        f.write("3,gamma,2.25\n")
    df = read_csv(spark, p, SCHEMA)
    good, bad = split_corrupt(df)
    rows = {r["id"]: (r["name"], r["score"]) for r in good.collect()}
    assert rows == {1: ("alpha, the first", 0.5), 3: ("gamma", 2.25)}
    assert bad.count() == 1


def test_schema_not_widened_twice(spark, tmp_path):
    from etl_sprint_2_5_spark.sources.text_files import _with_corrupt

    once = _with_corrupt(SCHEMA)
    assert _with_corrupt(once) == once
