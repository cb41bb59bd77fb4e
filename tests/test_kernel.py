"""Unit tests for the scalar kernel (SURVEY.md §2.7 F1-F10, P2/P7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions import kernel as K


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_clean_sentinels(spark):
    df = spark.createDataFrame(
        [("N/A",), ("",), ("ok",), (None,)], ["x"]
    ).select(K.clean_sentinels("x").alias("v"))
    assert [r["v"] for r in df.collect()] == [None, None, "ok", None]


def test_csv_to_array_dedups(spark):
    v = one(spark, K.csv_to_array(F.lit("Action, Drama, Action")))
    assert v == ["Action", "Drama"]


def test_json_ids_dedups(spark):
    v = one(spark, K.json_ids(F.lit('[{"id":"a"},{"id":"b"},{"id":"a"}]')))
    assert v == ["a", "b"]


def test_json_ids_malformed_is_null(spark):
    assert one(spark, K.json_ids(F.lit("not json"))) is None


def test_to_double_sentinel_and_cast(spark):
    assert one(spark, K.to_double(F.lit("8.6"))) == 8.6
    assert one(spark, K.to_double(F.lit("N/A"))) is None


def test_pluck_with_role_filter(spark):
    df = spark.createDataFrame(
        [([("p1", "actor"), ("p2", "writer")],)],
        "persons: array<struct<name:string,role:string>>",
    )
    got = df.select(
        K.pluck("persons", "name", role="actor").alias("v")
    ).first()["v"]
    assert got == ["p1"]


def test_coalesce_empty_array(spark):
    df = spark.createDataFrame([([1, 2],), (None,)], "x: array<int>")
    got = [r["v"] for r in df.select(K.coalesce_empty_array("x").alias("v")).collect()]
    assert got == [[1, 2], []]


def test_epoch_zero_and_sentinel(spark):
    assert str(one(spark, K.epoch_zero())) == "1970-01-01 00:00:00"
    assert one(spark, K.uuid_sentinel()) == "00000000-0000-0000-0000-000000000000"
