"""Unit tests for keyset cursor and pagination operators."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.keyset import keyset_batch
from etl_sprint_2_5_spark.operators.pagination import paginate, top_k_per_group

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _cdc(spark):
    rows = [
        (1, T0),
        (2, T0),               # tie on ts with id 1 — id breaks the tie
        (3, T0 + dt.timedelta(seconds=1)),
        (4, T0 + dt.timedelta(seconds=2)),
    ]
    return spark.createDataFrame(rows, ["id", "ts"])


def test_keyset_strictly_after_composite_cursor(spark):
    # cursor (T0, 1): id 2 (tie, greater id) and later rows qualify
    got = keyset_batch(_cdc(spark), "ts", "id", T0, 1, batch_size=10)
    assert [r["id"] for r in got.collect()] == [2, 3, 4]


def test_keyset_batch_limit(spark):
    got = keyset_batch(_cdc(spark), "ts", "id", T0, 0, batch_size=2)
    assert [r["id"] for r in got.collect()] == [1, 2]


def _nums(spark):
    return spark.createDataFrame([(i, i % 3) for i in range(10)], ["id", "g"])


def test_paginate_pages_partition_rows(spark):
    df = _nums(spark)
    p1 = paginate(df, [F.col("id")], F.col("id"), page=1, limit=4)
    p2 = paginate(df, [F.col("id")], F.col("id"), page=2, limit=4)
    p3 = paginate(df, [F.col("id")], F.col("id"), page=3, limit=4)
    assert [r["id"] for r in p1.collect()] == [0, 1, 2, 3]
    assert [r["id"] for r in p2.collect()] == [4, 5, 6, 7]
    assert [r["id"] for r in p3.collect()] == [8, 9]


def test_paginate_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        paginate(_nums(spark), [F.col("id")], F.col("id"), page=0, limit=4)
    with pytest.raises(ValueError):
        paginate(_nums(spark), [F.col("id")], F.col("id"), page=1, limit=0)


def test_top_k_per_group(spark):
    got = top_k_per_group(
        _nums(spark), [F.col("g")], [F.col("id").desc()], k=2
    )
    by_group = {}
    for r in got.collect():
        by_group.setdefault(r["g"], []).append(r["id"])
    assert by_group == {0: [9, 6], 1: [7, 4], 2: [8, 5]}
