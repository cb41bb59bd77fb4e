"""bounded_state_shuffle: the stateful-aggregation shuffle width is
derived from the aggregate's key-space bound (ceil(bound/keys_per) in
[1, session default]) and the session value is restored afterwards —
including when the body raises."""

from __future__ import annotations

import pytest


def _cm():
    from etl_sprint_2_5_spark.plans.events_queries import (
        bounded_state_shuffle,
    )

    return bounded_state_shuffle


KEY = "spark.sql.shuffle.partitions"


def test_width_derivation_and_restore(spark):
    bounded_state_shuffle = _cm()
    prev = spark.conf.get(KEY)
    try:
        spark.conf.set(KEY, "32")
        with bounded_state_shuffle(spark, 2048, keys_per_partition=256) as w:
            assert w == 8
            assert spark.conf.get(KEY) == "8"
        assert spark.conf.get(KEY) == "32"
        # clamped to the session default when the bound is large
        with bounded_state_shuffle(spark, 10**9) as w:
            assert w == 32
        # floored at 1 for tiny key spaces
        with bounded_state_shuffle(spark, 3, keys_per_partition=256) as w:
            assert w == 1
    finally:
        spark.conf.set(KEY, prev)


def test_restores_on_exception(spark):
    bounded_state_shuffle = _cm()
    prev = spark.conf.get(KEY)
    try:
        spark.conf.set(KEY, "32")
        with pytest.raises(RuntimeError, match="boom"):
            with bounded_state_shuffle(spark, 8, keys_per_partition=2):
                assert spark.conf.get(KEY) == "4"
                raise RuntimeError("boom")
        assert spark.conf.get(KEY) == "32"
    finally:
        spark.conf.set(KEY, prev)
