"""RocksDB state store for the stateful streaming twins — the
100-TB-scale state backend (SURVEY §2.8 T-family scale story).

The default HDFSBackedStateStoreProvider keeps every key's state in
executor MEMORY with full-snapshot checkpoints — fine at test scale,
a hard ceiling when a stateful query holds billions of keys. Spark
ships RocksDBStateStoreProvider (on-disk state, incremental
changelog checkpoints) exactly for that; flipping the provider is a
session conf, no query change. This test proves an EXISTING gated
twin — the keyed first-occurrence dedup, whose state merges across
micro-batches — produces identical results under RocksDB, so the
scale-out backend is a config away, not a rewrite.

Reference parity note: the reference daemon's only state is its
(ts, id) cursor (postgres_to_es/state.py) — Spark's stateful twins
hold real per-key state, which is why the backend matters here and
not there.
"""

from __future__ import annotations

import pytest

from etl_sprint_2_5_spark.plans import load_all
from etl_sprint_2_5_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_CONF = "spark.sql.streaming.stateStore.providerClass"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stateful_dedup_twin_green_under_rocksdb(spark):
    load_all()
    want = _rows(REGISTRY["stateful_event_dedup"].fn(spark, SF_SMOKE))
    prev = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, ROCKSDB)
    try:
        got = _rows(REGISTRY["streaming_stateful_event_dedup"].fn(spark, SF_SMOKE))
    except Exception as e:  # noqa: BLE001
        # config-gated like the connectors: a container whose Spark
        # build lacks the RocksDB JNI bundle skips, not fails
        if "RocksDB" in str(e) or "UnsatisfiedLink" in str(e):
            pytest.skip(f"RocksDB state store unavailable: {e}")
        raise
    finally:
        if prev is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, prev)
    assert got == want and len(want) > 0
