"""RocksDB state store for the stateful streaming twins — the
100-TB-scale state backend (SURVEY §2.8 T-family scale story).

The default HDFSBackedStateStoreProvider keeps every key's state in
executor MEMORY with full-snapshot checkpoints — fine at test scale,
a hard ceiling when a stateful query holds billions of keys. Spark
ships RocksDBStateStoreProvider (on-disk state, incremental
changelog checkpoints) exactly for that; flipping the provider is a
session conf, no query change. These tests prove the WHOLE gated
stateful family — keyed first-occurrence dedup, the
applyInPandasWithState as-of join and last-touch attribution, and a
native session-window aggregate — produces results identical to its
batch twin under RocksDB, so the scale-out backend is a config away,
not a rewrite, for every kind of state the engine keeps (custom
python state, native window state, dedup key sets).

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

# (batch twin, streaming twin) — one pair per kind of streaming state:
# custom keyed dedup state, applyInPandasWithState user state (as-of
# buffer, attribution last-touch), native session-window store.
TWINS = (
    ("stateful_event_dedup", "streaming_stateful_event_dedup"),
    ("asof_last_error", "streaming_asof_last_error"),
    ("last_touch_attribution", "streaming_last_touch_attribution"),
    ("session_windows", "streaming_session_window_agg"),
)


def _common_rows(a_df, b_df):
    """Row sets over the twins' SHARED columns, sorted by column name
    (twins may differ in auxiliary columns; the shared ones are the
    semantics)."""
    cols = sorted(set(a_df.columns) & set(b_df.columns))
    assert cols, (a_df.columns, b_df.columns)

    def rows(df):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    return rows(a_df), rows(b_df)


@pytest.mark.parametrize(("batch_name", "stream_name"), TWINS)
def test_stateful_twin_green_under_rocksdb(spark, batch_name, stream_name):
    load_all()
    batch_df = REGISTRY[batch_name].fn(spark, SF_SMOKE)
    prev = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, ROCKSDB)
    try:
        stream_df = REGISTRY[stream_name].fn(spark, SF_SMOKE)
        want, got = _common_rows(batch_df, stream_df)
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


def test_kmv_bottomk_stream_green_under_rocksdb(spark):
    """The 5th kind of streaming state — array-valued bottom-k KMV
    samples (≤ k longs per group) — under RocksDB: the gated query's
    own streamed_equals_direct identity doubles as the witness that
    the fold through the state store is bit-exact."""
    load_all()
    prev = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, ROCKSDB)
    try:
        row = REGISTRY["streaming_kmv_estimates"].fn(spark, SF_SMOKE).collect()
    except Exception as e:  # noqa: BLE001
        if "RocksDB" in str(e) or "UnsatisfiedLink" in str(e):
            pytest.skip(f"RocksDB state store unavailable: {e}")
        raise
    finally:
        if prev is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, prev)
    assert len(row) == 1
    assert row[0]["streamed_equals_direct"] is True
    assert row[0]["k_streamed"] > 0
