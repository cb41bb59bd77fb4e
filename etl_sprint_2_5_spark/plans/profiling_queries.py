"""Data-quality / profiling queries with exact DuckDB oracles.

Warehouse-side generalization of the reference's row-level input
validation (postgres_to_es/models.py pydantic models;
sqlite_to_postgresql/etl.py per-row coercion): instead of validating
rows in flight, profile whole columns and audit group sizes
declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_sprint_2_5_spark.operators.profile import (
    k_anonymity_audit,
    profile_columns,
)
from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.sources.parquet import load_table

_ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c})   AS n_distinct
        FROM orders"""
        for c in _ORDER_COLS
    ]
    return (
        "\n UNION ALL \n".join(parts) + "\n ORDER BY column_name"
    )


@query(
    "column_profile",
    oracle=_profile_oracle(),
    covers=("X-profile-columns",),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-count + exact distinct-count profile of every orders
    column in ONE aggregate pass (the DuckDB oracle is the UNION ALL
    of six per-column scans — same answer, six passes; the engine
    plan is the one you want at 100 TB). ``exact=False`` swaps HLL
    approx_count_distinct for the mergeable fixed-memory variant."""
    o = load_table(spark, "orders", sf_dir)
    return profile_columns(o, _ORDER_COLS).orderBy("column_name")


@query(
    "k_anonymity_groups",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS group_size,
           CAST(CASE WHEN count(*) < 10 THEN 1 ELSE 0 END AS BIGINT)
             AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
    covers=("X-profile-kanon",),
)
def k_anonymity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over (nation, segment) quasi-identifiers:
    every equivalence class with its size and an at-risk flag
    (size < 10). One map-side-combinable groupBy — the audit cost
    is a count aggregate regardless of table size."""
    c = load_table(spark, "customer", sf_dir)
    return k_anonymity_audit(c, ("c_nationkey", "c_mktsegment"), k=10).orderBy(
        "c_nationkey", "c_mktsegment"
    )


def _cms_probe_union(width: int, depth: int, salt: str) -> str:
    parts = [
        f"""
        SELECT {d} AS row,
               ('0x' || substr(md5('{salt}:{d}:' || event_type), 1, 15))::BIGINT
                 % {width} AS bucket,
               event_type
        FROM events"""
        for d in range(depth)
    ]
    return "\n UNION ALL \n".join(parts)


@query(
    "cms_event_type_estimates",
    oracle=f"""
    WITH probes AS ({_cms_probe_union(512, 4, "cms-v1")}),
    cells AS (
      SELECT row, bucket, count(*) AS n
      FROM probes GROUP BY row, bucket
    ),
    key_probes AS (
      SELECT DISTINCT row, bucket, event_type FROM probes
    )
    SELECT p.event_type, CAST(min(c.n) AS BIGINT) AS est_count
    FROM key_probes p JOIN cells c USING (row, bucket)
    GROUP BY p.event_type
    ORDER BY p.event_type
    """,
    covers=("X-sketch-cms",),
)
def cms_event_type_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch end-to-end, oracle-checked: build the 4×512
    sketch over the event-type stream in one combinable pass, then
    point-query every observed key (min over the key's 4 cells). The
    sketch itself — not just its estimates — is deterministic because
    the hash rows are salted md5, so the DuckDB oracle rebuilds the
    identical cell table. CMS guarantees est ≥ true; with 5 distinct
    keys and width 512 there are no collisions, so est == true here
    (the bound tests in tests/test_sketch.py cover the collision
    regime)."""
    from etl_sprint_2_5_spark.operators.sketch import cms_build, cms_estimate

    ev = load_table(spark, "events", sf_dir)
    sketch = cms_build(ev, "event_type", width=512, depth=4)
    keys = ev.select("event_type").distinct()
    return cms_estimate(sketch, keys, "event_type", width=512, depth=4).orderBy(
        "event_type"
    )
