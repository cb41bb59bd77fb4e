"""Skew-mitigation join patterns (no counterpart in the reference —
its joins ran inside PostgreSQL; this is the 100 TB toolbox the brief
requires for keys whose frequency distribution would wedge a shuffle).

Two layers of defense:

1. **AQE skew-join** (enabled in session.py) splits oversized shuffle
   partitions at runtime — free, use it first.
2. **Explicit salting** (here) for the pathological case AQE can't fix:
   a single join KEY too hot for any partition split (one user id with
   10⁸ rows). Fact side gets a deterministic salt in [0, factor); the
   dimension side is replicated once per salt value; the join key
   becomes (key, salt), spreading each hot key over ``factor`` tasks.

Deterministic salt (xxhash64 of a designated unique column) rather
than rand(): retries/recomputation land rows in the same partition,
which keeps the plan replayable (Spark may recompute a lost partition
independently — a rand() salt silently double-counts under retry with
non-idempotent downstream sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_fact(df: DataFrame, unique_col: str, factor: int) -> DataFrame:
    """Attach a deterministic salt in [0, factor) derived from a
    unique column of the fact row."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(factor)).cast("int")
    )


def replicate_dim(df: DataFrame, factor: int) -> DataFrame:
    """Replicate the (small) dimension once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_unique_col: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: result ≡ fact.join(dim, on, how), but
    each hot key spreads over ``factor`` shuffle partitions. The dim
    side grows ×factor — keep factor · |dim| well under the fact size."""
    f = salt_fact(fact, fact_unique_col, factor)
    d = replicate_dim(dim, factor)
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)


def salted_agg_counts(
    df: DataFrame,
    key_col: str,
    unique_col: str,
    value_col: str,
    factor: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation for pathologically hot GROUP BY
    keys: stage 1 aggregates on (key, salt) — each hot key spreads
    over ``factor`` combiner cells across different tasks — stage 2
    merges the ≤ factor partials per key. Result ≡ a plain
    groupBy(key).agg(count, sum); sums stay integer-exact because the
    partials are integers (count) or fixed-pointed upstream.

    Spark's own map-side partial aggregation already covers MOST skew
    (partials combine before the shuffle); explicit salting is the
    escape hatch when the reduce-side per-key state itself is the
    bottleneck (e.g. count_distinct carrying a set per key)."""
    salted = salt_fact(df, unique_col, factor)
    partial = salted.groupBy(key_col, SALT_COL).agg(
        F.count(F.lit(1)).alias("_pn"),
        F.sum(value_col).alias("_ps"),
    )
    return partial.groupBy(key_col).agg(
        F.sum("_pn").alias("n_events"),
        F.sum("_ps").alias("value_sum"),
    )
