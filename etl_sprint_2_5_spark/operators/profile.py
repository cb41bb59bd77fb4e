"""Data-profiling operators — column-level null/distinct statistics
and k-anonymity group audits.

The reference validates its inputs row-by-row at ETL time
(/root/reference/postgres_to_es/models.py pydantic validation,
sqlite_to_postgresql/etl.py:60-78 per-row coercion); a warehouse-side
engine instead profiles whole columns declaratively. Both operators
here are single-aggregate plans: the profile is ONE pass over the
table producing one row (then pivoted to rows driver-side by a
20-column stack, not a shuffle), and the k-anonymity audit is one
map-side-combinable groupBy.

At 100 TB: count_distinct is the only non-streaming aggregate —
the scale path swaps approx_count_distinct (HLL, mergeable, fixed
memory) via ``exact=False`` without changing the output contract
beyond documented error bounds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """Per-column profile: (column_name, n_nulls, n_distinct).

    One aggregate over the table computes every statistic, then a
    ``stack`` unpivots the single result row into one row per column
    — the unpivot touches len(cols) values, not the data.
    """
    aggs: list = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        nd = F.countDistinct(F.col(c)) if exact else F.approx_count_distinct(c)
        aggs.append(nd.alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{c}', __nn_{c}, __nd_{c}" for c in cols)
    return row.select(
        F.expr(
            f"stack({len(cols)}, {pairs}) AS (column_name, n_nulls, n_distinct)"
        )
    )


def k_anonymity_audit(
    df: DataFrame, quasi_identifiers: Sequence[str], k: int
) -> DataFrame:
    """Group sizes over the quasi-identifier columns with an
    ``at_risk`` flag (group smaller than k ⇒ re-identifiable).
    Integer flag, not boolean, so the result crosses engines
    hash-stably."""
    return df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.when(F.count(F.lit(1)) < k, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("at_risk"),
    )
