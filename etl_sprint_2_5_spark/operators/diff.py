"""Snapshot reconciliation: classify every key across two versions of
a dataset as added / removed / changed / unchanged.

The audit primitive behind CDC validation, backfill verification, and
migration sign-off (the reference's IVM correctness story — "does the
incremental result equal the batch rebuild?" — is exactly a snapshot
diff with an expected-empty changed set).

Shape: ONE full outer join hash-partitioned on the keys — both sides
shuffle once, no broadcast assumption (snapshots are the same order of
magnitude by definition). Attribute comparison is null-safe
(``<=>``): a NULL→NULL attribute is unchanged, NULL→value is changed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Row-level diff of two snapshots on ``key_cols``.

    Returns keys + ``change_type`` ∈ {added, removed, changed,
    unchanged} + old_/new_ prefixed compare columns (NULL on the
    missing side)."""
    o = old.select(
        *key_cols,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, list(key_cols), "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    change_type = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~same, "changed")
        .otherwise("unchanged")
    )
    return joined.select(
        *key_cols,
        change_type.alias("change_type"),
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )
