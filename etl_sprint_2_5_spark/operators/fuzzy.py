"""Blocked fuzzy matching — entity-resolution candidate generation +
edit-distance scoring without an all-pairs comparison.

The scale shape: rows join on cheap BLOCKING keys (prefix, length
band, phonetic bucket, ...) so candidate pairs exist only inside a
block; the O(n²) edit distance runs per block, never per corpus —
same family as the LSH band-bucket design in operators/dedup.py, with
Levenshtein instead of Jaccard as the verifier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_exprs: list[Column],
    max_dist: int,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing every blocking key, kept
    when levenshtein(text_a, text_b) ≤ max_dist.

    Blocking keys are caller-supplied expressions over the row (e.g.
    ``[F.substring("name", 1, 4), F.length("name")]``). Choose them so
    blocks stay small — the equi-join on the keys is the only shuffle,
    and the in-block pair expansion is the only quadratic term.
    Levenshtein is exact and integer-valued, so results are engine-
    exact (no float contract needed)."""
    keys = [e.alias(f"_bk{i}") for i, e in enumerate(block_exprs)]
    key_names = [f"_bk{i}" for i in range(len(block_exprs))]
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"), *keys
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"), *keys
    )
    pairs = a.join(b, key_names).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.levenshtein("_ta", "_tb").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
