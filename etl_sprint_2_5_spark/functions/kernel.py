"""Scalar expression kernel — SURVEY.md §2.7 F1-F10.

Each helper returns a Column built purely from pyspark.sql.functions,
so every use stays inside whole-stage codegen (no Python in the hot
path). Reference citations point at the row-at-a-time Python these
replace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel values the legacy source uses for "no data"
# (/root/reference/sqlite_to_postgresql/etl.py:38-46 EMPTY_VALUES).
EMPTY_VALUES = ("N/A", "")


def clean_sentinels(col: Column | str) -> Column:
    """P2: ``"N/A"`` / ``""`` → NULL (etl.py:49-59,73-76,82-85)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*EMPTY_VALUES), F.lit(None)).otherwise(c)


def csv_to_array(col: Column | str, sep: str = ", ") -> Column:
    """F1: split comma-separated list into array, dropping dups.

    Mirrors ``genre.split(", ")`` + ``list(set(...))``
    (movie_admin models.py:17-23) — split then array_distinct.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(F.split(c, sep))


def json_ids(col: Column | str) -> Column:
    """F2: parse legacy ``writers`` JSON ``[{"id": ...}]`` → array of ids.

    Replaces ``json.loads(movie["writers"])`` + per-item pluck + dedup
    (etl.py:98-103).
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, "array<struct<id:string>>")
    return F.array_distinct(F.transform(parsed, lambda x: x["id"]))


def to_double(col: Column | str) -> Column:
    """F4: string→double cast with sentinel cleansing first
    (models.py:30 ``float(imdb_rating)``)."""
    return clean_sentinels(col).cast("double")


def uuid_sentinel() -> Column:
    """F5: the all-zero UUID used as 'before everything' id cursor
    (daemon.py:107)."""
    return F.lit("00000000-0000-0000-0000-000000000000")


def epoch_zero() -> Column:
    """F9: epoch-0 default timestamp (daemon.py:105-106)."""
    return F.lit("1970-01-01 00:00:00").cast("timestamp")


def iso_ts(col: Column | str) -> Column:
    """F7: ISO-8601 format with timezone colon (utils.py:11-16)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")


def pluck(col: Column | str, field: str, role: str | None = None) -> Column:
    """F10: project a field out of an array-of-structs, optionally
    filtered by role first (daemon.py:227-230 list comprehensions)."""
    c = F.col(col) if isinstance(col, str) else col
    if role is not None:
        c = F.filter(c, lambda p: p["role"] == role)
    return F.transform(c, lambda p: p[field])


def coalesce_empty_array(col: Column | str) -> Column:
    """P7: NULL → empty array, preserving the reference's
    'empty list, never null' doc contract (daemon.py:210-213)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.array())
