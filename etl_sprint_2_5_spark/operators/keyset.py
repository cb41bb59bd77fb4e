"""Keyset-cursor incremental scan — SURVEY.md §2.1 S2 / §2.2 P6.

The reference's CDC producer reads "rows strictly after composite
cursor (ts, id)" with ``WHERE (ts = :t AND id > :last) OR ts > :t
ORDER BY ts, id LIMIT n`` (/root/reference/postgres_to_es/
daemon.py:110-117). Same semantics here as a composite-struct
comparison, which Catalyst pushes into the scan as two range
predicates — at scale this prunes parquet row groups / partitions on
the timestamp column instead of scanning history.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def after_cursor(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    cursor_ts: dt.datetime | str,
    cursor_id: int | str,
) -> Column:
    """Predicate: (ts, id) strictly greater than the cursor."""
    ts = F.col(ts_col)
    i = F.col(id_col)
    t = F.lit(cursor_ts).cast("timestamp")
    return ((ts == t) & (i > F.lit(cursor_id))) | (ts > t)


def keyset_batch(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    cursor_ts: dt.datetime | str,
    cursor_id: int | str,
    batch_size: int,
) -> DataFrame:
    """One producer batch: filter after cursor, total order, limit."""
    return (
        df.where(after_cursor(df, ts_col, id_col, cursor_ts, cursor_id))
        .orderBy(F.col(ts_col), F.col(id_col))
        .limit(batch_size)
    )
