"""Query registry backing the driver contract (__spark_entry__.py).

Each registered query is:
- a Spark plan builder ``fn(spark, sf_dir) -> DataFrame``;
- an equivalent ANSI-SQL oracle string for DuckDB (or None for
  genuinely non-SQL-expressible operators — the driver then records a
  weaker rows-only check);
- a ``covers`` tag list naming the SURVEY.md §2 operator ids the query
  exercises, so coverage is auditable line-by-line.

Cross-engine determinism rules every query here follows:
- every computed column is aliased identically on both sides;
- double aggregates are ROUNDed on both sides;
- timestamps cross the boundary as epoch microseconds (bigint);
- any array crossing the boundary is sorted then joined to a string
  (hash comparison is value-based; array order must be deterministic).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    covers: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, covers: tuple[str, ...] = ()):  # noqa: ANN201
    """Decorator registering a plan builder under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, covers=covers, doc=(fn.__doc__ or "")
        )
        return fn

    return wrap
