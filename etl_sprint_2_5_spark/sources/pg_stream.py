"""Live PostgreSQL keyset CDC as a REAL Structured Streaming source —
the PySpark-4 Python DataSource API (`spark.dataSource.register`)
wrapping the reference daemon's poll loop (postgres_to_es/
daemon.py:90-129,537-542) so Spark's own micro-batch engine owns the
cursor: offsets are the composite ``(updated_at, id)`` keyset cursor,
serialized into the query's checkpoint — crash recovery, replay and
exactly-once-effect sit on Spark's checkpoint contract instead of a
hand-rolled offset store.

Shape per micro-batch:

- ``latestOffset`` probes ``max(ts, id)`` driver-side (one indexed
  row: ``ORDER BY ts DESC, id DESC LIMIT 1``);
- ``partitions(start, end)`` probes ``min(id), max(id)`` over the
  cursor interval (one aggregate on the composite index) and tiles
  ``[lo, hi]`` into N CONTIGUOUS id ranges — each slice is one PK
  index range scan on the PG side (the sqlite_src.py min/max-probe
  pattern), not the scattered every-Nth-row scan an ``id %% N``
  tiling would cost;
- ``read`` runs ON THE EXECUTOR: one ``COPY (SELECT ... WHERE
  (ts, id) > start AND (ts, id) <= end AND id BETWEEN lo AND hi)
  TO STDOUT`` per slice — deterministic range reads, so a replayed
  batch re-reads exactly the same rows (the property checkpoint
  recovery needs).

Requirements: ``psql`` on PATH wherever partitions run (executors on
a real cluster; this container's local mode). The id column must be
integral and unique; ``(ts_col, id_col)`` should be indexed — the
same contract the reference's cursor query has.

Balance assumption: the contiguous tiling divides the interval's id
RANGE, not its row count — even slices assume DENSE ids (serial PK,
few deletes), which is the reference CDC table's contract
(postgres_init.sql: serial ids). If ids were sparse or clustered
(bulk deletes, id gaps from sequence caching), one slice could
receive most rows; the fix at that point is a percentile probe
(``percentile_disc`` over the interval, or repeated ntile bounds)
feeding the same BETWEEN pushdown — deliberately NOT paid here
because it costs an extra per-batch sort-aggregate on the hot poll
path that dense serial ids never need. Correctness is unaffected
either way: slices partition [lo, hi] exactly, only balance shifts.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_EPOCH = "1970-01-01 00:00:00"


def _convert(ddl: str):
    """Per-column text→python converters for an explicit DDL schema —
    COPY output is text; the engine wants typed tuples."""
    convs = []
    for f in ddl.split(","):
        typ = f.strip().split(None, 1)[1].strip().lower()
        if typ in ("bigint", "long", "int", "integer", "smallint"):
            convs.append(lambda v: None if v is None else int(v))
        elif typ in ("double", "float", "real", "double precision"):
            convs.append(lambda v: None if v is None else float(v))
        elif typ == "timestamp":
            convs.append(
                lambda v: None if v is None else dt.datetime.fromisoformat(v)
            )
        elif typ == "boolean":
            convs.append(lambda v: None if v is None else v in ("t", "true"))
        else:
            convs.append(lambda v: v)
    return convs


class PgKeysetPartition(InputPartition):
    """One contiguous id-range slice of a cursor interval (picklable
    plan unit): rows with ``id_lo <= id <= id_hi`` inside the keyset
    interval ``(start, end]``."""

    def __init__(self, start: dict, end: dict, id_lo: int, id_hi: int):
        self.start = start
        self.end = end
        self.id_lo = id_lo
        self.id_hi = id_hi


class PgKeysetStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offsets ARE the keyset cursor."""

    def __init__(self, schema_ddl: str, options: dict):
        self.ddl = schema_ddl
        self.dsn = options["dsn"]
        self.table = options["table"]
        self.ts_col = options["tscol"]
        self.id_col = options["idcol"]
        self.n_slices = int(options.get("slices", "2"))
        self.cols = ", ".join(
            f.strip().split()[0] for f in schema_ddl.split(",")
        )

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"ts": _EPOCH, "id": 0}

    def latestOffset(self) -> dict:
        from etl_sprint_2_5_spark.sources.pg_copy import pg_exec

        out = pg_exec(
            self.dsn,
            f"SELECT {self.ts_col}, {self.id_col} FROM {self.table} "
            f"ORDER BY {self.ts_col} DESC, {self.id_col} DESC LIMIT 1",
        ).strip()
        if not out:
            return self.initialOffset()
        ts, last_id = out.split("|")
        return {"ts": ts, "id": int(last_id)}

    # -- planning + execution -----------------------------------------
    def _interval_sql(self, s: dict, e: dict) -> str:
        from etl_sprint_2_5_spark.sources.pg_copy import pg_ts_literal

        return (
            f"({self.ts_col}, {self.id_col}) > "
            f"(TIMESTAMP '{pg_ts_literal(s['ts'])}', {int(s['id'])}) "
            f"AND ({self.ts_col}, {self.id_col}) <= "
            f"(TIMESTAMP '{pg_ts_literal(e['ts'])}', {int(e['id'])})"
        )

    def partitions(self, start: dict, end: dict):
        # driver-side: probe the interval's id extent (one aggregate
        # over the composite index), then tile [lo, hi] into
        # contiguous ranges — each slice is ONE index range scan
        from etl_sprint_2_5_spark.sources.pg_copy import pg_exec

        if (start["ts"], start["id"]) == (end["ts"], end["id"]):
            return []
        out = pg_exec(
            self.dsn,
            f"SELECT min({self.id_col}), max({self.id_col}) "
            f"FROM {self.table} WHERE {self._interval_sql(start, end)}",
        ).strip()
        lo_s, _, hi_s = out.partition("|")
        if not lo_s:  # interval advanced but holds no rows
            return []
        lo, hi = int(lo_s), int(hi_s)
        n = min(self.n_slices, hi - lo + 1)
        bounds = [lo + (hi - lo + 1) * k // n for k in range(n + 1)]
        return [
            PgKeysetPartition(start, end, bounds[k], bounds[k + 1] - 1)
            for k in range(n)
        ]

    def read(self, partition: PgKeysetPartition):
        # executor-side: one COPY stream per id range of the interval
        import subprocess

        from etl_sprint_2_5_spark.sources.pg_copy import (
            _NULL,
            _parse_csv_raw,
        )

        sql = (
            f"SELECT {self.cols} FROM {self.table} "
            f"WHERE {self._interval_sql(partition.start, partition.end)} "
            f"AND {self.id_col} BETWEEN {int(partition.id_lo)} "
            f"AND {int(partition.id_hi)} "
            f"ORDER BY {self.ts_col}, {self.id_col}"
        )
        proc = subprocess.run(
            [
                "psql", self.dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q",
                "-f", "-",
            ],
            input=(
                f"COPY ({sql}) TO STDOUT "
                f"WITH (FORMAT csv, NULL '{_NULL}')"
            ),
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"pg_keyset read failed: {proc.stderr.strip()}"
            )
        convs = _convert(self.ddl)
        # quote-aware NULL decode (pg_copy's round-trip contract):
        # only an UNQUOTED marker is NULL, so nullable text/numeric
        # columns survive — no NOT-NULL assumption on the CDC tables
        for rec in _parse_csv_raw(proc.stdout):
            yield tuple(
                c(None if (not q and v == _NULL) else v)
                for c, (q, v) in zip(convs, rec)
            )

    def commit(self, end: dict) -> None:
        # nothing external to release: the cursor lives in Spark's
        # checkpoint; reads are deterministic range queries
        return


class PgKeysetDataSource(DataSource):
    """``spark.readStream.format("pg_keyset")`` — options: dsn, table,
    tscol, idcol, readschema (explicit DDL), slices."""

    @classmethod
    def name(cls) -> str:
        return "pg_keyset"

    def schema(self) -> str:
        return self.options["readschema"]

    def streamReader(self, schema) -> PgKeysetStreamReader:  # noqa: ANN001
        return PgKeysetStreamReader(self.options["readschema"], self.options)
