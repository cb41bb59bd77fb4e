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
- ``partitions(start, end)`` tiles the half-open cursor interval
  ``(start, end]`` into N id-sliced partitions, so the batch's wire
  transfer is N concurrent COPY streams (the S2 keyset tiling proven
  on the live planner in tests/test_pg_live.py, here driven by the
  streaming engine);
- ``read`` runs ON THE EXECUTOR: one ``COPY (SELECT ... WHERE
  (ts, id) > start AND (ts, id) <= end AND id %% N = k) TO STDOUT``
  per slice — deterministic range reads, so a replayed batch re-reads
  exactly the same rows (the property checkpoint recovery needs).

Requirements: ``psql`` on PATH wherever partitions run (executors on
a real cluster; this container's local mode). The id column must be
integral and unique; ``(ts_col, id_col)`` should be indexed — the
same contract the reference's cursor query has.
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
    """One id-slice of a cursor interval (picklable plan unit)."""

    def __init__(self, start: dict, end: dict, n_slices: int, k: int):
        self.start = start
        self.end = end
        self.n_slices = n_slices
        self.k = k


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
    def partitions(self, start: dict, end: dict):
        if (start["ts"], start["id"]) == (end["ts"], end["id"]):
            return []
        return [
            PgKeysetPartition(start, end, self.n_slices, k)
            for k in range(self.n_slices)
        ]

    def read(self, partition: PgKeysetPartition):
        # executor-side: one COPY stream per id slice of the interval
        import csv
        import io
        import subprocess

        s, e, n, k = (
            partition.start, partition.end,
            partition.n_slices, partition.k,
        )
        sql = (
            f"SELECT {self.cols} FROM {self.table} "
            f"WHERE ({self.ts_col}, {self.id_col}) > "
            f"(TIMESTAMP '{s['ts']}', {int(s['id'])}) "
            f"AND ({self.ts_col}, {self.id_col}) <= "
            f"(TIMESTAMP '{e['ts']}', {int(e['id'])}) "
            f"AND {self.id_col} % {n} = {k} "
            f"ORDER BY {self.ts_col}, {self.id_col}"
        )
        proc = subprocess.run(
            [
                "psql", self.dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q",
                "-f", "-",
            ],
            input=f"COPY ({sql}) TO STDOUT WITH (FORMAT csv)",
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"pg_keyset read failed: {proc.stderr.strip()}"
            )
        convs = _convert(self.ddl)
        # plain csv.reader is safe here: this stream carries no NULL
        # marker (COPY csv default NULL is the empty UNQUOTED string,
        # and the CDC tables gated through this source are NOT NULL)
        for rec in csv.reader(io.StringIO(proc.stdout)):
            yield tuple(c(v) for c, v in zip(convs, rec))

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
