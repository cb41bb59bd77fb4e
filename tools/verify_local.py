"""Local stand-in for the driver's correctness gate.

Runs every query in __spark_entry__.queries() at sf0.01 via Spark AND
its oracle_sql() via DuckDB, then compares: row count, column names,
and order-insensitive values (columns sorted by name, rows sorted,
floats compared exactly after both sides' ROUND).

Usage: python tools/verify_local.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connect() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # cap the oracle engine: an unbounded DuckDB plus a mis-ordered
    # join once filled the whole disk with temp spill at sf1, wedging
    # the Spark session sharing the machine (round-8 incident) — a
    # failed oracle should fail ITS query, not the gate run
    con.execute("SET memory_limit='24GB'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        # driver-generated testdata is a single file; Spark-written
        # tables (e.g. the .testdata_sf1 replicas) are directories
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def normalize(df) -> list[tuple]:
    """Columns sorted by name, rows sorted by string repr."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(_norm_val(v) for v in row))
    return sorted(rows, key=repr), cols


def _norm_val(v):
    """Normalize a scalar, KEEPING its numeric kind.

    The driver's hash gate distinguishes int from float (DuckDB
    HUGEINT sums surface as float64 in pandas while Spark emits
    BIGINT), so a type-blind compare here would print ALL GREEN for
    queries the driver fails.  Tag every numeric value with its kind
    so 1435 != 1435.0 locally too.
    """
    import math

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return ("f", "NaN")
        # kill -0.0 and representation jitter after upstream rounding
        return ("f", round(v, 9) + 0.0)
    return v


def main() -> int:
    import __spark_entry__ as e
    from etl_sprint_2_5_spark.session import get_spark

    args = sys.argv[1:]
    if "--cold" in args:
        # cold-path check: clear the prepared-artifact cache so every
        # index/training step runs inline (results must be identical —
        # training is deterministic)
        import shutil

        from etl_sprint_2_5_spark.artifacts import artifact_root

        shutil.rmtree(artifact_root(), ignore_errors=True)
        args = [a for a in args if a != "--cold"]
    only = set(args)
    spark = get_spark("verify_local")
    con = duck_connect()
    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        srows, scols = normalize(sdf)
        orows, ocols = normalize(odf)
        status = []
        if scols != ocols:
            status.append(f"cols spark={scols} oracle={ocols}")
        if len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        elif scols == ocols and srows != orows:
            n_bad = sum(1 for a, b in zip(srows, orows) if a != b)
            diff = next((a, b) for a, b in zip(srows, orows) if a != b)
            status.append(f"values differ ({n_bad}/{len(srows)} rows), first: spark={diff[0]} oracle={diff[1]}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        # drop any cached intermediates a query left behind — a
        # 177-query sweep otherwise accumulates executor storage
        spark.catalog.clearCache()
    if not only:
        try:
            res = e.entry(spark)
            n = res.count()
            print(f"OK    entry(): {n} rows, schema: {[f.name for f in res.schema.fields]}")
        except Exception as ex:  # noqa: BLE001
            failures.append("entry")
            print(f"FAIL  entry(): {ex}")
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
