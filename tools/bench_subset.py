"""Targeted micro-bench: run a chosen subset of registered queries
through the same noop-sink methodology as bench.py, with N batches and
per-query medians — the measurement loop for optimization work
(guide §1.1's empirical side) without paying for the full headline
list on every iteration.

Usage: python tools/bench_subset.py [--batches N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    batches = 1
    if args and args[0] == "--batches":
        batches = int(args[1])
        args = args[2:]
    names = args
    if not names:
        raise SystemExit("usage: bench_subset.py [--batches N] query ...")

    from etl_sprint_2_5_spark import plans
    from etl_sprint_2_5_spark.session import get_spark

    plans.load_all()
    spark = get_spark("bench_subset")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # same warmup as bench.py: JVM/codegen + the Arrow worker pool
    force(plans.REGISTRY["point_lookup"].fn(spark, SF_DIR))
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s):  # noqa: ANN001, ANN202
        return s

    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, 1024 * n_workers, 1, n_workers).select(
        _noop(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    per_batch: list[dict[str, float]] = []
    for _b in range(batches):
        t: dict[str, float] = {}
        for name in names:
            q = plans.REGISTRY[name]
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            force(q.fn(spark, SF_DIR))
            t[name] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
        per_batch.append(t)
    med = {
        n: sorted(bt[n] for bt in per_batch)[batches // 2] for n in names
    }
    print(json.dumps({"queries": med, "batches": batches,
                      "per_batch": per_batch, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
