"""Physical-plan audit for the headline queries.

Prints, per query: #shuffle exchanges, #broadcast exchanges/joins,
whether parquet filter pushdown and column pruning reached the scans,
and the fraction of the plan inside whole-stage codegen — the
properties that decide whether a plan survives a 100× scale-up.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"


def audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    pushed = sum(1 for s in scans if "PushedFilters: [" in s and "PushedFilters: []" not in s)
    return {
        "shuffles": len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange|BroadcastHashJoin", plan)) // 2,
        "scans": len(scans),
        "scans_with_pushdown": pushed,
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        # cached-subtree reads: the static plan text re-prints a cached
        # subtree at every reference, inflating the shuffle/scan counts
        # above EXECUTED reality (each cached subtree runs once). A
        # nonzero imts is the signal to read shuffles as an upper bound.
        "imts": len(re.findall(r"InMemoryTableScan", plan)),
    }


def main() -> None:
    from pyspark.sql import SparkSession

    from etl_sprint_2_5_spark import plans

    plans.load_all()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        # plain pre-AQE plans so codegen spans and exchanges are visible
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    names = sys.argv[1:] or sorted(plans.REGISTRY)
    w = max(len(n) for n in names)
    for name in names:
        try:
            info = audit(plans.REGISTRY[name].fn(spark, SF_DIR))
            print(
                f"{name:<{w}}  shuffles={info['shuffles']:<2} "
                f"bcast={info['broadcasts']:<2} smj={info['sort_merge_joins']:<2} "
                f"scans={info['scans_with_pushdown']}/{info['scans']} pushed  "
                f"codegen={info['codegen_stages']}"
                + (
                    f"  imts={info['imts']} (cached subtrees repeat in the"
                    " static text; shuffle/scan counts are upper bounds)"
                    if info["imts"]
                    else ""
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:<{w}}  ERROR {str(e)[:80]}")


if __name__ == "__main__":
    main()
