"""Plan sweep over every LAZY registry query (guide §7.2 at breadth):
compile each formatted plan and flag duplicated heavy subtrees —
>= 2 Generate nodes (exploded streams computed more than once) or
>= 3 scans of one table. Scenario queries (tempfile/write/collect/
streaming in their source) are skipped: constructing them executes
them. The round-15 continuation session found the kneser_ney 7-scan
defect and the dedup_repeated_substrings double span-hash with this.

Usage: python tools/plan_sweep.py
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"
SCENARIO_MARKERS = (
    "tempfile", "mkdtemp", ".write.", "collect()", "ephemeral_pg",
    "createDataFrame", "foreachBatch", "readStream", "prepared_",
)


def main() -> None:
    from etl_sprint_2_5_spark import plans
    from etl_sprint_2_5_spark.session import get_spark

    plans.load_all()
    spark = get_spark("plan_sweep")
    for name, q in sorted(plans.REGISTRY.items()):
        try:
            src = inspect.getsource(q.fn)
        except OSError:
            continue
        if any(m in src for m in SCENARIO_MARKERS):
            continue
        try:
            df = q.fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001 - sweep must not stop
            print(f"SKIP {name}: {str(e)[:70]}")
            continue
        gens = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
        scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
        if gens >= 2 or scans >= 3:
            print(f"{name:40s} Generates={gens} parquet_scans={scans}")


if __name__ == "__main__":
    main()
