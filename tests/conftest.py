"""Shared pytest fixtures: one SparkSession per test session.

The session is built plain (like the driver's own session, not our
session.py factory) so tests double as driver-session simulations —
anything that only works under session.py configs is a bug.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("etl_sprint_2_5_spark-tests")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            str(tmp_path_factory.mktemp("warehouse")),
        )
        .getOrCreate()
    )
    yield s
    s.stop()
