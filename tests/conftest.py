from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_job_applify_spark.session import get_spark_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    # one JVM serves 500+ tests (Derby, codegen caches, broadcast relics
    # all accumulate); the 1g default heap flakes late-suite heavy plans
    s = get_spark_session(
        "tests",
        shuffle_partitions=8,
        config_options={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()
