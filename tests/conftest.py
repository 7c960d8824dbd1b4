from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# Right-size local parallelism for the TEST fixtures before the session
# module reads it: the suite runs thousands of tiny actions over
# sf0.001 fixtures, where task-dispatch overhead dominates compute —
# A/B on this suite's heaviest file (test_sinks.py): local[32] 199s,
# local[8] 151s, local[4] 164s. This caps TESTS only; bench.py and the
# scaling probes honor the driver's $SPARK_GRAFT_CPUS unchanged.
_cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
os.environ["SPARK_GRAFT_CPUS"] = str(min(_cpus, 8))

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.session import (  # noqa: E402
    get_spark,
)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-commit crash-injection / replay / scaling-trend "
        "tests that re-prove already-pinned algebra at larger sizes; "
        "skipped by default so the whole suite fits a CI budget — set "
        "SPARK_GRAFT_RUN_SLOW=1 to run them (done before releases and "
        "whenever the sink/streaming commit protocol changes)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow-marked (set SPARK_GRAFT_RUN_SLOW=1 to include)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="metro-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
