import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carpet_spark.session import get_spark
from carpet_spark.testing import duck_connect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


def pytest_collection_modifyitems(config, items):
    """Deterministic test sharding (r06 VERDICT item 4): CARPET_SHARD=i/N
    keeps every N-th collected item starting at i.  Collection order is
    identical in every worker, so the N shards partition the suite exactly
    — same total test count, no overlap — and round-robin assignment
    spreads the big parametrized parity blocks evenly.  Driven by
    scripts/run_tests_sharded.py; a plain `pytest tests/` (no env var)
    is unaffected.  pytest-xdist is not in the container, hence env-var
    sharding over separate processes (each with its own SparkSession and
    DuckDB connection) instead of -n."""
    shard = os.environ.get("CARPET_SHARD")
    if not shard:
        return
    idx, count = (int(x) for x in shard.split("/"))
    keep, dropped = [], []
    for i, item in enumerate(items):
        (keep if i % count == idx else dropped).append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=dropped)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("carpet_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(autouse=True, scope="module")
def _session_hygiene():
    """Drop accumulated memory-sink tables / cached plans between modules —
    the long suite degrades the shared JVM otherwise (measured: a 20s test
    took 377s at the end of a full run)."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        try:
            s.catalog.clearCache()
            for t in s.catalog.listTables():
                if t.isTemporary and any(
                    t.name.startswith(p)
                    for p in ("dedup_wm_", "late_", "stateful_", "state_")
                ):
                    s.catalog.dropTempView(t.name)
        except Exception:
            pass


@pytest.fixture(scope="session")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
