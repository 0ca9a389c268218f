import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carpet_spark.session import get_spark
from carpet_spark.testing import duck_connect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


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
