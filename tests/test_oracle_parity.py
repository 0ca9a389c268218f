"""The critical suite: replicate the driver's t2 loop locally (SURVEY §5).

Every operator declared in the registry with an oracle must hash-match
DuckDB at the t2 scale factor BEFORE we declare it to the driver.
"""

import pytest

from carpet_spark.registry import REGISTRY
from carpet_spark.testing import compare

HASH_OPS = sorted(name for name, op in REGISTRY.items() if op.oracle is not None)
ROWS_OPS = sorted(name for name, op in REGISTRY.items() if op.oracle is None)


@pytest.mark.parametrize("name", HASH_OPS)
def test_hash_parity(spark, duck, sf_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, sf_dir), duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_OPS)
def test_rows_only_runs(spark, sf_dir, name):
    op = REGISTRY[name]
    df = op.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
