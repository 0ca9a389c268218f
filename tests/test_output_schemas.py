"""Driver-canonicalizer safety: every op exposed with a hash oracle must
output only scalar columns.

The driver's CORRECTNESS harness canonicalizes results with pandas
(sort_values + value hash), which throws ``TypeError: unhashable type:
'list'`` on any array/map/struct cell — this killed fn_array's r02 row
(SURVEY §7.5, r02 VERDICT item 1).  The fix convention is to project
array-valued results through array_join/element_at/size witnesses; this
test enforces it REGISTRY-WIDE (schema-building only — no execution), so
a future op can't reintroduce the trap.
"""

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from carpet_spark.registry import REGISTRY

HASH_OPS = sorted(name for name, op in REGISTRY.items() if op.oracle is not None)


@pytest.mark.parametrize("name", HASH_OPS)
def test_oracled_op_outputs_scalars_only(spark, name):
    schema = REGISTRY[name].fn(spark, "/root/testdata/sf0.001").schema
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} outputs non-scalar columns the driver cannot hash: {bad} — "
        "project through array_join/element_at/size (see fn_array)"
    )
