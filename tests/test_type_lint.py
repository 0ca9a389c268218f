"""Registry-wide type-alignment lint (r03 VERDICT item 3).

One test sweeps EVERY hash-oracled op: Spark analyzed schema vs DuckDB
``DESCRIBE <oracle>``, flagging post-pandas dtype-category mismatches
(e.g. Spark BIGINT vs DuckDB HUGEINT → int64-vs-float64 → guaranteed
driver hash fail).  Schema-only, no execution — the full registry sweeps
in ~2 min — so an op with an uncast DuckDB SUM/list_sum can't land green.
"""

from __future__ import annotations

import pytest

import carpet_spark
from carpet_spark.testing import duck_connect, type_align_issues

SF_DIR = "/root/testdata/sf0.001"


def test_registry_type_alignment(spark):
    qs = carpet_spark.queries()
    oracles = carpet_spark.oracle_sql()
    con = duck_connect(SF_DIR)
    flagged: dict[str, list[str]] = {}
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            issues = type_align_issues(fn(spark, SF_DIR), con, sql)
        except Exception as e:  # noqa: BLE001 — a broken builder is its own flag
            issues = [f"LINT ERROR: {type(e).__name__}: {e}"]
        if issues:
            flagged[name] = issues
    con.close()
    assert not flagged, (
        f"{len(flagged)} ops with driver-hash-fatal type misalignment "
        f"(cast the oracle side, usually SUM→BIGINT): {flagged}"
    )
