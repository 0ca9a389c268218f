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


def test_nested_element_type_mismatch_is_caught(spark):
    """r04 VERDICT item 6 seeded fixture: list<int> vs DOUBLE[] must flag
    — pandas materializes both as object-dtype lists of int vs float, so
    the driver hash diverges even though the flat category is LIST on
    both sides.  Likewise a struct field and a map value."""
    import duckdb

    con = duckdb.connect()
    df = spark.range(1).selectExpr(
        "array(1, 2) AS xs",
        "named_struct('a', 1, 'b', 2.0) AS st",
        "map('k', 1) AS mp",
    )
    issues = type_align_issues(
        df,
        con,
        "SELECT [CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)] AS xs,"
        " {'a': CAST(1.0 AS DOUBLE), 'b': CAST(2.0 AS DOUBLE)} AS st,"
        " MAP(['k'], [CAST(1.5 AS DOUBLE)]) AS mp",
    )
    con.close()
    assert any(i.startswith("xs[]") and "INT" in i and "FLT" in i for i in issues), issues
    assert any(i.startswith("st.a") for i in issues), issues
    assert any(i.startswith("mp..value") for i in issues), issues


def test_nested_matching_types_stay_clean(spark):
    """The recursion must not false-positive on aligned nested types,
    including the benign DATE-in-list case, nested containers, and the
    nested-materialization cases r05 ADVICE called out: inside a list
    ``.df()`` keeps HUGEINT as int (→ INT, matches Spark bigint) and
    DECIMAL as Decimal (→ DEC, matches Spark decimal)."""
    import duckdb

    con = duckdb.connect()
    df = spark.range(1).selectExpr(
        "array(cast(1.5 as double), cast(2.5 as double)) AS xs",
        "named_struct('a', 1, 'b', array('x')) AS st",
        "map('k', 1) AS mp",
        "array(cast(1 as bigint)) AS hs",
        "array(cast(1.5 as decimal(4,1))) AS ds",
    )
    issues = type_align_issues(
        df,
        con,
        "SELECT [CAST(1.5 AS DOUBLE), CAST(2.5 AS DOUBLE)] AS xs,"
        " {'a': 1, 'b': ['x']} AS st,"
        " MAP(['k'], [1]) AS mp,"
        " [CAST(1 AS HUGEINT)] AS hs,"
        " [CAST(1.5 AS DECIMAL(4,1))] AS ds",
    )
    con.close()
    assert issues == [], issues


def test_nested_decimal_vs_double_is_caught(spark):
    """r05 ADVICE: a DuckDB DECIMAL[] against a Spark double[] must flag —
    nested DECIMAL materializes as Decimal objects, never float64, so the
    driver hash diverges even though TOP-LEVEL decimal would collapse to
    float64 and compare clean.  Likewise nested HUGEINT vs Spark double."""
    import duckdb

    con = duckdb.connect()
    df = spark.range(1).selectExpr(
        "array(cast(1.5 as double)) AS ds",
        "array(cast(2.0 as double)) AS hs",
    )
    issues = type_align_issues(
        df,
        con,
        "SELECT [1.5] AS ds, [CAST(2 AS HUGEINT)] AS hs",
    )
    con.close()
    assert any(i.startswith("ds[]") and "DEC" in i and "FLT" in i for i in issues), issues
    assert any(i.startswith("hs[]") and "INT" in i and "FLT" in i for i in issues), issues
