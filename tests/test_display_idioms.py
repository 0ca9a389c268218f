"""Micro-pins for the r11 exact-display idioms, at the ENGINE level.

The op-level sf0.1 pins (tests/test_sf01_regressions.py) exercise the
idioms only at the magnitudes the fixture reaches.  These tests pin the
idioms and the cross-engine rules they rest on across the full numeric
envelope, against Python's arbitrary-precision arithmetic as the
ground truth:

* the hi/lo 2^32 conversion split (SCALE.md "Near-cliff escalation"):
  DuckDB's native 128-bit→double casts (HUGEINT and DECIMAL(p>18))
  double-round — ``(double)upper·2^64 + (double)lower`` rounds the
  low word first — and land 1 ulp off near halfway points, while
  Spark's BigDecimal path is correctly rounded.  The split is exact
  for 0 ≤ x < 2^85 on BOTH engines (hi < 2^53 ⇒ both halves cast
  exactly, one final correctly-rounded add) and deliberately NOT
  beyond (pinned).

* the sign-split floor-div micro idiom: integer-division semantics
  vary by engine AND operand type — DuckDB ``//`` truncates toward
  zero on BIGINT/HUGEINT yet is PLAIN division (fraction kept) on
  DECIMAL/DOUBLE, while Spark ``DIV`` truncates on both — so
  money-per-day displays CASE on the sign and divide nonnegative
  magnitudes, where truncation == floor == Euclidean and every
  convention agrees (pinned against Python round-toward-zero).

If an engine upgrade ever fixes the DuckDB cast or changes a division
semantic, these tests fail first and name the simplification.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

# found by seeded halfway-point search (scripts history, r11): DuckDB
# native casts land 1 ulp off, Spark's are correct, hi/lo exact on both
MISROUNDED_128 = [
    129143188980153720833,
    129139696128632987649,
    184497830807598284801,
    1844788084009478258687,
]

HILO = (
    "CAST({x} // 4294967296 AS DOUBLE) * 4294967296.0"
    " + CAST({x} % 4294967296 AS DOUBLE)"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_duckdb_128bit_casts_misround_and_hilo_corrects(con):
    """The engine rule is LIVE: both 128-bit native casts are off by
    ≥1 ulp on the pinned values; the hi/lo split recovers the correctly
    rounded double.  (If this fails after a DuckDB upgrade with
    ``native == float(x)``, the cast got fixed — the hi/lo idiom can be
    retired op by op.)"""
    for x in MISROUNDED_128:
        native_h = con.execute(
            f"SELECT CAST(CAST({x} AS HUGEINT) AS DOUBLE)"
        ).fetchone()[0]
        native_d = con.execute(
            f"SELECT CAST(CAST('{x}' AS DECIMAL(38,0)) AS DOUBLE)"
        ).fetchone()[0]
        hilo = con.execute(
            "SELECT " + HILO.format(x=f"CAST({x} AS HUGEINT)")
        ).fetchone()[0]
        assert native_h != float(x), f"HUGEINT cast got fixed for {x}"
        assert native_d != float(x), f"DECIMAL cast got fixed for {x}"
        assert hilo == float(x), (x, hilo, float(x))


@settings(deadline=None, max_examples=120)
@given(st.integers(min_value=0, max_value=(1 << 85) - 1))
def test_hilo_split_correctly_rounded_below_2_85(x):
    con = duckdb.connect()
    try:
        got = con.execute(
            "SELECT " + HILO.format(x=f"CAST({x} AS HUGEINT)")
        ).fetchone()[0]
    finally:
        con.close()
    assert got == float(x), (x, got, float(x))


def test_hilo_split_envelope_boundary(con):
    """At 2^85 the hi half reaches 2^53 and the split's exactness
    argument ends — pinned with a concrete failing value just above
    (2^85 + 2^32 + 1: hi = 2^53 + 1 is not representable), so the
    envelope documented in SCALE.md stays honest."""
    x = (1 << 85) + (1 << 32) + 1
    got = con.execute(
        "SELECT " + HILO.format(x=f"CAST({x} AS HUGEINT)")
    ).fetchone()[0]
    assert got != float(x)


def test_duckdb_integer_division_convention_matrix(con):
    """The measured `//` matrix (SCALE.md r11 follow-up): DuckDB
    truncates toward zero on integer types — agreeing with Spark DIV
    even on negatives — but `//` on DECIMAL/DOUBLE is PLAIN division
    (fraction kept), the real hazard the sign-split + keep-operands-
    HUGEINT discipline fences.  If an upgrade changes any cell, the
    idiom's reasoning needs re-derivation."""
    big, huge, dec, dbl = con.execute(
        "SELECT -7 // 2, CAST(-7 AS HUGEINT) // 2,"
        " CAST(-7 AS DECIMAL(38,0)) // 2, -7.0 // 2"
    ).fetchone()
    assert big == -3 and huge == -3          # truncation, same as Spark DIV
    assert float(dec) == -3.5 and dbl == -3.5  # NOT integer division at all
    # remainder carries the dividend's sign on both engines (truncated-
    # division convention); the hi/lo split nonetheless only ever takes
    # % of nonnegative operands
    assert con.execute("SELECT -7 % 2, 7 % -2").fetchone() == (-1, 1)


@settings(deadline=None, max_examples=120)
@given(
    st.integers(min_value=-(10**15), max_value=10**15),
    st.integers(min_value=1, max_value=10**7),
)
def test_sign_split_floor_div_micro_is_trunc_toward_zero(c, n):
    expected = -((-c * 10000) // n) if c < 0 else (c * 10000) // n
    con = duckdb.connect()
    try:
        got = con.execute(
            f"SELECT CASE WHEN {c} < 0"
            f" THEN -(CAST({-c if c < 0 else 0} AS HUGEINT) * 10000 // {n})"
            f" ELSE CAST({c if c >= 0 else 0} AS HUGEINT) * 10000 // {n} END"
        ).fetchone()[0]
    finally:
        con.close()
    assert int(got) == expected, (c, n, got, expected)


def test_spark_native_cast_correct_and_div_truncates(spark):
    """Spark side of both rules in one query: the BigDecimal→double
    cast is correctly rounded on every value DuckDB misrounds, the
    hi/lo split agrees with it, and DIV truncates toward zero."""
    selects = []
    for i, x in enumerate(MISROUNDED_128):
        dec = f"CAST('{x}' AS DECIMAL(38,0))"
        selects.append(f"CAST({dec} AS DOUBLE) AS native_{i}")
        selects.append(
            f"CAST({dec} DIV 4294967296 AS DOUBLE) * 4294967296.0"
            f" + CAST({dec} % 4294967296 AS DOUBLE) AS hilo_{i}"
        )
    selects.append("-7 DIV 2 AS trunc_div")
    row = spark.sql("SELECT " + ", ".join(selects)).collect()[0]
    for i, x in enumerate(MISROUNDED_128):
        assert row[f"native_{i}"] == float(x), (x, row[f"native_{i}"])
        assert row[f"hilo_{i}"] == float(x), (x, row[f"hilo_{i}"])
    assert row["trunc_div"] == -3  # truncation, not floor
