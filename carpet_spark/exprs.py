"""Determinism helpers shared by operators and their oracles (SURVEY §7.4).

The driver's t2 gate is an order-insensitive value-hash vs DuckDB; double
addition is not associative, so any double SUM/AVG over a shuffled dataset
can drift by ulps between engines (and between runs).  Fix: sum in decimal
(associative, exact for money-shaped inputs), emit double.

These helpers are used in BOTH the Spark plan and the oracle SQL string so
the two sides compute bit-identical doubles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Inputs are money-shaped (≤2 decimal digits per factor; products ≤6 digits),
# so decimal(18,6) rounds to the exact decimal value — no boundary ambiguity.
# Precision 18 keeps Spark's Decimal on the compact long-backed fast path
# (measured ~2x faster aggregation than precision 28); the SUM result type
# is widened by both engines so no overflow below ~1e12 rows x 1e5 values.
DEC = "decimal(18,6)"


def dsum(col: Column) -> Column:
    """Deterministic sum: decimal-sum then cast to double."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Deterministic avg: exact decimal sum → double, / exact count."""
    return F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"


def round6(col: Column) -> Column:
    """For inherently-float outputs (stddev/corr/cosine): round both sides."""
    return F.round(col, 6)


# Fixed-point long-sum fast path.  Money-shaped inputs (≤6 decimal digits)
# scale exactly to integers at 1e6; summing longs stays in whole-stage
# codegen's primitive path — measured ~12x faster than the decimal
# accumulator on the Q1 shape at sf0.1.  Exactness bound: the scaled
# accumulator must fit a signed 64-bit long, i.e. |Σx| ≤ ~9.2e12 per group.
# Q1 at sf0.1 peaks at Σ≈4.6e9 (headroom ~2000x); beyond the bound (full
# 100 TB global sums) use dsum() — same result type, decimal accumulator.
# Both engines convert the identical exact integer sum to double, then
# divide by 1e6 — correctly-rounded in each step, so hashes stay bit-equal.
_FP = 1_000_000


def _fp_long(col: Column) -> Column:
    """round-half-away-from-zero(x*1e6) as a long, without ``F.round``.

    ``F.round`` on DoubleType routes through BigDecimal per row (measured
    2.1x slower on the Q1 agg at sf0.1); ``signum(x) * trunc(|x|*1e6+0.5)``
    computes the identical half-away-from-zero value in pure primitive
    codegen.  Contract (same as the oracle's ROUND): inputs are
    fixed-decimal (≤6 fractional digits), so |x|*1e6 lands within ~1e-4 of
    an integer and never near the .5 boundary where ``floor(y+0.5)`` and
    ``round(y)`` could disagree by one ulp."""
    scaled = (F.abs(col) * _FP + F.lit(0.5)).cast("long")
    # signum is double; the product is exact for |sum| ≤ 2^53, re-cast long
    return (F.signum(col) * scaled).cast("long")


def fp_scaled_long(col: Column, factor: int) -> Column:
    """round-half-away-from-zero(x*factor) as a long — the SIGNED
    fixed-point conversion at an explicit scale (cents: factor=100).

    The unsigned shortcut ``(x*factor + 0.5).cast(long)`` silently
    truncation-rounds NEGATIVE amounts one unit high (cast-to-long
    truncates toward zero, so -N.5 becomes -N instead of ROUND's -(N+1))
    — found by the extreme-value regime on refund-shaped rows.  Always
    use this form for any column that can carry a negative amount."""
    scaled = (F.abs(col) * factor + F.lit(0.5)).cast("long")
    return (F.signum(col) * scaled).cast("long")


def lsum(col: Column) -> Column:
    """Fixed-point sum: round(x*1e6) as long, sum, /1e6 — exact ≤ 9.2e12."""
    return (F.sum(_fp_long(col)) / F.lit(float(_FP))).cast("double")


def lavg(col: Column) -> Column:
    """Fixed-point avg: lsum semantics divided by the exact count."""
    return (
        F.sum(_fp_long(col)) / F.lit(float(_FP)) / F.count(F.lit(1))
    ).cast("double")


def sql_lsum(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 AS DOUBLE)"
    )


def sql_lavg(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 / COUNT(*) AS DOUBLE)"
    )
