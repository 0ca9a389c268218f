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
