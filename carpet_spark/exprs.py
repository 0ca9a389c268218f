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

_DBL_MAX = 1.7976931348623157e308


def fin(col: Column) -> Column:
    """Finite-or-NULL: NaN/±Inf → NULL at every double→exact-type
    boundary (r11 non-finite regime).  Under ANSI mode `CAST(NaN AS
    BIGINT)` / `CAST(inf AS DECIMAL)` ABORT THE JOB — at 100 TB one
    poisoned metric row from a bad upstream division would kill the
    whole query, so the money/fixed-point contract treats non-finite
    like NULL: skipped by sums, null in displays, loud ANSI abort
    RETAINED for finite-but-overflowing values (which is why this is a
    predicate and not `try_cast`, whose silent NULL would swallow real
    overflows too).  One primitive comparison — `abs(x) ≤ DBL_MAX` is
    FALSE for NaN and ±Inf — keeps whole-stage codegen; NULL input
    stays NULL (NULL comparison → NULL → when() emits NULL)."""
    return F.when(F.abs(col) <= F.lit(_DBL_MAX), col)


def sql_fin(expr: str) -> str:
    """Oracle twin of fin(): DuckDB's isfinite is NULL-propagating, so
    NULL input stays NULL and non-finite maps to NULL."""
    return f"(CASE WHEN isfinite({expr}) THEN {expr} END)"


def dsum(col: Column) -> Column:
    """Deterministic sum: decimal-sum then cast to double.  Non-finite
    inputs behave as NULL (see fin)."""
    return F.sum(fin(col).cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Deterministic avg: exact decimal sum → double, / exact count.
    The divisor stays COUNT(*) — the non-finite-as-NULL contract skips
    poisoned rows in the numerator only, mirroring sql_davg."""
    return F.sum(fin(col).cast(DEC)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({sql_fin(expr)} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (
        f"CAST(SUM(CAST({sql_fin(expr)} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT(*)"
    )


def round6(col: Column) -> Column:
    """For inherently-float outputs (stddev/corr/cosine): round both sides."""
    return F.round(col, 6)


# Fixed-point long-sum fast path.  Money-shaped inputs (≤6 decimal digits)
# scale exactly to integers at 1e6; summing longs stays in whole-stage
# codegen's primitive path — measured ~12x faster than the decimal
# accumulator on the Q1 shape at sf0.1.
#
# Scale escalation (r8 VERDICT "What's wrong #1"): a SINGLE long
# accumulator is exact only to |Σ round(x·1e6)| ≤ 2^63 ≈ 9.2e18, i.e.
# |Σx| ≤ 9.2e12.  The yardstick (used identically in ops/aggs.py and
# SCALE.md): 100 TB of TPC-H is ~SF 100,000 → lineitem ≈ 6e11 rows; Q1
# groups them ~6 ways, so Σ(l_extendedprice·…) per group ≈ 1e11 rows ×
# ~3.8e4 avg price ≈ 4e15 — ~400x over the old bound: the flagship
# aggregate would hit the ANSI overflow abort.  lsum/lavg therefore
# SPLIT the per-row scaled long into hi = fp >> 22 and lo = fp & (2^22-1)
# (pure primitive codegen), sum each part as a long, and merge ONCE PER
# GROUP in decimal(38,0): Σfp = Σhi·2^22 + Σlo exactly.  New bound:
#   Σlo ≤ N·2^22          → exact to N ≈ 2.2e12 rows/group, and
#   |Σhi| ≤ N·(fp_max/2^22) → exact to N ≈ 3.5e14 rows at fp_max ≈ 1.1e11
# — ~20x headroom on Q1's ~1e11-row groups, and still ~3.7x even for an
# UNGROUPED sum over the whole 6e11-row lineitem.  Beyond even that, the
# ANSI overflow stays a loud abort and dsum() remains the unbounded
# decimal path.
# DuckDB needs no mirror change: its SUM(BIGINT) already accumulates in
# HUGEINT (int128), so both engines produce the identical exact integer
# sum; each converts exact-integer → double → /1e6, correctly rounded in
# each step, so hashes stay bit-equal (verified: all parity suites green
# with no oracle edits).
_FP = 1_000_000
_SPLIT = 4_194_304  # 2^22: balances the N·2^22 (lo) and N·fp_max/2^22 (hi) bounds


def _fp_scaled_long_at(col: Column, factor: int) -> Column:
    """Shared body of _fp_long / fp_scaled_long: round-half-away-from-
    zero(x*factor) as a long, without ``F.round`` (which routes through
    BigDecimal per row — measured 2.1x slower on the Q1 agg at sf0.1).

    r11 optimization (guide §1.2 step 2 "per-task work"): the previous
    form expanded the fin() non-finite guard TWICE per conversion — once
    under signum(), once under the magnitude branch — so every money sum
    evaluated two full CASE trees per row; this form hoists the guard to
    a single outer CASE around the identical signed arithmetic.
    Exact-equivalence argument (no input contract needed — this holds
    for EVERY double, including the half-cent landings pinned by
    tests/test_edge_cases.py::test_fp_scaled_long_rounds_half_away_from_zero):

    - non-finite or NULL x: old = signum(NULL)*… = NULL; new = predicate
      not TRUE → NULL.  Same.
    - finite x: fin(x) = x, so old and new compute literally the same
      expression signum(x)*trunc(|x|·factor + 0.5), including the loud
      ANSI CAST abort when |x|·factor + 0.5 overflows long — a silent
      wrong sum is exactly what the abort contract exists to prevent.

    (A cheaper ``floor(x·factor+0.5)`` form was tried and REVERTED: it
    is ~15% faster still, but rounds negative EXACT-half landings toward
    +inf — floor(-3000000000.5+0.5) = -3000000000, not ROUND's
    -3000000001 — and the half-cent boundary is reachable in real money
    ops (the extreme regime found nine; the edge-case pin above feeds it
    directly), so the floor form is only oracle-equal under a ≤digits
    contract the cents scale does not have.)"""
    scaled = (F.abs(col) * factor + F.lit(0.5)).cast("long")
    # signum is double; the product is exact for |fp| ≤ 2^53, re-cast long
    return F.when(
        F.abs(col) <= F.lit(_DBL_MAX), (F.signum(col) * scaled.cast("double")).cast("long")
    )


def _fp_long(col: Column) -> Column:
    """round-half-away-from-zero(x*1e6) as a long (see _fp_scaled_long_at
    for the single-CASE design and the exact-equivalence argument)."""
    return _fp_scaled_long_at(col, _FP)


def fp_scaled_long(col: Column, factor: int) -> Column:
    """round-half-away-from-zero(x*factor) as a long — the SIGNED
    fixed-point conversion at an explicit scale (cents: factor=100).

    The unsigned shortcut ``(x*factor + 0.5).cast(long)`` silently
    truncation-rounds NEGATIVE amounts one unit high (cast-to-long
    truncates toward zero, so -N.5 becomes -N instead of ROUND's -(N+1))
    — found by the extreme-value regime on refund-shaped rows.  Always
    use this form for any column that can carry a negative amount.
    Non-finite → NULL, same contract as _fp_long."""
    return _fp_scaled_long_at(col, factor)


def _fp_split_sum(col: Column) -> Column:
    """Exact Σ round(x·1e6) as decimal(38,0) via the hi/lo long split
    (see the scale-escalation note above): two primitive long sums in
    the hash aggregate, one decimal merge per GROUP.  Pure integer
    per-row ops — arithmetic shift is floor-division by 2^22 and the
    mask is the matching two's-complement remainder in [0, 2^22), so
    fp == hi·2^22 + lo holds for every sign."""
    return fp_split_sum_of(_fp_long(col))


def fp_split_sum_of(fp: Column) -> Column:
    """Exact Σ of an ALREADY fixed-point-scaled long column as
    decimal(38,0) — the building block behind lsum for ops that
    construct their own per-row scaled long (conditional sums,
    second-level rollups, ratio numerators).  Same hi/lo contract as
    _fp_split_sum: exact to ~2.2e12 rows per group at |fp| ≲ 1.1e11."""
    hi = F.shiftright(fp, 22)
    lo = fp.bitwiseAND(F.lit(_SPLIT - 1))
    return (
        F.sum(hi).cast("decimal(38,0)") * F.lit(_SPLIT)
        + F.sum(lo).cast("decimal(38,0)")
    )


def fp_split_sum_over(fp: Column, w) -> Column:
    """Windowed twin of fp_split_sum_of: exact Σ fp OVER w as
    decimal(38,0) — for running/share-of-total shapes where the frame
    can hold a scale-proportional row count."""
    hi = F.shiftright(fp, 22)
    lo = fp.bitwiseAND(F.lit(_SPLIT - 1))
    return (
        F.sum(hi).over(w).cast("decimal(38,0)") * F.lit(_SPLIT)
        + F.sum(lo).over(w).cast("decimal(38,0)")
    )


def lsum(col: Column) -> Column:
    """Fixed-point sum: round(x*1e6) as long, hi/lo-split sum, /1e6 —
    exact to ~2.2e12 rows per group (loud ANSI abort beyond)."""
    return (_fp_split_sum(col).cast("double") / F.lit(float(_FP))).cast(
        "double"
    )


def lavg(col: Column) -> Column:
    """Fixed-point avg: lsum semantics divided by the exact count."""
    return (
        _fp_split_sum(col).cast("double")
        / F.lit(float(_FP))
        / F.count(F.lit(1))
    ).cast("double")


def sql_lsum(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(ROUND({sql_fin(expr)} * 1000000) AS BIGINT))"
        f" AS DOUBLE) / 1000000.0 AS DOUBLE)"
    )


def sql_lavg(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(ROUND({sql_fin(expr)} * 1000000) AS BIGINT))"
        f" AS DOUBLE) / 1000000.0 / COUNT(*) AS DOUBLE)"
    )


def dbl_vec(col: Column) -> Column:
    """Widen a float-vector column to array<double> ONCE per vector (r11
    optimization, guide §1.2).  The cosine family's pair scoring folds
    zip_with(a, b, (p, q) -> double(p) * double(q)) per candidate pair;
    zip_with/aggregate are CodegenFallback (interpreted), so the two
    per-element casts are ~half the interpreted frames of every pair dot.
    float32 -> float64 widening is exact, so casting each vector once
    before the pair join and multiplying the pre-widened elements yields
    the bit-identical product sequence — measured ~25-30% off the pair
    scoring stage at sf0.1 (tests/test_r11_optimizations.py pins the
    bit-equality over every fixture pair)."""
    return F.transform(col, lambda x: x.cast("double"))


def vec_dot(x: Column, y: Column) -> Column:
    """Dot product over pre-widened array<double> vectors: the same
    left-to-right aggregate fold as the inline-cast form (ops/llm._dot),
    minus the two interpreted casts per element.  NULL array / padded
    (length-mismatch) / NULL-element propagation is unchanged — the
    product of a NULL element is NULL either way, which nulls the fold."""
    prods = F.zip_with(x, y, lambda p, q: p * q)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
