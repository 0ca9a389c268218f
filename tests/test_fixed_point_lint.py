"""Source-level lint: no new single-long Σ over ×1e6 fixed-point values.

The r8 verdict's one scale-killer was a single BIGINT accumulator over
round(x·1e6) micro-units: exact only to |Σ| ≤ 2^63 ≈ 9.2e18, which a
100 TB group sum blows through (loud ANSI abort — the flagship query
dies at target scale).  r9 swept every such Spark-side sum onto the
hi/lo split (exprs.fp_split_sum_of / _over, exact decimal(38,0) merge)
or, where the group is provably bounded (per-part / per-customer
partials), kept the single long WITH an inline bound comment saying so.

This lint keeps that invariant from regressing: any direct
``F.sum(<expr containing a ×1e6 fixed-point construction>)`` in an op
module must either

- route through the split helpers (the expr never reaches a bare
  ``F.sum`` then), or
- sum in decimal (the arg mentions ``decimal``), or
- carry the bound marker ``single-long-ok:`` in a comment within
  MARKER_WINDOW lines — the house idiom for "this group is bounded at
  any SF, here's why".

Scope note: sums of *variables* that hold fixed-point longs (``v6 =
...; F.sum(v6)``) are one indirection away and regex-invisible; those
sites were closed by the r9 sweep itself and are guarded by the parity
+ extreme-value regimes, while THIS lint catches the common copy-paste
path (inline construction, the idiom every historical violation used).
Cents-scale (×100) accumulators are exempt by design: 1e4× more
headroom, audited per-site in SCALE.md's cents table.
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPS_GLOB = os.path.join(REPO, "carpet_spark", "ops", "*.py")
# The marker is a TOKEN prose cannot produce by accident: the r9 review
# found the original bare word ("single-long") occurring in narrative
# comments right above split sums, which would have silently exempted a
# future regression at exactly the sites the lint protects.  Every
# legitimate suppression now reads `single-long-ok: <bound>`.
MARKER = "single-long-ok:"
MARKER_WINDOW = 6  # lines above the F.sum( line the marker may sit

# ×1e4 and up: the sweep's worst-headroom site quantized residuals at
# ×10000 (ts_ar1_forecast_backtest), which the original 1e6-only regex
# missed.  ×100 cents accumulators stay exempt by design (1e4× more
# headroom, audited per-site in SCALE.md's cents table).
_FP_CONSTRUCTION = re.compile(r"1e[4-9]|\b10{4,}\b")
# a decimal accumulator that is re-cast to long INSIDE the sum argument
# (``F.sum((x.cast("decimal...")*y).cast("long"))``) still sums longs —
# the trailing cast decides the accumulator type, not the substring
_RECAST_LONG = re.compile(r'\.cast\(\s*"long"\s*\)\s*$')


def _balanced_arg(src: str, start: int) -> str:
    """Return the balanced-paren argument of the call opening at start."""
    depth, j = 1, start
    while depth and j < len(src):
        if src[j] == "(":
            depth += 1
        elif src[j] == ")":
            depth -= 1
        j += 1
    return src[start : j - 1]


def _violations_in(path: str) -> list[str]:
    src = open(path).read()
    lines = src.splitlines()
    out = []
    for m in re.finditer(r"F\.sum\(", src):
        arg = _balanced_arg(src, m.end())
        if not _FP_CONSTRUCTION.search(arg):
            continue  # not a ×1e6 fixed-point construction
        if "decimal" in arg and not _RECAST_LONG.search(arg.strip()):
            continue  # decimal accumulator — unbounded-safe by itself
        # oracle SQL strings never reach this (they're plain strings,
        # not F.sum calls); /1e6 DISPLAY divisions outside the sum arg
        # never reach this either (the regex scans the arg only)
        lineno = src[: m.start()].count("\n")  # 0-based
        ctx = lines[max(0, lineno - MARKER_WINDOW) : lineno + 2]
        if any(MARKER in ln for ln in ctx):
            continue  # bounded-group site, documented in place
        out.append(f"{os.path.relpath(path, REPO)}:{lineno + 1}")
    return out


def test_no_unbounded_single_long_fixed_point_sums():
    flagged: list[str] = []
    for path in sorted(glob.glob(OPS_GLOB)):
        flagged += _violations_in(path)
    assert not flagged, (
        "single-long Σ over ×1e4+ fixed-point values without a bound "
        f"marker: {flagged}. Either route through exprs.fp_split_sum_of/"
        "_over (scale-proportional group) or add a 'single-long-ok:' "
        "comment stating the per-group row bound (bounded group)."
    )


def _lint_on(snippet: str) -> list[str]:
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(snippet)
    try:
        return _violations_in(fh.name)
    finally:
        os.unlink(fh.name)


def test_lint_catches_a_violation():
    """Self-test: the lint actually fires on the forbidden idiom."""
    bad = (
        "df.agg(\n"
        "    F.sum(\n"
        '        (F.abs(F.col("x")) * 1e6 + 0.5).cast("long")\n'
        "    ).alias('s6')\n"
        ")\n"
    )
    assert _lint_on(bad), "lint failed to flag the idiom"


def test_lint_prose_mention_does_not_suppress():
    """r9 review finding: the old bare-word marker ('single-long') also
    occurred in NARRATIVE comments near protected sums, silently
    exempting a future regression there.  Prose mentioning the hazard
    must NOT suppress; only the explicit ok-token may."""
    bad = (
        "# a single-long accumulator would overflow there, so we split\n"
        "df.agg(\n"
        "    F.sum(\n"
        '        (F.abs(F.col("x")) * 1e6 + 0.5).cast("long")\n'
        "    ).alias('s6')\n"
        ")\n"
    )
    assert _lint_on(bad), "prose hazard mention suppressed the lint"
    ok = bad.replace(
        "# a single-long accumulator would overflow there, so we split",
        "# single-long-ok: bounded at ~30 rows/group at any SF",
    )
    assert not _lint_on(ok), "explicit ok-token failed to suppress"


def test_lint_catches_non_1e6_scale_factors():
    """r9 review finding: the sweep's worst-headroom site quantized at
    x10000, which a 1e6-only regex missed; any x1e4+ construction in a
    bare F.sum must flag."""
    for factor in ("10000", "1e4", "100000", "1e8"):
        bad = (
            "df.agg(\n"
            "    F.sum(\n"
            f'        (F.abs(F.col("x")) * {factor} + 0.5).cast("long")\n'
            "    ).alias('s')\n"
            ")\n"
        )
        assert _lint_on(bad), f"lint missed the x{factor} idiom"
    # cents (x100) stay exempt by design
    cents = (
        "df.agg(\n"
        "    F.sum(\n"
        '        (F.abs(F.col("x")) * 100 + 0.5).cast("long")\n'
        "    ).alias('s')\n"
        ")\n"
    )
    assert not _lint_on(cents), "lint flagged the exempt cents scale"


def test_lint_catches_decimal_recast_to_long():
    """A decimal product re-cast to long inside the sum arg still sums
    longs — the 'decimal' substring must not exempt it."""
    bad = (
        "df.agg(\n"
        "    F.sum(\n"
        '        (v.cast("decimal(38,0)") * 1e6).cast("long")\n'
        "    ).alias('s')\n"
        ")\n"
    )
    assert _lint_on(bad), "lint exempted a long accumulator via substring"


def test_lint_allows_true_decimal_accumulator():
    ok = (
        "df.agg(\n"
        "    F.sum(\n"
        '        (F.col("v") * 1e6 + 0.5).cast("long").cast("decimal(38,0)")\n'
        "    ).alias('s')\n"
        ")\n"
    )
    assert not _lint_on(ok), "lint flagged a decimal accumulator"
