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
# r10 (ADVICE): the r9 dedupe sweep made the canonical construction
# invisible to the original regex — `fp_scaled_long(col, 1_000_000)`
# contains neither `1e6` nor a bare `10{4,}` run.  The scan now (a)
# strips numeric-literal underscores before matching, (b) accepts any
# coefficient and exponent ≥ 4 (`2.5e6`, `1e12`, …, not just `1e[4-9]`),
# and (c) treats an inline fp_scaled_long(...) call as a construction
# whenever its factor is ≥ 1e4 or not a literal (cents factors stay
# exempt; an unprovable variable factor is conservatively hazardous).
# r11 (ADVICE): the plain-literal branch was `\b10{4,}\b` — 1-followed-
# by-zeros only, so an inline non-1 coefficient (`* 2_000_000 + 0.5`)
# escaped while the docstring claimed any-coefficient coverage.  Now any
# integer literal ≥ 10000 matches: `[1-9]\d{4,}` (5+ digits, nonzero
# lead) is ≥ 10^4 by construction.
_FP_CONSTRUCTION = re.compile(
    r"\d(?:\.\d+)?e(?:[4-9]|[1-9]\d+)\b|\b[1-9]\d{4,}\b"
)
_FP_HELPER_CALL = re.compile(r"fp_scaled_long\s*\(")
_INT_LITERAL = re.compile(r"^\d+$")


def _strip_numeric_underscores(s: str) -> str:
    """Remove underscores BETWEEN digits (Python numeric-literal grouping:
    1_000_000 → 1000000) without touching identifiers like fp_scaled_long."""
    return re.sub(r"(?<=\d)_(?=\d)", "", s)


def _top_level_last_arg(call_arg: str) -> str:
    """The text after the last TOP-LEVEL comma of a call's argument list —
    fp_scaled_long's factor parameter."""
    depth, last = 0, -1
    for i, ch in enumerate(call_arg):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            last = i
    return call_arg[last + 1 :].strip()


def _is_fp_construction(arg: str) -> bool:
    norm = _strip_numeric_underscores(arg)
    if _FP_CONSTRUCTION.search(norm):
        return True
    for m in _FP_HELPER_CALL.finditer(norm):
        factor = _top_level_last_arg(_balanced_arg(norm, m.end()))
        if _INT_LITERAL.match(factor):
            if int(factor) >= 10_000:
                return True  # micro-unit-scale factor, 2^63 is reachable
            continue  # literal cents-scale factor — exempt by design
        return True  # non-literal factor: can't prove cents, flag it
    return False
# a decimal accumulator that is re-cast to long INSIDE the sum argument
# (``F.sum((x.cast("decimal...")*y).cast("long"))``) still sums longs —
# the trailing cast decides the accumulator type, not the substring
# both quote styles: a single-quoted .cast('long') recast must not be
# wrongly exempted as a decimal accumulator (r10 ADVICE)
_RECAST_LONG = re.compile(r"\.cast\(\s*[\"']long[\"']\s*\)\s*$")


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
        if not _is_fp_construction(arg):
            continue  # not a ×1e4+ fixed-point construction
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


def test_lint_catches_helper_and_underscore_idioms():
    """r10 (ADVICE): the r9 dedupe sweep rewrote construction sites onto
    `fp_scaled_long(col, 1_000_000)`, which the original regex could not
    see (no `1e6`, no bare zero-run) — precisely the regression class the
    lint exists to catch, with the invisible form now modeled repo-wide
    by the canonical sites.  Both the helper call and the underscored
    literal must flag; literal cents factors stay exempt."""
    helper_bad = (
        "df.agg(\n"
        '    F.sum(fp_scaled_long(F.col("v"), 1_000_000)).alias("s6")\n'
        ")\n"
    )
    assert _lint_on(helper_bad), "lint missed F.sum(fp_scaled_long(col, 1_000_000))"
    underscore_bad = (
        "df.agg(\n"
        '    F.sum((F.abs(F.col("x")) * 1_000_000 + 0.5).cast("long")).alias("s")\n'
        ")\n"
    )
    assert _lint_on(underscore_bad), "lint missed the underscored literal"
    helper_10k = (
        "df.agg(\n"
        '    F.sum(fp_scaled_long(F.col("v"), 10_000)).alias("s4")\n'
        ")\n"
    )
    assert _lint_on(helper_10k), "lint missed the x1e4 helper factor"
    variable_factor = (
        "df.agg(\n"
        '    F.sum(fp_scaled_long(F.col("v"), factor)).alias("s")\n'
        ")\n"
    )
    assert _lint_on(variable_factor), (
        "a non-literal factor cannot be proven cents-scale and must flag"
    )
    cents_ok = (
        "df.agg(\n"
        '    F.sum(fp_scaled_long(F.col("v"), 100)).alias("sc")\n'
        ")\n"
    )
    assert not _lint_on(cents_ok), "lint flagged the exempt cents helper"
    marker_ok = (
        "# single-long-ok: bounded at <=25 nations at any SF\n"
        "df.agg(\n"
        '    F.sum(fp_scaled_long(F.col("v"), 1_000_000)).alias("s6")\n'
        ")\n"
    )
    assert not _lint_on(marker_ok), "ok-token failed to suppress helper form"


def test_lint_catches_high_exponents_and_coefficients():
    """r10 (ADVICE): `1e[4-9]` missed 1e10+ factors; the scan must catch
    any scientific literal with exponent >= 4, any coefficient."""
    for factor in ("1e10", "1e12", "2e6", "2.5e6", "1e100"):
        bad = (
            "df.agg(\n"
            "    F.sum(\n"
            f'        (F.abs(F.col("x")) * {factor} + 0.5).cast("long")\n'
            "    ).alias('s')\n"
            ")\n"
        )
        assert _lint_on(bad), f"lint missed the x{factor} idiom"
    for factor in ("1e3", "2e2"):  # sub-1e4 stays exempt
        ok = (
            "df.agg(\n"
            "    F.sum(\n"
            f'        (F.abs(F.col("x")) * {factor} + 0.5).cast("long")\n'
            "    ).alias('s')\n"
            ")\n"
        )
        assert not _lint_on(ok), f"lint flagged the exempt x{factor} scale"


def test_lint_catches_plain_decimal_non_1_coefficients():
    """r10 ADVICE: `\\b10{4,}\\b` matched only 1-followed-by-zeros, so an
    inline plain-decimal factor with a non-1 coefficient (`* 2_000_000`)
    escaped while the helper-call path caught it.  Any integer literal
    >= 10000 in the sum arg must now flag; < 10000 stays exempt."""
    for factor in ("2_000_000", "2000000", "50000", "12345"):
        bad = (
            "df.agg(\n"
            "    F.sum(\n"
            f'        (F.abs(F.col("x")) * {factor} + 0.5).cast("long")\n'
            "    ).alias('s')\n"
            ")\n"
        )
        assert _lint_on(bad), f"lint missed the plain x{factor} idiom"
    for factor in ("9999", "2_500", "100"):  # < 1e4 stays exempt
        ok = (
            "df.agg(\n"
            "    F.sum(\n"
            f'        (F.abs(F.col("x")) * {factor} + 0.5).cast("long")\n'
            "    ).alias('s')\n"
            ")\n"
        )
        assert not _lint_on(ok), f"lint flagged the exempt x{factor} scale"


def test_lint_covers_windowed_sums():
    """r09 VERDICT item 5: the WINDOWED money-sum family must route
    through exprs.fp_split_sum_over exactly like the grouped path routes
    through fp_split_sum_of.  A bare windowed long sum over a fixed-point
    construction is the same 2^63 hazard — the frame can hold a
    scale-proportional row count — and must flag under the same scan."""
    bad = (
        "df.select(\n"
        '    F.sum(fp_scaled_long(F.col("v"), 1_000_000)).over(w).alias("run6")\n'
        ")\n"
    )
    assert _lint_on(bad), "lint missed the windowed helper-form sum"
    bad_inline = (
        "df.select(\n"
        '    F.sum((F.abs(F.col("x")) * 1e6 + 0.5).cast("long")).over(w)\n'
        ")\n"
    )
    assert _lint_on(bad_inline), "lint missed the windowed inline sum"
    # the sanctioned route: the op never writes a bare F.sum at all
    ok = (
        "df.select(\n"
        '    fp_split_sum_over(fp_scaled_long(F.col("v"), 1_000_000), w)\n'
        ")\n"
    )
    assert not _lint_on(ok), "lint flagged the sanctioned fp_split_sum_over route"
