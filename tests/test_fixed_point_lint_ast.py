"""AST-level companion to test_fixed_point_lint.py: variable-held sums.

The regex lint catches ``F.sum(<inline ×1e4+ fixed-point construction>)``
— the copy-paste idiom every historical violation used — but documents
variable indirection as out of scope: ``v6 = fp_scaled_long(col,
1_000_000); ... F.sum(v6)`` is regex-invisible at the sum site.  The r9
sweep closed those sites by hand; nothing guarded the class.

This lint closes it structurally.  Per ops module it parses the AST,
tracks every local name whose assigned value contains a call to the
house fixed-point constructors (``fp_scaled_long`` with a factor ≥ 1e4
or non-literal, or ``_fp_long``), then flags any ``F.sum(arg)`` whose
argument subtree references a tracked name — same suppression contract
as the regex lint: a ``single-long-ok: <bound>`` comment within
MARKER_WINDOW lines above the sum, or a decimal accumulator cast.

Scope note (mirrors the regex lint's): ad-hoc inline constructions held
in variables (``x = (col * 1e6).cast("long")`` without the helper) stay
out of scope — the r9 sweep standardized every money path on
fp_scaled_long/lsum, and matching bare arithmetic would false-positive
on time math like ``(ts / 86400).cast("long")``.  The two lints
together cover: inline construction at the sum (regex), helper-built
variables at any distance (AST).
"""

from __future__ import annotations

import ast
import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPS_GLOB = os.path.join(REPO, "carpet_spark", "ops", "*.py")
MARKER = "single-long-ok:"
MARKER_WINDOW = 6

_CONSTRUCTORS = {"fp_scaled_long", "_fp_long"}
# helpers that CONSUME a fixed-point long safely (hi/lo split into
# decimal) — a tracked name passed to these is the sanctioned route
_SAFE_SINKS = {"fp_split_sum_of", "fp_split_sum_over"}


def _call_name(node: ast.Call) -> str | None:
    f = node.func
    if isinstance(f, ast.Name):
        return f.id
    if isinstance(f, ast.Attribute):
        return f.attr
    return None


def _is_hazardous_constructor(node: ast.Call) -> bool:
    name = _call_name(node)
    if name == "_fp_long":
        return True  # always ×1e6
    if name != "fp_scaled_long":
        return False
    if len(node.args) >= 2:
        factor = node.args[1]
        if isinstance(factor, ast.Constant) and isinstance(
            factor.value, (int, float)
        ):
            return factor.value >= 10_000
    return True  # non-literal / missing factor: can't prove cents — hazardous


def _tracked_names_in(func: ast.AST) -> set[str]:
    """Local names assigned (anywhere in the function) from an expression
    containing a hazardous constructor call."""
    tracked: set[str] = set()
    for node in ast.walk(func):
        if isinstance(node, ast.Assign):
            value, targets = node.value, node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            value, targets = node.value, [node.target]
        else:
            continue
        hazardous = any(
            isinstance(n, ast.Call) and _is_hazardous_constructor(n)
            for n in ast.walk(value)
        )
        if not hazardous:
            continue
        for t in targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    tracked.add(n.id)
    return tracked


def _is_f_sum(node: ast.Call) -> bool:
    f = node.func
    return (
        isinstance(f, ast.Attribute)
        and f.attr == "sum"
        and isinstance(f.value, ast.Name)
        and f.value.id == "F"
    )


def _sum_is_decimal_accumulated(node: ast.Call, src_seg: str) -> bool:
    """True when the sum argument itself is cast to decimal (the
    accumulator is decimal, not long) — same exemption as the regex lint,
    including its recast-to-long override.  The recast match accepts both
    quote styles (r10 ADVICE: a single-quoted .cast('long') trailing
    recast must be flagged, not exempted)."""
    return "decimal" in src_seg and not re.search(
        r"\.cast\(\s*[\"']long[\"']\s*\)\s*$", src_seg
    )


def _violations_in(path: str) -> list[str]:
    src = open(path).read()
    lines = src.splitlines()
    tree = ast.parse(src)
    out: list[str] = []
    for func in ast.walk(tree):
        if not isinstance(func, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        tracked = _tracked_names_in(func)
        if not tracked:
            continue
        for node in ast.walk(func):
            if not (isinstance(node, ast.Call) and _is_f_sum(node)):
                continue
            if not node.args:
                continue
            arg = node.args[0]
            names = {
                n.id for n in ast.walk(arg) if isinstance(n, ast.Name)
            }
            if not (names & tracked):
                continue
            seg = ast.get_source_segment(src, arg) or ""
            if _sum_is_decimal_accumulated(node, seg):
                continue
            lineno = node.lineno  # 1-based
            ctx = lines[max(0, lineno - 1 - MARKER_WINDOW) : lineno + 1]
            if any(MARKER in ln for ln in ctx):
                continue
            out.append(f"{os.path.relpath(path, REPO)}:{lineno}")
    return out


def test_no_unbounded_variable_held_fixed_point_sums():
    flagged: list[str] = []
    for path in sorted(glob.glob(OPS_GLOB)):
        flagged += _violations_in(path)
    assert not flagged, (
        "single-long Σ over a VARIABLE holding a ×1e4+ fixed-point long "
        f"without a bound marker: {flagged}. Either route through "
        "exprs.fp_split_sum_of/_over (scale-proportional group) or add a "
        "'single-long-ok:' comment stating the per-group row bound."
    )


# --- self-tests ------------------------------------------------------------


def _lint_on(snippet: str) -> list[str]:
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(snippet)
    try:
        return _violations_in(fh.name)
    finally:
        os.unlink(fh.name)


def test_ast_lint_catches_variable_indirection():
    bad = (
        "def op(spark, sf_dir):\n"
        '    v6 = fp_scaled_long(F.col("value"), 1_000_000)\n'
        "    return df.agg(F.sum(v6).alias('s6'))\n"
    )
    assert _lint_on(bad), "AST lint missed the variable-held sum"


def test_ast_lint_catches_nested_and_windowed_references():
    nested = (
        "def op(spark, sf_dir):\n"
        '    v6 = fp_scaled_long(F.col("value"), 1_000_000)\n'
        "    return df.agg(F.sum(F.when(F.col('ok'), v6)).alias('s'))\n"
    )
    assert _lint_on(nested), "AST lint missed the nested reference"
    windowed = (
        "def op(spark, sf_dir):\n"
        '    v6 = fp_scaled_long(F.col("value"), 1_000_000)\n'
        "    return df.select(F.sum(v6).over(w).alias('run'))\n"
    )
    assert _lint_on(windowed), "AST lint missed the windowed variable sum"


def test_ast_lint_marker_and_cents_and_decimal_exemptions():
    marked = (
        "def op(spark, sf_dir):\n"
        '    v6 = fp_scaled_long(F.col("value"), 1_000_000)\n'
        "    # single-long-ok: bounded at ~30 rows/group at any SF\n"
        "    return df.agg(F.sum(v6).alias('s6'))\n"
    )
    assert not _lint_on(marked), "marker failed to suppress"
    cents = (
        "def op(spark, sf_dir):\n"
        '    c = fp_scaled_long(F.col("value"), 100)\n'
        "    return df.agg(F.sum(c).alias('sc'))\n"
    )
    assert not _lint_on(cents), "cents factor must stay exempt"
    decimal = (
        "def op(spark, sf_dir):\n"
        '    v6 = fp_scaled_long(F.col("value"), 1_000_000)\n'
        "    return df.agg(F.sum(v6.cast('decimal(38,0)')).alias('s'))\n"
    )
    assert not _lint_on(decimal), "decimal accumulator must stay exempt"
    variable_factor = (
        "def op(spark, sf_dir):\n"
        "    v = fp_scaled_long(F.col('value'), factor)\n"
        "    return df.agg(F.sum(v).alias('s'))\n"
    )
    assert _lint_on(variable_factor), "non-literal factor must flag"
    # r10 ADVICE: a SINGLE-quoted trailing recast-to-long on a
    # decimal-containing argument is still a long accumulator and must
    # flag exactly like the double-quoted spelling.
    recast_single_quoted = (
        "def op(spark, sf_dir):\n"
        '    v6 = fp_scaled_long(F.col("value"), 1_000_000)\n'
        "    return df.agg(\n"
        "        F.sum(v6.cast('decimal(38,0)').cast('long')).alias('s')\n"
        "    )\n"
    )
    assert _lint_on(recast_single_quoted), (
        "single-quoted .cast('long') recast wrongly exempted"
    )


def test_ast_lint_ignores_safe_sinks_and_untracked_names():
    safe = (
        "def op(spark, sf_dir):\n"
        '    v6 = fp_scaled_long(F.col("value"), 1_000_000)\n'
        "    return df.agg(fp_split_sum_of(v6).alias('s6'))\n"
    )
    assert not _lint_on(safe), "sanctioned split route flagged"
    untracked = (
        "def op(spark, sf_dir):\n"
        "    days = (F.col('ts').cast('long') / 86400).cast('long')\n"
        "    return df.agg(F.sum(days).alias('d'))\n"
    )
    assert not _lint_on(untracked), (
        "ad-hoc time arithmetic is out of scope by design and must not flag"
    )
