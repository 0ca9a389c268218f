#!/usr/bin/env python
"""Registry-wide type-alignment lint (r03 VERDICT item 3).

For every hash-oracled op, compare the Spark *analyzed* schema against
DuckDB ``DESCRIBE <oracle>`` and flag any output column whose
post-pandas dtype category differs (the driver hashes pandas frames, so
e.g. Spark BIGINT vs DuckDB HUGEINT = int64-vs-float64 = guaranteed
hash fail even with equal values).  Schema-only — no query execution —
so the full registry sweeps in minutes.

Usage: python scripts/type_lint.py [op1 op2 ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from carpet_spark.session import get_spark
from carpet_spark.testing import duck_connect, type_align_issues


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("type_lint")
    con = duck_connect(sf_dir)
    qs, oracles = entry.queries(), entry.oracle_sql()
    todo = names or [n for n in qs if n in oracles]
    flagged: dict[str, list[str]] = {}
    t0 = time.time()
    for i, n in enumerate(todo):
        if n not in oracles:
            print(f"SKIP  {n} (rows-only, no oracle)")
            continue
        try:
            df = qs[n](spark, sf_dir)
            issues = type_align_issues(df, con, oracles[n])
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            issues = [f"LINT ERROR: {type(e).__name__}: {e}"]
        if issues:
            flagged[n] = issues
            print(f"FLAG  {n}: {issues}")
        if (i + 1) % 50 == 0:
            print(f"... {i + 1}/{len(todo)} ({time.time() - t0:.0f}s)")
    print(f"\n{len(todo)} ops linted in {time.time() - t0:.0f}s; "
          f"{len(flagged)} flagged: {sorted(flagged)}")
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
