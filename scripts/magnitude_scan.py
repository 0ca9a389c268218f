#!/usr/bin/env python
"""Registry-wide display-magnitude scan (r10 VERDICT item 5).

The only bug class that has recurred three times (r8/r9/r10) is the
`round(x, 6)` cliff: a float round on a double of magnitude >= ~5e8
asks for a grain near the double's ulp, where Spark's and DuckDB's
rounding algorithms legitimately split by 1 ulp even on bit-identical
inputs (SCALE.md "Display-determinism escalation").  The r10 finder was
an ad-hoc recipe; this script makes it a regression gate:

- run every hash op (or a --ops subset) at sf0.1, Spark side only;
- compute max(abs(col)) for every top-level double/float output column;
- flag columns with max |x| >= 5e8;
- diff the flag set against scripts/magnitude_allowlist.json — entries
  there are (op, column) pairs REVIEWED to use a magnitude-safe idiom
  (exact int -> one correctly-rounded double division, or an
  intrinsically-float quantity emitted UNROUNDED), each with a reason.

A flagged column NOT in the allowlist fails the scan (exit 1): either
fix the display onto the exact-integer idiom, or review it and add an
allowlist entry with the reason.  Allowlist entries that no longer flag
are reported (info) so the list can be pruned.

Usage:
  python scripts/magnitude_scan.py                    # scan all hash ops
  python scripts/magnitude_scan.py --ops op1 op2 ...  # subset
  python scripts/magnitude_scan.py --record           # (re)write allowlist
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# r11: lowered 5e8 -> 1e7 after the near-cliff probe showed the 5e8
# flag line only catches the class AFTER a column is already at the
# observed split magnitude; at 1e7 a column gets its review while it
# still has >= one decade of growth headroom.  Every flagged column
# must carry a reviewed allowlist reason either way.
THRESHOLD = 1e7
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALLOWLIST = os.path.join(REPO, "scripts", "magnitude_allowlist.json")
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    args = sys.argv[1:]
    record = "--record" in args
    if record:
        args.remove("--record")
    names: list[str] | None = None
    if "--ops" in args:
        names = args[args.index("--ops") + 1 :]

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    from carpet_spark.registry import REGISTRY
    from carpet_spark.session import get_spark

    ops = names if names is not None else [
        n for n, op in REGISTRY.items() if op.oracle is not None
    ]
    spark = get_spark("magnitude_scan")

    flagged: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, n in enumerate(ops, 1):
        try:
            df = REGISTRY[n].fn(spark, SF_DIR)
            float_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (DoubleType, FloatType))
            ]
            if not float_cols:
                continue
            row = df.agg(
                *[F.max(F.abs(F.col(c))).alias(c) for c in float_cols]
            ).collect()[0]
            hits = {
                c: row[c]
                for c in float_cols
                if row[c] is not None and row[c] >= THRESHOLD
            }
            for c, v in hits.items():
                flagged[f"{n}.{c}"] = v
            if hits:
                print(f"[{i}/{len(ops)}] FLAG  {n}: {hits}", flush=True)
        except Exception as e:  # noqa: BLE001 — scan everything, then fail
            errors[n] = str(e).splitlines()[0][:200]
            print(f"[{i}/{len(ops)}] ERROR {n}: {errors[n]}", flush=True)
    spark.stop()

    if errors:
        print(f"\nSCAN ERRORS ({len(errors)}): {sorted(errors)}")
        sys.exit(1)

    if record:
        entries = {
            k: {
                "max_abs_sf0.1": v,
                "reason": "REVIEW ME: verify the display idiom is "
                "magnitude-safe (exact int -> one double division, or "
                "intrinsically-float emitted unrounded) and say which",
            }
            for k, v in sorted(flagged.items())
        }
        try:
            with open(ALLOWLIST) as f:
                old = json.load(f)
            for k in entries:
                if k in old and "REVIEW ME" not in old[k].get("reason", ""):
                    entries[k]["reason"] = old[k]["reason"]
        except (OSError, ValueError):
            pass
        with open(ALLOWLIST, "w") as f:
            json.dump(entries, f, indent=2, sort_keys=True)
        print(f"\nrecorded {len(entries)} allowlist entries -> {ALLOWLIST}")
        return

    try:
        with open(ALLOWLIST) as f:
            allow = set(json.load(f))
    except (OSError, ValueError):
        allow = set()

    new = sorted(set(flagged) - allow)
    stale = sorted(allow - set(flagged)) if names is None else []
    if stale:
        print(f"\ninfo: {len(stale)} allowlist entries no longer flag "
              f"(prune when convenient): {stale}")
    if new:
        print(
            f"\nMAGNITUDE SCAN FAILED: {len(new)} unreviewed column(s) with "
            f"max |x| >= {THRESHOLD:.0e} at sf0.1 — a float round(x, 6) "
            "there splits engines at scale:\n  "
            + "\n  ".join(f"{k} (max {flagged[k]:.3e})" for k in new)
            + "\nFix the display onto the exact-integer idiom (SCALE.md "
            "'Display-determinism escalation') or review and add to "
            f"{os.path.relpath(ALLOWLIST, REPO)} with the reason."
        )
        sys.exit(1)
    print(
        f"\nMAGNITUDE SCAN GREEN: {len(ops)} ops, {len(flagged)} flagged "
        f"column(s), all reviewed ({len(allow)} allowlist entries)"
    )


if __name__ == "__main__":
    main()
