#!/usr/bin/env python
"""Partition-count invariance sweep (r11): the 100-TB determinism probe.

Every parity sweep so far runs Spark under ONE parallelism shape (the
pinned ``shuffle.partitions=8``, one input split per sf0.01 parquet
file).  On a real cluster none of that holds: input files split by
``maxPartitionBytes``, shuffle width is sized to the cluster, and AQE
re-plans at runtime.  An op whose output depends on any of it —
``first()`` / ``limit`` without a total order, ``collect_list`` ordered
by partition arrival, ``row_number`` over non-unique sort keys, a
double sum whose fold order leaks into an unrounded display — is
nondeterministic at scale even though every fixed-shape sweep is green.

This sweep runs every hash-oracled op twice in fresh JVMs:

- config A (driver shape): shuffle=8, local[32], default split sizing;
- config B (adversarial):  shuffle=17, local[4], 64 KB
  ``maxPartitionBytes`` / zero ``openCostInBytes`` (forces multi-split
  scans of the tiny sf0.01 files), AQE partition coalescing OFF so the
  odd shuffle width survives.

and hashes each op's driver-faithful canonical multiset twice per run:

- EXACT: ``repr(float)`` bit-faithful, same canon the oracle gate uses;
- TOLERANT: floats collapsed to 12 significant digits first.

Compare verdicts per op:
- INVARIANT:  exact hashes equal — partition-shape independent.
- FP_ORDER:   only tolerant hashes equal — the values differ in float
  low bits, i.e. a non-fixed-point reduction's fold order reaches the
  output.  Inherent to IEEE summation on ANY distributed engine; listed
  so the display-discipline owner can decide if the column should be
  exact-idiom'd (SCALE.md r10) instead.
- STRUCTURAL: tolerant hashes differ too (or row counts differ) — real
  nondeterminism (unordered first/limit/rank tie...).  These are bugs.

Usage:
  python scripts/partition_invariance_sweep.py            # full, both configs
  python scripts/partition_invariance_sweep.py --ops a,b  # subset
  python scripts/partition_invariance_sweep.py --emit OUT.json [--adversarial]
                                                          # one pass (internal)
Exit 0 unless any STRUCTURAL op is found (FP_ORDER is a report, not a
gate failure — triage goes to scripts/fp_order_allowlist.json; any op
neither INVARIANT nor allowlisted fails).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
ALLOWLIST = os.path.join(REPO, "scripts", "fp_order_allowlist.json")


def _tolerant(cell):
    """Canonical cell with floats collapsed to 12 significant digits."""
    if isinstance(cell, tuple):
        if len(cell) == 2 and cell[0] == "f":
            f = float(cell[1]) if cell[1] not in ("nan", "inf", "-inf") else cell[1]
            return ("f~", cell[1] if isinstance(f, str) else repr(float(f"{f:.12g}")))
        return tuple(_tolerant(x) for x in cell)
    return cell


def emit(out_path: str, adversarial: bool, only: list[str] | None) -> None:
    """One config pass: hash every selected hash op's output, write JSON."""
    from carpet_spark.registry import REGISTRY
    from carpet_spark.session import get_spark
    from carpet_spark.testing import canon_pd_cell

    import __spark_entry__ as entry

    spark = get_spark("pinv_b" if adversarial else "pinv_a")
    if adversarial:
        # runtime-settable knobs completing the shape change (shuffle
        # width + core count came in via env before session creation)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    qs = entry.queries()
    if only:
        # an explicit list may name rows-only ops too — cross-engine
        # hashing is impossible for them, but Spark-vs-Spark
        # shape-invariance is still a meaningful (report-only) probe
        ops = [n for n in REGISTRY if n in set(only)]
    else:
        ops = [n for n, op in REGISTRY.items() if op.oracle is not None]

    result: dict[str, dict] = {}
    for i, n in enumerate(sorted(ops), 1):
        try:
            pdf = qs[n](spark, SF_DIR).toPandas()
            ordered = pdf[sorted(pdf.columns, key=str.lower)]
            rows = sorted(
                repr(tuple(canon_pd_cell(v) for v in row))
                for row in ordered.itertuples(index=False, name=None)
            )
            tol_rows = sorted(
                repr(_tolerant(tuple(canon_pd_cell(v) for v in row)))
                for row in ordered.itertuples(index=False, name=None)
            )
            result[n] = {
                "rows": len(pdf),
                "exact": hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16],
                "tolerant": hashlib.sha256("\n".join(tol_rows).encode()).hexdigest()[:16],
            }
            if i % 50 == 0:
                print(f"  [{i}/{len(ops)}] ...", flush=True)
        except Exception as e:  # noqa: BLE001 — record, compare stage reports
            result[n] = {"error": f"{type(e).__name__}: {e}"}
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(result, f, sort_keys=True, indent=0)
    print(f"emitted {len(result)} ops -> {out_path}")


def main() -> None:
    argv = sys.argv[1:]
    only: list[str] | None = None
    if "--ops" in argv:
        only = argv[argv.index("--ops") + 1].split(",")

    if "--emit" in argv:
        emit(argv[argv.index("--emit") + 1], "--adversarial" in argv, only)
        return

    out_a = f"/tmp/pinv_a.{os.getpid()}.json"
    out_b = f"/tmp/pinv_b.{os.getpid()}.json"
    base_env = {k: v for k, v in os.environ.items()}
    subset = ["--ops", ",".join(only)] if only else []

    print("== config A: driver shape (shuffle=8, local[32], default splits)")
    env_a = dict(base_env, SPARK_GRAFT_SHUFFLE="8", SPARK_GRAFT_CPUS="32")
    subprocess.run(
        [sys.executable, __file__, "--emit", out_a, *subset],
        env=env_a, check=True, cwd=REPO,
    )
    print("== config B: adversarial shape (shuffle=17, local[4], 64KB splits, no coalesce)")
    env_b = dict(base_env, SPARK_GRAFT_SHUFFLE="17", SPARK_GRAFT_CPUS="4")
    subprocess.run(
        [sys.executable, __file__, "--emit", out_b, "--adversarial", *subset],
        env=env_b, check=True, cwd=REPO,
    )

    with open(out_a) as f:
        a = json.load(f)
    with open(out_b) as f:
        b = json.load(f)
    try:
        with open(ALLOWLIST) as f:
            allow = json.load(f)
    except (OSError, ValueError):
        allow = {}

    invariant, fp_order, structural, errors = [], [], [], []
    for n in sorted(a):
        ra, rb = a[n], b.get(n, {"error": "missing in B"})
        if "error" in ra or "error" in rb:
            errors.append((n, ra.get("error") or rb.get("error")))
        elif ra["exact"] == rb["exact"]:
            invariant.append(n)
        elif ra["rows"] == rb["rows"] and ra["tolerant"] == rb["tolerant"]:
            fp_order.append(n)
        else:
            structural.append(n)

    print(f"\nINVARIANT : {len(invariant)}")
    print(f"FP_ORDER  : {len(fp_order)}")
    for n in fp_order:
        mark = "allowlisted" if n in allow else "NEW — triage"
        print(f"  {n}  [{mark}]")
    print(f"STRUCTURAL: {len(structural)}")
    for n in structural:
        print(f"  {n}  rowsA={a[n]['rows']} rowsB={b[n]['rows']}")
    if errors:
        print(f"ERRORS    : {len(errors)}")
        for n, e in errors:
            print(f"  {n}: {e}")

    new_fp = [n for n in fp_order if n not in allow]
    if structural or new_fp or errors:
        print("\nSWEEP FAILED: structural nondeterminism, errors, or "
              "un-triaged FP_ORDER ops — fix or allowlist with a reason.")
        sys.exit(1)
    print("\nSWEEP GREEN: every hash op partition-shape invariant "
          f"({len(invariant)} exact, {len(fp_order)} allowlisted fp-order).")


if __name__ == "__main__":
    main()
