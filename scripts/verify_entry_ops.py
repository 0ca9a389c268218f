#!/usr/bin/env python
"""Drive __spark_entry__ exactly as the driver does for the named ops
(.claude/skills/verify recipe, scripted): run queries()[name] at the given
sf_dir AND the matching oracle_sql()[name] in DuckDB, compare row count +
column names + the order-insensitive sorted-column value multiset, and
smoke entry(spark) at sf0.001.

Usage: python scripts/verify_entry_ops.py op1 [op2 ...] [--sf sf0.01,sf0.001]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from carpet_spark.session import get_spark
from carpet_spark.testing import compare, duck_connect


def main() -> None:
    args = sys.argv[1:]
    sfs = ["sf0.01", "sf0.001"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    names = args
    if not names:
        print("usage: verify_entry_ops.py op1 [op2 ...] [--sf sf0.01,sf0.001]")
        sys.exit(2)

    spark = get_spark("verify_entry_ops")
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"NOT IN queries(): {missing}")
        sys.exit(1)

    failed = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duck_connect(sf_dir)
        for n in names:
            df = qs[n](spark, sf_dir)
            if n in oracles:
                try:
                    compare(df, con, oracles[n], name=f"{n}@{sf}")
                    print(f"PASS  {n}@{sf} (hash)")
                except AssertionError as e:
                    print(f"FAIL  {n}@{sf}: {e}")
                    failed += 1
            else:
                cnt = df.count()
                assert len(df.columns) > 0
                print(f"PASS  {n}@{sf} (rows-only, {cnt} rows)")
        con.close()

    flagship = entry.entry(spark)
    rows = flagship.collect()
    print(f"entry() smoke: {len(rows)} rows, schema={[f.name for f in flagship.schema]}")
    if len(rows) == 0 or len(flagship.columns) == 0:
        raise SystemExit("entry() smoke FAILED: empty result")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
