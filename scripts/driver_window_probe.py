#!/usr/bin/env python
"""Simulate the driver's CORRECTNESS loop over the first-N registry window.

The driver runs each queries()[name] at sf0.01 AND the DuckDB oracle, then
hashes both.  Round 1 showed the run stopping after 50 ops; whether that is
a count cap or a time cap, the defense is the same — every op in the
priority window must be cheap.  This probe times the Spark side + oracle
side per op and flags anything slow, so a pathological op can be reordered
or fixed BEFORE the driver runs.

Usage: python scripts/driver_window_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from carpet_spark.registry import REGISTRY, queries, oracle_sql
from carpet_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("driver_window_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = list(queries())[:n]
    oracles = oracle_sql()
    total_spark = total_oracle = 0.0
    rows = []
    for name in names:
        t0 = time.perf_counter()
        cnt = REGISTRY[name].fn(spark, sf_dir).count()
        t_spark = time.perf_counter() - t0
        t_oracle = 0.0
        if name in oracles:
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            t_oracle = time.perf_counter() - t0
        total_spark += t_spark
        total_oracle += t_oracle
        rows.append((name, t_spark, t_oracle, cnt))

    rows.sort(key=lambda r: -(r[1] + r[2]))
    print(f"{'op':<28}{'spark_s':>9}{'oracle_s':>10}{'rows':>9}")
    for name, ts, to, cnt in rows:
        print(f"{name:<28}{ts:>9.2f}{to:>10.2f}{cnt:>9}")
    print(
        f"\nTOTAL first {n}: spark {total_spark:.1f}s + oracle "
        f"{total_oracle:.1f}s = {total_spark + total_oracle:.1f}s"
    )


if __name__ == "__main__":
    main()
