#!/usr/bin/env python
"""Simulate the driver's CORRECTNESS loop over the first-N registry window.

The driver runs each queries()[name] at sf0.01 AND the DuckDB oracle, then
hashes both.  Round 1 showed the run stopping after 50 ops; whether that is
a count cap or a time cap, the defense is the same — every op in the
priority window must be cheap.  This probe times the Spark side + oracle
side per op and flags anything slow, so a pathological op can be reordered
or fixed BEFORE the driver runs.

Vacuity preflight (r09 VERDICT item 3): a window op that returns ZERO rows
at sf0.01 would bank an empty==empty hash-pass — a vacuous verification
that proves nothing about the op's math (this bug class shipped twice:
agg_survival_km in r8 and dedup_containment_pairs in r9).  The probe now
FAILS (exit 1) if any probed op returns 0 rows, unless the op is listed in
EMPTY_IS_THE_ANSWER with a written justification.  Run this on every
outgoing window BEFORE committing the rotation.

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

# Ops whose EMPTY output at sf0.01 is itself the verified assertion — each
# needs a written reason why empty is a meaningful, falsifiable result (the
# op would return rows if the property it checks were violated), not just
# "no rows happen to qualify".  Keep this list empty unless a new op truly
# belongs here; "the threshold is never hit at this SF" is NOT a reason —
# that is the vacuity bug this preflight exists to catch (re-parameterize
# the op instead, as dedup_containment_pairs %9→%3 and
# emb_pairwise_cosine_hist stride 997→199 did in r10).
EMPTY_IS_THE_ANSWER: dict[str, str] = {
    # name: justification
}


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
        flag = "  <- VACUOUS" if cnt == 0 and name not in EMPTY_IS_THE_ANSWER else ""
        print(f"{name:<28}{ts:>9.2f}{to:>10.2f}{cnt:>9}{flag}")
    print(
        f"\nTOTAL first {n}: spark {total_spark:.1f}s + oracle "
        f"{total_oracle:.1f}s = {total_spark + total_oracle:.1f}s"
    )

    vacuous = [
        name for name, _, _, cnt in rows
        if cnt == 0 and name not in EMPTY_IS_THE_ANSWER
    ]
    if vacuous:
        print(
            f"\nVACUITY PREFLIGHT FAILED: {len(vacuous)} op(s) return 0 rows "
            f"at {sf_dir} — a driver bank would be an empty==empty pass "
            f"proving nothing: {vacuous}\n"
            "Re-parameterize each op so real rows qualify at sf0.01 (see "
            "tests/test_positive_path.py for the precedents), or add it to "
            "EMPTY_IS_THE_ANSWER with a written justification."
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
