#!/usr/bin/env python
"""Determine the exact IEEE form of Spark's exact `percentile` aggregate
(r12 VERDICT item 2: the parallel rewrite must reproduce it bit-for-bit).

Candidate forms for interpolating between sorted neighbors a <= b at
continuous position pos = p * (n - 1), lower = floor(pos):
  F1: a + (b - a) * (pos - lower)                  # "a+(b-a)*frac"
  F2: (higher - pos) * a + (pos - lower) * b       # convex combination
These differ by ulps on adversarial inputs; we probe with cases where the
two forms differ and print which one Spark's aggregate matches, plus the
position convention (p*(n-1) vs alternatives) and NULL handling.
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from carpet_spark.session import get_spark


def bits(x: float) -> str:
    return struct.pack(">d", x).hex()


def main() -> None:
    spark = get_spark("percentile_probe", cpus=2)
    # Values chosen so F1 != F2 in double arithmetic for some p.
    cases = [
        ([0.1, 0.3], 1 / 3),
        ([0.1, 0.3], 0.5),
        ([1e16, 1e16 + 2], 0.1),
        ([1.0000000000000002, 3.0000000000000004], 0.7),
        ([-5.5, 1.1, 2.2, 7.7], 0.9),
        ([0.1, 0.2, 0.30000000000000004, 0.7, 0.9], 0.37),
        ([2.0, 2.0, 3.0], 0.25),
    ]
    mismatch = {"F1": 0, "F2": 0}
    for vals, p in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = df.agg(F.percentile("x", F.lit(p)).alias("q")).collect()[0]["q"]
        s = sorted(vals)
        n = len(s)
        pos = p * (n - 1)
        import math

        lower = math.floor(pos)
        higher = math.ceil(pos)
        a, b = s[int(lower)], s[int(higher)]
        f1 = a + (b - a) * (pos - lower)
        f2 = (higher - pos) * a + (pos - lower) * b
        print(
            f"vals={vals} p={p}\n  spark={got!r} {bits(got)}\n"
            f"  F1   ={f1!r} {bits(f1)} match={got == f1 and bits(got)==bits(f1)}\n"
            f"  F2   ={f2!r} {bits(f2)} match={got == f2 and bits(got)==bits(f2)}"
        )
        if bits(got) != bits(f1):
            mismatch["F1"] += 1
        if bits(got) != bits(f2):
            mismatch["F2"] += 1
    print("bit-mismatches:", mismatch)
    spark.stop()


if __name__ == "__main__":
    main()
