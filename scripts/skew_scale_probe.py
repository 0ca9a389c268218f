#!/usr/bin/env python
"""Skew-at-scale probe (r06 VERDICT "what's missing" item 3): measure —
not assert — that the engine's skew mitigations win on data that is
actually skewed, at a size where the hot key dominates wall-clock.

Fixture (generated once under /tmp with Spark itself, ~20M fact rows):
  fact(key, v): 50% of rows on ONE hot key, the rest uniform over 2M keys
  dim(key, w):  2M rows — too wide to broadcast at default thresholds

Three physical strategies for the same fact⋈dim → groupBy aggregate:
  1. plain shuffled sort-merge join, AQE skew handling OFF
     (the naive plan: one straggler task owns 10M rows)
  2. the same join with AQE skewJoin ON (advisory partition size lowered
     so the splitter engages at probe scale)
  3. manual 8-way salting (join_salted's pattern: fact key + pmod salt,
     dim exploded 8x)

plus the window twin (win_rank vs win_rank_salted's two-phase topk) on
the same skewed key.  All four variants return identical results
(asserted) — the probe isolates the physical effect of the mitigation.

Results land in SCALE.md.  Usage:
  python scripts/skew_scale_probe.py [n_fact_millions]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from carpet_spark.session import get_spark

BASE = "/tmp/carpet_skew_scale"


def build(spark, n_fact: int, n_dim: int) -> None:
    if os.path.isdir(f"{BASE}/fact") and os.path.isdir(f"{BASE}/dim"):
        return
    # 50% of fact rows on key 0; the rest uniform over [1, n_dim)
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim - 1)) + 1)
        .alias("key"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    fact.write.mode("overwrite").parquet(f"{BASE}/fact")
    dim = spark.range(n_dim).select(
        F.col("id").alias("key"), (F.col("id") % 31 + 1).alias("w")
    )
    dim.write.mode("overwrite").parquet(f"{BASE}/dim")


def timed(label, df):
    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    print(f"{label:34s} {dt:7.2f}s  ({len(rows)} result rows)", flush=True)
    return dt, sorted(map(tuple, rows))


def main() -> None:
    n_fact = int(sys.argv[1]) * 1_000_000 if len(sys.argv) > 1 else 20_000_000
    n_dim = 2_000_000
    spark = get_spark("skew_scale_probe")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    build(spark, n_fact, n_dim)
    fact = spark.read.parquet(f"{BASE}/fact")
    dim = spark.read.parquet(f"{BASE}/dim")
    hint = dim.hint("merge")  # keep every variant a shuffle join

    agg = lambda j: (
        j.groupBy((F.col("key") % 16).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("w")).cast("double").alias("wv"),
        )
        .select("g", "n", F.round("wv", 0).alias("wv"))
    )

    results = {}

    # 1. naive: skew handling off
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["naive_smj"] = timed(
        "naive sort-merge (skewJoin OFF)", agg(fact.join(hint, "key"))
    )

    # 2. AQE skew split (advisory size lowered so it engages at probe scale)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    results["aqe_skew"] = timed(
        "AQE skewJoin ON", agg(fact.join(hint, "key"))
    )
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    # 3. manual salting (join_salted's pattern)
    n_salt = 8
    f_s = fact.withColumn("salt", F.pmod(F.xxhash64("v"), F.lit(n_salt)))
    d_s = hint.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salt)]))
    )
    results["salted"] = timed(
        f"manual {n_salt}-way salted join",
        agg(f_s.join(d_s, ["key", "salt"])),
    )

    same = results["naive_smj"][1] == results["aqe_skew"][1] == results["salted"][1]
    print(f"identical results across strategies: {same}")

    # window twin on the few-hot-groups shape (win_rank_salted's target:
    # a handful of window partitions, one holding 50% of all rows — the
    # global-rank straggler).  Salted two-phase: per-(group, salt) top-k
    # first (64-way parallel), exact top-k over the k*n_salt survivors.
    k = 10
    grouped = fact.select(
        (F.col("key") % 16).alias("g"), "v",
        F.xxhash64("key", "v").alias("tie"),
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("tie"))
    t0 = time.perf_counter()
    n1 = (
        grouped.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .count()
    )
    t_plain = time.perf_counter() - t0
    print(f"{'window rank (hot group)':34s} {t_plain:7.2f}s  ({n1} rows)")
    wsalt = Window.partitionBy("g", "salt").orderBy(
        F.col("v").desc(), F.col("tie")
    )
    t0 = time.perf_counter()
    n2 = (
        grouped.withColumn("salt", F.pmod(F.col("tie"), F.lit(n_salt)))
        .withColumn("rk", F.row_number().over(wsalt))
        .filter(F.col("rk") <= k)  # phase 1: per-salt top-k survivors
        .withColumn("rk2", F.row_number().over(w))
        .filter(F.col("rk2") <= k)  # phase 2: exact top-k on survivors
        .count()
    )
    t_salted = time.perf_counter() - t0
    print(f"{'window rank (salted two-phase)':34s} {t_salted:7.2f}s  ({n2} rows)")
    assert n1 == n2, (n1, n2)

    print("\nSUMMARY (seconds): "
          f"naive={results['naive_smj'][0]:.2f} "
          f"aqe={results['aqe_skew'][0]:.2f} "
          f"salted={results['salted'][0]:.2f} "
          f"win_plain={t_plain:.2f} win_salted={t_salted:.2f}")


if __name__ == "__main__":
    main()
