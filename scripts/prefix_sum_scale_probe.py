#!/usr/bin/env python
"""Measure — not assert — the two r9 plan rewrites that re-shape where
per-task work lands, on axes big enough that the old shape's single-task
funnel dominates wall-clock:

A. Ranked-cumulative prefix sum (agg_abc_classification's two-pass
   range-partitioned form vs the bare global-window cumulative).  The
   single `Window.orderBy(...)` cumulative funnels the WHOLE ranked axis
   through one task; the two-pass form (range shuffle → per-partition
   split-sum partials → broadcast offset prefix → within-partition
   running sums) spreads it across NPART tasks.  Identical values by
   construction (the range partitioner preserves the total order and all
   sums are exact); the probe asserts a full-axis checksum both ways and
   times the physical difference at 1x/10x the key axis.

B. Grouped-map salting (udaf_grouped_pandas' (type, salt) grouping with
   a JVM-side broadcast mean vs the old groupBy(type) alone).  The old
   shape hands one Python worker ~n/|types| rows as a single Arrow
   frame; the salted shape bounds frames at ~n/(|types|*64).  Same
   demeaned output (asserted via checksum), measured wall both ways.

Results land in SCALE.md.  Usage:
  python scripts/prefix_sum_scale_probe.py [n_keys_millions] [n_events_millions] [a|b|ab]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window

from carpet_spark.exprs import fp_split_sum_of, fp_split_sum_over
from carpet_spark.session import get_spark

BASE = "/tmp/carpet_prefix_scale"


def build(spark, n_keys: int, n_events: int) -> None:
    if n_keys and not os.path.isdir(f"{BASE}/axis_{n_keys}"):
        # ranked axis: |keys| rows of (key, rev6), rev6 a money-shaped
        # long in micro-units — hash-scattered so the range shuffle
        # actually moves data
        spark.range(n_keys).select(
            F.col("id").alias("key"),
            (F.pmod(F.xxhash64("id"), F.lit(10_000_000_000)) + 1).alias(
                "rev6"
            ),
        ).write.mode("overwrite").parquet(f"{BASE}/axis_{n_keys}")
    if n_events and not os.path.isdir(f"{BASE}/events_{n_events}"):
        # events shape: 6 types, double value, unique event_id
        spark.range(n_events).select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("type_"), (F.col("id") % 6).cast("string")).alias(
                "event_type"
            ),
            ((F.col("id") % 9973).cast("double") / 100.0).alias("value"),
        ).write.mode("overwrite").parquet(f"{BASE}/events_{n_events}")


def timed(label, df):
    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt:7.2f}s  {rows}", flush=True)
    return dt, rows


# -- A: ranked-cumulative prefix sum ----------------------------------------

def cum_single_window(axis):
    wc = Window.orderBy(F.col("rev6").desc(), F.col("key")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return axis.select("key", fp_split_sum_over(F.col("rev6"), wc).alias("cum6"))


def cum_two_pass(axis, npart=32):
    # exactly agg_abc_classification's shape (aggs_advanced.py)
    rp = (
        axis.repartitionByRange(npart, F.col("rev6").desc(), F.col("key"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    per_pid = rp.groupBy("pid").agg(fp_split_sum_of(F.col("rev6")).alias("psum6"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_pid.select(
        "pid", F.coalesce(F.sum("psum6").over(woff), F.lit(0)).alias("off6")
    )
    win = (
        Window.partitionBy("pid")
        .orderBy(F.col("rev6").desc(), F.col("key"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rp.join(F.broadcast(offsets), "pid").select(
        "key",
        (F.col("off6") + fp_split_sum_over(F.col("rev6"), win)).alias("cum6"),
    )


def checksum_cum(df):
    # order-insensitive full-axis checksum over (key, cum6): any
    # misplaced prefix boundary or offset changes it
    return df.select(
        F.count(F.lit(1)).alias("n"),
        # hash sums overflow a long at ~2 rows — accumulate in decimal
        F.sum(
            F.xxhash64(F.col("key"), F.col("cum6").cast("string")).cast(
                "decimal(38,0)"
            )
        ).alias("sig"),
    )


# -- B: grouped-map salting --------------------------------------------------

def demean_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["mu"] if "mu" in pdf.columns else pdf["value"].mean()
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "demeaned": pdf["value"] - mu,
        }
    )


def demean_unsalted(ev):
    # the pre-r9 shape: one pandas frame per TYPE (n/6 rows each);
    # mean computed in-pandas (float here — checksum rounds to 4dp so
    # the float-vs-decimal mean ulp noise cannot flip the comparison)
    return ev.groupBy("event_type").applyInPandas(
        demean_fn, schema="event_id long, event_type string, demeaned double"
    )


def demean_salted(ev, n_salt=64):
    # the shipped udaf_grouped_pandas shape (udfs.py)
    mu = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.nullif(F.count("value").cast("double"), F.lit(0.0))
        ).alias("mu")
    )
    mu2 = mu.select(F.col("event_type").alias("mu_type"), "mu")
    salted = (
        ev.join(
            F.broadcast(mu2),
            F.col("event_type").eqNullSafe(F.col("mu_type")),
            "left",
        )
        .drop("mu_type")
        .withColumn(
            "salt",
            F.pmod(F.xxhash64("event_id"), F.lit(n_salt)).cast("int"),
        )
    )
    return salted.groupBy("event_type", "salt").applyInPandas(
        demean_fn, schema="event_id long, event_type string, demeaned double"
    )


def checksum_demean(df):
    return df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(
                F.col("event_id"), F.round("demeaned", 4).cast("string")
            ).cast("decimal(38,0)")
        ).alias("sig"),
    )


def main() -> None:
    n_keys = (int(sys.argv[1]) if len(sys.argv) > 1 else 2) * 1_000_000
    n_events = (int(sys.argv[2]) if len(sys.argv) > 2 else 12) * 1_000_000
    parts = sys.argv[3] if len(sys.argv) > 3 else "ab"
    spark = get_spark("prefix_sum_scale_probe")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    build(spark, n_keys if "a" in parts else 0, n_events if "b" in parts else 0)

    if "a" in parts:
        axis = spark.read.parquet(f"{BASE}/axis_{n_keys}")
        print(f"\n-- A: ranked-cumulative over {n_keys:,} keys --")
        t1, r1 = timed("single global-window cumulative", checksum_cum(cum_single_window(axis)))
        t2, r2 = timed("two-pass range-partitioned prefix sum", checksum_cum(cum_two_pass(axis)))
        print(f"identical checksums: {r1 == r2}   speedup {t1 / t2:.2f}x")

    if "b" in parts:
        ev = spark.read.parquet(f"{BASE}/events_{n_events}")
        print(f"\n-- B: grouped-map demean over {n_events:,} events / 6 types --")
        t3, r3 = timed("groupBy(type) pandas (one frame/type)", checksum_demean(demean_unsalted(ev)))
        t4, r4 = timed("salted (type,salt) + JVM broadcast mu", checksum_demean(demean_salted(ev)))
        print(f"identical checksums: {r3 == r4}   speedup {t3 / t4:.2f}x")


if __name__ == "__main__":
    main()
