#!/usr/bin/env python
"""Streaming scale probe (r02 VERDICT item 7, streaming half): run the REAL
incremental engine — readStream → watermark → windowed agg / dedup →
sink — over 1x/10x/100x synthetic event volumes and record wall time.

The registered streaming ops' bench path is the deterministic batch twin;
this probe exercises the Structured Streaming path itself (availableNow
trigger, state store, watermark eviction), which is where 100 TB behavior
lives: state per (window x key) for the agg, per event_id for dedup —
both bounded and watermark-evicted, so wall time should scale with INPUT
volume, never with accumulated state.

Results land in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.session import get_spark

BASE = "/tmp/carpet_scale/stream"
N_BASE = 150_000  # ~ sf0.1 events volume


def synth(spark, mult: int) -> str:
    path = f"{BASE}/events_x{mult}"
    if not os.path.exists(path):
        n = N_BASE * mult
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                # 30 days of events, seconds resolution, deterministic
                F.timestamp_seconds(
                    F.lit(1704067200) + F.pmod(F.hash("id"), F.lit(30 * 86400))
                ).alias("ts"),
                F.pmod(F.hash("id").cast("long") * 7, F.lit(10_000 * mult)).alias("user_id"),
                F.concat(
                    F.lit("type_"), F.pmod(F.hash("id").cast("long") * 13, F.lit(8))
                ).alias("event_type"),
                (F.pmod(F.hash("id").cast("long") * 31, F.lit(10_000)) / 100.0).alias("value"),
            )
            .repartition(8 * mult)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def run_query(writer, name: str) -> float:
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    t0 = time.perf_counter()
    q = (
        writer.option("checkpointLocation", ckpt)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return dt


def main() -> None:
    spark = get_spark("streaming_scale_probe", cpus=32)
    for mult in (1, 10, 100):
        path = synth(spark, mult)
        schema = spark.read.parquet(path).schema

        stream = spark.readStream.schema(schema).parquet(path)
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        )
        t_agg = run_query(
            agg.writeStream.format("memory").outputMode("append"),
            f"agg_x{mult}",
        )
        n_agg = spark.table(f"agg_x{mult}").count()

        stream2 = spark.readStream.schema(schema).parquet(path)
        dedup = stream2.withWatermark("ts", "2 hours").dropDuplicates(
            ["event_id", "ts"]
        )
        t_dd = run_query(
            dedup.writeStream.format("noop"), f"dedup_x{mult}"
        )

        print(
            f"mult={mult} rows={N_BASE*mult} tumbling_agg={t_agg:.2f}s "
            f"agg_windows={n_agg} dedup_watermark={t_dd:.2f}s",
            flush=True,
        )
        spark.catalog.dropTempView(f"agg_x{mult}")
    spark.stop()


if __name__ == "__main__":
    main()
