#!/usr/bin/env python
"""Avro sink/scan scale probe (round 8): the vendored OCF codec is new —
measure that the shard-per-batch write path and the file-per-partition
read path both scale linearly with row volume, and that the plan stays
driver-clean (payload rows never visit the driver; only (path, n_rows)
manifest rows do, one per shard).

Fixture: orders-shaped synthetic rows (long, string, double,
timestamp-micros long, nullable string) at 150k / 1.5M / 15M rows —
the last is ~100x the sf0.1 orders table the registered op consumes.

Usage: python scripts/avro_scale_probe.py [xmax]   # xmax in {1,10,100}
"""

from __future__ import annotations

import os
import shutil
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.ops.avro import (
    _ROUNDTRIP_SCHEMA,
    _read_avro_dir,
    write_pandas_shards,
)
from carpet_spark.session import get_spark

N1 = 150_000


def main() -> None:
    xmax = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("avro_scale_probe")
    print("| rows | write (s) | shards | read-back (s) | rows/s write | rows/s read |")
    print("|---|---|---|---|---|---|")
    for mult in (1, 10, 100):
        if mult > xmax:
            break
        n = N1 * mult
        src = spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            F.when(F.col("id") % 2 == 0, "F").otherwise("O").alias("o_orderstatus"),
            (F.col("id") % 100000 * 0.01).alias("o_totalprice"),
            (F.lit(800_000_000_000_000) + F.col("id") * 1_000_000).alias("o_odate_us"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.concat(F.lit("P"), (F.col("id") % 5).cast("string")))
            .alias("o_priority"),
        ).repartition(32)
        out = f"/tmp/carpet_avro_scale_x{mult}"
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)

        # the REGISTERED op's write path (carpet_spark.ops.avro
        # .write_pandas_shards), so the numbers measure what ships
        t0 = time.perf_counter()
        manifest = write_pandas_shards(src, out, _ROUNDTRIP_SCHEMA)
        wrote = manifest.agg(F.sum("n_rows")).collect()[0][0]
        t_write = time.perf_counter() - t0
        shards = len(os.listdir(out))
        assert wrote == n, (wrote, n)

        back = _read_avro_dir(
            spark, out,
            "o_orderkey long, o_orderstatus string, o_totalprice double, "
            "o_odate_us long, o_priority string",
        )
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "CollectLimit" not in plan and "Exchange" not in plan, plan[:400]
        t0 = time.perf_counter()
        got = back.count()
        t_read = time.perf_counter() - t0
        assert got == n, (got, n)
        print(f"| {n:,} | {t_write:.2f} | {shards} | {t_read:.2f} "
              f"| {n / t_write:,.0f} | {n / t_read:,.0f} |", flush=True)
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
