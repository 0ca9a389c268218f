#!/usr/bin/env python
"""Scale probe for the product-analytics ops (funnel / retention /
streaks) at 1x/10x/100x event volumes, reusing the synthetic events from
streaming_scale_probe.py (150k/1.5M/15M rows, 30-day span) with the
type_0..7 labels remapped onto the funnel stages.

Results land in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.ops.analytics import (
    funnel_conversion,
    retention_cohorts,
    win_activity_streaks,
)
from carpet_spark.session import get_spark
from carpet_spark.tables import _SOURCE_CACHE
from scripts.streaming_scale_probe import synth

_STAGES = {"type_0": "signup", "type_1": "view", "type_2": "click", "type_3": "purchase"}


def main() -> None:
    spark = get_spark("analytics_scale_probe", cpus=32)
    for mult in (1, 10, 100):
        src = synth(spark, mult)
        d = f"/tmp/carpet_scale/analytics_x{mult}"
        if not os.path.exists(f"{d}/events.parquet"):
            os.makedirs(d, exist_ok=True)
            mapped = spark.read.parquet(src).withColumn(
                "event_type",
                F.coalesce(
                    F.element_at(
                        F.create_map(*[F.lit(x) for kv in _STAGES.items() for x in kv]),
                        F.col("event_type"),
                    ),
                    F.col("event_type"),
                ),
            ).withColumn("props", F.lit("{}"))
            mapped.write.mode("overwrite").parquet(f"{d}/events.parquet")
        res = {}
        for name, fn in (
            ("funnel", funnel_conversion),
            ("retention", retention_cohorts),
            ("streaks", win_activity_streaks),
        ):
            best, rows = float("inf"), 0
            for _ in range(2):
                _SOURCE_CACHE.clear()
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            res[name] = (best, rows)
        print(
            f"mult={mult} " + " ".join(f"{k}={v[0]:.2f}s(rows={v[1]})" for k, v in res.items()),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
