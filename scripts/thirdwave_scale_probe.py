#!/usr/bin/env python
"""Scale probe for the round-3 third-wave ops at 1x/10x/100x volumes.

- ts_interval_merge + attribution_last_touch over the analytics events
  (150k/1.5M/15M rows — reuses analytics_scale_probe's remapped synth,
  which already carries view/click/purchase stages).
- join_array_membership shape over the scale_probe documents corpus
  (15k/150k/1.5M docs), with the probe dim drawn from the synthetic md5
  vocabulary so the broadcast-join side actually matches.

Results land in SCALE.md.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.ops.analytics import agg_transition_matrix, attribution_last_touch
from carpet_spark.ops.timeseries import ts_interval_merge, ts_rolling_active_users
from carpet_spark.session import get_spark
from carpet_spark.tables import _SOURCE_CACHE
from scripts.analytics_scale_probe import _STAGES  # noqa: F401  (synth reuse)
from scripts.scale_probe import synth as synth_tpch
from scripts.streaming_scale_probe import synth as synth_events


def _analytics_dir(spark, mult: int) -> str:
    src = synth_events(spark, mult)
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
    return d


def _membership_shape(spark, d_path: str):
    """Same plan as join_array_membership, dim drawn from the synth vocab."""
    terms = [
        hashlib.md5(f"a{k}".encode()).hexdigest() for k in range(5)
    ]
    dim = spark.createDataFrame([(t,) for t in terms], "term string")
    docs = spark.read.parquet(d_path)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        toks.join(F.broadcast(dim), "term")
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )


def main() -> None:
    spark = get_spark("thirdwave_scale_probe", cpus=32)
    for mult in (1, 10, 100):
        ad = _analytics_dir(spark, mult)
        _, _, d_path = synth_tpch(spark, mult)
        res = {}
        for name, thunk in (
            ("interval_merge", lambda: ts_interval_merge(spark, ad).count()),
            ("attribution", lambda: attribution_last_touch(spark, ad).count()),
            ("array_membership", lambda: _membership_shape(spark, d_path).count()),
            ("rolling_wau", lambda: ts_rolling_active_users(spark, ad).count()),
            ("transition_matrix", lambda: agg_transition_matrix(spark, ad).count()),
        ):
            best, rows = float("inf"), 0
            for _ in range(2):
                _SOURCE_CACHE.clear()
                t0 = time.perf_counter()
                rows = thunk()
                best = min(best, time.perf_counter() - t0)
            res[name] = (best, rows)
        print(
            f"mult={mult} "
            + " ".join(f"{k}={v[0]:.2f}s(rows={v[1]})" for k, v in res.items()),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
