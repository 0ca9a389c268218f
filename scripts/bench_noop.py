#!/usr/bin/env python
"""Isolated per-query timing with the noop sink (optimization guide §1.4).

bench.py's _execute uses toPandas() (the driver-contract methodology);
this harness times the same queries with the noop sink so the number is
the computation, not the result transfer, and dumps .explain("formatted")
for each query to plans/r11/<name>_<tag>.txt.

Usage: python scripts/bench_noop.py [--tag before|after] [--runs N]
       [--queries a,b,c] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carpet_spark.registry import REGISTRY
from carpet_spark.session import get_spark

HEADLINE = {
    "q1_pricing_summary": "agg_groupby",
    "q3_top_orders": "q3_top_orders",
    "q5_region_revenue": "join_multiway",
    "window_rank": "win_rank",
    "topk_lineitem": "topk",
    "distinct_users": "distinct_users",
    "wordcount": "text_tokenize_wordcount",
    "tumbling_1h": "stream_tumbling",
    "dedup_docs": "dedup_exact",
}


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(HEADLINE) if not args.queries else args.queries.split(",")
    sf_dir = args.sf_dir
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    load1 = round(os.getloadavg()[0], 2)
    spark = get_spark("carpet_spark_bench_noop", cpus=cpus)

    noop(REGISTRY["agg_groupby"].fn(spark, sf_dir).limit(1))  # session warmup

    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[HEADLINE[name]].fn
        spark.sparkContext.setJobDescription(f"bench_noop: {name}")
        noop(fn(spark, sf_dir))  # per-plan codegen warmup, discarded
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        if args.tag:
            os.makedirs("plans/r11", exist_ok=True)
            import contextlib, io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain(mode="formatted")
            with open(f"plans/r11/{name}_{args.tag}.txt", "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"noop_total": round(sum(timings.values()), 4),
                      "queries": timings, "load1": load1, "cpus": cpus,
                      "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
