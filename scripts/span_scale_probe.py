#!/usr/bin/env python
"""Scale probe for dedup_span_corpus: 64-token docs, ~30% of docs sharing
a boilerplate 20-token block (so inter-document duplicated spans exist),
measured at 15k / 150k / 1.5M docs on the registered op itself.

Results land in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.registry import REGISTRY
from carpet_spark.session import get_spark

BASE = "/tmp/carpet_scale/span"


def synth(spark, n: int) -> str:
    d = f"{BASE}/docs_{n}"
    if not os.path.exists(d):
        # 64 unique-ish md5 tokens per doc; docs with id%10<3 get a shared
        # 20-token boilerplate block spliced at the front
        toks = F.array(
            *[F.md5(F.concat(F.lit(str(i)), F.col("id").cast("string"))) for i in range(64)]
        )
        boiler = F.array(*[F.lit(f"boilerplate_token_{i}") for i in range(20)])
        text = F.when(
            F.col("id") % 10 < 3,
            F.array_join(F.concat(boiler, F.slice(toks, 1, 44)), " "),
        ).otherwise(F.array_join(toks, " "))
        (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                text.alias("text"),
                F.lit("en").alias("lang"),
                F.lit("web").alias("source"),
                F.length(text).alias("n_chars"),
            )
            .repartition(max(8, n // 100_000))
            .write.mode("overwrite")
            .parquet(f"{d}/documents.parquet")
        )
    return d


def main() -> None:
    spark = get_spark("span_scale_probe", cpus=32)
    for n in (15_000, 150_000, 1_500_000):
        d = synth(spark, n)
        best = float("inf")
        rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = REGISTRY["dedup_span_corpus"].fn(spark, d)
            stats = out.agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum((F.col("n_dup_spans") > 0).cast("int")).alias("docs_with_dups"),
            ).collect()[0]
            best = min(best, time.perf_counter() - t0)
            rows = stats
        print(
            f"n={n} span_dedup={best:.2f}s docs={rows['docs']} "
            f"docs_with_dups={rows['docs_with_dups']}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
