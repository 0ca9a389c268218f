#!/usr/bin/env python
"""Scale probe for the round-3 fourth-wave heavy shapes at 1x/10x:

- graph_adamic_adar: the two-hop expansion + anti-join (the one
  deliberate fanout this wave added) over a synthetic co-purchase
  lineitem (600k/6M rows, 150k/1.5M orders, 40k/400k parts — the op's
  %20 sampling keeps 2k/20k graph nodes).
- decontaminate_substring: the stride-window explode + broadcast hash
  join over the synthetic dup-heavy documents corpus (15k/150k docs,
  ~200-char bodies).
- emb_nearest_centroid_assign: posexplode centroid build + broadcast
  packed-centroid zip_with assignment over synthetic 64-dim embeddings
  (20k/200k vectors, 8 labels).

Each measurement is best-of-2 full executions (count()), rebuilding the
plan per run.  Results land in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.ops.graph import graph_adamic_adar
from carpet_spark.ops.llm import emb_nearest_centroid_assign as _enca
from carpet_spark.ops.trainprep import decontaminate_substring
from carpet_spark.session import get_spark

BASE = "/tmp/carpet_scale/wave4"


def synth(spark, mult: int) -> str:
    d = f"{BASE}/x{mult}"
    os.makedirs(d, exist_ok=True)
    n_li, n_o, n_p = 600_000 * mult, 150_000 * mult, 40_000 * mult
    n_d, n_e = 15_000 * mult, 20_000 * mult
    li = f"{d}/lineitem.parquet"
    if not os.path.exists(li):
        # every part id is a multiple of 20 (all survive the op's %20
        # node sampling) and each order buys 4 near-consecutive parts,
        # so the co-purchase graph is a dense overlapping-window chain —
        # the two-hop expansion has real work at every scale
        (
            spark.range(n_li)
            .select(
                (F.col("id") % n_o).cast("long").alias("l_orderkey"),
                (
                    ((F.col("id") % n_o) + (F.col("id") - F.col("id") % n_o) / n_o)
                    .cast("long")
                    % (n_p // 20)
                    * 20
                )
                .cast("long")
                .alias("l_partkey"),
            )
            .repartition(8 * mult)
            .write.mode("overwrite")
            .parquet(li)
        )
    docs = f"{d}/documents.parquet"
    if not os.path.exists(docs):
        (
            spark.range(n_d)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.md5(
                            F.concat(
                                F.lit(s),
                                (F.col("id") % (n_d // 2)).cast("string"),
                            )
                        )
                        for s in "abcdef"
                    ],
                ).alias("text"),
            )
            .repartition(max(2, mult))
            .write.mode("overwrite")
            .parquet(docs)
        )
    emb = f"{d}/embeddings.parquet"
    if not os.path.exists(emb):
        (
            spark.range(n_e)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(64)),
                    lambda i: F.sin(F.col("id") * i * 0.73).cast("float"),
                ).alias("embedding"),
                (F.col("id") % 8).cast("int").alias("label"),
            )
            .repartition(max(2, mult))
            .write.mode("overwrite")
            .parquet(emb)
        )
    return d


def main() -> None:
    spark = get_spark("fourthwave_scale_probe", cpus=32)
    for mult in (1, 10):
        d = synth(spark, mult)
        res = {}
        for name, fn in (
            ("graph_adamic_adar", graph_adamic_adar),
            ("decontaminate_substring", decontaminate_substring),
            ("emb_nearest_centroid_assign", _enca),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            res[name] = (round(best, 2), n)
        print(f"x{mult}: " + ", ".join(f"{k}={v[0]}s ({v[1]} rows)" for k, v in res.items()))
    spark.stop()


if __name__ == "__main__":
    main()
