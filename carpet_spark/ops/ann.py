"""Approximate nearest neighbor — the 100 TB similarity-search path.

Brute-force cosine (ops/llm.py sim_cosine_topk) is exact but scans every
vector.  This module adds signed-random-projection (SRP) LSH: h fixed
hyperplanes → h sign bits → bucket id; a query probes only its bucket
(plus optional multiprobe neighbors).  Buckets are an equi key, so at scale
candidate lookup is a partition-pruned hash join, not a scan.

Hyperplanes are derived from a fixed seed (np.random.default_rng(42)) so
bucket assignment is deterministic across runs/executors.  The hash family
is not portable to SQL → rows-only for the driver; recall vs brute force is
asserted in tests/test_property.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load

_DIM = 64
_N_PLANES = 8  # 256 buckets
_SEED = 42


def _planes() -> np.ndarray:
    return np.random.default_rng(_SEED).standard_normal((_N_PLANES, _DIM))


@register("sim_ann_lsh")  # rows-only: seeded hyperplane family not in SQL
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by cosine to the vec_id=0 query, restricted to the query's
    SRP bucket (single-probe).  Bucket assignment runs as an Arrow-batched
    mapInPandas (one matmul per batch); scoring reuses the exact cosine but
    only over the bucket's candidates."""
    e = load(spark, sf_dir, "embeddings")

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = _planes()
        for pdf in batches:
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            bits = (vecs @ planes.T) > 0
            bucket = (bits * (1 << np.arange(_N_PLANES))).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "embedding": pdf["embedding"],
                    "bucket": bucket.astype("int64"),
                }
            )

    bucketed = e.mapInPandas(
        bucketize,
        schema="vec_id long, label int, embedding array<float>, bucket long",
    )
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    cand = bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))

    def dot(a, b):
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    scored = cand.select(
        "vec_id",
        "label",
        F.round(
            dot(F.col("embedding"), F.col("qe"))
            / (
                F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(dot(F.col("qe"), F.col("qe")))
            ),
            6,
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)
