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


_NLIST = 16  # IVF coarse clusters
_NPROBE = 4  # clusters searched per query
_ITERS = 3  # fixed Lloyd iterations (deterministic run count)


@register("sim_ann_ivf")  # rows-only: iterative k-means not SQL-expressible
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    vectors into _NLIST cells; a query scores exact cosine only inside its
    _NPROBE nearest cells.  The scale path vs LSH: cell sizes adapt to the
    data distribution, and the per-cell candidate fetch is an equi join on
    cluster id (partition-prunable / bucketable at 100 TB).

    Training is distributed Lloyd with map-side combine: each Arrow batch
    emits per-cluster partial (sum, count); only _NLIST tiny partials
    shuffle per iteration, and the k×64-float centroid table broadcasts
    back — no driver-side scan of the vectors.  Seeding is deterministic
    (centroids ← vec_id 0.._NLIST-1), so cell assignment is reproducible
    across runs and executors.  Top-10 by cosine for the vec_id=0 query;
    recall vs the exact scan is asserted in tests/test_property.py."""
    e = load(spark, sf_dir, "embeddings")

    seed_rows = (
        e.filter(F.col("vec_id") < _NLIST).orderBy("vec_id").select("embedding").collect()
    )
    centroids = np.array([r[0] for r in seed_rows], dtype=np.float64)

    for _ in range(_ITERS):
        cent = centroids  # capture for closure

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
                # nearest centroid by squared L2
                d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                out = {"cluster": [], "vsum": [], "cnt": []}
                for cid in np.unique(assign):
                    mask = assign == cid
                    out["cluster"].append(int(cid))
                    out["vsum"].append(vecs[mask].sum(axis=0).tolist())
                    out["cnt"].append(int(mask.sum()))
                yield pd.DataFrame(out)

        agg = (
            e.mapInPandas(partials, schema="cluster int, vsum array<double>, cnt long")
            .groupBy("cluster")
            .agg(
                F.aggregate(
                    F.collect_list("vsum"),
                    F.array_repeat(F.lit(0.0), _DIM),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("vsum"),
                F.sum("cnt").alias("cnt"),
            )
            .collect()
        )
        new = centroids.copy()
        for row in agg:
            new[row["cluster"]] = np.array(row["vsum"]) / row["cnt"]
        centroids = new

    cent = centroids

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "embedding": pdf["embedding"],
                    "cluster": d2.argmin(axis=1).astype("int32"),
                }
            )

    indexed = e.mapInPandas(
        assign_cells,
        schema="vec_id long, label int, embedding array<float>, cluster int",
    )

    qvec = np.array(
        e.filter(F.col("vec_id") == 0).select("embedding").first()[0], dtype=np.float64
    )
    probe = np.argsort(((centroids - qvec) ** 2).sum(axis=1))[:_NPROBE].tolist()

    def dot(a, b):
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    qcol = F.array(*[F.lit(float(x)) for x in qvec.tolist()])
    scored = indexed.filter(F.col("cluster").isin(probe)).select(
        "vec_id",
        "label",
        F.round(
            dot(F.col("embedding"), qcol)
            / (
                F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                * F.lit(float(np.sqrt((qvec * qvec).sum())))
            ),
            6,
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)
