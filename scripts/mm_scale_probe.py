#!/usr/bin/env python
"""Raster-decode scale probe (r07 VERDICT item 5): the r7 vendored
PPM/PGM/BMP decoders have unit tests but no measured scaling row — this
probe drives the REAL mm_* decode tier (synth-encode -> pure-Python
decode -> per-image stats, all inside mapInPandas Arrow batches) at
1x/10x/100x document volumes and checks two things:

1. wall-clock scales ~linearly with raster byte volume (the decode is a
   per-row map with no shuffle — superlinear growth would mean batch
   memory pressure or driver involvement);
2. the executed plan stays driver-clean: FileScan -> (Arrow)MapInPandas
   chains only — no Exchange (nothing to shuffle), no CollectLimit, no
   broadcast of payload bytes.

Fixture: documents-shaped parquet (doc_id, text) where text length walks
20..599 so the synthetic image dims span both fit-box branches and vary
payload sizes exactly like the test fixture does.  1x = 15k docs
(~0.9 GB of decoded pixels), 100x = 1.5M docs (~90 GB decoded) — the
decoded plane never materializes as a whole; each Arrow batch holds only
its own rows, which is the property that lets the same plan run at
100 TB of shards.

Results land in SCALE.md ("Raster decode tier" table).  Usage:
  python scripts/mm_scale_probe.py [xmax]   # xmax in {1,10,100}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.registry import REGISTRY
from carpet_spark.session import get_spark

BASE = "/tmp/carpet_mm_scale"
N1 = 15_000  # 1x doc count (matches the corpus-op probes' 1x)


def build(spark, mult: int) -> str:
    """documents-shaped parquet: deterministic text whose LENGTH drives
    the synthetic image dims (multimodal._synth_dims keys off len)."""
    d = f"{BASE}/x{mult}"
    if not os.path.isdir(f"{d}/documents.parquet"):
        n = N1 * mult
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.rpad(F.lit("x"), (F.col("id") % 580 + 20).cast("int"), "x").alias(
                "text"
            ),
            F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
            F.lit("en").alias("lang"),
        )
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def probe(spark, name: str, sf_dir: str) -> float:
    from carpet_spark.tables import _SOURCE_CACHE

    _SOURCE_CACHE.clear()  # each mult reads its own fixture dir
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # driver-clean assertions: per-row decode must not shuffle or collect
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan[:500]
    for bad in ("Exchange", "CollectLimit", "BroadcastExchange"):
        assert bad not in plan, f"{name}: unexpected {bad} in decode plan"
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"  {name:28s} {dt:7.2f}s  ({n} rows)", flush=True)
    return dt


def main() -> None:
    xmax = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("mm_scale_probe")
    results: dict[str, dict[int, float]] = {}
    for mult in (1, 10, 100):
        if mult > xmax:
            break
        sf_dir = build(spark, mult)
        print(f"x{mult} ({N1 * mult} docs):", flush=True)
        # MM_PROBE_OPS narrows to one op per process: long-session netty
        # arena / Python-worker churn inflates the LAST op in a sequence
        # (mm_image_features read 96 s after two 10x ops vs 38 s fresh),
        # so per-op fresh processes give the honest scaling numbers.
        ops = os.environ.get(
            "MM_PROBE_OPS",
            "mm_image_resize,mm_image_channel_stats,mm_image_features",
        ).split(",")
        for name in ops:
            results.setdefault(name, {})[mult] = probe(spark, name, sf_dir)
    print("\nSUMMARY (seconds; cost@100x = t100/t1):")
    for name, r in results.items():
        row = " | ".join(f"{r[m]:.2f} s" if m in r else "-" for m in (1, 10, 100))
        ratio = f"{r[100] / r[1]:.1f}x" if 100 in r and 1 in r else "-"
        print(f"| {name} | {row} | {ratio} |")


if __name__ == "__main__":
    main()
