#!/usr/bin/env python
"""Scale probe for the round-4 wave's heavy shapes at 1x/10x:

- win_session_position: three user-partitioned windows sharing one
  exchange (600k/6M events, 50k/500k users, mixed 0-60 min gaps so
  sessions both chain and split).
- win_views_per_purchase: prior-purchase segmentation + per-segment
  aggregate + join-back, all keyed on user_id.
- text_shingle_jaccard_langs: distinct 3-gram shingle sets per lang +
  shingle self-join (15k/150k docs, ~120-token bodies over a closed
  vocabulary so shingle overlap is real at both scales).
- agg_next_basket_pairs: per-customer LEAD + two basket joins onto the
  category^2 grid (150k/1.5M orders, 600k/6M lineitem).

Best-of-2 full executions (count()), plan rebuilt per run.  Results
land in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from carpet_spark.ops.analytics import agg_next_basket_pairs
from carpet_spark.ops.llm import text_shingle_jaccard_langs
from carpet_spark.ops.windows import win_session_position, win_views_per_purchase
from carpet_spark.session import get_spark

BASE = "/tmp/carpet_scale/r4wave"
TYPES = ["view", "click", "purchase", "signup", "error"]
VOCAB = [f"w{i}" for i in range(40)]
LANGS = ["en", "fr", "de", "es", "zh"]


def synth(spark, mult: int) -> str:
    d = f"{BASE}/x{mult}"
    os.makedirs(d, exist_ok=True)
    n_ev, n_u = 600_000 * mult, 50_000 * mult
    ev = f"{d}/events.parquet"
    if not os.path.exists(ev):
        # per-user event k arrives k*(10 + (k%7)*5) minutes in: gaps run
        # 10-40 min, so 30-min sessions both chain and break
        k = (F.col("id") / n_u).cast("long")
        offset_min = k * 10 + (k % 7) * 5 * k
        (
            spark.range(n_ev)
            .select(
                F.col("id").alias("event_id"),
                (
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                    + F.make_interval(mins=offset_min)
                    + F.make_interval(secs=(F.col("id") % 59))
                ).alias("ts"),
                (F.col("id") % n_u).cast("long").alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in TYPES]),
                    ((F.col("id") % 5) + 1).cast("int"),
                ).alias("event_type"),
                (F.col("id") % 1000 / 10.0).alias("value"),
            )
            .repartition(8 * mult)
            .write.mode("overwrite")
            .parquet(ev)
        )
    n_d = 15_000 * mult
    docs = f"{d}/documents.parquet"
    if not os.path.exists(docs):
        # 120-token bodies drawn from a 40-word closed vocab: distinct
        # shingle sets stay bounded and overlap across langs is real
        toks = [
            F.element_at(
                F.array(*[F.lit(w) for w in VOCAB]),
                (((F.col("id") * 31 + i * 7) % 40) + 1).cast("int"),
            )
            for i in range(120)
        ]
        (
            spark.range(n_d)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *toks).alias("text"),
                F.element_at(
                    F.array(*[F.lit(lang) for lang in LANGS]),
                    ((F.col("id") % 5) + 1).cast("int"),
                ).alias("lang"),
            )
            .repartition(max(2, mult))
            .write.mode("overwrite")
            .parquet(docs)
        )
    n_o, n_li, n_c = 150_000 * mult, 600_000 * mult, 20_000 * mult
    orders = f"{d}/orders.parquet"
    if not os.path.exists(orders):
        (
            spark.range(n_o)
            .select(
                F.col("id").alias("o_orderkey"),
                (F.col("id") % n_c).cast("long").alias("o_custkey"),
                (
                    F.lit("1995-01-01").cast("timestamp")
                    + F.make_interval(days=((F.col("id") / n_c) % 2000).cast("long"))
                ).alias("o_orderdate"),
            )
            .repartition(4 * mult)
            .write.mode("overwrite")
            .parquet(orders)
        )
    li = f"{d}/lineitem.parquet"
    if not os.path.exists(li):
        (
            spark.range(n_li)
            .select(
                (F.col("id") % n_o).cast("long").alias("l_orderkey"),
                ((F.col("id") * 13) % 4000).cast("long").alias("l_partkey"),
            )
            .repartition(8 * mult)
            .write.mode("overwrite")
            .parquet(li)
        )
    return d


def main() -> None:
    spark = get_spark("r4wave_scale_probe", cpus=32)
    for mult in (1, 10):
        d = synth(spark, mult)
        res = {}
        for name, fn in (
            ("win_session_position", win_session_position),
            ("win_views_per_purchase", win_views_per_purchase),
            ("text_shingle_jaccard_langs", text_shingle_jaccard_langs),
            ("agg_next_basket_pairs", agg_next_basket_pairs),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            assert n > 0, f"{name} produced no rows at x{mult}"
            res[name] = (round(best, 2), n)
        print(
            f"x{mult}: "
            + ", ".join(f"{k}={v[0]}s ({v[1]} rows)" for k, v in res.items())
        )
    spark.stop()


if __name__ == "__main__":
    main()
