#!/usr/bin/env python
"""Scale probe: run the core operator shapes at 1x / 10x / 30x of sf0.1
(synthetic seeded data in /tmp) and report wall-time scaling.

The question this answers (SURVEY §7.6): do the plans scale linearly with
data volume, i.e. no driver-side or single-task bottleneck?  Results land
in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from carpet_spark.exprs import davg, dsum
from carpet_spark.session import get_spark

BASE = "/tmp/carpet_scale"


def synth(spark, mult: int) -> tuple[str, str, str]:
    """Seeded synthetic lineitem/orders/documents at `mult` x sf0.1 volumes."""
    li_path = f"{BASE}/lineitem_x{mult}"
    o_path = f"{BASE}/orders_x{mult}"
    d_path = f"{BASE}/documents_x{mult}"
    n_li, n_o = 600_000 * mult, 150_000 * mult
    n_d = 15_000 * mult
    if not os.path.exists(li_path):
        (
            spark.range(n_li)
            .withColumn("l_orderkey", (F.col("id") % n_o).cast("long"))
            .withColumn("l_quantity", (F.floor(F.rand(42) * 50) + 1).cast("double"))
            .withColumn("l_extendedprice", F.round(F.rand(43) * 100000 + 900, 2))
            .withColumn("l_discount", F.round(F.rand(44) * 0.1, 2))
            .withColumn("l_tax", F.round(F.rand(45) * 0.08, 2))
            .withColumn(
                "l_returnflag",
                F.element_at(
                    F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                    (F.col("id") % 3 + 1).cast("int"),
                ),
            )
            .drop("id")
            .repartition(8 * mult)
            .write.mode("overwrite")
            .parquet(li_path)
        )
    if not os.path.exists(o_path):
        (
            spark.range(n_o)
            .select(
                F.col("id").alias("o_orderkey"),
                (F.col("id") % (15_000 * mult)).alias("o_custkey"),
                F.round(F.rand(46) * 300000, 2).alias("o_totalprice"),
            )
            .repartition(2 * mult)
            .write.mode("overwrite")
            .parquet(o_path)
        )
    if not os.path.exists(d_path):
        # ~2 copies per distinct text: the dedup shuffle has real combining
        # to do, keyed on the digest of a ~200-char body
        (
            spark.range(n_d)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[F.md5(F.concat(F.lit(s), (F.col("id") % (n_d // 2)).cast("string"))) for s in "abcdef"],
                ).alias("text"),
            )
            .repartition(max(2, mult))
            .write.mode("overwrite")
            .parquet(d_path)
        )
    return li_path, o_path, d_path


def probe(spark, mult: int) -> dict[str, float]:
    li_path, o_path, d_path = synth(spark, mult)
    res = {}

    def t(name, build):
        best = float("inf")
        for _ in range(2):  # best-of-2, REBUILDING the plan each run —
            # re-executing one DataFrame object reuses its shuffle files
            # and fakes sub-linear scaling
            t0 = time.perf_counter()
            build().toPandas()
            best = min(best, time.perf_counter() - t0)
        res[name] = round(best, 3)

    def li():
        return spark.read.parquet(li_path)

    def o():
        return spark.read.parquet(o_path)

    t(
        "agg_q1_shape",
        lambda: li().groupBy("l_returnflag").agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        ),
    )
    t(
        "join_agg_shape",
        lambda: li().join(o(), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice")).alias("spend"))
        .orderBy(F.col("spend").desc())
        .limit(10),
    )
    t(
        "topk_shape",
        lambda: li()
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"))
        .limit(100),
    )
    t(
        "distinct_shape",
        lambda: li().groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("d")
        ),
    )

    def docs():
        return spark.read.parquet(d_path)

    # q5 shape: fact⋈fact shuffle + broadcast dim + group on dim key — the
    # plan whose 31x win over baseline comes from never shuffling the dims
    dim = spark.range(25).select(
        F.col("id").alias("n_key"),
        F.concat(F.lit("nation_"), F.col("id").cast("string")).alias("n_name"),
    )
    t(
        "q5_dim_broadcast_shape",
        lambda: li()
        .join(o(), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") % 25 == F.col("n_key"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")),
    )
    # window_rank shape: full-table window compute (one hash exchange +
    # per-partition sort); output bounded by a post-window rank filter so
    # the probe measures engine cost, not 60M-row Arrow transfer
    t(
        "window_rank_shape",
        lambda: li()
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("l_orderkey").orderBy(
                    F.col("l_extendedprice").desc()
                )
            ),
        )
        .filter(F.col("rnk") <= 2)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n")),
    )
    # per-group top-k, both ways: the naive single window funnels the whole
    # table through |groups| reducers (3 returnflag values here — the skew
    # worst case); the two-phase salted version pre-prunes to <=3 rows per
    # (group, salt-of-64) so the final window sees <=192 rows per group
    # regardless of table size.  The gap between these two rows IS the
    # skew argument for ops/sorts.py::topk_per_group.
    order_cols = [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc()]

    def naive_group_topk():
        w = Window.partitionBy("l_returnflag").orderBy(*order_cols)
        return (
            li()
            .select("l_returnflag", "l_orderkey", "l_extendedprice")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
        )

    def salted_group_topk():
        salted = Window.partitionBy(
            "l_returnflag", F.pmod(F.hash("l_orderkey"), F.lit(64))
        ).orderBy(*order_cols)
        final = Window.partitionBy("l_returnflag").orderBy(*order_cols)
        return (
            li()
            .select("l_returnflag", "l_orderkey", "l_extendedprice")
            .withColumn("srn", F.row_number().over(salted))
            .filter(F.col("srn") <= 3)
            .drop("srn")
            .withColumn("rn", F.row_number().over(final))
            .filter(F.col("rn") <= 3)
        )

    t("group_topk_naive_shape", naive_group_topk)
    t("group_topk_salted_shape", salted_group_topk)
    # dedup shape: exact dedup's digest-keyed shuffle (never the raw text)
    t(
        "dedup_shape",
        lambda: docs()
        .groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_distinct"), F.sum("n_copies").alias("n_docs")),
    )

    # decontamination shape (ops/trainprep.py::decontaminate_ngram): explode
    # per-doc n-grams, broadcast the (small) benchmark gram set, semi-join.
    # The corpus explodes ~2 grams/doc and is never shuffled; the bench side
    # is |corpus|/97 docs -> broadcastable at any realistic eval-suite size.
    def decontam():
        toks = F.split("text", " ")
        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 4, F.lit(0))),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(5)]
                ),
            )
        )
        ng = docs().select("doc_id", grams.alias("gs"))
        bench = (
            ng.filter(F.col("doc_id") % 97 == 0)
            .select(F.explode("gs").alias("g"))
            .distinct()
        )
        train = ng.filter(F.col("doc_id") % 97 != 0)
        hits = (
            train.select("doc_id", F.explode("gs").alias("g"))
            .join(F.broadcast(bench), "g", "left_semi")
            .select("doc_id")
            .distinct()
        )
        return (
            train.join(hits.withColumn("hit", F.lit(True)), "doc_id", "left")
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n_train"),
                F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_contam"),
            )
        )

    t("decontam_shape", decontam)

    # unigram-LM scoring shape (ops/trainprep.py::text_unigram_logprob):
    # token-count aggregate (shuffle = |vocab|), broadcast the vocab, score
    # the corpus shuffle-free, per-doc partial agg.  Synthetic md5 tokens
    # are truncated to 3 hex chars so vocab stays bounded (~4k) the way a
    # natural-language vocab is — the regime the broadcast design targets.
    def unigram():
        toks = (
            docs()
            .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
            .select("doc_id", F.substring("t", 1, 3).alias("tok"))
        )
        cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        tot = cnt.agg(F.sum("c").alias("s"))
        vocab = cnt.crossJoin(F.broadcast(tot)).select(
            "tok", F.log(F.col("c") / F.col("s")).alias("lp")
        )
        return (
            toks.join(F.broadcast(vocab), "tok")
            .groupBy("doc_id")
            .agg(F.avg("lp").alias("avg_lp"))
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"), F.avg("avg_lp").alias("mean_lp"))
        )

    t("unigram_logprob_shape", unigram)
    return res


def main():
    spark = get_spark("scale_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    mults = tuple(int(m) for m in os.environ.get("SCALE_MULTS", "1,10,30").split(","))
    for mult in mults:  # synth everything first so probes are write-free
        synth(spark, mult)
    out = {}
    for mult in mults:
        parts = max(8, 8 * mult // 4)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        out[f"x{mult}"] = {"shuffle_partitions": parts, **probe(spark, mult)}
        print(json.dumps({f"x{mult}": out[f"x{mult}"]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
