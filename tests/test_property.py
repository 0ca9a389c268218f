"""Property tests for the approximate operators (SURVEY §5): the ops whose
oracles are omitted (rows-only) get their quality contracts asserted here.
"""

import pytest

from carpet_spark.registry import REGISTRY

SF01 = "/root/testdata/sf0.1"  # the only sf with duplicate documents


def test_minhash_precision_and_recall(spark, sf_dir):
    """Every MinHash pair must truly have jaccard >= 0.7 (precision 1.0 by
    construction — the op verifies exactly); recall vs the exact op >= 0.9."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["dedup_near_jaccard"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["dedup_near_minhash"].fn(spark, sf_dir).collect()
    }
    assert approx <= exact, f"false positives: {approx - exact}"
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, f"recall {recall:.2f} ({len(approx)}/{len(exact)})"


def test_minhash_finds_all_exact_duplicates_at_sf01(spark):
    """LSH recall is 1.0 for jaccard=1.0 pairs: the 8 duplicate-text groups
    at sf0.1 must all be found."""
    import pyspark.sql.functions as F

    from carpet_spark.tables import load

    d = load(spark, SF01, "documents")
    dup_pairs = set()
    groups = (
        d.groupBy("text").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    assert len(groups) == 8, "fixture drift: expected 8 dup groups at sf0.1"
    for g in groups:
        ids = sorted(g.ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                dup_pairs.add((ids[i], ids[j]))
    found = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["dedup_near_minhash"].fn(spark, SF01).collect()
    }
    assert dup_pairs <= found, f"missed exact dups: {dup_pairs - found}"


def test_simhash_finds_exact_duplicates_at_sf01(spark):
    """Exact duplicates have identical simhash signatures -> hamming 0."""
    import pyspark.sql.functions as F

    from carpet_spark.tables import load

    d = load(spark, SF01, "documents")
    groups = (
        d.groupBy("text").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    dup_pairs = set()
    for g in groups:
        ids = sorted(g.ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                dup_pairs.add((ids[i], ids[j]))
    res = REGISTRY["dedup_near_simhash"].fn(spark, SF01).collect()
    zero = {(r.doc_a, r.doc_b) for r in res if r.hamming == 0}
    assert dup_pairs <= zero, f"missed: {dup_pairs - zero}"


def test_approx_distinct_within_5pct(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in REGISTRY["distinct_users"].fn(spark, sf_dir).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.05, f"{et}: {approx[et]} vs {n}"


def test_ann_lsh_returns_query_first(spark, sf_dir):
    """Single-probe SRP-LSH: the query vector is always in its own bucket,
    so the top hit is itself with cos 1.0; all results score below it."""
    rows = REGISTRY["sim_ann_lsh"].fn(spark, sf_dir).collect()
    assert rows, "empty ANN result"
    assert rows[0].vec_id == 0 and rows[0].cos_sim == 1.0
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ann_results_subset_of_brute_force_scores(spark, sf_dir):
    """Every ANN hit's score must equal the brute-force score for that id
    (the approximation affects candidate coverage, never the scores)."""
    import pyspark.sql.functions as F

    from carpet_spark.ops.llm import _dot
    from carpet_spark.tables import load

    ann = {r.vec_id: r.cos_sim for r in REGISTRY["sim_ann_lsh"].fn(spark, sf_dir).collect()}
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    brute = {
        r.vec_id: r.cos
        for r in e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qe"))
                / (
                    F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(_dot(F.col("qe"), F.col("qe")))
                ),
                6,
            ).alias("cos"),
        )
        .collect()
    }
    for vid, sim in ann.items():
        assert brute[vid] == sim


def test_approx_percentile_close_to_exact(spark, sf_dir):
    approx = {
        r.l_returnflag: (r.p50_approx, r.p90_approx)
        for r in REGISTRY["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: (r.p50_price, r.p90_price)
        for r in REGISTRY["agg_percentile"].fn(spark, sf_dir).collect()
    }
    for flag, (p50, p90) in exact.items():
        a50, a90 = approx[flag]
        assert abs(a50 - p50) / p50 <= 0.01
        assert abs(a90 - p90) / p90 <= 0.01


def test_ann_ivf_query_first_and_recall(spark, sf_dir):
    """IVF ANN: the query is always in its own (probed) cell → top hit is
    itself at cos 1.0; and with nprobe=4 of 16 cells the top-10 must
    overlap the exact brute-force top-10 on ≥5 ids (measured 7+ on the
    fixture; bound left slack for centroid ulp drift)."""
    import numpy as np
    import pyspark.sql.functions as F

    from carpet_spark.tables import load

    rows = REGISTRY["sim_ann_ivf"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert rows[0].vec_id == 0 and rows[0].cos_sim == 1.0
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in e])
    vecs = np.array([r.embedding for r in e], dtype=np.float64)
    q = vecs[ids == 0][0]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    exact_top = set(ids[np.argsort(-cos)[:10]].tolist())
    got = {r.vec_id for r in rows}
    assert len(got & exact_top) >= 5, f"recall too low: {got & exact_top}"


def test_lsum_matches_dsum_on_money_columns(spark, sf_dir):
    """The fixed-point long sum (exprs.lsum) must be bit-identical to the
    decimal path (exprs.dsum) for every money-shaped bench column within
    the hi/lo split's ~2.2e12 rows/group bound — this is the contract
    that lets the Q1 flagship use the fast primitive-long path."""
    import pyspark.sql.functions as F

    from carpet_spark.exprs import dsum, lsum
    from carpet_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    exprs = {
        "qty": F.col("l_quantity"),
        "price": F.col("l_extendedprice"),
        "disc_price": F.col("l_extendedprice") * (1 - F.col("l_discount")),
        "charge": F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")),
    }
    row = li.agg(
        *[dsum(e).alias(f"d_{k}") for k, e in exprs.items()],
        *[lsum(e).alias(f"l_{k}") for k, e in exprs.items()],
    ).collect()[0]
    for k in exprs:
        assert row[f"d_{k}"] == row[f"l_{k}"], (k, row[f"d_{k}"], row[f"l_{k}"])

    # negative values (c_acctbal has ~8% negatives): rounding must agree
    # away-from-zero on both paths
    c = load(spark, sf_dir, "customer")
    neg = c.agg(
        dsum(F.col("c_acctbal")).alias("d"), lsum(F.col("c_acctbal")).alias("l")
    ).collect()[0]
    assert neg["d"] == neg["l"], (neg["d"], neg["l"])


def test_lsum_exact_beyond_single_long_accumulator_bound(spark):
    """r8 VERDICT "What's wrong #1" regression: a SINGLE long accumulator
    for Σ round(x·1e6) overflows at |Σx| > 9.2e12 — the 100 TB Q1 shape.
    The r9 hi/lo-split escalation (exprs._fp_split_sum) must return the
    EXACT sum where the old path would have ANSI-aborted: 1.1M rows of
    9e6 puts the scaled sum at 9.9e18 > 2^63."""
    import pyspark.sql.functions as F

    from carpet_spark.exprs import lsum

    n, v = 1_100_000, 9_000_000.0
    df = spark.range(n).select(F.lit(v).alias("x"))
    got = df.agg(lsum(F.col("x")).alias("s")).collect()[0]["s"]
    assert got == v * n, (got, v * n)  # 9.9e12 < 2^53: double holds it exactly

    # signed variant: alternating ±9e6 over an ODD row count, so the two
    # signs imbalance by exactly one row — Σhi carries a large negative
    # partial and Σlo a large positive one (lo is always in [0, 2^22) in
    # the two's-complement split) and the decimal merge must still
    # produce the exact +9e6
    df2 = spark.range(n + 1).select(
        F.when(F.col("id") % 2 == 0, F.lit(v)).otherwise(F.lit(-v)).alias("x")
    )
    got2 = df2.agg(lsum(F.col("x")).alias("s")).collect()[0]["s"]
    assert got2 == v, (got2, v)


def test_embedding_ann_dedup_precision_and_recall(spark, sf_dir):
    """dedup_near_embedding_ann: every emitted pair's score must equal the
    exact op's score for that pair (precision 1.0 — candidates are verified
    with the same exact cosine), and recall vs the exact all-pairs op must
    clear the banding's theoretical floor (~0.98 at cos 0.4, higher above;
    bound left slack at 0.85 for the finite-planes draw)."""
    exact = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in REGISTRY["dedup_near_embedding"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in REGISTRY["dedup_near_embedding_ann"].fn(spark, sf_dir).collect()
    }
    for pair, sim in approx.items():
        assert pair in exact and exact[pair] == sim, f"false positive: {pair}"
    if exact:
        recall = len(set(approx) & set(exact)) / len(exact)
        assert recall >= 0.85, f"recall {recall:.3f} ({len(approx)}/{len(exact)})"


def test_knn_join_topk_recall_vs_bruteforce(spark, sf_dir):
    """Batch k-NN join: per-query top-3 via banded SRP candidates must
    average >=0.5 recall vs exact brute force (2-bit x 8 bands is a
    recall-oriented but still pruning family; exactness is NOT claimed —
    the op is rows-only by design), every emitted score must be exactly
    right (verified re-computation), and ranks must be 1..k ordered."""
    import numpy as np

    from carpet_spark.tables import load

    rows = REGISTRY["sim_knn_join_topk"].fn(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)

    e = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding").collect()
    ids = np.array([r.vec_id for r in e])
    labels = np.array([r.label for r in e])
    vecs = np.array([r.embedding for r in e], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    qmask = labels == 1
    assert set(by_q) <= set(ids[qmask].tolist())

    recalls = []
    for qi in np.nonzero(qmask)[0]:
        q_id = int(ids[qi])
        cos = (vecs @ vecs[qi]) / (norms * norms[qi])
        order = sorted(range(len(ids)), key=lambda i: (-round(cos[i], 6), ids[i]))
        exact_top = [int(ids[i]) for i in order if ids[i] != q_id][:3]
        got = sorted(by_q.get(q_id, []), key=lambda r: r.rank)
        got_ids = [r.neighbor_id for r in got]
        # scores exactly right for whatever was emitted
        for r in got:
            i = int(np.nonzero(ids == r.neighbor_id)[0][0])
            assert abs(round(float(cos[i]), 6) - r.cos_sim) <= 1e-6
        assert [r.rank for r in got] == list(range(1, len(got) + 1))
        recalls.append(len(set(got_ids) & set(exact_top)) / 3)
    assert recalls and float(np.mean(recalls)) >= 0.5, np.mean(recalls)


def test_range_binned_equals_naive_band_on_random_data(spark):
    """join_range_binned's bin-replication must be EXACTLY equivalent to
    the naive theta band join for any data — including values on bin
    boundaries (x/width integral) and negatives (floor semantics)."""
    import random

    import pyspark.sql.functions as F

    rng = random.Random(20260813)
    band = 10.0
    # adversarial values: boundary multiples of the bin width, negatives,
    # near-boundary offsets
    vals_a = [rng.choice([-1, 1]) * rng.randint(0, 400) / 4.0 for _ in range(300)]
    vals_b = [rng.choice([-1, 1]) * rng.randint(0, 400) / 4.0 for _ in range(300)]
    a = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals_a)], "ida long, va double"
    )
    b = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals_b)], "idb long, vb double"
    )

    naive = a.join(
        b, (b.vb >= a.va - band) & (b.vb <= a.va + band)
    ).select("ida", "idb")

    a_binned = a.withColumn(
        "bin_id",
        F.explode(
            F.array(
                F.floor(F.col("va") / band) - 1,
                F.floor(F.col("va") / band),
                F.floor(F.col("va") / band) + 1,
            )
        ),
    )
    b_binned = b.withColumn("bin_id", F.floor(F.col("vb") / band))
    binned = (
        b_binned.join(a_binned, "bin_id")
        .filter((F.col("vb") >= F.col("va") - band) & (F.col("vb") <= F.col("va") + band))
        .select("ida", "idb")
    )

    naive_set = {tuple(r) for r in naive.collect()}
    binned_set = {tuple(r) for r in binned.collect()}
    assert naive_set == binned_set, (
        f"missing={list(naive_set - binned_set)[:5]} "
        f"extra={list(binned_set - naive_set)[:5]}"
    )


def test_agg_approx_topk_partition_independent(spark, sf_dir):
    """The Misra-Gries guarantee that licenses agg_approx_topk's EXACT hash
    oracle: any word with global frequency > n/K survives phase 1 in at
    least one partition, so the final top-20 (exact recount of candidates)
    must be identical under radically different partition layouts."""
    from carpet_spark.registry import REGISTRY

    fn = REGISTRY["agg_approx_topk"].fn

    def run(n_parts):
        import carpet_spark.tables as tables

        orig = tables.load

        def repartitioned(spark_, sf_, name):
            df = orig(spark_, sf_, name)
            return df.repartition(n_parts) if name == "documents" else df

        tables.load = repartitioned
        # ops bind `load` at import time; patch via the module the op uses
        import carpet_spark.ops.aggs_advanced as mod

        mod_orig = mod.load
        mod.load = repartitioned
        try:
            return [tuple(r) for r in fn(spark, sf_dir).collect()]
        finally:
            tables.load = orig
            mod.load = mod_orig

    assert run(1) == run(13)


def test_emb_pca_variance_dominates_coordinates(spark, sf_dir):
    """PC1 optimality witness: the variance of the projected scores must be
    >= the variance of every raw coordinate (PC1 maximizes variance over
    ALL unit directions, so coordinate axes are a lower bound)."""
    import numpy as np

    from carpet_spark.registry import REGISTRY
    from carpet_spark.tables import load

    scores = np.array(
        [r["pc1_score"] for r in REGISTRY["emb_pca_project"].fn(spark, sf_dir).collect()]
    )
    mat = np.vstack(
        [r["embedding"] for r in load(spark, sf_dir, "embeddings").collect()]
    ).astype(float)
    assert scores.var(ddof=1) >= mat.var(axis=0, ddof=1).max() - 1e-9


def test_mmr_first_pick_and_diversity(spark, sf_dir):
    """MMR contract: (1) the first selected row is the plain cosine argmax;
    (2) the selected set's max pairwise cosine is <= the plain top-10's
    (diversity never worsens); (3) exactly 10 rows, ranks 1..10."""
    import numpy as np

    from carpet_spark.registry import REGISTRY
    from carpet_spark.tables import load

    mmr = (
        REGISTRY["sim_mmr_rerank"].fn(spark, sf_dir)
        .orderBy("sel_rank")
        .collect()
    )
    assert [r["sel_rank"] for r in mmr] == list(range(1, 11))

    topk = REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()
    assert mmr[0]["vec_id"] == topk[0]["vec_id"]

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=float)
        for r in load(spark, sf_dir, "embeddings").collect()
    }

    def max_pairwise(ids):
        vs = [emb[i] / np.linalg.norm(emb[i]) for i in ids]
        return max(
            float(vs[i] @ vs[j])
            for i in range(len(vs))
            for j in range(i + 1, len(vs))
        )

    assert max_pairwise([r["vec_id"] for r in mmr]) <= max_pairwise(
        [r["vec_id"] for r in topk]
    ) + 1e-9


def test_phash_dedup_catches_exact_duplicates(spark, tmp_path):
    """Byte-identical payloads hash identically, so every exact-duplicate
    pair must appear in mm_phash_dedup's output with hamming 0 — and
    unrelated payloads must NOT pair at hamming 0 (the fixture corpus has
    no exact text dups, so this runs on a synthesized micro-corpus)."""
    import os

    from pyspark.sql import Row

    from carpet_spark.registry import REGISTRY

    base = str(tmp_path / "phash_docs")
    mk = lambda i, t: Row(doc_id=i, text=t, lang="en", source="w", n_chars=len(t))
    rows = [
        mk(0, "alpha beta gamma delta " * 20),
        mk(1, "alpha beta gamma delta " * 20),   # exact dup of 0
        mk(2, "epsilon zeta eta theta " * 20),
        mk(3, "epsilon zeta eta theta " * 20),   # exact dup of 2
        mk(4, "totally different content here with other words " * 9),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "documents.parquet")
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in REGISTRY["mm_phash_dedup"].fn(spark, base).collect()
    }
    assert got.get((0, 1)) == 0
    assert got.get((2, 3)) == 0
    # unrelated docs must not collide at hamming 0
    for (a, b), h in got.items():
        if (a, b) not in {(0, 1), (2, 3)}:
            assert h > 0, f"unexpected hamming-0 pair {(a, b)}"
