"""Reshaping operators — pivot (long→wide), unpivot/melt (wide→long),
seeded sampling.

Scale notes: pivot with an EXPLICIT value list compiles to one pass of
conditional aggregates (no second distinct-scan to discover columns — at
100 TB always pass the list); unpivot is a zero-shuffle stack() projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..exprs import lsum, sql_dsum
from ..ranks import ranked_by_range
from ..registry import register
from ..tables import load

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "agg_pivot",
    oracle=f"""
    SELECT c_nationkey,
           {', '.join(
               f'''CAST(SUM(CAST(CASE WHEN c_mktsegment = '{s}' THEN c_acctbal
                     ELSE NULL END AS DECIMAL(18,6))) AS DOUBLE) AS {s.lower()}'''
               for s in _SEGMENTS
           )}
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: account balance totals per nation, one column per market
    segment.  The explicit segment list keeps it a single-pass conditional
    aggregate; the oracle is the equivalent CASE formulation (same nulls
    for empty cells)."""
    c = load(spark, sf_dir, "customer")
    out = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"))
    )
    return out.select(
        "c_nationkey", *[F.col(s).alias(s.lower()) for s in _SEGMENTS]
    )


@register(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long: melt three measure columns into (measure, val) rows via
    unpivot (stack) — a pure projection, 3x rows, zero shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("measure", "^l_", "").alias("measure"),
        "val",
    )


@register(
    "sample_stratified",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    )
    SELECT doc_id, lang, sample_rank
    FROM ranked
    WHERE sample_rank <= (n_lang + 9) // 10
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10%-per-stratum sample of documents by language: rank
    rows inside each stratum by md5(doc_id) (a uniform, engine-agnostic
    pseudo-random order — unlike seeded RNG, identical in any engine) and
    keep the first ceil(n/10).  The cutoff uses integer arithmetic
    ((n+9) div 10), never 0.1*n, so no float-boundary drift (SURVEY §7.4).

    This is the reproducible eval-holdout / per-language rebalancing
    primitive of a training-data pipeline.  Scale: one window pass
    partitioned by stratum; md5 ranking distributes uniformly so no stratum
    ordering hotspot beyond the stratum's own size (salt-split giant strata
    upstream if one language dominates)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    order = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(Window.partitionBy("lang").orderBy(*order))
        .cast("long")
        .alias("sample_rank"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_lang"),
    )
    return ranked.filter(
        F.col("sample_rank") <= F.expr("(n_lang + 9) div 10")
    ).select("doc_id", "lang", "sample_rank")


@register(
    "sample_seeded",
    # promoted rows-only -> hash (r7 VERDICT item 4): seeded Bernoulli
    # reformulated as a deterministic hash-threshold filter both engines
    # compute bit-identically.
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE md5('42|' || CAST(l_orderkey AS VARCHAR) || '_'
              || CAST(l_linenumber AS VARCHAR))
          < '19999999999999999999999999999999'
    """,
)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded ~10% Bernoulli sample, engine-portable: instead of an RNG
    stream (which no two engines share), each row's keep/drop coin is
    md5(seed || primary key) compared against the 10%-quantile of the
    hex space ('1999…' = 0x1999…/0xffff… ≈ 0.1) — the same seeded
    selection every engine reproduces bit-identically, which is what
    makes a sampled eval slice auditable.  Changing the seed literal
    reshuffles the sample; the fraction is the threshold prefix.

    Scale (100 TB): a pure narrow projection+filter — no shuffle, no
    state, trivially parallel; the hash cost is the whole overhead.
    This is the front door to profiling/sketching without a full scan
    (sample_hash_split is the multi-way variant)."""
    li = load(spark, sf_dir, "lineitem")
    coin = F.md5(
        F.concat(
            F.lit("42|"),
            F.col("l_orderkey").cast("string"),
            F.lit("_"),
            F.col("l_linenumber").cast("string"),
        )
    )
    return li.filter(coin < "19999999999999999999999999999999").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "sample_balanced_class",
    oracle="""
    WITH ranked AS (
      SELECT label, vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM embeddings
    ),
    counts AS (SELECT label, COUNT(*) AS n_before FROM embeddings GROUP BY label),
    cap AS (SELECT MIN(n_before) AS cap FROM counts)
    SELECT c.label, c.n_before, COUNT(*) AS n_after,
           CAST(SUM(r.vec_id) AS BIGINT) AS checksum
    FROM ranked r JOIN counts c USING (label), cap
    WHERE r.rk <= cap.cap
    GROUP BY c.label, c.n_before
    """,
)
def sample_balanced_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: cap every label at the minority-class
    size so a classifier trained on the output sees a uniform label
    prior — the standard rebalancing step before fine-tuning on skewed
    labels.  Selection is DETERMINISTIC pseudo-random: rank within each
    label by md5(vec_id) (a seeded shuffle both engines compute
    identically — no RNG stream to diverge) and keep rank ≤ min class
    count.  Output proves the exact same rows were chosen (per-label
    checksum of kept ids), not just the same counts.

    Scale (100 TB): per-label rank is one hashpartitioning(label)
    window; the cap is a 1-row broadcast (min over |labels| counts —
    label cardinality is small by definition here; for millions of
    classes, cap via a quantile sketch instead).  A skewed majority
    label bounds its reducer at that label's row count — if one label
    dominates the corpus, pre-filter with a sampled bernoulli pass
    before the exact rank."""
    e = load(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = e.select("label", "vec_id", F.row_number().over(w).alias("rk"))
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_before"))
    cap = counts.agg(F.min("n_before").alias("cap"))
    return (
        ranked.join(F.broadcast(cap))
        .filter(F.col("rk") <= F.col("cap"))
        .join(counts, "label")
        .groupBy("label", "n_before")
        .agg(
            F.count(F.lit(1)).alias("n_after"),
            F.sum("vec_id").cast("long").alias("checksum"),
        )
    )


@register(
    "sample_negative_pairs",
    oracle="""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, label AS anchor_label
      FROM embeddings WHERE vec_id % 97 = 0
    ),
    ranked AS (
      SELECT a.anchor_id, e.vec_id AS neg_id,
             ROW_NUMBER() OVER (
               PARTITION BY a.anchor_id
               ORDER BY md5(CAST(a.anchor_id AS VARCHAR) || '_'
                            || CAST(e.vec_id AS VARCHAR)), e.vec_id)
               AS rk
      FROM anchors a JOIN embeddings e ON e.label <> a.anchor_label
    )
    SELECT anchor_id, neg_id, rk FROM ranked WHERE rk <= 5
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for each
    anchor, pick 5 pseudo-random candidates with a DIFFERENT label —
    seeded by md5(anchor, candidate) so the pairing is reproducible
    across runs and engines (no RNG stream), which is what makes
    contrastive datasets auditable.

    Scale (100 TB): the anchor set is the small side by construction
    (sampled) and BROADCASTS against the candidate corpus; ranking is a
    per-anchor window over that join.  The label-mismatch predicate
    makes the join a (broadcast) theta join — acceptable because
    |anchors| is bounded; at corpus-scale anchors, sample negatives
    WITHIN partitions instead (in-batch negatives, the standard trick)
    so no cross-partition pairing ever materializes."""
    e = load(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label")
    )
    cands = e.select(F.col("vec_id").alias("neg_id"), "label")
    joined = F.broadcast(anchors).join(
        cands, cands.label != anchors.anchor_label
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("_"),
                F.col("neg_id").cast("string"),
            )
        ),
        F.col("neg_id"),
    )
    return (
        joined.select("anchor_id", "neg_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@register(
    "sample_systematic_every_nth",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum,
           CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS DOUBLE) AS price_sum
    FROM ranked WHERE rn % 100 = 1
    """,
)
def sample_systematic_every_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every-Nth) sampling over a total key order: row 1,
    101, 201… of the (orderkey, linenumber) sequence — the audit-sample
    discipline (regulators like it because the selection is verifiable
    and covers the key range uniformly, unlike an RNG sample) — with
    checksums proving the exact same rows were drawn.

    r12 (VERDICT item 8): the global ROW_NUMBER window ran in ONE task.
    Replaced by the range-partitioned two-phase rank
    (ranks.ranked_by_range): same sampled range exchange a global sort
    pays, then per-partition local ranks + broadcast offsets — rank
    assignment is IDENTICAL (the (orderkey, linenumber) key is the
    table's primary key, a total order), and every phase runs
    partition-parallel, so the audit pull now scales with the data."""
    li = load(spark, sf_dir, "lineitem")
    ranked = ranked_by_range(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_orderkey", "l_linenumber"],
    ).filter(F.col("_rank") % 100 == 1)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("l_orderkey").cast("long").alias("key_checksum"),
        lsum(F.col("l_extendedprice")).alias("price_sum"),
    )


@register(
    "sample_time_split",
    oracle="""
    WITH cut AS (
      SELECT MIN(epoch_us(ts))
             + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) * 4 // 5 AS c
      FROM events
    )
    SELECT CASE WHEN epoch_us(ts) < (SELECT c FROM cut)
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(event_id) AS min_event,
           MAX(event_id) AS max_event
    FROM events
    GROUP BY 1
    """,
)
def sample_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split at the 80% point of the observed time
    range: everything before the cutoff trains, everything after tests —
    the ONLY honest split for forecasting and any model that will serve
    on future data (a random split like sample_hash_split leaks the
    future into training: the model sees events that happen after its
    test questions).  The report carries per-split user counts because
    overlapping users across splits is expected here — it is target
    leakage, not user leakage, that the time cut prevents.

    Determinism: the cutoff is interval arithmetic on the data's own
    min/max (×4/5 in exact µs integer terms in both engines) — no wall
    clock, fully replayable.

    Scale (100 TB): one scan, a 1-row min/max broadcast, a 2-key
    aggregate.  The split column in production is written as a
    partition key so train/test reads prune at the directory level."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cut = ev.agg(
        (
            F.min(us) + F.floor((F.max(us) - F.min(us)) * 4 / 5).cast("long")
        ).alias("cut_us")
    )
    return (
        ev.join(F.broadcast(cut))
        .select(
            F.when(F.unix_micros("ts") < F.col("cut_us"), "train")
            .otherwise("test")
            .alias("split"),
            "user_id",
            "event_id",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
    )


@register(
    "sample_pps_systematic",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    cum AS (
      SELECT o_custkey, cents,
             CAST(SUM(cents) OVER (ORDER BY o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_hi,
             CAST(SUM(cents) OVER (ORDER BY o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS cum_lo_n
      FROM rev
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev),
    pts AS (
      SELECT k, (2 * k + 1) * t.total // 40 AS point
      FROM (SELECT unnest(range(0, 20)) AS k) ks CROSS JOIN tot t
    )
    SELECT p.k AS sample_idx, c.o_custkey, c.cents,
           round(c.cents * 20 / CAST(t.total AS DOUBLE), 6)
             AS inclusion_prob
    FROM pts p
    JOIN cum c ON p.point >= COALESCE(c.cum_lo_n, 0) AND p.point < c.cum_hi
    CROSS JOIN tot t
    """,
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: 20 evenly
    spaced points on the cumulative-revenue axis each select the
    customer whose revenue interval contains them — big customers enter
    the sample with probability ∝ their revenue, the design survey
    statisticians and auditors (monetary-unit sampling) use so a 20-unit
    sample still covers most of the money.  Deterministic by
    construction (fixed key order, midpoint offsets (2k+1)·T/40, exact
    integer cumulative cents); reported inclusion probabilities are the
    size-proportional n·w/T.

    Scale (100 TB): the cumulative axis uses the distributed prefix-sum
    pattern (dist_cumulative_share) at scale; point selection is a
    20-row broadcast range join."""
    o = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    rev = o.groupBy("o_custkey").agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.orderBy("o_custkey")
    cum = rev.select(
        "o_custkey", "cents",
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_hi"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .cast("long")
        .alias("cum_lo_n"),
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    ks = o.sparkSession.createDataFrame([(k,) for k in range(20)], "k int")
    pts = ks.crossJoin(F.broadcast(tot)).select(
        "k", F.expr("(2 * k + 1) * total DIV 40").alias("point"), "total"
    )
    j = F.broadcast(pts).join(
        cum,
        (F.col("point") >= F.coalesce(F.col("cum_lo_n"), F.lit(0)))
        & (F.col("point") < F.col("cum_hi")),
    )
    return j.select(
        F.col("k").alias("sample_idx"), "o_custkey", "cents",
        F.round(F.col("cents") * 20 / F.col("total").cast("double"), 6).alias(
            "inclusion_prob"
        ),
    )
