"""Training-data preparation operators (extension beyond SURVEY §2.I).

The ops a 100 TB pretraining pipeline runs between raw crawl and tokenizer:
HTML stripping, free-text PII scrubbing, deterministic train/val/test
splitting, batch sessionization, embedding quantization, BPE-style token
accounting, and mergeable-sketch cardinality.

Scale design: every op here is either a pure narrow projection (clean,
scrub, quantize, token-count — zero shuffle at any size) or a two-phase
hash aggregate whose shuffle volume is |groups|, not |rows| (split stats,
sessionize, sketches).  Nothing leaves the JVM; no Python UDFs.

Determinism notes (SURVEY §7.4): DuckDB ``regexp_replace`` replaces only
the first match unless passed the ``'g'`` flag — every oracle regex here
carries it.  Spark ``regexp_extract_all`` defaults to group 1, DuckDB to
group 0, so extraction patterns are parenthesized and both sides pass the
group index explicitly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..exprs import davg, round6, sql_davg
from ..registry import register
from ..tables import load, spread

# ------------------------------------------------------------- cleaning ----

# Entity-decode table applied after tag stripping; order-insensitive except
# &amp; which must come last so "&amp;lt;" doesn't double-decode.
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


@register(
    "text_clean_html",
    oracle=r"""
    WITH html AS (
      SELECT doc_id,
             '<p id="' || doc_id || '"><b>' || text || '</b></p> &amp; <br/>' AS h
      FROM documents
    ),
    cleaned AS (
      SELECT doc_id,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(
                 regexp_replace(h, '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
                 '&amp;', '&'),
               '\s+', ' ', 'g')) AS cleaned
      FROM html
    )
    SELECT doc_id, cleaned, length(cleaned) AS clean_len FROM cleaned
    """,
)
def text_clean_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-to-text cleaning: strip tags, decode entities, collapse
    whitespace.  The markup is synthesized deterministically around each
    document (the corpus itself is plain text) so the op exercises the
    real chain.  Pure narrow projection — zero shuffle at any corpus size,
    whole-stage-codegen regex on the JVM."""
    d = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<p id="'), F.col("doc_id").cast("string"), F.lit('"><b>'),
        F.col("text"), F.lit("</b></p> &amp; <br/>"),
    )
    cleaned = F.regexp_replace(html, "<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(ch))
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return d.select(
        "doc_id", cleaned.alias("cleaned"), F.length(cleaned).alias("clean_len")
    )


_PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"


@register(
    "pii_text_scrub",
    oracle=f"""
    WITH note AS (
      SELECT doc_id,
             text || ' contact: 12-345-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' or doc' || doc_id || '@example.com' AS note
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(note, '{_PHONE_RE}', '[PHONE]', 'g'),
                          '{_EMAIL_RE}', '[EMAIL]', 'g') AS scrubbed,
           len(regexp_extract_all(note, '({_PHONE_RE})', 1)) AS n_phone,
           len(regexp_extract_all(note, '({_EMAIL_RE})', 1)) AS n_email
    FROM note
    """,
)
def pii_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text PII scrubbing: redact phone numbers and emails *inside*
    unstructured text (the column-level ops in ops/pii.py can't reach
    these).  PII is planted deterministically per doc_id so redaction
    counts are verifiable.  Narrow projection: the scrub runs where the
    data lives, no shuffle, no Python."""
    d = load(spark, sf_dir, "documents")
    note = F.concat(
        F.col("text"), F.lit(" contact: 12-345-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" or doc"), F.col("doc_id").cast("string"), F.lit("@example.com"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(note, _PHONE_RE, "[PHONE]"), _EMAIL_RE, "[EMAIL]"
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all(note, F.lit(f"({_PHONE_RE})"), F.lit(1))).alias("n_phone"),
        F.size(F.regexp_extract_all(note, F.lit(f"({_EMAIL_RE})"), F.lit(1))).alias("n_email"),
    )


# ------------------------------------------------------------- splitting ----


@register(
    "sample_hash_split",
    oracle="""
    WITH b AS (
      SELECT *, strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1 AS bucket
      FROM documents
    ),
    s AS (
      SELECT *, CASE WHEN bucket < 12 THEN 'train'
                     WHEN bucket < 14 THEN 'val'
                     ELSE 'test' END AS split
      FROM b
    )
    SELECT split, COUNT(*) AS n_docs,
           {avg_chars} AS avg_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM s GROUP BY split
    """.format(avg_chars=sql_davg("n_chars")),
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content hash: the last
    hex nibble of md5(text) buckets each document 0-15; 12/2/2 nibbles →
    75/12.5/12.5 split.  Content-keyed (not doc_id-keyed) so re-ingested
    copies of a document always land in the same split — the property that
    prevents train/test leakage under re-crawls.  Stateless projection +
    3-group aggregate; no shuffle of document text."""
    d = load(spark, sf_dir, "documents")
    bucket = F.expr("locate(substring(md5(text), 32, 1), '0123456789abcdef') - 1")
    split = (
        F.when(bucket < 12, "train").when(bucket < 14, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.col("n_chars")).alias("avg_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------- sessionizing ----


@register(
    "ts_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0
                  ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when a
    user's inter-event gap exceeds 30 minutes.  The batch twin of
    stream_session (ops/streaming.py) — same windows, computed with two
    partitioned window passes instead of the state store.

    Scale: both windows and the final aggregate share ONE
    hashpartitioning(user_id) — a single shuffle end-to-end regardless of
    table size; per-partition sorts are user-local.  Ordering is made
    total with (ts, event_id) so tie rows flag identically in both
    engines."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gap test to match DuckDB's interval comparison (a cast-to-
    # seconds diff would misclassify gaps like 30min+0.4s)
    gap_ok = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        <= 1_800_000_000
    )
    flagged = e.select(
        "user_id", "ts", "event_id",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("new_session"),
    )
    numbered = flagged.select(
        "user_id", "ts",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("duration_sec"),
        )
    )


# ----------------------------------------------------------- embeddings ----

_NORM_SQL = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
)


@register(
    "emb_quantize",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding, {_NORM_SQL} AS nrm FROM embeddings
    ),
    q AS (
      SELECT vec_id, label, round(nrm, 6) AS l2_norm, nrm,
             list_transform(range(1, 65),
               i -> CAST(round(CAST(embedding[i] AS DOUBLE)
                               / NULLIF(nrm, 0) * 127) AS INT)) AS qv
      FROM n
    )
    SELECT vec_id, label, l2_norm,
           CASE WHEN nrm = 0 THEN NULL ELSE list_min(qv) END AS q_min,
           CASE WHEN nrm = 0 THEN NULL ELSE list_max(qv) END AS q_max,
           CASE WHEN nrm = 0 THEN NULL
                ELSE CAST(list_sum(qv) AS INTEGER) END AS q_sum
    FROM q
    """,
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization: L2-normalize then scale to [-127,127]
    — the storage/serving compression step before ANN indexing (4 bytes →
    1 byte per dim).  All JVM higher-order functions over the array
    column; zero shuffle.  Projected to scalar stats (min/max/sum pin
    every quantized value's contribution) to keep the value-hash off raw
    list columns.  float→double widening is exact in both engines; the
    64-term norm fold drifts ≤1e-14, inside round-6 (same argument as
    _DOT_SQL, ops/llm.py)."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    sq = F.zip_with(v, v, lambda x, y: x.cast("double") * y.cast("double"))
    nrm = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))
    # NULLIF guard (degenerate sweep): a zero vector cannot be unit-scaled
    # — its quantized stats are NULL by construction on both sides (the
    # explicit CASE keeps the two engines' NULL-in-list fold semantics out
    # of the comparison entirely).
    qv = F.transform(
        v,
        lambda x: F.round(
            x.cast("double") / F.nullif(F.col("nrm"), F.lit(0.0)) * 127
        ).cast("int"),
    )
    live = F.col("nrm") > 0
    return (
        e.withColumn("nrm", nrm)
        .withColumn("qv", qv)
        .select(
            "vec_id", "label",
            round6(F.col("nrm")).alias("l2_norm"),
            F.when(live, F.array_min("qv")).alias("q_min"),
            F.when(live, F.array_max("qv")).alias("q_max"),
            F.when(
                live, F.aggregate("qv", F.lit(0), lambda acc, x: acc + x)
            ).alias("q_sum"),
        )
    )


# ------------------------------------------------------- token counting ----

# BPE-style pre-tokenization proxy: letter runs, digit runs, or single
# non-alphanumeric marks — the GPT-2-family regex shape reduced to classes
# both Java regex and RE2 treat identically.
_TOK_RE = "([a-z]+|[0-9]+|[^a-z0-9 ])"


@register(
    "text_bpe_tokens",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             len(regexp_extract_all(text, '{_TOK_RE}', 1)) AS n_tok
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MAX(n_tok) AS max_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM t GROUP BY source
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting with a BPE-ish pre-tokenizer regex (letter runs /
    digit runs / punctuation marks) — the budget estimate a pretraining
    pipeline runs before paying for real tokenization.  Per-doc counts are
    a narrow projection; the rollup shuffles |sources| rows.  Integer sums
    are exact, and the avg is one double division of exact ints —
    bit-identical across engines."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all("text", F.lit(_TOK_RE), F.lit(1)))
    return (
        d.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.max("n_tok").alias("max_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        )
    )


# ------------------------------------------------------ sketch merging ----


@register("agg_hll_merge", oracle=None)  # rows-only: estimate is sketch-defined
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-cardinality pattern: build one HLL sketch of user_id per
    event_type (partial, map-side combined), then union the per-type
    sketches into a global distinct-user estimate — the only way COUNT
    DISTINCT composes at 100 TB (partials merge across partitions, days,
    and re-runs; exact distinct would reshuffle every row).  Estimate
    accuracy vs exact is pinned in tests/test_trainprep.py (lgConfigK=12
    → ~1.6% standard error).  Rows-only: the estimate is sketch-defined,
    not ANSI-SQL-reproducible."""
    e = load(spark, sf_dir, "events")
    sketches = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    return sketches.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct_users"),
    )


_FP_SQL = "sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


@register(
    "dedup_cross_corpus",
    oracle=f"""
    WITH seen AS (
        SELECT {_FP_SQL} AS fp FROM documents WHERE doc_id % 3 = 0
    ),
    incoming AS (
        SELECT doc_id, lang, {_FP_SQL} AS fp
        FROM documents WHERE doc_id % 3 <> 0
    )
    SELECT i.doc_id, i.lang
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fp = i.fp)
    """,
)
def dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: drop incoming documents whose normalized
    fingerprint (lowercase, whitespace-collapsed, sha256 — text_fingerprint's
    normalization) already exists in the previously-ingested corpus.  Here
    the 'seen' corpus is simulated as doc_id % 3 == 0 of the same table.

    Scale: LEFT ANTI join on the 32-byte digest — the shuffle carries
    fingerprints, never text, and the seen-side can be a 100 TB corpus's
    fingerprint index (digests only, ~1/3000th the bytes).  This is THE
    recurring production shape: dedup each new crawl against everything
    already trained on."""
    d = load(spark, sf_dir, "documents")
    fp = F.sha2(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), 256)
    seen = d.filter(F.col("doc_id") % 3 == 0).select(fp.alias("fp"))
    incoming = d.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", "lang", fp.alias("fp")
    )
    return incoming.join(seen, "fp", "left_anti").select("doc_id", "lang")


# ------------------------------------------------------ output sharding ----


@register(
    "pack_shards",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             hash_part,
             len(string_split(text, ' ')) AS n_tokens
      FROM (
        SELECT doc_id, text,
               CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 8
                    AS INTEGER) AS hash_part
        FROM documents
      )
    ),
    packed AS (
      SELECT doc_id, hash_part, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY hash_part ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, hash_part, n_tokens,
           CAST(FLOOR(CAST(cum_tokens - n_tokens AS DOUBLE) / 2000)
                AS BIGINT) AS shard_id
    FROM packed
    """,
)
def pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed token-budget output shards — the last step
    of a pretraining pipeline before writing tokenized data.  Documents are
    spread across hash partitions (md5 of doc_id, so assignment is stable
    under reprocessing), and within each partition a running token cumsum
    places each doc in shard floor(preceding_tokens / budget): every shard
    holds ~budget tokens of consecutive docs.

    Scale: the window cumsum runs per hash_part — P independent sequential
    scans, each 1/P of the corpus, exactly how a distributed writer packs
    shards without a global sort.  Shard ids are deterministic because the
    intra-partition order (doc_id) and the hash are."""
    d = load(spark, sf_dir, "documents")
    budget = 2000
    part = (
        F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)) % 8
    ).alias("hash_part")
    toks = d.select(
        "doc_id", part, F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("hash_part")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.select(
        "doc_id",
        "hash_part",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double") / budget
        ).alias("shard_id"),
    )


@register(
    "shuffle_deterministic",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)))
             AS shuffle_rank
    FROM documents
    """,
)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: global example order for training is
    the sort order of md5(seed || doc_id) — reproducible across runs and
    engines (both emit lowercase-hex md5), reshuffled by changing the
    seed, and free of RNG state.  The observable is the rank itself.

    Scale: the global rank is computed WITHOUT a single-partition window
    (the naive ``Window.orderBy(key)`` funnels the corpus through one
    reducer).  Instead, the distributed zipWithIndex pattern over
    CONTENT-DERIVED range buckets: the key's first hex character splits
    the corpus into 16 disjoint ordered ranges ('0' < '1' < … < 'f'
    lexicographically, and the first char dominates the comparison), each
    bucket takes a partition-local row_number, and a 16-row cumulative
    offset table (broadcast) lifts local ranks to global ones.  Bucketing
    by content — not by a sampled boundary — keeps every branch of the
    plan in agreement without relying on exchange reuse; at 100 TB use
    the first 2-4 hex chars (256-65k buckets) for reducer parallelism."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    keyed = d.select(
        "doc_id", key.alias("k"), F.substring(key, 1, 1).alias("bucket")
    )
    local = keyed.withColumn(
        "lrn", F.row_number().over(Window.partitionBy("bucket").orderBy("k"))
    )
    offsets = (
        keyed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        "doc_id", (F.col("lrn") + F.col("offset")).alias("shuffle_rank")
    )


# ----------------------------------------------- decontamination / mixing ----


@register(
    "decontaminate_ngram",
    oracle="""
    WITH ng AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                    t[i+3] || ' ' || t[i+4])) AS gs
      FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM ng WHERE doc_id % 97 = 0
    ),
    hits AS (
      SELECT DISTINCT e.doc_id
      FROM (SELECT doc_id, unnest(gs) AS g FROM ng WHERE doc_id % 97 <> 0) e
      JOIN bench USING (g)
    )
    SELECT n.doc_id, n.source,
           (h.doc_id IS NOT NULL) AS contaminated
    FROM ng n LEFT JOIN hits h USING (doc_id)
    WHERE n.doc_id % 97 <> 0
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    at least one 5-word n-gram with the held-out eval set (docs where
    ``doc_id % 97 = 0`` stand in for the benchmark corpus).  The standard
    pretraining hygiene step (13-gram in the literature; 5-gram here so
    the synthetic short docs actually collide).

    100 TB design: the benchmark n-gram set is tiny relative to the corpus
    (eval suites are MBs, training data is TBs), so it is broadcast and the
    contamination check is a broadcast LEFT SEMI join against each doc's
    exploded n-grams — the corpus is never shuffled, and the per-doc
    ``array_distinct`` bounds the explode factor at |tokens|."""
    d = load(spark, sf_dir, "documents")
    # Materialize the token array in its own projection and spread the
    # single-split fixture scan (r11, guide §1.2/§2.4): inlining the split
    # into the transform lambda re-splits the text per element_at — 5x per
    # gram — and the whole gram stage serialized on one core.
    base = spread(d.select("doc_id", "source", "text"), "doc_id").select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - 4),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
            F.element_at(toks, i + 4),
        ),
    )
    # guard: sequence(1, n-4) descends through 0 when n < 5 (Spark default
    # step -1) and element_at(toks, 0) throws — short docs get no grams
    grams = F.when(n >= 5, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    ng = base.select("doc_id", "source", grams.alias("gs"))
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
    return train.join(
        hits.withColumn("hit", F.lit(True)), "doc_id", "left"
    ).select(
        "doc_id",
        "source",
        F.coalesce("hit", F.lit(False)).alias("contaminated"),
    )


@register(
    "chunk_documents",
    oracle="""
    SELECT doc_id,
           k AS chunk_id,
           1 + 150 * k AS chunk_start,
           substr(text, 1 + 150 * k, 200) AS chunk_text,
           length(substr(text, 1 + 150 * k, 200)) AS chunk_len
    FROM documents,
         LATERAL (SELECT unnest(range(0, 1 + (length(text) - 1) // 150)) AS k)
    WHERE length(text) >= 1
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking: fixed 200-char windows with 50-char overlap
    (stride 150), emitting (chunk_id, 1-based char offset, text, length)
    per chunk.  Chunk k starts at ``1 + 150*k`` while that offset is still
    inside the document, so every char belongs to ≥1 chunk and boundary
    context is preserved by the overlap.

    100 TB design: pure narrow explode — no shuffle, no UDF; output size
    is bounded at ~1.33× input chars by the stride/window ratio, and the
    generator (sequence + transform) runs inside whole-stage codegen."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    ks = F.sequence(F.lit(0), F.expr("(length(text) - 1) div 150"))
    e = d.select("doc_id", "text", F.explode(ks).alias("k"))
    start = 1 + 150 * F.col("k")
    chunk = F.substring(F.col("text"), start, 200)
    return e.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        start.alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )


@register(
    "sample_domain_mix",
    oracle="""
    WITH b AS (
      SELECT doc_id, source, n_chars,
             16 * (strpos('0123456789abcdef', substr(md5(text), 31, 1)) - 1)
               + (strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1)
               AS bucket
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM b
    WHERE bucket < CASE source WHEN 'src0' THEN 256
                               WHEN 'src1' THEN 128
                               WHEN 'src2' THEN 64
                               ELSE 26 END
    """,
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain mixing: keep each document with a per-source target
    rate (src0 100%, src1 50%, src2 25%, everything else ~10%) — the knob a
    pretraining pipeline turns to up-weight high-quality domains.  The coin
    flip is the last byte of md5(text) (256 buckets) so the decision is
    content-keyed and reproducible: re-runs and re-crawls keep exactly the
    same documents, independent of partitioning or row order.

    100 TB design: stateless narrow filter, zero shuffle; the rate table
    rides along as a CASE expression (broadcast a real dim table if the
    domain list outgrows a literal)."""
    d = load(spark, sf_dir, "documents")
    nib = "locate(substring(md5(text), {pos}, 1), '0123456789abcdef') - 1"
    bucket = F.expr(f"16 * ({nib.format(pos=31)}) + ({nib.format(pos=32)})")
    rate = (
        F.when(F.col("source") == "src0", 256)
        .when(F.col("source") == "src1", 128)
        .when(F.col("source") == "src2", 64)
        .otherwise(26)
    )
    return d.select("doc_id", "source", "n_chars").where(bucket < rate)


@register(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT SUM(c) AS s FROM cnt)
    SELECT doc_id,
           round(AVG(ln(c / s)), 6) AS avg_logprob,
           COUNT(*) AS n_tok
    FROM toks JOIN cnt USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model scoring: each document's mean token
    log-probability under the corpus's own unigram distribution — the
    cheap 'perplexity' filter a pretraining pipeline runs before paying
    for a neural LM pass (low avg_logprob = rare-token gibberish, high =
    boilerplate).  Self-scored here; at 100 TB the vocab table would be
    fit once on a reference corpus and reused.

    100 TB design: two-phase.  Phase 1 builds the vocab -> count table
    with a map-side-combined aggregate (shuffle volume is |vocab|, not
    |tokens|); a unigram vocab is millions of rows = tens of MB, so phase
    2 BROADCASTs it and scores every document without shuffling the
    corpus — the only corpus-keyed exchange is the final per-doc partial
    aggregate (one row per doc after map-side combine)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("s"))
    vocab = cnt.crossJoin(F.broadcast(tot)).select(
        "tok", F.log(F.col("c") / F.col("s")).alias("lp")
    )
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


# ------------------------------------------- quality signals & learning ----


@register(
    "text_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY doc_id)
    SELECT c.doc_id,
           t.n AS n_tok,
           round(SUM(-(c / t.n) * log2(c / t.n)), 6) AS token_entropy
    FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id, t.n
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy — the repetition /
    diversity quality signal pretraining filters use alongside stopword
    and length ratios (low entropy = template spam or keyword stuffing).

    100 TB design: the textbook formulation (explode -> groupBy(doc, tok)
    -> groupBy(doc)) shuffles the whole token stream TWICE on a 100 TB
    corpus.  This implementation instead computes each document's entropy
    inside its own row with JVM higher-order functions: sort the token
    array, then one ``aggregate`` pass accumulates -p*log2(p) per run of
    equal tokens — a pure narrow projection, ZERO shuffle at any scale,
    O(n log n) per document.  The DuckDB oracle uses the groupBy
    formulation, so the hash match also proves the two are equivalent.
    round(6) absorbs float-summation-order differences (SURVEY §7.4.1)."""
    d = load(spark, sf_dir, "documents")
    # Materialize the sorted token array in its own projection (r11, guide
    # §1.2): every reference to the inline expression — and run_term fires
    # once per token run inside the fold — re-evaluated
    # array_sort(split(text)).  No spread here: the op's pinned design
    # claim is ZERO exchanges (test_token_entropy_zero_shuffle), and the
    # materialization alone removes the quadratic re-evaluation.
    # NULL-text filter moved ahead of the projection (same rows kept).
    base = d.where(F.col("text").isNotNull()).select(
        "doc_id", F.array_sort(F.split("text", " ")).alias("ts")
    )
    toks_sorted = F.col("ts")
    n = F.size(toks_sorted)

    def run_term(run):
        p = run.cast("double") / n.cast("double")
        return -p * F.log2(p)

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0.0).alias("acc"),
    )
    entropy = F.aggregate(
        toks_sorted,
        init,
        lambda st, x: F.when(
            x == st.prev,
            F.struct(
                x.alias("prev"), (st.run + 1).alias("run"), st.acc.alias("acc")
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).alias("run"),
                (
                    st.acc
                    + F.when(st.run > 0, run_term(st.run)).otherwise(F.lit(0.0))
                ).alias("acc"),
            )
        ),
        lambda st: st.acc
        + F.when(st.run > 0, run_term(st.run)).otherwise(F.lit(0.0)),
    )
    # NULL-text docs have no token distribution — no row, matching the
    # oracle where unnest(split(NULL)) emits nothing for them (filtered in
    # the base projection above)
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tok"),
        F.round(entropy, 6).alias("token_entropy"),
    )


# Weak-label stopword set = the 'en' marker words the langid op keys on.
_QUALITY_EN_MARKERS = ("the", "and", "of", "join", "filter")


@register("quality_train_score")  # no oracle: iterative LBFGS fit (rows-only)
def quality_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter, the C4/Gopher-style pipeline step: featurize
    cheap text signals, train a logistic-regression classifier against a
    weak label on a deterministic content-hash ~80% split, then score the
    WHOLE corpus with the fitted model.  Returns (doc_id, weak_label, pred,
    in_train).  The fixture carries no human quality labels (and its
    ``lang`` column is uncorrelated with the text — probed), so the weak
    label is a substantial-document proxy (n_chars >= 280) that the model
    must recover from the cheap features; in production the same plumbing
    takes human or LM-judge labels.

    100 TB design: featurization and scoring are narrow projections (zero
    shuffle); the only distributed iteration is MLlib's LBFGS, whose
    per-iteration gradient is a treeAggregate of mergeable partials — the
    driver ever holds only the coefficient vector.  This is the public
    Spark surface purpose-built for fitting on data that does not fit
    anywhere else.  Scoring reuses the same assembled features, so a real
    pipeline would persist the model and apply it as a stage in
    pipeline_pretrain_prep.  No oracle: LBFGS converges to float-level
    nondeterminism; the accuracy property is tested in
    tests/test_trainprep.py on the held-out hash split instead."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    d = load(spark, sf_dir, "documents")
    # materialized token split (r11, guide §1.2): the five sibling feature
    # expressions each inlined the split.  NO spread here: featurization is
    # one cheap pass, but every one of LBFGS's 25 treeAggregate iterations
    # inherits the partition count — 32 partitions turned the tiny fit into
    # 800 task launches (measured 6.4 -> 8.2 s cold; 1-partition fit wins).
    base = d.select("doc_id", "n_chars", "text").select(
        "doc_id", "n_chars", "text", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    n_tok = F.size(toks)
    markers = F.array(*[F.lit(w) for w in _QUALITY_EN_MARKERS])
    feats = base.select(
        "doc_id",
        (F.col("n_chars") >= 280).cast("double").alias("label"),
        n_tok.cast("double").alias("f_ntok"),
        (F.col("n_chars").cast("double") / n_tok).alias("f_avg_len"),
        (
            F.size(F.filter(toks, lambda x: F.array_contains(markers, x))).cast(
                "double"
            )
            / n_tok
        ).alias("f_marker"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias(
            "f_distinct"
        ),
        # content-keyed split, same convention as sample_hash_split: the
        # last md5 nibble of the text — stable across runs AND machines
        (
            F.conv(F.substring(F.md5("text"), 32, 1), 16, 10).cast("int") < 13
        ).alias("in_train"),
    )
    # A learned filter is undefined on docs with INCOMPLETE features or
    # label (NULL text or NULL n_chars metadata — routine at corpus
    # scale): VectorAssembler's handleInvalid="error" would kill the fit
    # on the first such row, and "keep" would feed NaNs to LBFGS.  Drop
    # them explicitly from BOTH train and score — a production pipeline
    # routes unfeaturizable docs to a default disposition upstream.
    feats = feats.filter(
        F.col("label").isNotNull()
        & F.col("in_train").isNotNull()
        & F.col("f_ntok").isNotNull()
        & F.col("f_avg_len").isNotNull()
        & F.col("f_marker").isNotNull()
        & F.col("f_distinct").isNotNull()
    )
    va = VectorAssembler(
        inputCols=["f_ntok", "f_avg_len", "f_marker", "f_distinct"],
        outputCol="features",
    )
    train = va.transform(feats.filter(F.col("in_train")))
    if train.isEmpty():
        # Empty-sweep guard: LBFGS throws on a zero-row fit ("Nothing has
        # been added to this summarizer"); with no training rows there is
        # no model, so the score table is empty with the same schema.
        return feats.filter(F.lit(False)).select(
            "doc_id",
            F.col("label").cast("int").alias("weak_label"),
            F.lit(0).alias("pred"),
            F.col("in_train").cast("int").alias("in_train"),
        )
    model = LogisticRegression(maxIter=25, regParam=0.01).fit(train)
    # Persist + reload before scoring — the production pattern, and a real
    # correctness requirement: the freshly-fitted model's trainingSummary
    # holds a SparkSession reference, and the scoring closure serializes
    # the whole model, so transform() throws NotSerializableException
    # (ObservationManager) in any session where an observe() query has run
    # (e.g. agg_observe_metrics earlier in a suite).  The reloaded model
    # carries coefficients only.
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    with tempfile.TemporaryDirectory(prefix="carpet_lr_") as tmp:
        model.write().overwrite().save(f"{tmp}/model")
        # load() materializes coefficients in memory; tmp can then go away
        model = LogisticRegressionModel.load(f"{tmp}/model")
    return (
        model.transform(va.transform(feats))
        .select(
            "doc_id",
            F.col("label").cast("int").alias("weak_label"),
            F.col("prediction").cast("int").alias("pred"),
            F.col("in_train").cast("int").alias("in_train"),
        )
    )


@register(
    "dedup_span_corpus",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 10
    ),
    spans AS (
      SELECT doc_id,
             md5(array_to_string(toks[k:k+9], ' ')) AS dig
      FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 10 + 2)) AS k)
    ),
    per AS (
      SELECT dig, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY dig
    )
    SELECT s.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN p.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           ROUND(SUM(CASE WHEN p.nd > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS dup_frac
    FROM spans s JOIN per p USING (dig)
    GROUP BY s.doc_id
    """,
)
def dedup_span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document span duplication (the C4/RefinedWeb repeated-span
    signal): for every 10-token window of every document, does the same
    span occur in ANY other document?  Emits per-doc
    (n_spans, n_dup_spans, dup_frac) — the score a pretrain pipeline
    thresholds to drop boilerplate-heavy documents, complementing
    dedup_near_minhash (whole-doc) and text_repetition (intra-doc).

    100 TB design: spans never shuffle as text — each window is digested
    to md5 INSIDE the projection (one narrow explode), so the two
    aggregations and the self-join move 16-byte digests only, exactly like
    dedup_exact.  Both groupBys and the join share hashpartitioning(dig),
    so the exchange is reused rather than repeated; the final per-doc
    rollup shuffles one row per span with map-side combine.  Span count ~=
    token count, so total shuffle volume is ~2 x the tokenized corpus
    digest stream — linear, skew-free (digests are uniform)."""
    d = load(spark, sf_dir, "documents")
    # materialized token split + spread scan (r11, guide §1.2/§2.4): the
    # inline split re-evaluated per slice() inside the transform lambda
    W = 10
    base = spread(d.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    base = base.filter(F.size(toks) >= W)
    digs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - W + 1),
        lambda k: F.md5(F.array_join(F.slice(toks, k, W), " ")),
    )
    spans = base.select("doc_id", F.explode(digs).alias("dig"))
    per = spans.groupBy("dig").agg(F.countDistinct("doc_id").alias("nd"))
    return (
        spans.join(per, "dig")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("nd") > 1).cast("int")).alias("n_dup_spans"),
            F.round(
                F.sum((F.col("nd") > 1).cast("int")) / F.count(F.lit(1)), 6
            ).alias("dup_frac"),
        )
    )


@register(
    "dedup_url_canonical",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN 'http://cdn' || (doc_id % 50)
                         || '.example.com/doc/' || (doc_id % 2000)
               WHEN 1 THEN 'HTTP://CDN' || (doc_id % 50)
                         || '.EXAMPLE.COM:80/doc/' || (doc_id % 2000) || '/'
               ELSE 'http://cdn' || (doc_id % 50)
                    || '.example.com/doc/' || (doc_id % 2000)
                    || '?utm_source=feed&ref=rss'
             END AS url
      FROM documents
    ),
    canon AS (
      SELECT regexp_replace(
               replace(split_part(lower(url), '?', 1), ':80/', '/'),
               '/$', '') AS cu
      FROM raw
    ),
    g AS (SELECT cu, COUNT(*) AS n_variants FROM canon GROUP BY cu)
    SELECT COUNT(*) AS n_canonical,
           CAST(SUM(n_variants) AS BIGINT) AS n_raw,
           MAX(n_variants) AS max_variants
    FROM g
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the first pass of every web-crawl
    pipeline: the same page arrives as ``http://host/p``,
    ``HTTP://HOST:80/p/`` and ``http://host/p?utm_source=...``, and
    byte-exact dedup misses all of it.  Canonical form here: lowercase,
    strip the query (the synthetic queries are tracking-only; a real
    deployment whitelists+sorts meaningful params), drop the default
    :80 port, strip the trailing slash.  The three deterministic
    variants per doc (synthesized from doc_id — the fixture has no URL
    column) all collapse to one canonical URL, and the op reports
    raw-vs-canonical counts and the largest variant cluster.

    Scale (100 TB): canonicalization is pure whole-stage-codegen string
    projection (lower/split/replace — no UDF, no regex backtracking:
    the only regexp is the anchored '/$'); the groupBy shuffles
    canonical URLs with map-side combine, and the final reduction is
    one row.  This is the cheap precursor that shrinks the corpus
    BEFORE content-level MinHash/SimHash dedup runs."""
    d = load(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("cdn"), (F.col("doc_id") % 50).cast("string"), F.lit(".example.com")
    )
    path = F.concat(F.lit("/doc/"), (F.col("doc_id") % 2000).cast("string"))
    m = F.col("doc_id") % 3
    raw = (
        F.when(m == 0, F.concat(F.lit("http://"), host, path))
        .when(
            m == 1,
            F.concat(F.lit("HTTP://"), F.upper(host), F.lit(":80"), path, F.lit("/")),
        )
        .otherwise(
            F.concat(
                F.lit("http://"), host, path, F.lit("?utm_source=feed&ref=rss")
            )
        )
    )
    canon = F.regexp_replace(
        F.replace(
            F.substring_index(F.lower(raw), "?", 1), F.lit(":80/"), F.lit("/")
        ),
        "/$",
        "",
    )
    g = d.select(canon.alias("cu")).groupBy("cu").agg(
        F.count(F.lit(1)).alias("n_variants")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_canonical"),
        F.sum("n_variants").cast("long").alias("n_raw"),
        F.max("n_variants").alias("max_variants"),
    )


@register(
    "text_dedup_exact_normalized",
    oracle="""
    WITH norm AS (
      SELECT trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT t) AS n_distinct_norm,
           (SELECT COUNT(DISTINCT text) FROM documents) AS n_distinct_raw
    FROM norm
    """,
)
def text_dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize-then-dedup (the C4/RefinedWeb 'near-exact' tier between
    byte-exact and MinHash): lowercase, strip non-alphanumerics, collapse
    whitespace, THEN digest — catching re-encodes, punctuation edits, and
    case changes that byte-exact dedup misses.  Reports raw-distinct vs
    normalized-distinct side by side, the number a pipeline owner uses to
    decide whether the normalization tier is worth running.

    Engine parity note: Spark's regexp_replace is global by default;
    DuckDB needs the explicit 'g' flag — a silent first-match-only
    mismatch otherwise (both patterns here are backtracking-free).

    Scale (100 TB): normalization is codegen string projection;
    distinct-counting groups 32-byte sha256 digests of the normalized
    text so full text never shuffles (the oracle counts raw normalized
    strings — identical modulo cryptographic collision)."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return d.select(
        F.sha2(norm, 256).alias("nd"), F.sha2(F.col("text"), 256).alias("rd")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("nd").alias("n_distinct_norm"),
        F.countDistinct("rd").alias("n_distinct_raw"),
    )


@register(
    "text_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY w
        ORDER BY c DESC, w ASC LIMIT 1000
      )
    )
    SELECT t.lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (w)
    GROUP BY t.lang
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-1000 corpus
    vocabulary — the tokenizer-fit check run before committing to a
    vocab size (high OOV in a language = that language will fragment
    into bytes/unks and train badly).  The vocab cut is deterministic
    (count DESC, word ASC — a total order, so the 1000-boundary tie
    never flaps between engines).

    Scale (100 TB): the vocab build is a map-side-combined wordcount
    followed by a driver-bounded top-k (1000 rows — TakeOrdered, no full
    sort); membership testing BROADCASTS the vocab so the token stream
    is tagged map-side with zero shuffle (left join against a 1000-row
    hash set); the final aggregate is |langs| keys.  The token explode
    is the only data-volume term and it is flatMap-linear."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(1000)
        .select("w")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("in_v", F.lit(1))), "w", "left"
    )
    oov = F.when(F.col("in_v").isNull(), 1).otherwise(0)
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov).cast("long").alias("n_oov"),
        F.round(F.sum(oov) / F.count(F.lit(1)).cast("double"), 6).alias(
            "oov_rate"
        ),
    )


@register(
    "text_boilerplate_prefix",
    oracle="""
    WITH pre AS (
      SELECT source,
             array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
               AS prefix5
      FROM documents
    ),
    counts AS (
      SELECT source, prefix5, COUNT(*) AS c FROM pre GROUP BY 1, 2
    ),
    modal AS (
      SELECT source, prefix5 AS modal_prefix, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, prefix5 ASC NULLS LAST)
               AS rk,
             CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_docs
      FROM counts
    )
    SELECT source, n_docs, modal_prefix, c AS n_modal,
           round(c / CAST(n_docs AS DOUBLE), 6) AS boilerplate_ratio
    FROM modal WHERE rk = 1
    """,
)
def text_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection by modal prefix: per source, the most common
    first-5-token opening and what fraction of that source's documents
    share it — a high ratio screams templated pages (cookie banners,
    nav headers, license stubs) that inflate dedup clusters and waste
    pretraining tokens; sources flagged here go to dedup_span_corpus
    for span-level removal.

    Scale (100 TB): the prefix is a bounded projection (5 tokens — the
    full text never aggregates); counting is a (source, prefix) agg
    with map-side combine; the modal pick is a per-source window over
    that count table.  Output: |sources| rows."""
    d = load(spark, sf_dir, "documents")
    prefix5 = F.array_join(F.slice(F.split("text", " "), 1, 5), " ")
    counts = d.select("source", prefix5.alias("prefix5")).groupBy(
        "source", "prefix5"
    ).agg(F.count(F.lit(1)).alias("c"))
    # NULLS LAST tie-break matches the oracle: Spark ASC defaults to
    # NULLS FIRST, which would crown a NULL-text "prefix" as modal on ties
    wm = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("prefix5").asc_nulls_last()
    )
    ws = Window.partitionBy("source")
    modal = counts.select(
        "source",
        F.col("prefix5").alias("modal_prefix"),
        "c",
        F.row_number().over(wm).alias("rk"),
        F.sum("c").over(ws).alias("n_docs"),
    )
    return modal.filter(F.col("rk") == 1).select(
        "source",
        "n_docs",
        "modal_prefix",
        F.col("c").alias("n_modal"),
        F.round(F.col("c") / F.col("n_docs").cast("double"), 6).alias(
            "boilerplate_ratio"
        ),
    )


@register(
    "text_source_overlap",
    oracle="""
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT DISTINCT source,
             t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
      WHERE len(t) >= 3
    ),
    pair AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT source, COUNT(*) AS n_grams FROM grams GROUP BY source
    )
    SELECT p.src_a, p.src_b, p.n_shared,
           round(p.n_shared
                 / CAST(sa.n_grams + sb.n_grams - p.n_shared AS DOUBLE), 6)
             AS jaccard
    FROM pair p
    JOIN sizes sa ON sa.source = p.src_a
    JOIN sizes sb ON sb.source = p.src_b
    """,
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: pairwise 3-gram Jaccard between
    source corpora — the diagnostic that catches mirrored/syndicated
    content BETWEEN sources (within-source dup is dedup_exact's job;
    benchmark leakage is decontaminate_ngram's).  A high off-diagonal
    here means two 'independent' sources are feeding the same pages and
    the mix weights (sample_domain_mix) double count them.

    Scale (100 TB): each source reduces to its DISTINCT gram set first
    (map-side dedup; digest the grams at real scale so only 8-byte
    hashes shuffle); the pair join is gram-keyed — a gram shared by k
    sources yields C(k,2) pair rows, never a corpus × corpus product;
    sizes join over |sources| rows.  Output: C(|sources|,2) rows."""
    d = load(spark, sf_dir, "documents")
    # materialized token split + spread scan: same inline-split fix as
    # decontaminate_ngram (r11, guide §1.2/§2.4)
    # round-robin spread: hashing by "source" would pile each source's docs
    # onto one partition (only a handful of distinct sources)
    base = spread(d.select("source", "text")).select(
        "source", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    grams = (
        base.select(
            "source",
            F.explode(
                F.when(
                    F.size(toks) >= 3,
                    F.transform(
                        F.sequence(F.lit(0), F.size(toks) - 3),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(toks, i + 1),
                            F.element_at(toks, i + 2),
                            F.element_at(toks, i + 3),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )
        .distinct()
    )
    a = grams.select(F.col("source").alias("src_a"), "g")
    b = grams.select(F.col("source").alias("src_b"), F.col("g").alias("g2"))
    pair = (
        a.join(b, (a.g == b.g2) & (a.src_a < b.src_b))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        pair.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"),
                                     F.col("n_grams").alias("na"))), "src_a")
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"),
                                     F.col("n_grams").alias("nb"))), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "text_readability_proxy",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS words,
             len(regexp_extract_all(text, '[aeiou]+')) AS syllables,
             len(list_filter(string_split(text, ' '),
                 w -> len(regexp_extract_all(w, '[aeiou]+')) >= 3))
               AS complex_words
      FROM documents
    )
    SELECT doc_id, words, syllables,
           round(syllables / CAST(words AS DOUBLE), 6) AS syl_per_word,
           round(complex_words / CAST(words AS DOUBLE), 6)
             AS complex_ratio
    FROM m
    WHERE doc_id % 20 = 0 AND words > 0
    """,
)
def text_readability_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring proxy: syllables-per-word (vowel-group count,
    the standard cheap syllable estimator) and the Gunning-fog style
    complex-word ratio (≥3 syllables) per document — the quality signal
    that separates encyclopedic prose from keyword-stuffed spam and
    drives curriculum ordering in pretrain mixes (easy→hard).  True
    Flesch–Kincaid also needs sentence counts — this fixture's texts
    have no sentence punctuation, so the op ships the two per-word
    terms (plug sentences in via the scan_csv-style split when the data
    has them).

    Scale (100 TB): everything is per-row regexp/array projection in
    whole-stage codegen — no shuffle at all before the %20 output
    filter, which pushes to the scan.  The anchored vowel-class regex
    cannot backtrack."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    syl = lambda c: F.size(F.expr(f"regexp_extract_all({c}, '[aeiou]+', 0)"))
    m = d.select(
        "doc_id",
        F.size(toks).alias("words"),
        syl("text").alias("syllables"),
        F.size(
            F.filter(
                toks,
                lambda w: F.size(
                    F.regexp_extract_all(w, F.lit("[aeiou]+"), F.lit(0))
                )
                >= 3,
            )
        ).alias("complex_words"),
    )
    return m.filter((F.col("doc_id") % 20 == 0) & (F.col("words") > 0)).select(
        "doc_id",
        "words",
        "syllables",
        F.round(F.col("syllables") / F.col("words").cast("double"), 6).alias(
            "syl_per_word"
        ),
        F.round(
            F.col("complex_words") / F.col("words").cast("double"), 6
        ).alias("complex_ratio"),
    )


@register(
    "feature_minmax_scale",
    oracle="""
    WITH b AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           round((l_extendedprice - (SELECT lo FROM b))
                 / ((SELECT hi FROM b) - (SELECT lo FROM b)), 6) AS scaled
    FROM lineitem
    WHERE l_orderkey % 991 = 0
    """,
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max feature scaling to [0, 1] — the normalization that
    distance-based models (k-NN, k-means, the ANN family here) need
    BEFORE their geometry means anything, complementing
    feature_quantile_bucketize (ordinal) and udf_pandas_struct's z-score
    (standardization).  The fit statistics (min/max) come from the FULL
    column — fitting them on a sample or, worse, per-partition is the
    classic train-serve skew bug.

    Determinism: both engines subtract and divide the identical raw
    doubles (no accumulation anywhere), rounded at 6dp.

    Scale (100 TB): pass 1 is a 2-value aggregate; the transform is a
    broadcast of those 2 values into codegen projection.  Persist the
    (lo, hi) pair with the model — serving must reuse the TRAINING
    bounds, never refit."""
    li = load(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    return (
        li.filter(F.col("l_orderkey") % 991 == 0)
        .join(F.broadcast(b))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                (F.col("l_extendedprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo")),
                6,
            ).alias("scaled"),
        )
    )


@register(
    "text_tokenizer_fertility",
    oracle=f"""
    WITH m AS (
      SELECT lang,
             len(string_split(text, ' ')) AS words,
             len(regexp_extract_all(text, '{_TOK_RE}', 1)) AS toks
      FROM documents
    )
    SELECT lang,
           CAST(SUM(words) AS BIGINT) AS total_words,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           round(SUM(toks) / CAST(SUM(words) AS DOUBLE), 6) AS fertility
    FROM m
    GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens divided by
    whitespace words — the fairness metric for multilingual tokenizers
    (a language with fertility 2× pays twice the context window and
    twice the inference cost for the same text; vocab design reviews
    track exactly this table).  Uses text_bpe_tokens' pre-tokenizer so
    the two ops share one tokenization definition.

    Scale (100 TB): two regexp/array projections per row, one
    |langs|-key aggregate of exact integer sums; the ratio divides
    identical doubles."""
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all("text", F.lit(_TOK_RE), F.lit(1)))
    words = F.size(F.split("text", " "))
    m = d.select("lang", words.alias("words"), toks.alias("toks"))
    return m.groupBy("lang").agg(
        F.sum("words").cast("long").alias("total_words"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.round(
            F.sum("toks") / F.sum("words").cast("double"), 6
        ).alias("fertility"),
    )


@register(
    "fn_feature_hashing",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    bucketed AS (
      SELECT tok,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT) % 1024 AS bucket
      FROM toks
    ),
    per AS (
      SELECT bucket, COUNT(*) AS n_tokens FROM bucketed GROUP BY bucket
    )
    SELECT CAST((SELECT COUNT(*) FROM toks) AS BIGINT) AS vocab_size,
           COUNT(*) AS n_buckets_used,
           MAX(n_tokens) AS max_collisions,
           round(SUM(CASE WHEN n_tokens > 1 THEN n_tokens ELSE 0 END)
                 / NULLIF(CAST((SELECT COUNT(*) FROM toks) AS DOUBLE), 0), 6)
             AS collided_token_share
    FROM per
    """,
)
def fn_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick audited: map the corpus vocabulary into 1024
    hash buckets (md5-derived — deterministic across engines, unlike
    each engine's native hash) and report the collision profile —
    bucket utilization, the worst pile-up, and the share of tokens that
    share their bucket with another.  Feature hashing removes the vocab
    dictionary from training pipelines (sklearn's HashingVectorizer /
    VW); this op is the due-diligence that sizes 2^k against the real
    vocabulary BEFORE collisions silently merge features.

    Scale (100 TB): vocab dedup is the only shuffle (digest-width);
    bucketing is projection; the report reduces 1024 rows.  The SAME
    bucket expression then embeds in the training projection itself —
    audit and transform share one definition."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % 1024
    )
    per = toks.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    vocab = toks.agg(F.count(F.lit(1)).alias("vocab_size"))
    # Aggregate the bucket profile FIRST, then bind the vocab scalar by
    # cross join (empty-sweep rule): joining the scalar INTO the bucket
    # rows loses it when the bucket set is empty, so vocab_size read
    # back as NULL instead of 0 on an empty corpus.
    persum = per.agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.max("n_tokens").alias("max_collisions"),
        F.sum(
            F.when(F.col("n_tokens") > 1, F.col("n_tokens")).otherwise(0)
        ).alias("collided"),
    )
    return vocab.crossJoin(F.broadcast(persum)).select(
        F.col("vocab_size").cast("long").alias("vocab_size"),
        "n_buckets_used",
        "max_collisions",
        F.round(
            F.col("collided")
            / F.nullif(F.col("vocab_size").cast("double"), F.lit(0.0)),
            6,
        ).alias("collided_token_share"),
    )


@register(
    "pipeline_sft_pair_prep",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id % 15 = 0
    ),
    cut AS (
      SELECT doc_id, toks, len(toks) AS n,
             GREATEST(1, CAST(FLOOR(len(toks) * 0.6) AS BIGINT)) AS k
      FROM t WHERE len(toks) >= 2
    )
    SELECT doc_id,
           array_to_string(list_slice(toks, 1, k), ' ') AS prompt,
           array_to_string(list_slice(toks, k + 1, n), ' ') AS response,
           k AS n_prompt_tok,
           n - k AS n_response_tok,
           CASE WHEN n > 64 THEN 1 ELSE 0 END AS needs_truncation
    FROM cut
    """,
)
def pipeline_sft_pair_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT pair assembly: each document split into a (prompt, response)
    continuation pair at the 60% token cut — the standard self-
    supervised formatting for instruction-tuning data factories (real
    pipelines swap the splitter for template extraction; the CONTRACT —
    exact token accounting per side, a truncation flag against the
    context budget, no empty responses — is what this op pins, because
    silent truncation of responses is the classic SFT data bug).  Docs
    under 2 tokens are dropped (no valid pair exists).

    Scale (100 TB): pure array projection per row (slice + join — the
    text splits once); downstream packing is pack_shards' job and
    dedup/decontamination run BEFORE pairing so both sides of a pair
    stay in the same decision.  The %15 filter bounds driver output."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 15 == 0)
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    k = F.greatest(
        F.lit(1), F.floor(F.size("toks") * 0.6).cast("long")
    )
    cut = base.select(
        "doc_id",
        "toks",
        F.size("toks").cast("long").alias("n"),
        k.alias("k"),
    )
    return cut.select(
        "doc_id",
        F.array_join(
            F.slice(F.col("toks"), 1, F.col("k").cast("int")), " "
        ).alias("prompt"),
        F.array_join(
            F.expr("slice(toks, cast(k + 1 as int), cast(n - k as int))"), " "
        ).alias("response"),
        F.col("k").alias("n_prompt_tok"),
        (F.col("n") - F.col("k")).alias("n_response_tok"),
        F.when(F.col("n") > 64, 1).otherwise(0).alias("needs_truncation"),
    )


@register(
    "sample_importance_weighted",
    oracle="""
    WITH mx AS (SELECT MAX(n_chars) + 1 AS maxp1 FROM documents),
    scored AS (
      SELECT doc_id, n_chars,
             (n_chars * 1000000) // (SELECT maxp1 FROM mx) AS p6,
             (('0x' || substr(md5('iw|' || doc_id), 1, 8))::BIGINT)
               % 1000000 AS u6
      FROM documents
    )
    SELECT doc_id, n_chars,
           round(p6 / 1000000.0, 6) AS accept_p,
           round(1000000.0 / p6, 6) AS inv_weight
    FROM scored WHERE u6 < p6
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance-weighted Bernoulli sampling: each doc
    accepted with probability proportional to its weight (n_chars /
    max — a length-proportional token-budget sampler; swap in a
    quality score unchanged), decided by comparing a seeded
    md5-uniform draw against the weight in 6-dp fixed point — both the
    acceptance probability and the uniform are INTEGERS, so the accept
    set is bit-identical on any engine, any partitioning, any rerun
    (the property sample_seeded's RNG cannot give).  Survivors carry
    1/p as the Horvitz–Thompson inverse weight so downstream sums
    stay unbiased.

    Scale (100 TB): pure per-row projection + filter after one
    broadcast scalar (max); no shuffle, no state — the sampler
    composes into any scan."""
    d = load(spark, sf_dir, "documents")
    mx = d.agg((F.max("n_chars") + 1).alias("maxp1"))
    scored = d.join(F.broadcast(mx)).select(
        "doc_id",
        "n_chars",
        F.expr("(n_chars * 1000000) DIV maxp1").alias("p6"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("iw|"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        ).alias("u6"),
    )
    return scored.filter(F.col("u6") < F.col("p6")).select(
        "doc_id",
        "n_chars",
        F.round(F.col("p6") / 1000000.0, 6).alias("accept_p"),
        F.round(F.lit(1000000.0) / F.col("p6"), 6).alias("inv_weight"),
    )


@register(
    "agg_token_budget_allocation",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(avail) AS BIGINT) AS total,
             CAST(SUM(avail) // 2 AS BIGINT) AS budget
      FROM per
    ),
    base AS (
      SELECT p.source, p.avail, t.budget,
             CAST((p.avail * t.budget) // t.total AS BIGINT) AS fl,
             CAST((p.avail * t.budget) % t.total AS BIGINT) AS rem
      FROM per p CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rn,
             CAST(SUM(fl) OVER () AS BIGINT) AS sumfl
      FROM base
    )
    SELECT source, avail AS avail_tokens,
           fl + CASE WHEN rn <= budget - sumfl THEN 1 ELSE 0 END
             AS alloc_tokens,
           round((fl + CASE WHEN rn <= budget - sumfl THEN 1 ELSE 0 END)
                 / CAST(budget AS DOUBLE), 6) AS alloc_share
    FROM ranked
    """,
)
def agg_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across corpus sources: a global budget
    (half the available tokens here) split proportionally to each
    source's whitespace-token supply using LARGEST-REMAINDER rounding,
    so the integer allocations sum EXACTLY to the budget — the 'how
    many tokens do we take from each source' planning step a pretrain
    data mix starts from (sample_domain_mix then enforces the chosen
    rates row-wise).  Everything is integer arithmetic: floor shares
    via integer division, the leftover distributed to the largest
    remainders with a source-name tie-break.

    Scale (100 TB): the token supply is one map-side-combined
    aggregate over the corpus scan; allocation runs on the |sources|-
    row table (window over a broadcast-size frame).  avail×budget
    products need int128/decimal beyond ~9e18 — DuckDB's HUGEINT does
    this natively; the Spark side documents a decimal(38,0) fallback."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("avail")
    )
    tot = per.agg(
        F.sum("avail").cast("long").alias("total"),
        F.expr("CAST(SUM(avail) DIV 2 AS BIGINT)").alias("budget"),
    )
    base = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail",
        "budget",
        F.expr("(avail * budget) DIV total").alias("fl"),
        ((F.col("avail") * F.col("budget")) % F.col("total")).alias("rem"),
    )
    wr = Window.orderBy(F.col("rem").desc(), F.col("source"))
    wall = Window.partitionBy()
    ranked = base.select(
        "source",
        "avail",
        "budget",
        "fl",
        F.row_number().over(wr).alias("rn"),
        F.sum("fl").over(wall).cast("long").alias("sumfl"),
    )
    alloc = F.col("fl") + F.when(
        F.col("rn") <= F.col("budget") - F.col("sumfl"), 1
    ).otherwise(0)
    return ranked.select(
        "source",
        F.col("avail").alias("avail_tokens"),
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("budget").cast("double"), 6).alias(
            "alloc_share"
        ),
    )


@register(
    "dq_sft_format_check",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    cut AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
             GREATEST(1, CAST(FLOOR(len(toks) * 0.6) AS BIGINT)) AS k
      FROM t
    ),
    pairs AS (
      -- guarded COALESCE (hostile-strings sweep, fn_lambda's pattern):
      -- array_to_string([]) is NULL here where Spark's array_join gives
      -- '' — an EMPTY doc's empty completion must FLAG — but a NULL doc
      -- must stay NULL on both engines (nulls regime)
      SELECT doc_id, n, k,
             CASE WHEN toks IS NULL THEN NULL
                  ELSE COALESCE(array_to_string(toks[1:k], ' '), '')
             END AS prompt,
             CASE WHEN toks IS NULL THEN NULL
                  ELSE COALESCE(array_to_string(toks[k+1:n], ' '), '')
             END AS completion
      FROM cut
    ),
    flags AS (
      SELECT CASE WHEN completion = '' THEN 1 ELSE 0 END AS f_empty,
             CASE WHEN k > 400 THEN 1 ELSE 0 END AS f_long,
             CASE WHEN completion <> ''
                       AND position(completion IN prompt) > 0
                  THEN 1 ELSE 0 END AS f_echo,
             CASE WHEN n < 2 THEN 1 ELSE 0 END AS f_short
      FROM pairs
    ),
    agg AS (
      SELECT COUNT(*) AS n_pairs,
             CAST(SUM(f_empty) AS BIGINT) AS empty_completion,
             CAST(SUM(f_long) AS BIGINT) AS prompt_too_long,
             CAST(SUM(f_echo) AS BIGINT) AS completion_echoes_prompt,
             CAST(SUM(f_short) AS BIGINT) AS too_few_tokens,
             CAST(SUM(CASE WHEN f_empty + f_long + f_echo + f_short = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS pair_ok
      FROM flags
    ),
    tidy AS (
      SELECT 'empty_completion' AS chk, empty_completion AS n_flagged,
             n_pairs FROM agg
      UNION ALL SELECT 'prompt_too_long', prompt_too_long, n_pairs FROM agg
      UNION ALL SELECT 'completion_echoes_prompt', completion_echoes_prompt,
        n_pairs FROM agg
      UNION ALL SELECT 'too_few_tokens', too_few_tokens, n_pairs FROM agg
      UNION ALL SELECT 'pair_ok', pair_ok, n_pairs FROM agg
    )
    SELECT chk, n_flagged, n_pairs,
           round(n_flagged / CAST(n_pairs AS DOUBLE), 6) AS rate
    FROM tidy
    """,
)
def dq_sft_format_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format gate for SFT pairs: rebuilds the prompt/completion split
    pipeline_sft_pair_prep ships (first 60% of tokens → prompt, rest →
    completion) over the FULL corpus and counts the malformed pairs a
    fine-tune loader must reject — empty completions, over-long
    prompts, completions textually contained in their prompt (echo
    pairs teach copying), and under-length docs — plus the surviving
    pair_ok count.  The checks the prep op's %15 demo sample cannot
    see at population scale.

    Scale (100 TB): pure projection + one 1-row aggregate exploded to
    tidy rows; the substring containment is per-row instr(), no
    join."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    cut = d.select(
        F.col("doc_id"),
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n"),
        F.greatest(
            F.lit(1), F.floor(F.size(toks) * 0.6).cast("long")
        ).alias("k"),
    )
    pairs = cut.select(
        "n",
        "k",
        F.array_join(F.slice("toks", 1, F.col("k")), " ").alias("prompt"),
        F.array_join(
            F.slice(
                "toks",
                (F.col("k") + 1).cast("int"),
                (F.col("n") - F.col("k")).cast("int"),
            ),
            " ",
        ).alias("completion"),
    )
    flags = pairs.select(
        F.when(F.col("completion") == "", 1).otherwise(0).alias("f_empty"),
        F.when(F.col("k") > 400, 1).otherwise(0).alias("f_long"),
        F.when(
            (F.col("completion") != "")
            & (F.expr("instr(prompt, completion)") > 0),
            1,
        )
        .otherwise(0)
        .alias("f_echo"),
        F.when(F.col("n") < 2, 1).otherwise(0).alias("f_short"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("f_empty").cast("long").alias("empty_completion"),
        F.sum("f_long").cast("long").alias("prompt_too_long"),
        F.sum("f_echo").cast("long").alias("completion_echoes_prompt"),
        F.sum("f_short").cast("long").alias("too_few_tokens"),
        F.sum(
            F.when(
                F.col("f_empty")
                + F.col("f_long")
                + F.col("f_echo")
                + F.col("f_short")
                == 0,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("pair_ok"),
    )
    checks = (
        "empty_completion",
        "prompt_too_long",
        "completion_echoes_prompt",
        "too_few_tokens",
        "pair_ok",
    )
    tidy = F.explode(
        F.array(
            *[
                F.struct(F.lit(c).alias("chk"), F.col(c).alias("n_flagged"))
                for c in checks
            ]
        )
    )
    return agg.select(tidy.alias("cell"), "n_pairs").select(
        "cell.chk",
        "cell.n_flagged",
        "n_pairs",
        F.round(
            F.col("cell.n_flagged") / F.col("n_pairs").cast("double"), 6
        ).alias("rate"),
    )


@register(
    "pipeline_dpo_pair_prep",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS nd
      FROM documents
    ),
    best AS (SELECT * FROM ranked WHERE rn < nd + 1 - rn),
    worst AS (SELECT source, rn, doc_id, n_chars FROM ranked)
    SELECT b.source, b.rn AS pair_idx,
           b.doc_id AS chosen_doc_id,
           w.doc_id AS rejected_doc_id,
           b.n_chars - w.n_chars AS margin_chars
    FROM best b JOIN worst w
      ON b.source = w.source AND w.rn = b.nd + 1 - b.rn
    """,
)
def pipeline_dpo_pair_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style training:
    within each source, documents ranked by a quality score (n_chars
    proxy — quality_train_score slots in) pair best-with-worst,
    second-best with second-worst, and so on (the max-margin matching
    that gives the strongest preference signal per pair), emitting
    (chosen, rejected, margin) rows; odd middles drop, pairs with
    zero margin survive and are the caller's filter decision.
    Completes the pair-prep family: pipeline_sft_pair_prep makes
    (prompt, completion), emb_mixup_pairs makes augmentation pairs,
    this makes preference pairs.

    Scale (100 TB): one (source)-partitioned rank window, then a
    self-equi-join on (source, mirrored rank) — same partitioning
    reused, no second shuffle; pair count is n/2 per group, never
    quadratic."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    wk = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("nd"),
    )
    best = ranked.filter(F.col("rn") < F.col("nd") + 1 - F.col("rn")).alias(
        "b"
    )
    worst = ranked.select("source", "rn", "doc_id", "n_chars").alias("w")
    return best.join(
        worst,
        (F.col("b.source") == F.col("w.source"))
        & (F.col("w.rn") == F.col("b.nd") + 1 - F.col("b.rn")),
    ).select(
        F.col("b.source").alias("source"),
        F.col("b.rn").alias("pair_idx"),
        F.col("b.doc_id").alias("chosen_doc_id"),
        F.col("w.doc_id").alias("rejected_doc_id"),
        (F.col("b.n_chars") - F.col("w.n_chars")).alias("margin_chars"),
    )


@register(
    "decontaminate_substring",
    oracle="""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0
    ),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0
    ),
    bwin AS (
      SELECT DISTINCT w AS win
      FROM bench,
           unnest(list_transform(
             range(1, greatest(1, length(text) - 39) + 1, 20),
             i -> substr(text, i, 40))) AS t(w)
    ),
    cwin AS (
      SELECT doc_id, w AS win
      FROM corpus,
           unnest(list_transform(
             range(1, greatest(1, length(text) - 39) + 1, 20),
             i -> substr(text, i, 40))) AS t(w)
    ),
    hits AS (
      SELECT c.doc_id, COUNT(DISTINCT c.win) AS n_hit_windows
      FROM cwin c JOIN bwin b ON c.win = b.win
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_hit_windows FROM hits
    """,
)
def decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring contamination detection: 40-char windows at
    stride 20 from the held-out benchmark split (doc_id%11) hash-join
    against the same windows of the training corpus — the
    character-level complement to decontaminate_ngram's token
    n-grams, catching verbatim leaks that tokenization differences
    (whitespace, punctuation splits) would hide.  The stride-20 /
    width-40 pair guarantees any aligned shared run ≥ 59 chars
    produces a window hit; output is the contaminated corpus docs
    with their distinct matched-window counts.

    Scale (100 TB): the corpus explodes to length/stride windows
    (bounded linear blowup) but ONLY window hashes need to shuffle —
    and the bench window set is benchmark-sized, so the join
    broadcasts it; the corpus never shuffles at all.  Same asymmetric
    shape as decontaminate_ngram."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 11 == 0)
    corpus = d.filter(F.col("doc_id") % 11 != 0)

    def windows(df: DataFrame) -> DataFrame:
        idx = F.sequence(
            F.lit(1), F.greatest(F.lit(1), F.length("text") - 39), F.lit(20)
        )
        return df.select(
            "doc_id",
            F.explode(
                F.transform(idx, lambda i: F.substr("text", i, F.lit(40)))
            ).alias("win"),
        )

    bwin = windows(bench).select("win").distinct()
    cwin = windows(corpus)
    return (
        cwin.join(F.broadcast(bwin), "win")
        .groupBy("doc_id")
        .agg(F.countDistinct("win").alias("n_hit_windows"))
    )


@register(
    "text_bpe_merge_round",
    oracle="""
    WITH words AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT p AS pair, CAST(SUM(freq) AS BIGINT) AS n
      FROM words,
           unnest(list_transform(range(1, greatest(1, length(word) - 1) + 1),
                                 i -> substr(word, i, 2))) AS u(p)
      WHERE length(word) >= 2
      GROUP BY p
    ),
    ranked AS (
      SELECT pair, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk
      FROM pairs
    )
    SELECT rnk, pair, n FROM ranked WHERE rnk <= 10
    """,
)
def text_bpe_merge_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE vocabulary induction: corpus words collapse to
    a (word, frequency) table, every adjacent character pair counts
    weighted by word frequency, and the top-10 pairs by count are the
    merge candidates — EXACTLY the statistic the first iteration of
    byte-pair-encoding training computes (subsequent rounds re-run the
    same op over re-segmented words; text_bpe_tokens applies a learned
    vocab, this LEARNS one).  Rank ties break on the pair string.

    Scale (100 TB): the word-frequency collapse is the wordcount
    shuffle (map-side combined, vocabulary-sized); pair extraction
    then runs over DISTINCT WORDS — orders of magnitude smaller than
    the corpus — and the pair table is ≤ |alphabet|², so the per-round
    cost after round one is corpus-size-independent.  This is why
    real BPE trainers count words first."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length("word") - 1))
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(idx, lambda i: F.substr("word", i, F.lit(2)))
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        pairs.select("pair", "n", F.row_number().over(wr).alias("rnk"))
        .filter(F.col("rnk") <= 10)
        .select("rnk", "pair", "n")
    )


@register(
    "sample_epoch_repeat_factors",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(avail) * 2 AS BIGINT) AS target_total,
             COUNT(*) AS k
      FROM per
    )
    SELECT p.source, p.avail,
           LEAST(4000000,
                 (t.target_total // t.k) * 1000000 // p.avail)
             AS repeat_ppm,
           p.avail * LEAST(4000000,
                 (t.target_total // t.k) * 1000000 // p.avail) // 1000000
             AS effective_tokens,
           CASE WHEN (t.target_total // t.k) * 1000000 // p.avail
                     > 4000000 THEN 1 ELSE 0 END AS capped
    FROM per p CROSS JOIN tot t
    """,
)
def sample_epoch_repeat_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch repeat factors for a uniform source mix: to hit a target
    of 2× the corpus tokens split EQUALLY across sources, each source
    repeats at target_share/avail — capped at 4 epochs (the published
    diminishing-returns ceiling for data repetition), with the cap
    flagged so the mix designer sees which sources are supply-limited.
    Factors are integer ppm (micro-epochs), so the plan is
    deterministic and effective token counts reconcile exactly —
    agg_token_budget_allocation answers 'how many tokens from each
    source'; this answers 'how many PASSES over each source' when the
    target EXCEEDS supply.

    Scale (100 TB): one token-supply rollup, then |sources|-row
    arithmetic — identical economics to the allocation op."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("avail")
    )
    tot = per.agg(
        (F.sum("avail") * 2).cast("long").alias("target_total"),
        F.count(F.lit(1)).alias("k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    raw_ppm = F.expr("(target_total DIV k) * 1000000 DIV avail")
    ppm = F.least(F.lit(4000000).cast("long"), raw_ppm)
    return j.select(
        "source",
        "avail",
        ppm.alias("repeat_ppm"),
        F.expr(
            "avail * LEAST(CAST(4000000 AS BIGINT),"
            " (target_total DIV k) * 1000000 DIV avail) DIV 1000000"
        ).alias("effective_tokens"),
        F.when(raw_ppm > 4000000, 1).otherwise(0).alias("capped"),
    )


@register(
    "sample_weighted_no_replacement",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln(((('0x' || substr(md5('aes|' || doc_id), 1, 8))::BIGINT)
                 % 1000000 + 1) / 1000000.0) / n_chars AS aes_key
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, n_chars, aes_key,
             ROW_NUMBER() OVER (ORDER BY aes_key DESC, doc_id) AS rnk
      FROM keyed
    )
    SELECT rnk, doc_id, n_chars, round(aes_key, 6) AS aes_key
    FROM ranked WHERE rnk <= 20
    """,
)
def sample_weighted_no_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, distributed-style: the
    Efraimidis-Spirakis A-ES scheme — each item draws a seeded
    uniform u and keys on ln(u)/w; the top-k keys ARE a weighted
    sample without replacement, which is the only known way to do
    this in one distributed pass (no sequential urn).  The uniform is
    a seeded md5 integer in (0, 1e6], so the sample is reproducible
    run-to-run and engine-to-engine; sample_importance_weighted is
    the WITH-replacement/Bernoulli sibling.  Weights here are
    n_chars (token-mass-proportional document selection).

    Scale (100 TB): key computation is a per-row projection; top-k
    over keys is TakeOrderedAndProject (per-partition heaps, k rows
    to the driver) — the exact shape Spark already optimizes."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u_ppm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("aes|"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
        + 1
    )
    keyed = d.select(
        "doc_id",
        "n_chars",
        (F.log(u_ppm / 1000000.0) / F.col("n_chars")).alias("aes_key"),
    )
    w = Window.orderBy(F.col("aes_key").desc(), F.col("doc_id"))
    return (
        keyed.select(
            "doc_id",
            "n_chars",
            "aes_key",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 20)
        .select("rnk", "doc_id", "n_chars", F.round("aes_key", 6).alias("aes_key"))
    )


@register(
    "sample_group_kfold",
    oracle="""
    WITH folded AS (
      SELECT o_orderkey, o_custkey,
             (('0x' || substr(md5('fold|' || o_custkey), 1, 8))::BIGINT)
               % 5 AS fold
      FROM orders
    ),
    per_fold AS (
      SELECT fold, COUNT(*) AS n_rows,
             COUNT(DISTINCT o_custkey) AS n_groups
      FROM folded GROUP BY fold
    ),
    leakage AS (
      SELECT CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS leaked_groups
      FROM (SELECT o_custkey, COUNT(DISTINCT fold) AS nf
            FROM folded GROUP BY o_custkey)
    )
    SELECT p.fold, p.n_rows, p.n_groups,
           round(p.n_rows / CAST(SUM(p.n_rows) OVER () AS DOUBLE), 6)
             AS row_share,
           (SELECT leaked_groups FROM leakage) AS leaked_groups
    FROM per_fold p
    """,
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment (k=5): every row's fold derives from a
    seeded hash of its GROUP key (customer), never the row — so all
    of a customer's orders land in the same fold, the property that
    prevents the leakage that sinks naive row-level CV when rows
    within a group are correlated (they always are).  The report
    shows per-fold row/group counts, shares, and a computed
    leaked_groups column that is zero BY CONSTRUCTION — the pipeline
    asserts its own invariant.  Deterministic md5 folding =
    sample_hash_split's mechanism lifted to the group level.

    Scale (100 TB): fold assignment is a projection; the audit is
    two map-side-combined aggregates."""
    o = load(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold|"), F.col("o_custkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    folded = o.select("o_orderkey", "o_custkey", fold.alias("fold"))
    per_fold = folded.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_groups"),
    )
    leakage = (
        folded.groupBy("o_custkey")
        .agg(F.countDistinct("fold").alias("nf"))
        .agg(
            F.sum(F.when(F.col("nf") > 1, 1).otherwise(0))
            .cast("long")
            .alias("leaked_groups")
        )
    )
    wall = Window.partitionBy()
    return per_fold.crossJoin(F.broadcast(leakage)).select(
        "fold",
        "n_rows",
        "n_groups",
        F.round(
            F.col("n_rows") / F.sum("n_rows").over(wall).cast("double"), 6
        ).alias("row_share"),
        "leaked_groups",
    )


@register(
    "pipeline_next_token_examples",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id % 25 = 0
    ),
    examples AS (
      SELECT doc_id, i,
             array_to_string(w[i:i+7], ' ') AS context,
             w[i+8] AS target
      FROM toks,
           unnest(range(1, greatest(0, len(w) - 8) + 1, 16)) AS u(i)
      WHERE len(w) >= 9
    )
    SELECT doc_id, i AS start_pos, context, target
    FROM examples
    """,
)
def pipeline_next_token_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-token training-example construction: fixed 8-token context
    windows with their following token as the target, cut at stride
    16 across each (sampled) document — the (context, target) pair
    table that a causal-LM data loader consumes, materialized
    relationally so dedup/decontamination/quality filters compose on
    it like on any other table (filter examples whose CONTEXT matches
    a benchmark n-gram = decontaminate_ngram on this output).  Docs
    shorter than 9 tokens yield nothing, by construction.

    Scale (100 TB): the window cut is array arithmetic per row
    (length/stride examples per doc, the token-budget blowup every
    LM pipeline pays); examples shuffle only if the caller groups
    them — construction itself is projection."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    w = F.split("text", " ")
    cut = d.filter(F.size(w) >= 9).select(
        "doc_id",
        w.alias("w"),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.lit(0), F.size(w) - 8),
                F.lit(16),
            )
        ).alias("i"),
    )
    return cut.select(
        "doc_id",
        F.col("i").alias("start_pos"),
        F.array_join(F.slice("w", F.col("i"), 8), " ").alias("context"),
        F.element_at("w", (F.col("i") + 8).cast("int")).alias("target"),
    )


@register(
    "sample_reservoir_fixed_n",
    oracle="""
    WITH tagged AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS rk
      FROM orders
    )
    SELECT o_orderpriority, rk, o_orderkey, o_totalprice
    FROM tagged WHERE rk <= 20
    """,
)
def sample_reservoir_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample PER GROUP (reservoir semantics, n=20
    orders per priority class) — the eval-set builder that
    sample_stratified's fraction semantics can't give you: a fraction
    keeps group-size skew, a fixed n makes every class equally
    represented.  Randomness is a deterministic md5 hash-rank of the
    key, so every engine, every rerun, every SF picks the same rows
    (seeded RNGs differ across engines; hash order doesn't), with the
    key itself as the total tie-break.

    Scale (100 TB): per-group top-n by hash rank — AT scale this runs
    as the salted two-phase plan topk_per_group documents (local top-n
    per partition, then top-n of candidates), so no reducer ever sees
    a whole group; n candidates per partition bound the final task."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            F.row_number().over(w).alias("rk"),
            "o_orderkey",
            "o_totalprice",
        )
        .filter(F.col("rk") <= 20)
    )


@register(
    "sample_neyman_allocation",
    oracle="""
    WITH x AS (
      SELECT c.c_mktsegment AS seg,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    per AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(v) AS BIGINT) AS s_h,
             SUM(CAST(v AS HUGEINT) * v) AS ss_h
      FROM x GROUP BY seg
    ),
    sig AS (
      SELECT seg, n_h,
             sqrt(CAST(ss_h AS DOUBLE) / n_h
                  - (CAST(s_h AS DOUBLE) / n_h)
                    * (CAST(s_h AS DOUBLE) / n_h)) / 100.0 AS sigma_h
      FROM per
    ),
    tot AS (
      SELECT SUM(n_h * sigma_h) AS denom, CAST(SUM(n_h) AS BIGINT) AS n
      FROM sig
    )
    SELECT s.seg, s.n_h,
           round(s.sigma_h, 6) AS sigma_h,
           CAST(FLOOR(1000 * s.n_h * s.sigma_h / NULLIF(t.denom, 0))
                AS BIGINT) AS alloc_neyman,
           CAST(FLOOR(1000.0 * s.n_h / t.n) AS BIGINT)
             AS alloc_proportional
    FROM sig s CROSS JOIN tot t
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) stratified-sample allocation: for a fixed
    budget of 1000 draws, allocate to each market segment
    proportionally to N_h·σ_h — the design that minimizes estimator
    variance, put side by side with plain proportional allocation so
    the difference (volatile strata earn extra samples) is visible.
    This op emits the DESIGN table; sample_stratified /
    sample_reservoir_fixed_n execute a design.  σ_h comes from exact
    wide-integer moments (the agg_anova_oneway discipline), and both
    allocations use FLOOR so engine rounding can't disagree.

    Scale (100 TB): one fact scan to |strata| moment rows, one
    broadcast total — the design costs one aggregate regardless of
    data size."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    v = (
        F.signum("o_totalprice") * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    x = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), v.alias("v")
    )
    per = x.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("v").cast("long").alias("s_h"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("ss_h"),
    )
    mean = F.col("s_h").cast("double") / F.col("n_h")
    sigma = F.sqrt(F.col("ss_h").cast("double") / F.col("n_h") - mean * mean) / 100.0
    sig = per.select("seg", "n_h", sigma.alias("sigma_h"))
    tot = sig.agg(
        F.sum(F.col("n_h") * F.col("sigma_h")).alias("denom"),
        F.sum("n_h").cast("long").alias("n"),
    )
    return sig.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n_h",
        F.round("sigma_h", 6).alias("sigma_h"),
        # NULLIF guard (degenerate sweep): all-constant strata have
        # Σ N_h·σ_h = 0 — Neyman allocation is undefined, NULL both sides.
        F.floor(
            1000
            * F.col("n_h")
            * F.col("sigma_h")
            / F.nullif(F.col("denom"), F.lit(0.0))
        )
        .cast("long")
        .alias("alloc_neyman"),
        F.floor(F.lit(1000.0) * F.col("n_h") / F.col("n"))
        .cast("long")
        .alias("alloc_proportional"),
    )


@register(
    "sample_ipw_ess",
    oracle="""
    WITH pop AS (
      SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n_pop
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    samp AS (
      SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n_samp
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderpriority = '1-URGENT'
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_pop) AS BIGINT) AS np_tot FROM pop
    ),
    stot AS (
      SELECT CAST(SUM(n_samp) AS BIGINT) AS ns_tot FROM samp
    ),
    w AS (
      SELECT p.seg, p.n_pop, s.n_samp,
             (p.n_pop * 1.0 / t.np_tot) / (s.n_samp * 1.0 / st.ns_tot)
               AS wt
      FROM pop p JOIN samp s ON s.seg = p.seg
      CROSS JOIN tot t CROSS JOIN stot st
    ),
    ess AS (
      SELECT SUM(n_samp * wt) * SUM(n_samp * wt)
             / SUM(n_samp * wt * wt) AS ess_val,
             CAST(SUM(n_samp) AS BIGINT) AS n_total
      FROM w
    )
    SELECT w.seg, w.n_pop, w.n_samp, round(w.wt, 6) AS ipw_weight,
           round((SELECT ess_val FROM ess), 6) AS effective_sample_size,
           (SELECT n_total FROM ess) AS raw_sample_size
    FROM w
    """,
)
def sample_ipw_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-probability weights that rebalance a biased slice (the
    urgent-priority orders) back to the full population's segment
    mix, with the Kish effective sample size (Σw)²/Σw² that says how
    much statistical power the reweighting costs — the
    survey-weighting core of every observational comparison
    (ab_cuped_adjustment reduces variance WITHIN an experiment; IPW
    corrects composition when you never randomized).  Weights are
    ratios of exact count shares; ESS folds the per-segment weights
    with their multiplicities.

    Scale (100 TB): two broadcast-dim grouped counts and a
    |segments|-row weight table — the reweighting itself is then a
    broadcast join of this table onto any downstream metric scan."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey)
    pop = base.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pop")
    )
    samp = (
        base.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_samp"))
    )
    tot = pop.agg(F.sum("n_pop").cast("long").alias("np_tot"))
    stot = samp.agg(F.sum("n_samp").cast("long").alias("ns_tot"))
    w = (
        pop.join(samp, "seg")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(stot))
        .select(
            "seg",
            "n_pop",
            "n_samp",
            (
                (F.col("n_pop") * F.lit(1.0) / F.col("np_tot"))
                / (F.col("n_samp") * F.lit(1.0) / F.col("ns_tot"))
            ).alias("wt"),
        )
    )
    ess = w.agg(
        (
            F.sum(F.col("n_samp") * F.col("wt"))
            * F.sum(F.col("n_samp") * F.col("wt"))
            / F.sum(F.col("n_samp") * F.col("wt") * F.col("wt"))
        ).alias("ess_val"),
        F.sum("n_samp").cast("long").alias("n_total"),
    )
    return w.crossJoin(F.broadcast(ess)).select(
        "seg",
        "n_pop",
        "n_samp",
        F.round("wt", 6).alias("ipw_weight"),
        F.round("ess_val", 6).alias("effective_sample_size"),
        F.col("n_total").alias("raw_sample_size"),
    )


@register(
    "dq_split_leakage_check",
    oracle="""
    WITH splits AS (
      SELECT doc_id, text,
             CASE WHEN strpos('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1
                       < 13
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT split, doc_id,
             t[k] || ' ' || t[k+1] || ' ' || t[k+2] || ' ' || t[k+3] || ' '
               || t[k+4] || ' ' || t[k+5] || ' ' || t[k+6] || ' '
               || t[k+7] || ' ' || t[k+8] AS g
      FROM (SELECT split, doc_id, string_split(text, ' ') AS t FROM splits),
           LATERAL (SELECT unnest(range(1, len(t) - 7)) AS k)
    ),
    train_g AS (SELECT DISTINCT g FROM shingles WHERE split = 'train'),
    leaked AS (
      SELECT DISTINCT s.doc_id
      FROM shingles s JOIN train_g tg ON tg.g = s.g
      WHERE s.split = 'test'
    ),
    counts AS (
      SELECT CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
             CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test
      FROM splits
    )
    SELECT n_train, n_test,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM leaked) AS n_test_leaked,
           round((SELECT COUNT(*) FROM leaked)
                 / CAST(NULLIF(n_test, 0) AS DOUBLE), 6) AS leakage_rate
    FROM counts
    """,
)
def dq_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split integrity: after the standard content-hash split
    (sample_hash_split's md5 convention, 13/16 train), count test documents
    that share ANY 9-token shingle with the training side — the
    contamination audit every eval pipeline must run, because a clean
    doc_id split does NOT imply clean content separation (near-dup docs
    land on both sides and inflate eval scores).  Exact shingle
    intersection, not MinHash: this is the oracle-grade version of what
    dedup_near_minhash approximates, bounded here by the distinct
    shingle vocabulary.

    Scale (100 TB): distinct (split, doc, shingle) triples shuffle once
    on the shingle (the dedup_span_corpus digest pattern — hash the
    shingle to 16 bytes at scale); the train-side set semi-joins the
    test side.  The leakage rate drives the go/no-go, the leaked doc
    list (one filter away) drives the quarantine."""
    d = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1), 16, 10
    ).cast("long")
    splits = d.select(
        "doc_id", "text",
        F.when(bucket < 13, "train").otherwise("test").alias("split"),
    )
    toks = splits.select("split", "doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    idx = F.sequence(F.lit(0), n - 9)
    shingles = (
        toks.filter(n >= 9)
        .select(
            "split", "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda k: F.concat_ws(
                        " ", *[F.col("t")[k + i] for i in range(9)]
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    train_g = shingles.filter(F.col("split") == "train").select("g").distinct()
    leaked = (
        shingles.filter(F.col("split") == "test")
        .join(train_g, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    counts = splits.agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    nleak = leaked.agg(F.count(F.lit(1)).cast("long").alias("n_test_leaked"))
    return counts.crossJoin(F.broadcast(nleak)).select(
        "n_train", "n_test", "n_test_leaked",
        # NULLIF guard (degenerate sweep): a split with no test docs has
        # no leakage rate — NULL on both sides.
        F.round(
            F.col("n_test_leaked")
            / F.nullif(F.col("n_test").cast("double"), F.lit(0.0)),
            6,
        ).alias("leakage_rate"),
    )


@register(
    "pipeline_rag_context_pack",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS dl,
             CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf0
      FROM docs
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_dl,
             CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0
      FROM stats
    ),
    ranked AS (
      SELECT s.doc_id, s.dl,
             ROW_NUMBER() OVER (ORDER BY
               round(ln((c.n_docs - c.df0 + 0.5) / (c.df0 + 0.5) + 1.0)
                     * (s.tf0 * 2.2)
                     / (s.tf0 + 1.2 * (0.25 + 0.75 * s.dl
                        / (c.total_dl / CAST(c.n_docs AS DOUBLE)))), 6) DESC,
               s.doc_id) AS rnk
      FROM stats s CROSS JOIN corpus c
    ),
    top AS (SELECT doc_id, dl, rnk FROM ranked WHERE rnk <= 24),
    packed AS (
      SELECT doc_id, dl, rnk,
             CAST(FLOOR(CAST(SUM(dl) OVER (ORDER BY rnk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - dl
               AS DOUBLE) / 400) AS BIGINT) AS context_id
      FROM top
    )
    SELECT context_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_tokens,
           CAST(MIN(rnk) AS BIGINT) AS best_rank,
           string_agg(CAST(doc_id AS VARCHAR), '+' ORDER BY rnk) AS doc_ids
    FROM packed GROUP BY context_id
    """,
)
def pipeline_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly: rank documents by BM25 relevance
    (text_bm25_topk's scorer), take the top-24, and pack them
    relevance-first into ~400-token context windows using pack_shards'
    running-total DIV convention — the retrieval→context step between
    'search found documents' and 'prompt fits the model', with the
    most relevant material landing in the first window (what the model
    attends to best).  Each context row reports its docs in rank order
    (deterministic '+'-joined ids), token load, and best rank.

    Scale (100 TB): ranking is TakeOrderedAndProject over the scored
    scan; packing runs on the top-k rows only.  Per-query packing
    partitions the same windows by query id."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stats = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        F.size(F.filter(toks, lambda x: x == "spark")).cast("long").alias("tf0"),
    )
    corpus = stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
        F.sum(F.when(F.col("tf0") > 0, 1).otherwise(0)).cast("long").alias("df0"),
    )
    j = stats.crossJoin(F.broadcast(corpus))
    idf = F.log(
        (F.col("n_docs") - F.col("df0") + 0.5) / (F.col("df0") + 0.5) + 1.0
    )
    score = F.round(
        idf
        * (F.col("tf0") * 2.2)
        / (
            F.col("tf0")
            + 1.2
            * (0.25 + 0.75 * F.col("dl") / (F.col("total_dl") / F.col("n_docs").cast("double")))
        ),
        6,
    )
    ranked = j.select(
        "doc_id", "dl",
        F.row_number().over(Window.orderBy(score.desc(), "doc_id")).alias("rnk"),
    )
    top = ranked.filter(F.col("rnk") <= 24)
    wcum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    packed = top.select(
        "doc_id", "dl", "rnk",
        F.floor(
            (F.sum("dl").over(wcum) - F.col("dl")).cast("double") / 400
        ).cast("long").alias("context_id"),
    )
    return packed.groupBy("context_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        F.min("rnk").cast("long").alias("best_rank"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("rnk").alias("rnk"),
                            F.col("doc_id").cast("string").alias("did"),
                        )
                    )
                ),
                lambda s: s["did"],
            ),
            "+",
        ).alias("doc_ids"),
    )


@register(
    "sample_temperature_mixture",
    oracle="""
    WITH counts AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total FROM counts),
    quant AS (
      SELECT c.source, c.n_docs, c.n_tokens, t.n_total,
             CAST(FLOOR(sqrt(c.n_tokens / CAST(t.n_total AS DOUBLE))
                        * 1000000000000 + 0.5) AS BIGINT) AS tq
      FROM counts c CROSS JOIN tot t
    ),
    denom AS (SELECT CAST(SUM(tq) AS BIGINT) AS dq FROM quant)
    SELECT q.source, q.n_docs, q.n_tokens,
           round(q.n_tokens / CAST(q.n_total AS DOUBLE), 6) AS raw_share,
           round(q.tq / CAST(d.dq AS DOUBLE), 6) AS temp_weight,
           round(q.tq / CAST(d.dq AS DOUBLE) * q.n_total / q.n_tokens, 6)
             AS sampling_epochs,
           CASE WHEN q.tq / CAST(d.dq AS DOUBLE) * q.n_total / q.n_tokens
                     > 1.0 THEN 1 ELSE 0 END AS upsampled
    FROM quant q CROSS JOIN denom d
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (T=2, i.e. weight ∝ share^½) —
    the standard multilingual/multi-domain pretraining reweighting
    (mBERT/XLM-R recipe): small sources are upsampled toward, but not
    onto, a uniform mix, so the head domain stops drowning the tail
    without tiny domains overfitting.  Shares are TOKEN shares, as in
    the published recipe (and because this fixture's per-source doc
    counts are exactly uniform — a doc-count mixture would output
    twenty identical rows and prove nothing: the degenerate-population
    trap).  Per source: token count, raw share, tempered mixture
    weight, the implied sampling epochs at a corpus-sized token
    budget, and the upsampled flag (>1 epoch — below-average sources
    under √ temperature, so both branches populate).
    sample_domain_mix applies hand-set rates; this op COMPUTES
    principled rates from the corpus itself.

    Engine parity: exponent ½ is deliberate — sqrt is IEEE
    correctly-rounded in both engines (pow(x, 0.7) is not, and a
    1-ulp libm disagreement under the quantizer would flip a hash),
    and the tempered terms quantize to exact 1e12 integers before the
    (order-free) integer denominator sum.

    Scale (100 TB): one map-side-combined groupBy on source, then
    two 1-row scalar binds — the per-source table is dimension-sized.
    The weights feed sample_epoch_repeat_factors / domain-mix filters
    downstream; token counting is the only pass over text."""
    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )
    tot = counts.agg(F.sum("n_tokens").cast("long").alias("n_total"))
    quant = counts.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens", "n_total",
        F.floor(
            F.sqrt(F.col("n_tokens") / F.col("n_total").cast("double"))
            * 1_000_000_000_000
            + 0.5
        )
        .cast("long")
        .alias("tq"),
    )
    denom = quant.agg(F.sum("tq").cast("long").alias("dq"))
    w = F.col("tq") / F.col("dq").cast("double")
    epochs = w * F.col("n_total") / F.col("n_tokens")
    return quant.crossJoin(F.broadcast(denom)).select(
        "source", "n_docs", "n_tokens",
        F.round(F.col("n_tokens") / F.col("n_total").cast("double"), 6).alias(
            "raw_share"
        ),
        F.round(w, 6).alias("temp_weight"),
        F.round(epochs, 6).alias("sampling_epochs"),
        F.when(epochs > 1.0, 1).otherwise(0).alias("upsampled"),
    )
