"""Mutation-shaped batch operators: MERGE/upsert and CDC compaction.

Spark has no in-place UPDATE; the scalable idiom is "merge as a join":
compute the post-merge state as a full-outer join of target and source and
rewrite the affected partitions (partition overwrite at 100 TB — only
partitions containing matched keys are rewritten, the rest are untouched).
Both ops here express the *result relation* declaratively so Catalyst keeps
pushdown/broadcast freedom, and both have exact SQL oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import register
from ..tables import load


@register(
    "merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_orderkey + 10000000 AS s_key, o_custkey AS s_custkey,
             'O' AS s_status, o_totalprice * 0.5 AS s_price
      FROM orders WHERE o_orderkey % 1000 = 0
      UNION ALL
      SELECT o_orderkey AS s_key, o_custkey AS s_custkey,
             o_orderstatus AS s_status, o_totalprice + 100.0 AS s_price
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT COALESCE(t.o_orderkey, s.s_key) AS o_orderkey,
           COALESCE(s.s_custkey, t.o_custkey) AS o_custkey,
           COALESCE(s.s_status, t.o_orderstatus) AS o_orderstatus,
           COALESCE(s.s_price, t.o_totalprice) AS o_totalprice
    FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.s_key
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: WHEN MATCHED → update
    (price +100 for every 7th order), WHEN NOT MATCHED → insert (new
    half-price orders keyed above the existing range).  The post-merge
    relation is one full-outer join with COALESCE picks — the source side
    is small relative to the target, so it broadcasts; at 100 TB the write
    path is dynamic partition overwrite of only the touched partitions."""
    o = load(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("s_key"),
        F.col("o_custkey").alias("s_custkey"),
        F.col("o_orderstatus").alias("s_status"),
        (F.col("o_totalprice") + 100.0).alias("s_price"),
    )
    inserts = o.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("s_key"),
        F.col("o_custkey").alias("s_custkey"),
        F.lit("O").alias("s_status"),
        (F.col("o_totalprice") * 0.5).alias("s_price"),
    )
    src = updates.unionByName(inserts)
    t = o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    return t.join(src, t.o_orderkey == src.s_key, "full_outer").select(
        F.coalesce(t.o_orderkey, F.col("s_key")).alias("o_orderkey"),
        F.coalesce(F.col("s_custkey"), t.o_custkey).alias("o_custkey"),
        F.coalesce(F.col("s_status"), t.o_orderstatus).alias("o_orderstatus"),
        F.coalesce(F.col("s_price"), t.o_totalprice).alias("o_totalprice"),
    )


@register(
    "cdc_compact_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) ranked
    WHERE rn = 1
    """,
)
def cdc_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: keep the latest event per user (change-stream →
    current-state snapshot).  row_number over (key ORDER BY ts DESC) with a
    unique event_id tie-break; one hash-partition shuffle on the key, which
    at 100 TB is the same partitioning the downstream upsert join wants —
    so the exchange is reusable.  events.ts is normalized to µs timestamps
    by the loader (FIXTURES.md) and both engines order it identically."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "scd2_history",
    oracle="""
    SELECT user_id, event_type AS state, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each event opens a validity
    interval closed by the user's next event (NULL = current).  One window
    over the natural (key, time) sort — the same shuffle CDC compaction
    uses, so at 100 TB the two share a partitioning.  event_id breaks ts
    ties identically on both engines."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "reconcile_table_diff",
    oracle="""
    WITH a AS (SELECT * FROM orders),
    b AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 503 = 0
                  THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 1009 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 997 = 0
    )
    SELECT CASE
             WHEN a.o_orderkey IS NULL THEN 'added'
             WHEN b.o_orderkey IS NULL THEN 'removed'
             WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
                  OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                  OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
               THEN 'changed'
             ELSE 'unchanged'
           END AS status,
           COUNT(*) AS n
    FROM a FULL OUTER JOIN b USING (o_orderkey)
    GROUP BY 1
    """,
)
def reconcile_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two table versions into
    added/removed/changed/unchanged counts — the data-migration sign-off
    query (did the backfill / engine swap / vendor feed change what it
    claimed and nothing else?).  The 'after' snapshot is derived
    deterministically inside the op: keys %1009 deleted, %503 price-
    bumped, %997 re-inserted under new keys.

    Comparison uses IS DISTINCT FROM per column — no row-hash, so NULLs
    compare correctly and no cross-engine value-formatting (double→string)
    ambiguity enters; a real deployment with hundreds of columns would
    generate the same predicate list from the schema.

    Scale (100 TB): one full-outer sort-merge join on the primary key —
    the unavoidable shuffle, done once; the status projection is
    codegen'd scalar work and the aggregate is 4 keys with map-side
    partials.  For repeated nightly diffs, bucket both snapshots on the
    key to make the join exchange-free."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    a = o.select("o_orderkey", *cols)
    changed_price = F.when(
        F.col("o_orderkey") % 503 == 0, F.col("o_totalprice") + 1.0
    ).otherwise(F.col("o_totalprice"))
    b = (
        o.filter(F.col("o_orderkey") % 1009 != 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            changed_price.alias("o_totalprice"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 997 == 0).select(
                (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                "o_custkey",
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice",
            )
        )
    )
    bb = b.select(
        F.col("o_orderkey").alias("b_key"),
        *[F.col(c).alias(f"b_{c}") for c in cols],
    )
    j = a.join(bb, a.o_orderkey == bb.b_key, "full_outer")
    any_diff = None
    for c in cols:
        d = ~F.col(c).eqNullSafe(F.col(f"b_{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    status = (
        F.when(F.col("o_orderkey").isNull(), "added")
        .when(F.col("b_key").isNull(), "removed")
        .when(any_diff, "changed")
        .otherwise("unchanged")
    )
    return j.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "cdc_scd2_apply_batch",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER w AS valid_to
      FROM events WHERE ts < TIMESTAMP '2024-01-15'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    batch AS (
      SELECT user_id, event_type AS new_state, ts AS change_ts
      FROM (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15' AND user_id % 3 = 0
      ) WHERE rn = 1
    ),
    closed AS (
      SELECT d.user_id, d.state, d.valid_from,
             CASE WHEN d.valid_to IS NULL AND b.user_id IS NOT NULL
                  THEN b.change_ts ELSE d.valid_to END AS valid_to,
             CASE WHEN d.valid_to IS NULL AND b.user_id IS NOT NULL
                  THEN 'closed'
                  WHEN d.valid_to IS NULL THEN 'current'
                  ELSE 'history' END AS row_status
      FROM dim d LEFT JOIN batch b ON b.user_id = d.user_id
    ),
    inserted AS (
      SELECT user_id, new_state AS state, change_ts AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             'inserted' AS row_status
      FROM batch
    )
    SELECT * FROM closed
    UNION ALL
    SELECT * FROM inserted
    """,
)
def cdc_scd2_apply_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC batch to a live SCD2 dimension: the dim is the
    pre-day-15 event history (scd2_history's build), the batch is the FIRST
    post-day-15 change for every THIRD key (a realistic partial delta —
    most keys don't change in one batch); applying it closes the open row of
    every changed key at the change timestamp and inserts the new
    current row, while history rows and unchanged keys pass through
    untagged — the exact merge a warehouse runs nightly on dimension
    deltas (merge_upsert is the type-1 flavor; this is the versioned
    one).  Every row carries its outcome (history / current / closed /
    inserted) so the run is auditable.

    Scale (100 TB): the dim-batch join keys on user_id (batch side
    broadcast-able — it's latest-per-key, |keys| rows max); the SCD2
    build shares the same key partitioning."""
    e = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("ts") < cutoff)
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    batch = (
        e.filter((F.col("ts") >= cutoff) & (F.col("user_id") % 3 == 0))
        .select(
            "user_id",
            F.col("event_type").alias("new_state"),
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "new_state", F.col("ts").alias("change_ts"))
    )
    j = dim.join(F.broadcast(batch), "user_id", "left")
    open_changed = F.col("valid_to").isNull() & F.col("change_ts").isNotNull()
    closed = j.select(
        "user_id", "state", "valid_from",
        F.when(open_changed, F.col("change_ts")).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
        F.when(open_changed, "closed")
        .when(F.col("valid_to").isNull(), "current")
        .otherwise("history")
        .alias("row_status"),
    )
    inserted = batch.select(
        "user_id",
        F.col("new_state").alias("state"),
        F.col("change_ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit("inserted").alias("row_status"),
    )
    return closed.unionByName(inserted)


@register(
    "dq_scd2_interval_audit",
    oracle="""
    WITH dim AS (
      SELECT user_id, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events WHERE ts < TIMESTAMP '2024-01-08'
    ),
    corrupted AS (
      -- deliberate fault injection: every 13th row's valid_to slides an
      -- hour late (overlap with the successor), every 17th an hour early
      -- (gap before the successor) — the audit must catch exactly these
      SELECT user_id, rn, valid_from,
             CASE WHEN valid_to IS NULL THEN NULL
                  WHEN rn % 13 = 0 THEN valid_to + INTERVAL 1 HOUR
                  WHEN rn % 17 = 0 THEN valid_to - INTERVAL 1 HOUR
                  ELSE valid_to END AS valid_to
      FROM dim
    ),
    seq AS (
      SELECT user_id, rn, valid_from, valid_to,
             LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY rn)
               AS next_from
      FROM corrupted
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN valid_to IS NOT NULL AND next_from IS NOT NULL
                         AND valid_to > next_from THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlaps,
           CAST(SUM(CASE WHEN valid_to IS NOT NULL AND next_from IS NOT NULL
                         AND valid_to < next_from THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gaps,
           CAST(SUM(CASE WHEN valid_to IS NOT NULL
                         AND valid_to <= valid_from THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inverted,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_open
    FROM seq
    """,
)
def dq_scd2_interval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval-integrity audit: per key, consecutive validity
    intervals must tile time exactly — valid_to equal to the successor's
    valid_from, no overlaps, no gaps, no inverted rows, exactly one open
    row — the dimension-health check every warehouse runs after a merge
    like cdc_scd2_apply_batch.  The fixture dim is built correct and then
    deterministically corrupted (every 13th close slides late → overlap,
    every 17th early → gap) so the audit provably CATCHES faults instead
    of vacuously passing on clean data.

    Scale (100 TB): one key-partitioned window pass and a global count
    rollup — the audit costs one scan of the dimension."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = e.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp")).select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("rn"),
    )
    corrupted = dim.select(
        "user_id", "rn", "valid_from",
        F.when(F.col("valid_to").isNull(), None)
        .when(
            F.col("rn") % 13 == 0, F.col("valid_to") + F.expr("INTERVAL 1 HOUR")
        )
        .when(
            F.col("rn") % 17 == 0, F.col("valid_to") - F.expr("INTERVAL 1 HOUR")
        )
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
    )
    wseq = Window.partitionBy("user_id").orderBy("rn")
    seq = corrupted.select(
        "user_id", "rn", "valid_from", "valid_to",
        F.lead("valid_from").over(wseq).alias("next_from"),
    )
    both = F.col("valid_to").isNotNull() & F.col("next_from").isNotNull()
    return seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(both & (F.col("valid_to") > F.col("next_from")), 1).otherwise(0))
        .cast("long")
        .alias("n_overlaps"),
        F.sum(F.when(both & (F.col("valid_to") < F.col("next_from")), 1).otherwise(0))
        .cast("long")
        .alias("n_gaps"),
        F.sum(
            F.when(
                F.col("valid_to").isNotNull()
                & (F.col("valid_to") <= F.col("valid_from")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_inverted"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
    )


@register(
    "dq_cdc_scd2_consistency",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type AS cur_state
      FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    scd2_open AS (
      SELECT user_id, event_type AS open_state
      FROM (
        SELECT user_id, event_type,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events
      ) WHERE valid_to IS NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN l.cur_state = s.open_state THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           CAST(SUM(CASE WHEN l.cur_state <> s.open_state THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree,
           CAST(COUNT(DISTINCT l.cur_state) AS BIGINT) AS n_states_seen,
           round(CAST(SUM(CASE WHEN l.cur_state = s.open_state
                          THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS agreement_rate
    FROM latest l JOIN scd2_open s ON s.user_id = l.user_id
    """,
)
def dq_cdc_scd2_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-derivation reconciliation: the type-1 'latest per key'
    snapshot (cdc_compact_latest's descending-rank path) must agree
    with the SCD2 open row (scd2_history's lead-is-null path) on every
    key — two independently-coded pipelines that answer the same
    question, which is exactly how real warehouses catch tie-break and
    boundary bugs (a DESC rank and an ASC lead disagree the moment a
    tie-break is inconsistent).  Agreement here is the assertion, not
    a degenerate output: the counts, state cardinality, and rate give
    the hash structure and the reviewer the context.

    Scale (100 TB): both derivations share the user_id partitioning;
    the reconciliation is one key-keyed join."""
    e = load(spark, sf_dir, "events")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        e.select(
            "user_id", F.col("event_type").alias("cur_state"),
            F.row_number().over(wd).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd2_open = (
        e.select(
            "user_id", F.col("event_type").alias("open_state"),
            F.lead("ts").over(wa).alias("valid_to"),
        )
        .filter(F.col("valid_to").isNull())
        .drop("valid_to")
    )
    j = latest.join(scd2_open, "user_id")
    agree = F.col("cur_state") == F.col("open_state")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(agree, 1).otherwise(0)).cast("long").alias("n_agree"),
        F.sum(F.when(~agree, 1).otherwise(0)).cast("long").alias("n_disagree"),
        F.countDistinct("cur_state").cast("long").alias("n_states_seen"),
        F.round(
            F.sum(F.when(agree, 1).otherwise(0)).cast("long")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("agreement_rate"),
    )
