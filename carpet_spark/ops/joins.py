"""Category D — joins (SURVEY.md §2.D).

Physical strategy is Catalyst's choice (broadcast-hash / sort-merge /
shuffled-hash / broadcast-nested-loop); we shape the logical plan so the
right one is available: dimension sides are small → AQE auto-broadcasts
(no shuffle of the fact table on the build side); explicit
``F.broadcast()`` marks the dims whose size Catalyst can't see through
aggregates.  At 100 TB: fact-fact joins shuffle on the join key (sort-merge
+ AQE skew splitting); fact-dim joins must broadcast — these plans do.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..exprs import dsum, lsum, sql_dsum, sql_lsum
from ..registry import register
from ..tables import load, spread


@register(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate,
           c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer.  No forced hint: Catalyst's size
    stats broadcast customer while it fits the threshold (zero shuffle of
    orders); at 100 TB, where customer is a multi-billion-row table, the
    planner falls back to sort-merge with AQE skew splitting instead of
    an executor-OOM broadcast."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "o_orderdate",
        "c_custkey", "c_name", "c_mktsegment",
    )


_EARLY = "TIMESTAMP '1995-07-01 00:00:00'"


@register(
    "join_left",
    oracle=f"""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderdate < {_EARLY}) o
      ON o.o_custkey = c.c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a filtered right side so unmatched customers emit
    NULL order columns."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-07-01")
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right",
    oracle=f"""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_mktsegment
    FROM (SELECT * FROM orders WHERE o_orderdate < {_EARLY}) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-07-01")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_mktsegment"
    )


@register(
    "join_full",
    oracle="""
    SELECT cc.nk AS cust_nk, cc.n_cust, ss.nk AS supp_nk, ss.n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
          WHERE c_mktsegment = 'MACHINERY' GROUP BY 1) cc
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
               GROUP BY 1) ss
      ON cc.nk = ss.nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated sides (nations with MACHINERY
    customers vs nations with suppliers) — both unmatched directions occur."""
    cc = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .groupBy(F.col("c_nationkey").alias("cust_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    ss = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("supp_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cc.join(ss, cc.cust_nk == ss.supp_nk, "full").select(
        "cust_nk", "n_cust", "supp_nk", "n_supp"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 finished order.  left_semi never duplicates the
    left side and only ships the join key of the right side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian region×nation (125 rows).  Only sane when one side is
    tiny — Catalyst uses BroadcastNestedLoopJoin."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_theta_range",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_retailprice,
           l.l_extendedprice
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_extendedprice BETWEEN p.p_retailprice * 0.9 AND p.p_retailprice * 1.1
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate: hash join on partkey, band as post-join
    filter — the scalable shape (pure theta would be nested-loop).  The
    equi component means no broadcast is required: stats pick
    broadcast-hash at small SF, sort-merge at scale."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_extendedprice >= p.p_retailprice * 0.9)
        & (li.l_extendedprice <= p.p_retailprice * 1.1)
    )
    return li.join(p, cond, "inner").select(
        "l_orderkey", "l_linenumber", "p_partkey", "p_retailprice", "l_extendedprice"
    )


@register(
    "join_band",
    oracle="""
    SELECT s.s_suppkey, s.s_acctbal, c.c_custkey, c.c_acctbal
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 10.0 AND s.s_acctbal + 10.0
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure band (non-equi) join → BroadcastNestedLoopJoin; Catalyst
    builds on whichever side its stats say is smaller (supplier here) —
    no forced hint, so a grown side never OOMs an executor.  At scale
    this shape demands binning the band into an equi key first
    (join_range_binned is that path); kept here as the semantic
    baseline."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cond = (c.c_acctbal >= s.s_acctbal - 10.0) & (c.c_acctbal <= s.s_acctbal + 10.0)
    return c.join(s, cond, "inner").select(
        "s_suppkey", "s_acctbal", "c_custkey", "c_acctbal"
    )


@register(
    "join_multiway",
    oracle=f"""
    SELECT n.n_name,
           {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join.  Join order: dims first (region→nation
    filter prunes to one region before touching facts), lineitem joined to
    the already-filtered orders.  Explicit broadcast hints only on the TRUE
    dims (region: 5 rows, nation: 25 rows — constant at every SF); customer
    and supplier are left to Catalyst/AQE, which still broadcasts them at
    any scale where they fit the threshold but falls back to sort-merge at
    100 TB, where customer is ~1/7 the row count of lineitem and a forced
    broadcast would OOM the executors (r7 VERDICT finding 1)."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "join_asof",
    oracle="""
    WITH sig AS (
      SELECT user_id, ts, MAX(event_id) AS sig_id
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts, s.sig_id, s.ts AS sig_ts
    FROM events e
    ASOF LEFT JOIN sig s ON e.user_id = s.user_id AND s.ts <= e.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's latest signup event
    with signup.ts <= event.ts (NULL if none yet).

    Spark has no native ASOF JOIN; this is the union-tag + window
    last(ignorenulls) pattern (SURVEY §2.D): union both sides with a
    side marker, sort per user by (ts, side, id) — right side first at
    equal ts so <= semantics hold — and carry the last seen signup
    forward.  ONE shuffle on user_id, no range-join blowup: the scalable
    distributed as-of.  Right side deduped to one row per (user, ts)
    (max event_id) so ties are deterministic — DuckDB's ASOF picks the
    single matching row per timestamp for the same reason.
    """
    ev = load(spark, sf_dir, "events")
    sig = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("sig_id"))
    )
    left = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("is_left"),
        F.lit(None).cast("long").alias("sig_id"),
        F.lit(None).cast("timestamp").alias("sig_ts"),
    )
    right = sig.select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_left"),
        "sig_id",
        F.col("ts").alias("sig_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.col("is_left").asc(),
            F.coalesce("event_id", "sig_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        left.unionByName(right)
        .withColumn("m_sig_id", F.last("sig_id", ignorenulls=True).over(w))
        .withColumn("m_sig_ts", F.last("sig_ts", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m_sig_id").alias("sig_id"),
            F.col("m_sig_ts").alias("sig_ts"),
        )
    )


_J_INNER_PROJ_ORACLE = """
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """


@register("join_bucketed", oracle=_J_INNER_PROJ_ORACLE)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketing: both sides written
    bucketed by the join key (8 buckets, sorted), then joined — Spark's
    bucketing metadata proves co-partitioning so the join plans WITHOUT an
    Exchange on either side (asserted in test_plans.py).

    This is THE fact-fact join strategy at 100 TB: pay the shuffle once at
    write time, every subsequent join on the bucket key is local.  Result
    is identical to the plain join, so the oracle is the plain join SQL.
    """
    import hashlib
    import os
    import tempfile

    wh = os.path.join(tempfile.gettempdir(), "carpet_spark_buckets")
    # Key the bucketed tables on a content fingerprint of the source files
    # (path + mtime + size), not just the sf_dir basename: a regenerated
    # source at the same path, a shared basename across roots, or a cleaned
    # /tmp with a surviving metastore would otherwise serve stale data
    # (ADVICE r01).  Reuse on an unchanged source is the point of bucketing
    # (pay the shuffle once at write time), so we keep the cache but make
    # its key honest — and rewrite if the backing files vanished.
    fp = hashlib.sha256()
    for table in ("orders", "customer"):
        path = os.path.join(sf_dir, f"{table}.parquet")
        st = os.stat(path)
        fp.update(f"{path}|{st.st_mtime_ns}|{st.st_size}".encode())
    tag = fp.hexdigest()[:12]
    t_orders, t_cust = f"b_orders_{tag}", f"b_customer_{tag}"
    for tname, table, key, cols in (
        (t_orders, "orders", "o_custkey", ["o_orderkey", "o_custkey", "o_totalprice"]),
        (t_cust, "customer", "c_custkey", ["c_custkey", "c_mktsegment"]),
    ):
        if not spark.catalog.tableExists(tname) or not os.path.isdir(
            os.path.join(wh, tname)
        ):
            (
                load(spark, sf_dir, table)
                .select(*cols)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(wh, tname))
                .mode("overwrite")
                .saveAsTable(tname)
            )
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_mktsegment"
    )


@register("join_salted", oracle=_J_INNER_PROJ_ORACLE)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join via key salting: the fact side appends a random
    salt in [0,8) to its key; the dim side explodes into all 8 salted
    copies; join on (key, salt).  Result is identical to the plain join
    (oracle = plain SQL) but a hot key's rows now spread over 8 tasks.

    AQE's skewJoin handles moderate skew automatically; salting is the
    manual fallback for pathological keys (the task-killing 10%-of-table
    key) and is shown here as the reusable pattern.  The salt must be
    deterministic-per-row only for test reproducibility — pmod(hash) here,
    rand() in production.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n_salt = 8
    o_s = o.withColumn("salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salt)))
    c_s = c.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salt)]))
    )
    return o_s.join(
        c_s, (o_s.o_custkey == c_s.c_custkey) & (o_s.salt == c_s.salt), "inner"
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_mktsegment")


@register(
    "join_skew_aqe",
    oracle=f"""
    WITH f AS (
        SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
                    ELSE l_orderkey % 97 END AS skew_key,
               l_quantity
        FROM lineitem
    ),
    d AS (
        SELECT CAST(unnest(range(0, 97)) AS BIGINT) AS skew_key,
               CAST(unnest(range(0, 97)) AS BIGINT) * 3 + 1 AS weight
    )
    SELECT f.skew_key,
           COUNT(*) AS n_rows,
           {{lsum}} AS weighted_qty
    FROM f JOIN d USING (skew_key)
    GROUP BY 1
    """.format(lsum=sql_lsum("f.l_quantity * d.weight")),
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed shuffle join left to AQE: ~90% of lineitem rows map to
    skew_key 0 (the task-killing hot key), joined to a 97-row weight dim
    with an explicit ``MERGE`` hint so the plan is a shuffled sort-merge
    join rather than a broadcast (the shape AQE's skew mitigation applies
    to).  At production thresholds AQE splits the oversized partition into
    advisory-sized chunks and replicates the matching dim rows
    (``spark.sql.adaptive.skewJoin``) — no salting, no manual tuning;
    tests/test_plans.py lowers the thresholds so the split is observable
    (``skew=true`` in the adaptive plan) at test scale.  join_salted
    (above) is the manual fallback for when the dim side is too large to
    replicate."""
    # repartition(16) simulates production mapper granularity: AQE splits a
    # skewed reduce partition only at map-output-block boundaries, and the
    # single-row-group test parquet yields ONE mapper (unsplittable).  A
    # 100 TB scan has thousands of mappers, so the repartition disappears
    # in production — here it is what makes the skew split observable.
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(0).cast("long"))
            .otherwise(F.col("l_orderkey") % 97)
            .alias("skew_key"),
            "l_quantity",
        )
        .repartition(16)
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("skew_key"), (F.col("id") * 3 + 1).alias("weight")
    )
    return (
        li.join(dim.hint("MERGE"), "skew_key")
        .groupBy("skew_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            lsum(F.col("l_quantity") * F.col("weight")).alias("weighted_qty"),
        )
    )


@register(
    "join_interval_events",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND c.ts >= p.ts - INTERVAL '1 hour'
     AND c.ts <= p.ts
    """,
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join: each purchase matched to the same user's
    clicks in the preceding hour — the attribution-join shape.  Equi on
    user_id (hash join) + time band as post-join filter; the streaming twin
    is a stream-stream join with watermarks on both sides (exercised in
    tests/test_streaming.py)."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.click_ts <= p.purchase_ts),
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


@register(
    "join_bloom_runtime_filter",
    oracle=f"""
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           {sql_lsum('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 150000
    GROUP BY 1
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim fact join shaped for Catalyst's runtime bloom filter:
    the filtered orders side builds a BloomFilterAggregate that is injected
    as a ``might_contain`` semi-filter on lineitem's scan side BEFORE the
    join shuffle — rows that cannot match never get shuffled.  At
    production defaults this fires when the application side exceeds
    ``runtime.bloomFilter.applicationSideScanSizeThreshold`` (10 GB) — i.e.
    exactly the 100 TB fact-table case; tests/test_plans.py lowers the
    threshold to make the injection observable at test scale."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            lsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


_BAND = 10.0


@register(
    "join_range_binned",
    oracle="""
    SELECT s.s_suppkey, s.s_acctbal, c.c_custkey, c.c_acctbal
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 10.0 AND s.s_acctbal + 10.0
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_band's 100 TB form: bin the band predicate into an EQUI key.
    Each supplier row is replicated into the 3 bins its ±10 window can
    touch (bin width = band width ⇒ a match is always in the same or an
    adjacent bin of the probe row); the join is then a plain hash join on
    bin_id with the exact band re-checked after.  Same result as join_band
    (identical oracle), but the plan is shuffle/broadcast HASH join —
    never a nested-loop — so both sides may be facts.  3x replication of
    ONE side buys an equi-shuffle: the standard interval-join compromise
    (plan-asserted no BroadcastNestedLoopJoin in test_plans.py)."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey", "c_acctbal")
    s_binned = s.withColumn(
        "bin_id",
        F.explode(
            F.array(
                F.floor(F.col("s_acctbal") / _BAND) - 1,
                F.floor(F.col("s_acctbal") / _BAND),
                F.floor(F.col("s_acctbal") / _BAND) + 1,
            )
        ),
    )
    c_binned = c.withColumn("bin_id", F.floor(F.col("c_acctbal") / _BAND))
    return (
        c_binned.join(s_binned, "bin_id")
        .filter(
            (F.col("c_acctbal") >= F.col("s_acctbal") - _BAND)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + _BAND)
        )
        .select("s_suppkey", "s_acctbal", "c_custkey", "c_acctbal")
    )


@register(
    "join_fuzzy_blocked",
    oracle="""
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON substring(a.c_name, 10, 7) = substring(b.c_name, 10, 7)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) self-match with BLOCKING: candidate pairs come
    from an equi-join on a cheap blocking key, then the expensive
    levenshtein verifies only within blocks — entity resolution's standard
    scale shape.  All-pairs levenshtein over n rows is O(n²·len²) and
    unshardable; blocked, the cost is Σ|block|² with full recall for any
    pair sharing the key.  The key must be DISCRIMINATIVE: the first
    attempt blocked on the 12-char name prefix, which on templated
    "Customer#000..." names put the whole corpus in ONE block (all-pairs
    in disguise — 225M single-task compares at sf0.1).  Blocking on the
    first 7 digits of the numeric suffix caps every block at the last-2-
    digit combinations (≤100 rows) at ANY corpus size, trading recall on
    pairs that differ in a leading digit — the standard blocking recall/
    cost dial.  JVM-side levenshtein (built-in), hash-verified against
    DuckDB's."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # r12 (guide §2.4, the P1 class inside a join): the blocked self-join
    # broadcasts one side, so the probe side inherits the single-split
    # scan's ONE partition and every within-block levenshtein ran on one
    # core.  spread() fans the probe side by block key (no-op at any
    # production multi-split layout); measured 3.1-3.4 s -> 0.5-0.7 s.
    a = spread(
        c.select(
            F.col("c_custkey").alias("custkey_a"),
            F.col("c_name").alias("name_a"),
            F.substring("c_name", 10, 7).alias("blk"),
        ),
        "blk",
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.substring("c_name", 10, 7).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 1)
        .select("custkey_a", "custkey_b", "name_a", "name_b", "edit_dist")
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH sig AS (
      SELECT user_id, ts, MIN(event_id) AS sig_id
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts, s.sig_id, s.ts AS sig_ts
    FROM events e
    ASOF LEFT JOIN sig s ON e.user_id = s.user_id AND s.ts >= e.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event matched to the user's EARLIEST signup
    at-or-after it (NULL if none follows) — the "next scheduled event"
    lookup, mirror of join_asof's latest-at-or-before.

    Same union-tag pattern, reflected: per user, sort by ts ascending with
    the left row BEFORE the right at equal ts (so >= includes ties), and
    take first(ignorenulls) over the [current row, unbounded following]
    frame.  Still exactly ONE shuffle on user_id and no range-join blowup;
    right side deduped to one row per (user, ts) with MIN(event_id) so the
    match is engine-deterministic."""
    ev = load(spark, sf_dir, "events")
    sig = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("sig_id"))
    )
    left = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("is_left"),
        F.lit(None).cast("long").alias("sig_id"),
        F.lit(None).cast("timestamp").alias("sig_ts"),
    )
    right = sig.select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_left"),
        "sig_id",
        F.col("ts").alias("sig_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.col("is_left").desc(),
            F.coalesce("event_id", "sig_id").asc(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        left.unionByName(right)
        .withColumn("m_sig_id", F.first("sig_id", ignorenulls=True).over(w))
        .withColumn("m_sig_ts", F.first("sig_ts", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m_sig_id").alias("sig_id"),
            F.col("m_sig_ts").alias("sig_ts"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH sig AS (
      SELECT user_id, ts, MIN(event_id) AS sig_id
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id, ts
    ),
    back AS (
      SELECT e.event_id, e.user_id, e.ts, s.sig_id AS b_id, s.ts AS b_ts
      FROM events e
      ASOF LEFT JOIN sig s ON e.user_id = s.user_id AND s.ts <= e.ts
    ),
    fwd AS (
      SELECT e.event_id, s.sig_id AS f_id, s.ts AS f_ts
      FROM events e
      ASOF LEFT JOIN sig s ON e.user_id = s.user_id AND s.ts >= e.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN b_ts IS NULL THEN f_id
                WHEN f_ts IS NULL THEN b_id
                WHEN date_diff('second', b_ts, b.ts)
                     <= date_diff('second', b.ts, f_ts) THEN b_id
                ELSE f_id END AS sig_id,
           CASE WHEN b_ts IS NULL THEN f_ts
                WHEN f_ts IS NULL THEN b_ts
                WHEN date_diff('second', b_ts, b.ts)
                     <= date_diff('second', b.ts, f_ts) THEN b_ts
                ELSE f_ts END AS sig_ts
    FROM back b JOIN fwd f USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each event matched to the user's CLOSEST signup
    in either time direction (tie at equal distance → the earlier one) —
    completes the asof family (join_asof = backward, join_asof_forward =
    forward).  The sensor-alignment / nearest-reading lookup.

    Both directional candidates come from ONE union-tag pass: a single
    Window partitioning (user_id, ordered ts with the signup row first at
    equal ts) carries last(signup≤) over the preceding frame AND
    first(signup≥) over the following frame — same partition+order spec,
    so Catalyst evaluates both frames in one Window node after ONE shuffle
    and one sort.  The equal-ts signup sorts before the event row, so the
    forward frame misses it — harmless: the backward frame catches it at
    distance 0, which wins the nearest choice by the tie rule.  No range
    join, no per-row probe; the 100 TB cost is exactly join_asof's.

    DuckDB oracle: two native ASOF joins (<= and >=) re-joined on
    event_id, same CASE.  Signups dedup to MIN(event_id) per (user, ts)
    on both sides so the match is engine-deterministic."""
    ev = load(spark, sf_dir, "events")
    sig = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("sig_id"))
    )
    left = ev.select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("is_left"),
        F.lit(None).cast("long").alias("sig_id"),
        F.lit(None).cast("timestamp").alias("sig_ts"),
    )
    right = sig.select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_left"),
        "sig_id",
        F.col("ts").alias("sig_ts"),
    )
    order = [
        F.col("ts").asc(),
        F.col("is_left").asc(),  # signup row first at equal ts
        F.coalesce("event_id", "sig_id").asc(),
    ]
    wb = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = left.unionByName(right)
    b_id = F.last("sig_id", ignorenulls=True).over(wb)
    b_ts = F.last("sig_ts", ignorenulls=True).over(wb)
    f_id = F.first("sig_id", ignorenulls=True).over(wf)
    f_ts = F.first("sig_ts", ignorenulls=True).over(wf)
    b_closer = (
        F.col("f_ts").isNull()
        | (
            F.col("b_ts").isNotNull()
            & (
                F.unix_timestamp("ts") - F.unix_timestamp("b_ts")
                <= F.unix_timestamp("f_ts") - F.unix_timestamp("ts")
            )
        )
    )
    return (
        u.select(
            "*",
            b_id.alias("b_id"), b_ts.alias("b_ts"),
            f_id.alias("f_id"), f_ts.alias("f_ts"),
        )
        .filter(F.col("is_left") == 1)
        .select(
            "event_id", "user_id", "ts",
            F.when(b_closer, F.col("b_id")).otherwise(F.col("f_id")).alias("sig_id"),
            F.when(b_closer, F.col("b_ts")).otherwise(F.col("f_ts")).alias("sig_ts"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH sig AS (
      SELECT user_id, ts, MAX(event_id) AS sig_id
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id, ts
    ),
    matched AS (
      SELECT e.event_id, e.user_id, e.ts, s.sig_id, s.ts AS sig_ts
      FROM events e
      ASOF LEFT JOIN sig s ON e.user_id = s.user_id AND s.ts <= e.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN sig_ts >= ts - INTERVAL 1 HOUR THEN sig_id END AS sig_id,
           CASE WHEN sig_ts >= ts - INTERVAL 1 HOUR THEN sig_ts END AS sig_ts
    FROM matched
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: the latest signup at-or-before
    each event counts ONLY if it is within the last hour — the form every
    sensor-alignment and feature-join actually ships (an unboundedly old
    match is usually worse than no match: stale features silently leak
    into training).

    Identical single-shuffle union-tag machinery as join_asof; the
    tolerance is a post-match null-out (cheap scalar), NOT a range join —
    so the 100 TB cost is unchanged.  Mirrors pandas merge_asof's
    ``tolerance=`` parameter."""
    base = join_asof(spark, sf_dir)
    within = F.col("sig_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("sig_id")).alias("sig_id"),
        F.when(within, F.col("sig_ts")).alias("sig_ts"),
    )


@register(
    "join_null_safe_keys",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS k
      FROM orders WHERE o_orderkey < 2000
    ),
    b AS (
      SELECT o_orderkey AS rhs_key,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS k
      FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000
    )
    SELECT a.o_orderkey, b.rhs_key, a.k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    WHERE a.o_orderkey % 97 = 0 AND b.rhs_key % 97 = 0
    """,
)
def join_null_safe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi join (<=>): ordinary join conditions silently drop
    every row whose key is NULL (NULL = NULL is NULL, not true) — the
    trap behind countless 'where did my rows go' bugs when joining on
    nullable business keys.  eqNullSafe makes NULL a first-class joinable
    value; one in seven keys here is NULL, so the NULL↔NULL matches are a
    substantial, hash-checked part of the result (the %97 filter bounds
    the NULL-block blowup).

    Scale: <=> compiles to a plain hash-join key (null-safe comparison is
    still an equi key — plan stays BroadcastHashJoin/SortMergeJoin, no
    nested loop); note a hot NULL key concentrates like any other skewed
    key — salt it if NULLs dominate."""
    o = load(spark, sf_dir, "orders")
    k = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    a = o.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", k.alias("k")
    )
    b = o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 4000)).select(
        F.col("o_orderkey").alias("rhs_key"), k.alias("k2")
    )
    return (
        a.join(b, a.k.eqNullSafe(b.k2))
        .filter((F.col("o_orderkey") % 97 == 0) & (F.col("rhs_key") % 97 == 0))
        .select("o_orderkey", "rhs_key", "k")
    )


@register(
    "join_array_membership",
    oracle="""
    SELECT tok AS term,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    WHERE tok IN ('merge', 'window', 'stream', 'filter', 'query')
    GROUP BY tok
    """,
)
def join_array_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-membership join done the scalable way: EXPLODE the array side
    to rows, then equi-join the term dimension.  The naive formulation —
    ``docs.join(dim, array_contains(docs.tokens, dim.term))`` — has a
    non-equi predicate, so Spark can only plan BroadcastNestedLoopJoin:
    every (doc, term) pair is tested, O(|docs|·|terms|) comparisons with
    the full text array materialized per probe.  Explode+equi-join turns
    membership into a hash lookup: tokens flow through a
    BroadcastHashJoin against the 5-row term dim (map-side, no shuffle),
    and only MATCHING tokens reach the |terms|-key aggregate.

    Scale (100 TB): the explode is a flatMap — no shuffle, no buffering;
    the only shuffle is the final groupBy on ≤|terms| keys with map-side
    partial counts (count + distinct-doc count collapse per partition
    first).  Works unchanged when the dim is too big to broadcast: the
    same plan degrades to a shuffled hash join on the token key, still
    never a nested loop."""
    d = load(spark, sf_dir, "documents")
    terms = ["merge", "window", "stream", "filter", "query"]
    dim = spark.createDataFrame([(t,) for t in terms], "term string")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    return (
        toks.join(F.broadcast(dim), "term")
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )


@register(
    "join_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment || '_v0' AS segment_version,
             DATE '1900-01-01' AS valid_from,
             DATE '1995-01-01' + CAST(c_custkey % 730 AS INTEGER) AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, c_mktsegment || '_v1',
             DATE '1995-01-01' + CAST(c_custkey % 730 AS INTEGER),
             DATE '1995-01-01' + CAST(c_custkey % 730 AS INTEGER) + 730
      FROM customer
      UNION ALL
      SELECT c_custkey, c_mktsegment || '_v2',
             DATE '1995-01-01' + CAST(c_custkey % 730 AS INTEGER) + 730,
             DATE '9999-01-01'
      FROM customer
    )
    SELECT d.segment_version,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS DOUBLE) AS revenue
    FROM orders o
    JOIN dim d ON d.c_custkey = o.o_custkey
              AND CAST(o.o_orderdate AS DATE) >= d.valid_from
              AND CAST(o.o_orderdate AS DATE) < d.valid_to
    GROUP BY d.segment_version
    """,
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of facts against an SCD2 dimension: every order
    joins the dim VERSION that was valid on its order date ([valid_from,
    valid_to) half-open, so version boundaries never double-count) — the
    correctness backbone of any as-was reporting / ML feature pipeline
    (joining today's dim onto historical facts leaks the future).  The
    version history is synthesized per customer (three eras with
    per-customer boundaries) since the fixture dim is versionless;
    scd2_history builds the same shape from real mutations.

    Scale (100 TB): the join key is the EQUI customer key — Spark plans
    a plain hash join (broadcast here; shuffled at scale) and evaluates
    the validity-range predicate as a cheap post-probe filter, since
    version counts per key are small (3 here; rarely >dozens in
    practice).  Never a range-only join — without the equi key this
    degenerates to a nested loop (join_range_binned shows the banded
    fix for that shape).  One fact shuffle, |versions|-key aggregate."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    b1 = F.date_add(
        F.lit("1995-01-01").cast("date"), (F.col("c_custkey") % 730).cast("int")
    )
    far_past = F.lit("1900-01-01").cast("date")
    far_future = F.lit("9999-01-01").cast("date")
    dim = (
        c.select(
            "c_custkey",
            F.explode(
                F.array(
                    F.struct(
                        F.concat(F.col("c_mktsegment"), F.lit("_v0")).alias("sv"),
                        far_past.alias("vf"),
                        b1.alias("vt"),
                    ),
                    F.struct(
                        F.concat(F.col("c_mktsegment"), F.lit("_v1")).alias("sv"),
                        b1.alias("vf"),
                        F.date_add(b1, 730).alias("vt"),
                    ),
                    F.struct(
                        F.concat(F.col("c_mktsegment"), F.lit("_v2")).alias("sv"),
                        F.date_add(b1, 730).alias("vf"),
                        far_future.alias("vt"),
                    ),
                )
            ).alias("v"),
        )
        .select(
            "c_custkey",
            F.col("v.sv").alias("segment_version"),
            F.col("v.vf").alias("valid_from"),
            F.col("v.vt").alias("valid_to"),
        )
    )
    od = F.col("o_orderdate").cast("date")
    j = o.join(
        dim,
        (dim.c_custkey == o.o_custkey)
        & (od >= dim.valid_from)
        & (od < dim.valid_to),
    )
    return j.groupBy("segment_version").agg(
        F.count(F.lit(1)).alias("n_orders"),
        lsum(F.col("o_totalprice")).alias("revenue"),
    )


@register(
    "join_fanout_safe",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, v AS version, c_mktsegment || '_v' || v AS attr
      FROM customer, unnest([0, 1, 2]) AS t(v)
    ),
    latest AS (
      SELECT c_custkey, attr FROM dim WHERE version = 2
    )
    SELECT (SELECT COUNT(*) FROM orders) AS n_facts,
           (SELECT COUNT(*) FROM orders o
              JOIN dim d ON d.c_custkey = o.o_custkey) AS n_naive_rows,
           (SELECT COUNT(*) FROM orders o
              JOIN latest l ON l.c_custkey = o.o_custkey) AS n_safe_rows
    """,
)
def join_fanout_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-fanout hygiene: joining facts against a dimension whose key
    is NOT unique silently multiplies rows (here a 3-version dim triples
    every order — sums/counts downstream inflate 3x with no error
    raised).  The fix is structural: reduce the dim to one row per key
    (latest version — cdc_compact_latest's plan) BEFORE the join, and
    ASSERT the contract by comparing fact count vs joined count.  The op
    returns all three counts; a pipeline would alarm on
    n_safe_rows != n_facts.

    Scale (100 TB): the dedup-before-join order matters twice at scale —
    the naive join shuffles (and bills) 3x the rows, and the dim dedup
    is a |dim|-sized aggregate that runs BEFORE the expensive fact
    shuffle, not after the damage.  Spark cannot infer key uniqueness
    from data; this guard is how you encode it."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    dim = c.select(
        "c_custkey",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("version"),
        "c_mktsegment",
    ).select(
        "c_custkey",
        "version",
        F.concat("c_mktsegment", F.lit("_v"), F.col("version")).alias("attr"),
    )
    latest = dim.filter(F.col("version") == 2).select("c_custkey", "attr")
    n_facts = o.agg(F.count(F.lit(1)).alias("n_facts"))
    n_naive = (
        o.join(dim, o.o_custkey == dim.c_custkey)
        .agg(F.count(F.lit(1)).alias("n_naive_rows"))
    )
    n_safe = (
        o.join(latest, o.o_custkey == latest.c_custkey)
        .agg(F.count(F.lit(1)).alias("n_safe_rows"))
    )
    return n_facts.crossJoin(n_naive).crossJoin(n_safe)


@register(
    "join_ip_range_lookup",
    oracle="""
    WITH ips AS (
      SELECT DISTINCT user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    ranges AS (
      SELECT r AS range_id,
             r * 16777216 + (r % 7) * 1000 AS r_start,
             r * 16777216 + (r % 7) * 1000 + 16777216 - 5000 AS r_end,
             'blk_' || r AS label
      FROM (SELECT unnest(range(0, 256)) AS r)
    ),
    matched AS (
      SELECT i.user_id, rg.label
      FROM ips i
      LEFT JOIN ranges rg
        ON rg.range_id = CAST(FLOOR(i.ip / 16777216) AS BIGINT)
       AND i.ip >= rg.r_start AND i.ip <= rg.r_end
    )
    SELECT COALESCE(label, 'unassigned') AS label, COUNT(*) AS n_ips
    FROM matched
    GROUP BY 1
    """,
)
def join_ip_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP-to-range lookup (the geo-IP / threat-intel enrichment shape):
    assign each address to the non-overlapping [start, end] block that
    contains it.  The naive predicate ``ip BETWEEN start AND end`` is
    non-equi → BroadcastNestedLoopJoin, |ips|×|ranges| probes.  The
    scalable plan derives an EQUI prefix key on BOTH sides — the /8
    bucket floor(ip / 2^24) for the IP, the containing bucket for the
    range — so the match becomes a hash join with the range check as a
    cheap post-probe filter; addresses falling in coverage gaps come
    back 'unassigned' via the left join.

    Ranges spanning multiple buckets are handled by EXPLODING the range
    over its covered buckets (not needed here — the synthetic blocks
    each live inside one bucket; join_range_binned shows the general
    banded variant).

    Scale (100 TB): the range dim (even full GeoIP is ~10M rows)
    broadcasts or shuffles on the bucket key; the IP side is one scan +
    projection; never a nested loop (plan-tested)."""
    ev = load(spark, sf_dir, "events")
    ips = ev.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)).alias("ip"),
    )
    r = F.col("range_id")
    ranges = spark.range(256).select(
        F.col("id").alias("range_id")
    ).select(
        "range_id",
        (r * 16777216 + (r % 7) * 1000).alias("r_start"),
        (r * 16777216 + (r % 7) * 1000 + 16777216 - 5000).alias("r_end"),
        F.concat(F.lit("blk_"), r.cast("string")).alias("label"),
    )
    bucket = F.floor(F.col("ip") / 16777216).cast("long")
    matched = ips.withColumn("bucket", bucket).join(
        F.broadcast(ranges),
        (F.col("range_id") == F.col("bucket"))
        & (F.col("ip") >= F.col("r_start"))
        & (F.col("ip") <= F.col("r_end")),
        "left",
    )
    return matched.groupBy(
        F.coalesce("label", F.lit("unassigned")).alias("label")
    ).agg(F.count(F.lit(1)).alias("n_ips"))


@register(
    "join_record_linkage_scored",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey + 1000000 AS rec_id,
             CASE WHEN c_custkey % 3 = 0 THEN upper(c_name)
                  ELSE c_name END AS name,
             CASE WHEN c_custkey % 4 = 0 THEN ROUND(c_acctbal)
                  ELSE c_acctbal END AS acctbal,
             c_nationkey,
             c_custkey AS true_key
      FROM customer WHERE c_custkey % 7 = 0
    ),
    cand AS (
      SELECT d.rec_id, d.true_key, c.c_custkey,
             (CASE WHEN lower(d.name) = lower(c.c_name) THEN 4 ELSE 0 END
              + CASE WHEN abs(d.acctbal - c.c_acctbal) <= 1.0 THEN 2
                     ELSE 0 END
              + CASE WHEN d.c_nationkey = c.c_nationkey THEN 1
                     ELSE 0 END) AS score
      FROM dirty d
      JOIN customer c ON c.c_nationkey = d.c_nationkey
    ),
    best AS (
      SELECT rec_id, true_key, c_custkey, score,
             ROW_NUMBER() OVER (PARTITION BY rec_id
                                ORDER BY score DESC, c_custkey) AS rk
      FROM cand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN c_custkey = true_key THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(AVG(score), 6) AS avg_best_score
    FROM best WHERE rk = 1 AND score >= 5
    """,
)
def join_record_linkage_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (the Fellegi–Sunter shape): dirty
    records (case-mangled names, rounded balances — synthesized with
    known true keys) matched back to the clean registry by summed
    field-agreement weights (name≈4, balance≈2, nation≈1), best match
    per record above an acceptance threshold — entity resolution with
    an accuracy readout, since the synthetic truth lets the op GRADE
    itself (n_correct / n_records).

    Scale (100 TB): candidates come from BLOCKING on nation (the equi
    key) — never dirty × registry; scoring is codegen arithmetic on
    the blocked pairs and best-match is a per-record window.  Real
    deployments block on several keys (phonetic name + zip), union
    candidates, and learn the weights (EM) — same plan shape.
    join_fuzzy_blocked holds the edit-distance variant;
    dedup_survivorship consumes these links."""
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dirty = c.filter(k % 7 == 0).select(
        (k + 1000000).alias("rec_id"),
        F.when(k % 3 == 0, F.upper("c_name")).otherwise(F.col("c_name")).alias(
            "name"
        ),
        F.when(k % 4 == 0, F.round("c_acctbal")).otherwise(
            F.col("c_acctbal")
        ).alias("acctbal"),
        F.col("c_nationkey").alias("nk"),
        k.alias("true_key"),
    )
    cand = dirty.join(
        c, dirty.nk == c.c_nationkey
    ).select(
        "rec_id",
        "true_key",
        "c_custkey",
        (
            F.when(F.lower("name") == F.lower("c_name"), 4).otherwise(0)
            + F.when(F.abs(F.col("acctbal") - F.col("c_acctbal")) <= 1.0, 2)
            .otherwise(0)
            + F.when(F.col("nk") == F.col("c_nationkey"), 1).otherwise(0)
        ).alias("score"),
    )
    w = Window.partitionBy("rec_id").orderBy(
        F.col("score").desc(), F.col("c_custkey")
    )
    best = cand.select(
        "rec_id", "true_key", "c_custkey", "score",
        F.row_number().over(w).alias("rk"),
    ).filter((F.col("rk") == 1) & (F.col("score") >= 5))
    return best.agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum(F.when(F.col("c_custkey") == F.col("true_key"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(F.avg("score"), 6).alias("avg_best_score"),
    )


@register(
    "join_mark_exists",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l_orderkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
    )
    SELECT o.o_orderkey, o.o_orderstatus,
           CASE WHEN late.l_orderkey IS NULL THEN 0 ELSE 1 END
             AS has_late_shipment
    FROM orders o LEFT JOIN late ON o.o_orderkey = late.l_orderkey
    """,
)
def join_mark_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark join — the operator an `EXISTS(...)` in a SELECT list (as
    opposed to a WHERE clause) compiles to: EVERY left row survives,
    carrying a boolean of whether a match exists, unlike join_semi
    (keeps matches only) or join_anti (keeps non-matches only).  Here
    each order is marked with whether any of its line items shipped
    in the fixture's later half (1998-06 on) — the 'flag, don't filter' shape feature engineering uses
    constantly (has_return, has_support_ticket, ...).

    Scale (100 TB): the mark side reduces to DISTINCT keys before the
    join (digest-sized), so the left join degenerates to semi-join
    traffic plus one boolean column; the distinct pre-aggregate
    map-side combines and AQE broadcasts it when selective."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = (
        li.filter(F.col("l_shipdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp"))
        .select("l_orderkey")
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    return o.join(late, o.o_orderkey == late.l_orderkey, "left").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("_m").isNull(), 0).otherwise(1).alias(
            "has_late_shipment"
        ),
    )


@register(
    "join_basket_containment",
    oracle="""
    WITH wanted AS (
      SELECT unnest(['Brand#13', 'Brand#22']) AS brand
    ),
    matched AS (
      SELECT l.l_orderkey,
             COUNT(DISTINCT p.p_brand) AS n_matched,
             COUNT(*) AS n_matched_lines
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN wanted w ON p.p_brand = w.brand
      GROUP BY l.l_orderkey
    )
    SELECT l_orderkey, n_matched_lines
    FROM matched WHERE n_matched = 2
    """,
)
def join_basket_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-containment (ALL-of) basket join: orders whose line items
    cover EVERY brand in the query set {Brand#13, Brand#22} — the
    'baskets containing both A and B' query behind bundle analysis
    and the relational-division textbook operator, expressed as the
    scalable group-count idiom (match lines against the wanted set,
    require distinct-match count = |set|) instead of k self-joins
    which explode combinatorially as the set grows.

    Scale (100 TB): the wanted set broadcasts into the part join, the
    fact scan reduces to matching lines BEFORE the per-order
    aggregate (map-side combined on orderkey), and |set| changes only
    a literal — same one-shuffle plan for any set size, versus one
    extra self-join per item in the naive form."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    wanted = ["Brand#13", "Brand#22"]
    matched = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(F.col("p_brand").isin(*wanted))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("p_brand").alias("n_matched"),
            F.count(F.lit(1)).alias("n_matched_lines"),
        )
    )
    return matched.filter(F.col("n_matched") == len(wanted)).select(
        "l_orderkey", "n_matched_lines"
    )


@register(
    "join_nearest_numeric",
    oracle="""
    WITH parts AS (
      SELECT p_partkey, p_retailprice AS price FROM part
    ),
    queries AS (
      SELECT o_orderkey, o_totalprice / 100 AS qprice
      FROM orders WHERE o_orderkey % 20 = 0
    ),
    stream AS (
      SELECT price AS v, 0 AS kind, p_partkey AS pid,
             NULL::BIGINT AS oid, NULL::DOUBLE AS qprice
      FROM parts
      UNION ALL
      SELECT qprice, 1, NULL, o_orderkey, qprice FROM queries
    ),
    tagged AS (
      SELECT *,
             LAST_VALUE(CASE WHEN kind = 0 THEN pid END IGNORE NULLS)
               OVER w AS prev_pid,
             LAST_VALUE(CASE WHEN kind = 0 THEN v END IGNORE NULLS)
               OVER w AS prev_price,
             FIRST_VALUE(CASE WHEN kind = 0 THEN pid END IGNORE NULLS)
               OVER w2 AS next_pid,
             FIRST_VALUE(CASE WHEN kind = 0 THEN v END IGNORE NULLS)
               OVER w2 AS next_price
      FROM stream
      WINDOW w AS (ORDER BY v, kind, COALESCE(pid, oid)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (ORDER BY v, kind, COALESCE(pid, oid)
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT oid AS o_orderkey, round(qprice, 6) AS query_price,
           CASE WHEN next_price IS NULL THEN prev_pid
                WHEN prev_price IS NULL THEN next_pid
                WHEN qprice - prev_price <= next_price - qprice
                THEN prev_pid ELSE next_pid END AS matched_partkey,
           round(CASE WHEN next_price IS NULL THEN prev_price
                WHEN prev_price IS NULL THEN next_price
                WHEN qprice - prev_price <= next_price - qprice
                THEN prev_price ELSE next_price END, 6) AS matched_price
    FROM tagged WHERE kind = 1
    """,
)
def join_nearest_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor join on a NUMERIC axis: each query price
    matches the catalog part with the closest retail price —
    join_asof_nearest does this on time; this is the same operator on
    any ordered domain (price matching, sensor calibration lookup,
    percentile table interpolation), built with the union-sort trick:
    both streams interleave in one sorted pass, each query reads the
    last part before it (LAST_VALUE IGNORE NULLS) and the first after
    (the reversed frame), and picks the closer, ties to the lower
    side.  No range fanout, no cross join — two window passes over
    the union.

    Scale (100 TB): the sort is the cost — range-partition by price
    so the union sorts locally per partition, with partition-boundary
    parts replicated one partition over (the standard distributed
    merge-join trick); query and catalog never cartesian."""
    p = load(spark, sf_dir, "part").select(
        F.col("p_retailprice").alias("v"),
        F.lit(0).alias("kind"),
        F.col("p_partkey").alias("pid"),
        F.lit(None).cast("long").alias("oid"),
        F.lit(None).cast("double").alias("qprice"),
    )
    q = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            (F.col("o_totalprice") / 100).alias("v"),
            F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("pid"),
            F.col("o_orderkey").alias("oid"),
            (F.col("o_totalprice") / 100).alias("qprice"),
        )
    )
    stream = p.unionAll(q)
    order = [F.col("v"), F.col("kind"), F.coalesce("pid", "oid")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    # The forward lookup is a REVERSED running frame, not a
    # [current, unboundedFollowing] frame: Spark evaluates
    # first(ignorenulls) over an UnboundedFollowing frame by rescanning
    # the frame per row — O(n²) in the sort order (measured 33 s at
    # sf0.1 on the 27.5k-row union; guide §1.2 "the distributed
    # algorithm").  last(ignorenulls) over the DESC order's running
    # frame visits the identical row set (asc positions ≥ current,
    # current included; NULLS FIRST asc ↔ NULLS LAST desc reverse
    # exactly), evaluates incrementally in O(n), and returns the same
    # value row for row.
    rev = [F.col("v").desc(), F.col("kind").desc(), F.coalesce("pid", "oid").desc()]
    w2 = Window.orderBy(*rev).rowsBetween(Window.unboundedPreceding, 0)
    part_pid = F.when(F.col("kind") == 0, F.col("pid"))
    part_price = F.when(F.col("kind") == 0, F.col("v"))
    tagged = stream.select(
        "kind",
        "oid",
        "qprice",
        F.last(part_pid, ignorenulls=True).over(w).alias("prev_pid"),
        F.last(part_price, ignorenulls=True).over(w).alias("prev_price"),
        F.last(part_pid, ignorenulls=True).over(w2).alias("next_pid"),
        F.last(part_price, ignorenulls=True).over(w2).alias("next_price"),
    )
    prefer_prev = (
        F.col("qprice") - F.col("prev_price")
        <= F.col("next_price") - F.col("qprice")
    )
    return tagged.filter(F.col("kind") == 1).select(
        F.col("oid").alias("o_orderkey"),
        F.round("qprice", 6).alias("query_price"),
        F.when(F.col("next_price").isNull(), F.col("prev_pid"))
        .when(F.col("prev_price").isNull(), F.col("next_pid"))
        .when(prefer_prev, F.col("prev_pid"))
        .otherwise(F.col("next_pid"))
        .alias("matched_partkey"),
        F.round(
            F.when(F.col("next_price").isNull(), F.col("prev_price"))
            .when(F.col("prev_price").isNull(), F.col("next_price"))
            .when(prefer_prev, F.col("prev_price"))
            .otherwise(F.col("next_price")),
            6,
        ).alias("matched_price"),
    )


@register(
    "join_temporal_validity_intersect",
    oracle="""
    WITH ov AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS v_start,
             CAST(o_orderdate AS DATE)
               + CAST(o_orderkey % 30 + 1 AS INTEGER) AS v_end
      FROM orders
    ),
    months AS (
      SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS m
      FROM orders
    ),
    promos AS (
      SELECT m AS promo_start, m + 10 AS promo_end
      FROM months
      WHERE EXTRACT(month FROM m) % 3 = 0
    )
    SELECT o.o_orderkey, o.v_start, o.v_end, p.promo_start,
           GREATEST(o.v_start, p.promo_start) AS ov_start,
           LEAST(o.v_end, p.promo_end) AS ov_end,
           CAST(date_diff('day', GREATEST(o.v_start, p.promo_start),
                          LEAST(o.v_end, p.promo_end)) AS BIGINT)
             AS overlap_days
    FROM ov o JOIN promos p
      ON o.v_start < p.promo_end AND p.promo_start < o.v_end
    """,
)
def join_temporal_validity_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity-interval intersection join: order in-flight windows
    [orderdate, orderdate + synthetic duration) against a promo calendar
    (first 10 days of every third month), emitting the clipped overlap
    span per pair — the SCD2-×-calendar shape behind 'which promo was
    live while this order was open' attribution and bitemporal joins.
    All endpoints are DATEs with integer-day arithmetic (DATE + int stays
    DATE on both engines); the half-open overlap predicate and
    GREATEST/LEAST clipping are identical text.

    Scale (100 TB): the calendar side is tiny and broadcast — the fact
    table never shuffles; for two LARGE interval tables the documented
    plan is the binned-range equi-join (join_range_binned) keyed on
    overlapping month bins, turning the theta join into equi-key."""
    o = load(spark, sf_dir, "orders")
    ov = o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("v_start"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 30 + 1).cast("int"),
        ).alias("v_end"),
    )
    months = o.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).distinct()
    promos = months.filter(F.month("m") % 3 == 0).select(
        F.col("m").alias("promo_start"), F.date_add("m", 10).alias("promo_end")
    )
    j = ov.join(
        F.broadcast(promos),
        (F.col("v_start") < F.col("promo_end"))
        & (F.col("promo_start") < F.col("v_end")),
    )
    ov_start = F.greatest("v_start", "promo_start")
    ov_end = F.least("v_end", "promo_end")
    return j.select(
        "o_orderkey", "v_start", "v_end", "promo_start",
        ov_start.alias("ov_start"),
        ov_end.alias("ov_end"),
        F.datediff(ov_end, ov_start).cast("long").alias("overlap_days"),
    )


@register(
    "join_late_arriving_dim",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_nationkey, c_mktsegment
      FROM customer WHERE c_custkey % 37 <> 0
    ),
    enriched AS (
      SELECT o.o_orderkey, o.o_totalprice,
             COALESCE(d.c_custkey, -1) AS dim_key,
             COALESCE(d.c_mktsegment, 'UNKNOWN') AS segment,
             CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END AS is_late
      FROM orders o LEFT JOIN dim d ON d.c_custkey = o.o_custkey
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(is_late) AS BIGINT) AS n_late_arriving,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM enriched GROUP BY segment
    """,
)
def join_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension handling: facts whose dimension row hasn't
    landed yet (simulated: every 37th customer withheld) are routed to
    the -1 / 'UNKNOWN' surrogate instead of being dropped or stalling
    the load — the inferred-member pattern every warehouse ETL needs so
    revenue totals stay complete while the dim catches up.  The rollup
    reports the UNKNOWN bucket alongside real segments plus the
    late-arriving count per segment (always 0 for real segments, total
    for UNKNOWN — the reconciliation number a backfill job consumes).

    Scale (100 TB): a broadcast-able dim LEFT join (facts never lose
    rows), COALESCE surrogates in the projection, map-side-combined
    rollup.  The backfill pass is the same join run later with the
    arrived dim rows — idempotent because the surrogate is a function of
    NULL-ness, not load order."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    dim = c.filter(F.col("c_custkey") % 37 != 0).select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    cents = (
        F.signum("o_totalprice")
        * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    enriched = o.join(
        dim, o.o_custkey == dim.c_custkey, "left"
    ).select(
        cents.alias("cents"),
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("is_late"),
    )
    return enriched.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("is_late").cast("long").alias("n_late_arriving"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@register(
    "join_match_waterfall",
    oracle="""
    WITH sys_b AS (
      -- the "other system": every 7th key is lost, every 5th name is
      -- case-mangled, so each match rung has real work
      SELECT c_custkey AS b_key,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END
               AS b_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN c_name || '~zz'
                  WHEN c_custkey % 5 = 0 THEN upper(c_name)
                  ELSE c_name END AS b_name,
             c_mktsegment AS b_segment
      FROM customer
    ),
    l1 AS (
      SELECT a.c_custkey, b.b_key, 1 AS level
      FROM customer a JOIN sys_b b ON b.b_custkey = a.c_custkey
    ),
    rest1 AS (
      SELECT * FROM sys_b WHERE b_key NOT IN (SELECT b_key FROM l1)
    ),
    l2 AS (
      SELECT a.c_custkey, b.b_key, 2 AS level
      FROM customer a JOIN rest1 b ON b.b_name = a.c_name
    ),
    rest2 AS (
      SELECT * FROM rest1 WHERE b_key NOT IN (SELECT b_key FROM l2)
    ),
    l3 AS (
      SELECT a.c_custkey, b.b_key, 3 AS level
      FROM customer a JOIN rest2 b ON lower(b.b_name) = lower(a.c_name)
    ),
    matched AS (
      SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(MIN(b_key) AS BIGINT) AS min_key,
           CAST(MAX(b_key) AS BIGINT) AS max_key
    FROM matched GROUP BY level
    UNION ALL
    SELECT 0 AS level,
           CAST(COUNT(*) AS BIGINT), CAST(MIN(b_key) AS BIGINT),
           CAST(MAX(b_key) AS BIGINT)
    FROM sys_b
    WHERE b_key NOT IN (SELECT b_key FROM matched)
    """,
)
def join_match_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfall (cascade) entity matching: records from a second system
    try to match on successively weaker rungs — exact key, exact name,
    case-insensitive name — each rung consuming its matches so a record
    resolves at the STRONGEST rung it can (the standard MDM/identity-
    resolution ladder; join_record_linkage_scored scores candidate
    pairs, this op routes records).  The second system is derived
    deterministically (every 7th key lost, every 5th name case-mangled, every 11th name corrupted beyond the ladder)
    so every rung and the unmatched残 bucket (level 0) all populate.

    Scale (100 TB): each rung is an equi-key hash join; the
    consumed-set exclusion is a left-anti join on the prior rungs'
    keys (NOT IN over a bounded key set — at scale, anti-join the
    rung outputs instead, same plan shape).  The ladder runs k joins
    for k rungs, never a cross product."""
    c = load(spark, sf_dir, "customer")
    sys_b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("b_custkey"),
        F.when(F.col("c_custkey") % 11 == 0, F.concat(F.col("c_name"), F.lit("~zz")))
        .when(F.col("c_custkey") % 5 == 0, F.upper("c_name"))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.col("c_mktsegment").alias("b_segment"),
    )
    a = c.select("c_custkey", "c_name")
    l1 = sys_b.join(a, sys_b.b_custkey == a.c_custkey).select(
        "c_custkey", "b_key", F.lit(1).alias("level")
    )
    rest1 = sys_b.join(l1.select("b_key"), "b_key", "left_anti")
    l2 = rest1.join(a, rest1.b_name == a.c_name).select(
        "c_custkey", "b_key", F.lit(2).alias("level")
    )
    rest2 = rest1.join(l2.select("b_key"), "b_key", "left_anti")
    l3 = rest2.join(a, F.lower(rest2.b_name) == F.lower(a.c_name)).select(
        "c_custkey", "b_key", F.lit(3).alias("level")
    )
    matched = l1.unionByName(l2).unionByName(l3)
    unmatched = sys_b.join(matched.select("b_key"), "b_key", "left_anti")
    summary = matched.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.min("b_key").cast("long").alias("min_key"),
        F.max("b_key").cast("long").alias("max_key"),
    )
    un = unmatched.agg(
        F.lit(0).alias("level"),
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.min("b_key").cast("long").alias("min_key"),
        F.max("b_key").cast("long").alias("max_key"),
    )
    return summary.unionByName(un)


@register(
    "join_fx_asof_convert",
    oracle="""
    WITH months AS (
      SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS m
      FROM orders
    ),
    rates AS (
      SELECT m,
             CAST(1000000 + ((EXTRACT(year FROM m) * 12
                   + EXTRACT(month FROM m)) % 7) * 10000 AS BIGINT)
               AS rate_micro
      FROM months
    )
    SELECT o.o_orderkey,
           CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m,
           r.rate_micro,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS usd_cents,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * r.rate_micro
             // 1000000 AS fx_cents
    FROM orders o
    JOIN rates r ON r.m = CAST(date_trunc('month', o.o_orderdate) AS DATE)
    """,
)
def join_fx_asof_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency conversion against a monthly rate table: each order
    converts at its order month's rate — the effective-dated lookup
    every multi-currency ledger runs (the general as-of machinery lives
    in the join_asof family; month-granular rates make it an exact
    equi-join on the truncated month, the common production shortcut).
    Rates are exact integer micro-units (1.00–1.06 cycling
    deterministically by month index) and conversion is integer
    multiply-then-floor-divide — cent-exact, no float drift, auditable.

    Scale (100 TB): the rate table is |months| rows broadcast; facts
    never shuffle.  Daily rates swap the equi-join for join_asof's
    backward match, same shape."""
    o = load(spark, sf_dir, "orders")
    m = F.date_trunc("month", "o_orderdate").cast("date")
    months = o.select(m.alias("m")).distinct()
    rates = months.select(
        "m",
        (
            F.lit(1000000)
            + ((F.year("m") * 12 + F.month("m")) % 7) * 10000
        ).cast("long").alias("rate_micro"),
    )
    cents = (
        F.signum("o_totalprice")
        * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    return (
        o.select("o_orderkey", m.alias("m"), cents.alias("usd_cents"))
        .join(F.broadcast(rates), "m")
        .select(
            "o_orderkey", "m", "rate_micro", "usd_cents",
            F.expr("usd_cents * rate_micro DIV 1000000").alias("fx_cents"),
        )
    )
