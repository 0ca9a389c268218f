"""Time-series operators over the events table — hypertable-style rollups
and gap filling (the continuous-aggregate surface of a streaming warehouse).

Scale notes: gap filling generates the hour spine from the *aggregated*
min/max (one row), never by exploding per-event; the multi-grain rollup is
one scan + one grouping-sets aggregate instead of three passes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..exprs import fp_scaled_long, fp_split_sum_of, lsum, sql_lsum
from ..registry import register
from ..tables import load


@register(
    "ts_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT s.hour, t.event_type, COALESCE(c.n, 0) AS n_events
    FROM spine s CROSS JOIN types t
    LEFT JOIN counts c ON c.hour = s.hour AND c.event_type = t.event_type
    """,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event_type with zero-filled gaps: the
    continuous-aggregate shape (resample + fill) used for dashboards and
    ML feature grids.  The hour spine comes from sequence() over the global
    min/max (a 1-row aggregate, broadcast to the join) — spine size is
    O(hours), independent of event count."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["hour", "event_type"], "left")
        .select("hour", "event_type", F.coalesce("n", F.lit(0)).alias("n_events"))
    )


@register(
    "ts_ohlc",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 20, '0')) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 20, '0')) AS close,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event_type — the classic
    time-series downsampling shape.  open/close use ``min_by``/``max_by``
    over a (ts, event_id) struct so ties on ts break deterministically on
    the unique event_id (SURVEY §7.4 rule 2); values are raw doubles (no
    arithmetic → bit-exact across engines).  DuckDB 1.0's arg_min can't
    take a struct key, so the oracle uses a zero-padded decimal string
    (epoch_us ‖ event_id) — order-equivalent to the struct because both
    fields are non-negative and fixed-width.

    Scale: one hash-aggregate pass, shuffle keyed on (hour, event_type) —
    partial min_by/max_by combine map-side, so shuffle volume is
    O(groups), not O(events), at any table size."""
    ev = load(spark, sf_dir, "events")
    # NULL-masked key: a NULL tick is not a price — open/close must come
    # from the first/last OBSERVED value, exactly as DuckDB's arg_min/
    # arg_max skip NULL values (Spark's min_by alone would return a NULL
    # close whenever the bar's last tick happens to be NULL)
    key = F.when(
        F.col("value").isNotNull(), F.struct("ts", "event_id")
    )
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "ts_rollup_multi",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           date_part('hour', ts) AS hour_of_day,
           grouping(date_part('hour', ts)) AS g_hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE), date_part('hour', ts))
    """,
)
def ts_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup: (day, hour) → (day) → (total)
    in ONE grouping-sets pass — the batch equivalent of maintaining hourly
    + daily + total continuous aggregates."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hour_of_day"),
        "user_id",
    )
    return ev.rollup("day", "hour_of_day").agg(
        F.grouping("hour_of_day").cast("int").alias("g_hour"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    ).select("day", "hour_of_day", "g_hour", "n_events", "n_users")


@register(
    "ts_locf",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_value
      FROM events GROUP BY 1, 2
    )
    SELECT s.hour, t.event_type,
           last_value(h.avg_value IGNORE NULLS) OVER (
             PARTITION BY t.event_type ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf_value
    FROM spine s CROSS JOIN types t
    LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
    """,
)
def ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill resample (last observation carried forward): dense
    hourly grid per event_type where silent hours inherit the most recent
    hourly average — the standard ML-feature / sensor-data imputation.

    Scale: the window runs over the DENSE SPINE (O(hours x types) rows,
    independent of event count), not raw events — the expensive part stays
    a map-side-combined hourly aggregate; leading NULLs (hours before a
    type's first observation) stay NULL by definition."""
    from pyspark.sql import Window

    from ..exprs import davg, round6

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(round6(davg(F.col("value"))).alias("avg_value"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.last("avg_value", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


@register(
    "ts_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_value
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT s.hour, t.event_type, h.avg_value,
             last_value(h.avg_value IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN h.avg_value IS NOT NULL THEN s.hour END
                        IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             first_value(h.avg_value IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY s.hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN h.avg_value IS NOT NULL THEN s.hour END
                         IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY s.hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM spine s CROSS JOIN types t
      LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
    )
    SELECT hour, event_type,
           CASE
             WHEN avg_value IS NOT NULL THEN avg_value
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               round(pv + (nv - pv)
                     * (CAST(epoch(hour) - epoch(ph) AS DOUBLE)
                        / CAST(epoch(nh) - epoch(ph) AS DOUBLE)), 6)
             ELSE NULL
           END AS interp_value
    FROM grid
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (time-weighted) interpolation on the dense hourly grid per
    event_type: silent hours get the value lerped between the previous and
    next observed hours; hours outside the observed range stay NULL (no
    extrapolation).  Completes the imputation trio zero-fill (ts_gapfill) /
    step (ts_locf) / linear (this op).

    Scale: identical spine discipline to ts_locf — the two carry-windows
    run over O(hours x types) spine rows, never raw events, and the lerp
    is pure per-row arithmetic.  Both engines evaluate the SAME double
    expression shape (pv + (nv-pv)*frac, then round 6) so results are
    bit-deterministic."""
    from pyspark.sql import Window

    from ..exprs import davg, round6

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(round6(davg(F.col("value"))).alias("avg_value"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("avg_value").isNotNull(), F.col("hour"))
    grid = (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            "avg_value",
            F.last("avg_value", ignorenulls=True).over(wp).alias("pv"),
            F.last(obs_hour, ignorenulls=True).over(wp).alias("ph"),
            F.first("avg_value", ignorenulls=True).over(wn).alias("nv"),
            F.first(obs_hour, ignorenulls=True).over(wn).alias("nh"),
        )
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    return grid.select(
        "hour",
        "event_type",
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.round(F.col("pv") + (F.col("nv") - F.col("pv")) * frac, 6),
        )
        .alias("interp_value"),
    )


@register(
    "ts_zscore_outliers",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             CAST(SUM(CAST(value AS DECIMAL(28,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS roll_sum,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6)) * CAST(value AS DECIMAL(28,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS roll_sumsq
      FROM events
    )
    SELECT event_id, user_id, ts, value,
           ROUND((value - roll_sum / n)
                 / sqrt((roll_sumsq - roll_sum * roll_sum / n) / (n - 1)), 4)
             AS zscore
    FROM w
    WHERE n >= 5
      AND (roll_sumsq - roll_sum * roll_sum / n) / (n - 1) > 1e-12
    """,
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score per user over the trailing 20 events — the
    monitoring/anomaly primitive (flag readings far from the recent local
    distribution).  Frames shorter than 5 rows and near-zero variances are
    excluded (z undefined / numerically meaningless).

    Determinism (SURVEY §7.4): the rolling mean and variance are
    FORMULATED identically on both sides — decimal-exact frame sums for
    Σx and Σx², then one double conversion and the textbook
    (Σx² − (Σx)²/n)/(n−1) — instead of each engine's own windowed
    STDDEV (whose internal accumulation order differs); z rounds to 4dp.
    Tie-break (ts, event_id) is unique per user.

    Scale: one shuffle on user_id shared by all three frames (a single
    Window node), then per-partition sorted sliding sums — the same
    single-exchange shape as win_running; never a self-join."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    dec = F.col("value").cast("decimal(28,6)")
    roll_sum = F.sum(dec).over(w).cast("double")
    roll_sumsq = F.sum(dec * dec).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    var = (roll_sumsq - roll_sum * roll_sum / n) / (n - 1)
    z = F.round((F.col("value") - roll_sum / n) / F.sqrt(var), 4)
    return (
        ev.select("event_id", "user_id", "ts", "value",
                  n.alias("n"), var.alias("var"), z.alias("zscore"))
        .filter((F.col("n") >= 5) & (F.col("var") > 1e-12))
        .select("event_id", "user_id", "ts", "value", "zscore")
    )


@register(
    "ts_ewma",
    oracle="""
    WITH framed AS (
      SELECT event_id, user_id, ts, value,
             list_filter(
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
               x -> x IS NOT NULL) AS obs
      FROM events
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN len(obs) = 0 THEN NULL
                ELSE ROUND(list_reduce(obs, (a, x) -> a * 0.8 + x * 0.2), 6)
           END AS ewma
    FROM framed
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 0.2) per user over
    the trailing 50 events — the smoothing primitive behind monitoring
    dashboards and drift detectors.  The 50-row truncation bounds the
    frame (the dropped history's weight is 0.8^50 ~ 1e-5) and makes the
    recursion a pure windowed fold instead of an unbounded scan.

    Determinism: both engines collect the SAME ordered frame (unique
    (ts, event_id) tie-break) and fold it left with the SAME lambda
    (seed = first element, acc*0.8 + x*0.2) — Spark `aggregate` over the
    frame's collect_list, DuckDB `list_reduce` over the windowed list().
    Identical IEEE operation order → identical doubles; round(6) on both.

    Scale: one shuffle on user_id, per-partition sort, O(50) state per
    row — the win_running shape with a bounded frame.  (A true unbounded
    EWMA is inherently sequential per key; the applyInPandas route covers
    that need — this op is the JVM-only bounded formulation.)"""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, 0)
    )
    # collect_list SKIPS NULL values, so the fold runs over the frame's
    # OBSERVED ticks only (a NULL reading does not move the average) —
    # the oracle list_filters to the same sequence.  try_element_at: a
    # frame whose ticks are ALL NULL has no seed -> ewma NULL, not an
    # ANSI index error.
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.try_element_at(vals, F.lit(1)),
        lambda acc, x: acc * F.lit(0.8) + x * F.lit(0.2),
    )
    return ev.select(
        "event_id", "user_id", "ts", "value", F.round(ewma, 6).alias("ewma")
    )


@register(
    "ts_seasonality_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT isodow(d) AS dow, COUNT(*) AS n_days,
             CAST(SUM(n) AS DOUBLE) / COUNT(*) AS dow_avg
      FROM daily GROUP BY 1
    ),
    overall AS (
      SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS all_avg FROM daily
    )
    SELECT dow, n_days,
           ROUND(dow_avg, 6) AS dow_avg,
           ROUND(dow_avg / all_avg, 6) AS seasonal_index
    FROM stats CROSS JOIN overall
    """,
)
def ts_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: each weekday's average daily event
    count relative to the overall daily average (index > 1 = busy day) —
    the first decomposition every forecasting pipeline computes.

    Integer day counts aggregate exactly; the two averages divide once as
    doubles with identical formulation, rounded 6dp.  Scale: one daily
    rollup (|days| rows) then 7-row statistics — input size only touches
    the first aggregate, which is map-side combined."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy((F.weekday("d") + 1).alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("dow_avg"),
    )
    overall = daily.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("all_avg")
    )
    return stats.crossJoin(F.broadcast(overall)).select(
        "dow",
        "n_days",
        F.round("dow_avg", 6).alias("dow_avg"),
        F.round(F.col("dow_avg") / F.col("all_avg"), 6).alias("seasonal_index"),
    )


@register(
    "ts_inflight_orders",
    oracle="""
    WITH deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS d, +1 AS delta FROM orders
      UNION ALL
      SELECT CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 + 1 AS INTEGER), -1 FROM orders
    ),
    daily AS (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY d
    )
    SELECT d, net,
           CAST(SUM(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS in_flight
    FROM daily
    """,
)
def ts_inflight_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-in-flight timeline via the DIFFERENCE-ARRAY sweep: each
    order contributes +1 at open and -1 at close (close = open +
    1..30 days, derived deterministically from the key since the fixture
    has no ship date), daily net deltas aggregate map-side, and a
    cumulative sum over DATES yields the concurrent-open count — the
    interval-stabbing query (active sessions / open tickets / concurrent
    jobs) WITHOUT joining every day against every interval.

    Scale: the expensive part is the per-date delta aggregate
    (|orders| rows in, |dates| rows out, map-side combined).  The final
    cumulative window IS a global ordering — over the DATE axis, whose
    cardinality is bounded (~2,400 here; a century of days is 36,525
    rows), so the single-task window is a non-issue at any fact-table
    size; integer deltas make the running sum exact."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    opens = o.select(d.alias("d"), F.lit(1).alias("delta"))
    closes = o.select(
        F.date_add(d, (F.col("o_orderkey") % 30 + 1).cast("int")).alias("d"),
        F.lit(-1).alias("delta"),
    )
    daily = opens.unionByName(closes).groupBy("d").agg(
        F.sum("delta").alias("net")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d", "net", F.sum("net").over(w).cast("long").alias("in_flight")
    )


@register(
    "ts_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + CAST(FLOOR(value) AS BIGINT) AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                  THEN 1 ELSE 0 END AS new_island,
             event_id
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS s0, MAX(e) AS e1
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(e1 - s0) AS BIGINT) AS covered_s
    FROM merged
    GROUP BY user_id
    """,
)
def ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user intervals (interval union): each event
    opens a span of ``floor(value)`` seconds; overlapping/touching spans
    coalesce into islands and the op reports, per user, how many disjoint
    intervals remain and how many seconds they cover — the gaps-and-
    islands sweep behind session stitching, SLA uptime, and machine-
    utilization queries.

    Algorithm (one pass, no self-join): sort each user's intervals by
    start; an interval begins a NEW island iff its start exceeds the
    running max end of all earlier intervals (window max over the
    preceding frame); the running sum of those flags numbers the islands;
    a groupBy (user, island) then min(start)/max(end) materializes the
    merged spans.  The naive alternative — self-join on overlap — is
    O(n²) per user and unplannable as an equi-join.

    Determinism: ordering is total (s, e, event_id), and all arithmetic
    is integer seconds (unix_timestamp floors; DuckDB FLOOR(epoch)
    matches; duration uses FLOOR not CAST because DuckDB CAST
    double→BIGINT rounds while Spark's truncates).

    Scale (100 TB): ONE hashpartitioning(user_id) exchange feeds both
    windows and the island groupBy (same key prefix — Catalyst reuses
    the sort); per-user data never leaves its partition, there is no
    global sort, and output is |users| rows.  A pathological single-user
    skew is bounded by that user's event count, the same bound the
    self-join formulation would hit quadratically."""
    e = load(spark, sf_dir, "events")
    s = F.unix_timestamp("ts")
    iv = e.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + F.floor("value").cast("long")).alias("e"),
    )
    order = [F.col("s"), F.col("e"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("e").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("e1") - F.col("s0")).alias("covered_s"),
    )


@register(
    "ts_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events
      GROUP BY 1
    ),
    pred AS (
      SELECT d, v,
             LAG(v, 7) OVER (ORDER BY d) AS forecast
      FROM daily
    )
    SELECT COUNT(*) AS n_days,
           round(CAST(SUM(CAST(ROUND(abs(v - forecast) * 1000000) AS BIGINT))
                 AS DOUBLE) / 1000000 / COUNT(*), 6) AS mae,
           round(CAST(SUM(CAST(ROUND(abs(v - forecast) * 1000000) AS BIGINT))
                 AS DOUBLE) / 1000000
                 / (CAST(SUM(CAST(ROUND(abs(v) * 1000000) AS BIGINT))
                    AS DOUBLE) / 1000000), 6) AS wape
    FROM pred
    WHERE forecast IS NOT NULL
    """,
)
def ts_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's total as the
    value 7 days earlier (the same-weekday-last-week baseline every
    forecasting effort must beat) and score MAE and WAPE over the
    history — the sanity benchmark that decides whether a model earns
    its complexity.  LAG(7) assumes a dense daily spine (true here; gaps
    need ts_gapfill first).

    Determinism: daily totals and all error sums are fixed-point
    (multiples of 1e-6 via round-to-long), so both engines divide
    identical doubles; only the final ratios round.

    Scale (100 TB): facts collapse to |days| rows map-side; the LAG and
    the error aggregate run over that bounded spine in one task — the
    bounded-axis argument (ts_inflight_orders).  Backtesting a model
    per key (per SKU/store) partitions the same plan by key."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    w = Window.orderBy("d")
    pred = daily.select(
        "d", "v", F.lag("v", 7).over(w).alias("forecast")
    ).filter(F.col("forecast").isNotNull())
    # error/total sums run over the |days| spine but each row is a
    # scale-proportional DAILY TOTAL (~5e16 micro-units at 100 TB), so a
    # single long Σ clears 2^63 around 180 days — hi/lo split sums
    err6 = fp_split_sum_of(
        (F.abs(F.col("v") - F.col("forecast")) * 1e6 + 0.5).cast("long")
    ).cast("double") / 1e6
    tot6 = fp_split_sum_of(
        (F.abs(F.col("v")) * 1e6 + 0.5).cast("long")
    ).cast("double") / 1e6
    return pred.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(err6 / F.count(F.lit(1)), 6).alias("mae"),
        F.round(err6 / tot6, 6).alias("wape"),
    )


@register(
    "ts_rolling_active_users",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    covered AS (
      SELECT DISTINCT user_id, d + k AS cover_d
      FROM active, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(k)
    ),
    spine AS (
      SELECT DISTINCT d FROM active
    )
    SELECT s.d, COUNT(*) AS wau
    FROM spine s JOIN covered c ON c.cover_d = s.d
    GROUP BY s.d
    """,
)
def ts_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU per day) — the engagement curve
    DAU alone understates.  Rolling COUNT(DISTINCT) has no efficient
    window form (distinct state can't slide), so this uses the standard
    COVER expansion: each (user, active-day) pair contributes membership
    to the 7 days it keeps the user 'active' for, then a plain distinct
    + count per day — turning an unmergeable rolling distinct into two
    ordinary shuffles with a bounded 7× blow-up of the (user, day)
    DEDUPED activity set (not of raw events).

    The day spine is restricted to observed activity days (first 6 days
    correctly count partial windows; trailing days beyond the last
    event are not reported).

    Scale (100 TB): raw events collapse to |users|×|days| first; the ×7
    explode and second distinct shuffle that bounded set; the final
    count is |days| keys.  For 30/90-day windows at extreme user
    counts, switch to mergeable HLL sketches per day and union them
    (agg_hll_merge's shape) at ~2% error."""
    ev = load(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    covered = (
        active.select(
            "user_id",
            F.explode(F.array(*[F.lit(k) for k in range(7)])).alias("k"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("k")).alias("cover_d"))
        .distinct()
    )
    spine = active.select("d").distinct()
    return (
        spine.join(covered, spine.d == covered.cover_d)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("wau"))
    )


@register(
    "ts_local_peaks",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events
      GROUP BY 1
    ),
    flagged AS (
      SELECT d, v,
             LAG(v) OVER (ORDER BY d) AS prev_v,
             LEAD(v) OVER (ORDER BY d) AS next_v
      FROM daily
    )
    SELECT d, v, round(v - (prev_v + next_v) / 2, 6) AS prominence
    FROM flagged
    WHERE v > prev_v AND v > next_v
    """,
)
def ts_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection on the daily total series: a day is a peak
    iff it STRICTLY exceeds both neighbors (plateaus are not peaks;
    boundary days have a NULL neighbor, and NULL comparisons are not
    true, so they are correctly excluded) — the spike detector behind
    'what happened on the 14th' alerting, reported with a simple
    prominence score (height above the neighbor midpoint).

    Scale (100 TB): facts collapse to the |days| spine map-side; the
    lag/lead window runs over that bounded axis in one task
    (ts_inflight_orders' argument).  Per-key peak detection (per SKU /
    per sensor) is the same plan with the window partitioned by key."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    w = Window.orderBy("d")
    flagged = daily.select(
        "d",
        "v",
        F.lag("v").over(w).alias("prev_v"),
        F.lead("v").over(w).alias("next_v"),
    )
    return flagged.filter(
        (F.col("v") > F.col("prev_v")) & (F.col("v") > F.col("next_v"))
    ).select(
        "d",
        "v",
        F.round(
            F.col("v") - (F.col("prev_v") + F.col("next_v")) / 2, 6
        ).alias("prominence"),
    )


@register(
    "ts_window_custom_origin",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR((FLOOR(epoch(ts)) - 1800) / 3600) AS BIGINT) AS bucket,
             value
      FROM events
    )
    SELECT event_type,
           bucket * 3600 + 1800 AS window_start_s,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE)
                / 1000000 AS DOUBLE) AS total
    FROM b
    GROUP BY 1, 2
    """,
)
def ts_window_custom_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows with a NON-DEFAULT origin: 1-hour buckets
    anchored at :30 past the hour (Spark ``window(ts, '1 hour', '1
    hour', '30 minutes')``) — the offset parameter everyone discovers
    the hard way when business windows start at 9:30 market open or a
    22:00 log-rotation boundary, not at midnight UTC.  The oracle pins
    the EXACT semantics in integer arithmetic: bucket =
    floor((epoch − offset) / slide), window_start = bucket·slide +
    offset — which is precisely what Spark's window() computes.

    Scale (100 TB): windowing is a pure projection (no Spark-side
    session/gap state for tumbling); the aggregate is map-side combined
    on (type, bucket) — identical cost to any groupBy; in streaming the
    same expression drives watermark-tracked incremental state."""
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "1 hour", "30 minutes")
    return (
        ev.groupBy("event_type", win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            lsum(F.col("value")).alias("total"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n",
            "total",
        )
    )


@register(
    "ts_change_point_simple",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
               AS v6
      FROM events GROUP BY 1
    ),
    pref AS (
      SELECT d, v6,
             SUM(v6) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS s6,
             ROW_NUMBER() OVER (ORDER BY d) AS t,
             SUM(v6) OVER () AS total6,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    scored AS (
      SELECT d AS split_day,
             s6 / 1000000.0 / t AS mean_left,
             (total6 - s6) / 1000000.0 / (n - t) AS mean_right
      FROM pref WHERE t < n
    )
    SELECT split_day,
           round(mean_left, 6) AS mean_left,
           round(mean_right, 6) AS mean_right,
           round(abs(mean_right - mean_left), 6) AS shift
    FROM scored
    ORDER BY abs(mean_right - mean_left) DESC, split_day ASC
    LIMIT 1
    """,
)
def ts_change_point_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection on the daily series: the split that
    maximizes the before/after mean gap — the 'when did behavior
    actually change' primitive behind deploy-impact and incident
    retrospectives (a binary-segmentation step; recurse on each side for
    multiple change points).  Every candidate split is scored from ONE
    prefix-sum pass: mean_left = S_t/t, mean_right = (S−S_t)/(n−t) —
    never n separate re-aggregations.

    Determinism: prefix sums accumulate fixed-point LONGS (exact);
    scores are identical double ratios; the argmax tie-breaks on the
    earlier day.

    Scale (100 TB): facts collapse to the |days| spine map-side; the
    prefix windows and Take(1) run over that bounded axis — the
    ts_inflight_orders argument.  Per-metric change points partition
    the same plan by key."""
    ev = load(spark, sf_dir, "events")
    # per-day cells sum ALL of events — hi/lo split (exact decimal); the
    # prefix/total window sums below then run over decimals, exact by
    # themselves
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        fp_split_sum_of(
            fp_scaled_long(F.col("value"), 1_000_000)
        ).alias("v6")
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    pref = daily.select(
        "d",
        F.sum("v6").over(wc).alias("s6"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
        F.sum("v6").over(wall).alias("total6"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    scored = pref.filter(F.col("t") < F.col("n")).select(
        F.col("d").alias("split_day"),
        (F.col("s6") / 1e6 / F.col("t")).alias("mean_left"),
        (
            (F.col("total6") - F.col("s6")) / 1e6 / (F.col("n") - F.col("t"))
        ).alias("mean_right"),
    )
    shift = F.abs(F.col("mean_right") - F.col("mean_left"))
    return (
        scored.orderBy(shift.desc(), F.col("split_day").asc())
        .limit(1)
        .select(
            "split_day",
            F.round("mean_left", 6).alias("mean_left"),
            F.round("mean_right", 6).alias("mean_right"),
            F.round(shift, 6).alias("shift"),
        )
    )


@register(
    "ts_control_chart_xmr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    mr AS (
      SELECT d, v, abs(v - LAG(v) OVER (ORDER BY d)) AS moving_range
      FROM daily
    ),
    lim AS (
      SELECT AVG(v) AS xbar, AVG(moving_range) AS mrbar
      FROM mr WHERE moving_range IS NOT NULL
    )
    SELECT m.d, m.v,
           round(l.xbar, 6) AS center,
           round(l.xbar + 2.66 * l.mrbar, 6) AS ucl,
           round(l.xbar - 2.66 * l.mrbar, 6) AS lcl,
           CASE WHEN m.v > l.xbar + 2.66 * l.mrbar
                  OR m.v < l.xbar - 2.66 * l.mrbar
                THEN 1 ELSE 0 END AS out_of_control
    FROM mr m CROSS JOIN lim l
    """,
)
def ts_control_chart_xmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals + moving range) control chart over the daily
    series: center line x̄, control limits x̄ ± 2.66·m̄R (the Shewhart
    individuals constant), and a per-day out-of-control flag — SPC's
    answer to 'is this variation noise or a signal', which thresholds
    tuned by eye never answer consistently.  The moving range (|vₜ −
    vₜ₋₁|) estimates short-term variation, so slow drifts still trip the
    limits.

    Determinism: daily values are fixed-point; x̄/m̄R divide exact sums
    by counts, the limit arithmetic is formulated identically on both
    sides, and only displayed columns round — the flag compares the
    UNROUNDED doubles in both engines.

    Scale (100 TB): facts → |days| spine map-side; LAG and the 1-row
    limit aggregate run on the bounded axis and broadcast back — per-
    metric charts partition the same plan by key."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    w = Window.orderBy("d")
    mr = daily.select(
        "d", "v", F.abs(F.col("v") - F.lag("v").over(w)).alias("moving_range")
    )
    lim = mr.filter(F.col("moving_range").isNotNull()).agg(
        F.avg("v").alias("xbar"), F.avg("moving_range").alias("mrbar")
    )
    ucl = F.col("xbar") + 2.66 * F.col("mrbar")
    lcl = F.col("xbar") - 2.66 * F.col("mrbar")
    return mr.crossJoin(F.broadcast(lim)).select(
        "d",
        "v",
        F.round("xbar", 6).alias("center"),
        F.round(ucl, 6).alias("ucl"),
        F.round(lcl, 6).alias("lcl"),
        F.when((F.col("v") > ucl) | (F.col("v") < lcl), 1)
        .otherwise(0)
        .alias("out_of_control"),
    )


@register(
    "ts_activity_heatmap_dow_hour",
    oracle="""
    SELECT dayofweek(CAST(ts AS DATE)) AS dow0,
           CAST(date_part('hour', ts) AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_activity_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity grid — the on-call/staffing
    heatmap ('when do users actually show up'), and the base rate that
    anomaly thresholds (ts_zscore_outliers, ts_control_chart_xmr)
    should be conditioned on before paging anyone at 3am Sunday for
    being quieter than 3pm Tuesday.  Day-of-week uses the explicit
    0=Sunday normalization (Spark dayofweek−1 ≡ DuckDB dayofweek —
    fn_calendar_dim's rule).

    Scale (100 TB): one aggregate, ≤168 keys, map-side combined; the
    distinct-user count is the only shuffle-weight term (user ids per
    cell) — swap in approx_count_distinct for a sketch-width shuffle
    when exactness stops mattering."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow0"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "ts_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             dayofweek(CAST(ts AS DATE)) AS dow,
             CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS HUGEINT)
               AS m
      FROM events GROUP BY 1, 2
    ),
    per_dow AS (
      SELECT dow,
             CAST(COUNT(*) AS HUGEINT) AS n_d,
             SUM(m) AS s_d,
             SUM(m * m) AS q_d
      FROM daily GROUP BY dow
    ),
    terms AS (
      SELECT n_d, s_d, q_d,
             (n_d * q_d - s_d * s_d) // n_d AS t_d
      FROM per_dow
    ),
    tot AS (
      SELECT CAST(SUM(n_d) AS HUGEINT) AS n,
             SUM(s_d) AS s, SUM(q_d) AS q, SUM(t_d) AS r
      FROM terms
    ),
    conv AS (
      -- hi/lo 2^32-split int->double conversion: DuckDB's native
      -- HUGEINT->DOUBLE is NOT correctly rounded above 2^53 (1-ulp
      -- splits vs Spark); both halves are < 2^53 so their casts are
      -- exact on any engine, and the one final + rounds correctly
      SELECT n,
             CAST((n * q - s * s) // 4294967296 AS DOUBLE) * 4294967296.0
               + CAST((n * q - s * s) % 4294967296 AS DOUBLE) AS tot_dbl,
             CAST(r // 4294967296 AS DOUBLE) * 4294967296.0
               + CAST(r % 4294967296 AS DOUBLE) AS res_dbl
      FROM tot
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           tot_dbl / CAST(n AS DOUBLE) / 1e12 AS ss_total,
           res_dbl / 1e12 AS ss_residual,
           round(1.0 - (res_dbl / 1e12)
                 / NULLIF(tot_dbl / CAST(n AS DOUBLE) / 1e12, 0), 6)
             AS seasonality_r2
    FROM conv
    """,
)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How seasonal is this series, as ONE number: the R² of the
    day-of-week-means model — the share of daily variance explained by
    which weekday it is (0 = no weekly rhythm; near 1 = the weekday IS
    the value).  ts_seasonality_dow shows the profile; this op scores
    whether that profile matters enough to build into forecasts and
    anomaly baselines (ts_seasonal_naive_backtest, heatmap
    conditioning).

    Determinism (rebuilt r11, near-cliff probe): the former
    round(SUM(pow(v-mu,2)), 6) was a FLOAT sum over days (summation
    order engine-dependent, the round already at 3.5e8 at sf0.1 —
    crossing the ~5e8 engine-split cliff within one 2× growth step).
    Now pure integer arithmetic on exact micro-units m: per dow,
    n·Σ(m−μ)² == n·Σm² − (Σm)² exactly, so SS_residual is
    Σ_dow floor((n_d·q_d − s_d²) ÷ n_d) in decimal(38,0)/HUGEINT
    (numerators are Cauchy-Schwarz-nonnegative, so truncating DIV ==
    flooring //) — each display is a deterministic function of exact
    integers.  The final int→double conversions go through a hi/lo
    2^32-split reconstruction (r11 finding: DuckDB's 128-bit→double
    cast is NOT correctly rounded above 2^53 — 1-ulp splits vs Spark's
    BigDecimal conversion; two exact sub-2^53 halves + one rounded add
    are correctly rounded on both engines, deterministic to 2^85).
    Exactness bounds: decimal(38,0) squares hold to ~$6e10/day series
    at 36.5k days (loud ANSI abort beyond, never a silent split); the
    sub-micro² floor truncation is ≤ 7 micro² total.

    Scale (100 TB): facts collapse to |days| rows map-side; the per-dow
    and global closed forms are plain groupBy reductions on that
    bounded axis (the former two window passes are gone).  Fully
    mergeable — the same decomposition per key (per store/SKU)
    partitions the plan."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        # grouping key only (never output): Spark 1=Sunday vs DuckDB
        # 0=Sunday is a bijection, so per-dow terms agree
        F.dayofweek(F.col("ts").cast("date")).alias("dow"),
    ).agg(
        fp_split_sum_of(fp_scaled_long(F.col("value"), 1_000_000)).alias("m")
    )
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("m").alias("s_d"),
        F.sum(F.col("m") * F.col("m")).alias("q_d"),
    )
    # exact floor-div on decimals: (a - a % n) / n is integral, so the
    # decimal division is exact (no scale rounding can occur)
    terms = per_dow.select(
        "n_d", "s_d", "q_d",
        F.expr(
            "CAST(((n_d * q_d - s_d * s_d) - ((n_d * q_d - s_d * s_d) % n_d))"
            " / n_d AS DECIMAL(38,0))"
        ).alias("t_d"),
    )
    glob = terms.agg(
        F.sum("n_d").cast("long").alias("n"),
        F.sum("s_d").alias("s"),
        F.sum("q_d").alias("q"),
        F.sum("t_d").alias("r"),
    )
    # hi/lo 2^32-split int→double conversion (see the oracle's conv CTE
    # comment): DuckDB's 128-bit→double cast is not correctly rounded
    # above 2^53, so both sides reconstruct the double from two exact
    # sub-2^53 halves with one final correctly-rounded addition
    ss_tot = (
        F.expr(
            "CAST((n * q - s * s) DIV 4294967296 AS DOUBLE) * 4294967296.0"
            " + CAST((n * q - s * s) % 4294967296 AS DOUBLE)"
        )
        / F.col("n").cast("double")
        / F.lit(1e12)
    )
    ss_res = (
        F.expr(
            "CAST(r DIV 4294967296 AS DOUBLE) * 4294967296.0"
            " + CAST(r % 4294967296 AS DOUBLE)"
        )
        / F.lit(1e12)
    )
    return glob.select(
        F.col("n").alias("n_days"),
        ss_tot.alias("ss_total"),
        ss_res.alias("ss_residual"),
        # NULLIF guard (degenerate sweep): a constant series has zero
        # total variance — R² is undefined, NULL on both sides.
        F.round(
            F.lit(1.0) - ss_res / F.nullif(ss_tot, F.lit(0.0)), 6
        ).alias("seasonality_r2"),
    )


@register(
    "ts_latency_percentiles_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           COUNT(*) AS n,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1
    """,
)
def ts_latency_percentiles_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly p50/p95/p99 of the error-event value — the SRE latency
    dashboard shape: means hide tail pain, so SLOs are defined on p95+,
    tracked per time bucket to catch regressions the moment they ship.
    Exact percentiles with quantile_cont-matching interpolation
    (agg_percentile's parity).

    Scale (100 TB): the type filter pushes to the scan; exact per-group
    percentiles buffer each (hour) group — bounded here; the production
    swap at scale is approx_percentile's mergeable sketch per bucket,
    which also enables cross-bucket re-aggregation (hour → day) without
    touching raw data."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "ts_rsi_indicator",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    chg AS (
      SELECT d, v, v - LAG(v) OVER (ORDER BY d) AS delta
      FROM daily
    ),
    gl AS (
      SELECT d,
             AVG(CASE WHEN delta > 0 THEN delta ELSE 0 END)
               OVER w14 AS avg_gain,
             AVG(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
               OVER w14 AS avg_loss,
             COUNT(delta) OVER w14 AS n_window
      FROM chg
      WINDOW w14 AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT d,
           round(CASE WHEN avg_loss = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss)
                 END, 6) AS rsi14
    FROM gl
    WHERE n_window = 14
    """,
)
def ts_rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period RSI over the daily series (SMA variant: simple means of
    gains and losses in the trailing frame — Wilder's original uses a
    recursive EWMA; ts_ewma holds that machinery) — the bounded 0–100
    momentum oscillator read as overbought >70 / oversold <30; on
    operational KPIs it reads as sustained-up vs sustained-down pressure
    regardless of level.  Rows before a full 14-delta window are
    withheld (COUNT over the frame) rather than emitting a misleadingly
    volatile partial value; an all-gain window caps at exactly 100.

    Determinism: deltas difference exact fixed-point dailies; both
    engines average identical doubles over identical frames and the
    division guard is the same CASE.

    Scale (100 TB): |days|-axis windows after the map-side collapse —
    the bounded-axis argument; per-instrument RSI partitions by key."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    w = Window.orderBy("d")
    chg = daily.select(
        "d", (F.col("v") - F.lag("v").over(w)).alias("delta")
    )
    w14 = Window.orderBy("d").rowsBetween(-13, 0)
    gl = chg.select(
        "d",
        F.avg(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0.0))
        .over(w14)
        .alias("avg_gain"),
        F.avg(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0.0))
        .over(w14)
        .alias("avg_loss"),
        F.count("delta").over(w14).alias("n_window"),
    )
    rsi = F.when(F.col("avg_loss") == 0, 100.0).otherwise(
        100.0 - 100.0 / (1.0 + F.col("avg_gain") / F.col("avg_loss"))
    )
    return gl.filter(F.col("n_window") == 14).select(
        "d", F.round(rsi, 6).alias("rsi14")
    )


@register(
    "ts_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT v,
             LAG(v, 1) OVER (ORDER BY d) AS v1,
             LAG(v, 7) OVER (ORDER BY d) AS v7,
             LAG(v, 14) OVER (ORDER BY d) AS v14
      FROM daily
    )
    SELECT round(corr(v, v1), 6) AS acf_1,
           round(corr(v, v7), 6) AS acf_7,
           round(corr(v, v14), 6) AS acf_14
    FROM lagged
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily series at lags 1, 7, and 14 — the
    memory/seasonality diagnostic read before choosing any forecasting
    model: high acf_1 says momentum (yesterday predicts today), a
    spike at acf_7 says weekly rhythm (and that
    ts_seasonal_naive_backtest's LAG(7) baseline will be strong),
    nothing anywhere says don't bother forecasting.  Pairs with
    ts_seasonality_strength's variance-share view of the same
    structure.

    Determinism: each lag-pair correlation is a mergeable second-moment
    aggregate (agg_stats' machinery) over pairs both engines align
    identically (corr ignores the NULL warm-up rows by definition);
    rounded at 6dp.

    Scale (100 TB): facts → |days| spine map-side; three LAG columns
    share one window pass and the three corrs one aggregate."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "v",
        F.lag("v", 1).over(w).alias("v1"),
        F.lag("v", 7).over(w).alias("v7"),
        F.lag("v", 14).over(w).alias("v14"),
    )
    return lagged.agg(
        F.round(F.corr("v", "v1"), 6).alias("acf_1"),
        F.round(F.corr("v", "v7"), 6).alias("acf_7"),
        F.round(F.corr("v", "v14"), 6).alias("acf_14"),
    )


@register(
    "dq_flatline_detection",
    oracle="""
    WITH coarse AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value / 25) AS BIGINT) AS level
      FROM events
    ),
    flagged AS (
      SELECT user_id, level, ts, event_id,
             CASE WHEN LAG(level) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                       IS DISTINCT FROM level
                  THEN 1 ELSE 0 END AS new_run
      FROM coarse
    ),
    runs AS (
      SELECT user_id, level,
             SUM(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM flagged
    ),
    lens AS (
      SELECT user_id, level, COUNT(*) AS run_len
      FROM runs GROUP BY user_id, level, run_id
    )
    SELECT COUNT(*) AS n_flatline_runs,
           MAX(run_len) AS max_run_len,
           COUNT(DISTINCT user_id) AS n_users_affected
    FROM lens
    WHERE run_len >= 4
    """,
)
def dq_flatline_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-sensor / flatline detection: runs of ≥4 consecutive readings
    at the SAME (coarsened) level within a user's stream — the telemetry
    pathology where a frozen gauge keeps reporting its last value and
    every downstream average quietly drifts.  Values coarsen to
    25-wide levels first (exact FLOOR division both engines) so the
    continuous fixture exhibits plateaus; a real sensor feed drops the
    coarsening.  Detection is the gaps-and-islands sweep
    (ts_interval_merge's machinery) keyed on value-change flags instead
    of time gaps.

    Scale (100 TB): one hashpartitioning(user_id) exchange feeds the
    lag, the run numbering, and the run-length aggregate; output is one
    summary row.  Per-sensor detail = drop the final rollup."""
    ev = load(spark, sf_dir, "events")
    coarse = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("level"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = coarse.withColumn(
        "new_run",
        F.when(
            ~F.lag("level").over(w).eqNullSafe(F.col("level")), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    lens = runs.groupBy("user_id", "level", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return lens.filter(F.col("run_len") >= 4).agg(
        F.count(F.lit(1)).alias("n_flatline_runs"),
        F.max("run_len").alias("max_run_len"),
        F.countDistinct("user_id").alias("n_users_affected"),
    )


@register(
    "ts_percentile_bands",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    bands AS (
      SELECT quantile_cont(v, 0.10) AS p10,
             quantile_cont(v, 0.50) AS p50,
             quantile_cont(v, 0.90) AS p90
      FROM daily
    )
    SELECT d, v,
           round((SELECT p10 FROM bands), 6) AS p10,
           round((SELECT p50 FROM bands), 6) AS p50,
           round((SELECT p90 FROM bands), 6) AS p90,
           CASE WHEN v < (SELECT p10 FROM bands) THEN 'below'
                WHEN v > (SELECT p90 FROM bands) THEN 'above'
                ELSE 'normal' END AS band
    FROM daily
    """,
)
def ts_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Is today normal?' bands: each day positioned against the
    series' own p10/p50/p90 — the context layer every KPI chart needs
    (a number without its historical band invites both panic and
    complacency), and the simplest anomaly flag that self-calibrates to
    the metric's scale (ts_control_chart_xmr is the variance-based
    sibling; this one is distribution-based and robust to non-normal
    series).

    Scale (100 TB): facts → |days| spine map-side; exact band
    percentiles over that bounded axis broadcast back as one row; band
    assignment is a scalar CASE.  Rolling bands (trailing-90-day)
    partition the same percentile over a frame."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    bands = daily.agg(
        F.percentile("v", F.lit(0.10)).alias("p10"),
        F.percentile("v", F.lit(0.50)).alias("p50"),
        F.percentile("v", F.lit(0.90)).alias("p90"),
    )
    return daily.join(F.broadcast(bands)).select(
        "d",
        "v",
        F.round("p10", 6).alias("p10"),
        F.round("p50", 6).alias("p50"),
        F.round("p90", 6).alias("p90"),
        F.when(F.col("v") < F.col("p10"), "below")
        .when(F.col("v") > F.col("p90"), "above")
        .otherwise("normal")
        .alias("band"),
    )


@register(
    "ts_pacing_vs_target",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT))
                  AS BIGINT) AS v6
      FROM orders
      WHERE year(o_orderdate) = 1997
      GROUP BY 1
    ),
    cum AS (
      SELECT d, v6,
             SUM(v6) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS c6,
             SUM(v6) OVER () AS total6,
             ROW_NUMBER() OVER (ORDER BY d) AS day_n,
             COUNT(*) OVER () AS n_days
      FROM daily
    )
    SELECT d,
           CAST(c6 AS DOUBLE) / 1e6 AS cum_actual,
           CAST((CAST(total6 AS HUGEINT) * day_n) // n_days AS DOUBLE) / 1e6
             AS linear_target,
           round((c6 * n_days) / (CAST(total6 AS DOUBLE) * day_n), 6)
             AS pace_ratio
    FROM cum
    WHERE day_n % 30 = 0
    """,
)
def ts_pacing_vs_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget/quota pacing: cumulative 1997 revenue against the
    straight-line path to the year's total, with the pace ratio
    (>1 ahead, <1 behind) sampled every 30 active days — the
     'are we on track' chart for any period target (here the target is
    the realized total, making the op self-contained; swap in a planned
    figure via a 1-row join in production).

    Determinism: integer fixed-point prefix sums; the ratio divides
    exact longs cast identically.  The two money displays carry NO
    float round: at sf0.1 the year total is ~3.3e9 dollars, and
    round(x, 6) at that magnitude asks for a grain below the double's
    resolution (x·10⁶ ≈ 3.3e15, ulp ≈ 0.5) where the engines' rounding
    algorithms split by 1 ulp (r10 sf0.1 sweep finding) — instead the
    exact integer micro-units (the linear target floor-divided to
    integer micro-units first) go through one correctly-rounded IEEE
    int→double division, deterministic at any magnitude.  The pace
    RATIO keeps its 6dp round: it is O(1)-magnitude, where the grain
    is sound.

    Scale (100 TB): facts collapse to the |days| spine; the three
    windows share its single ordering — the bounded-axis rule.  The
    day_n sampling bounds output; it must be applied AFTER the windows
    (pace needs the full cumulative path)."""
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    # per-day totals over ALL 1997 orders: a single-long Σ of
    # o_totalprice micro-units clears 2^63 within one 100 TB day
    # (~6e7 rows × ~1.5e11 fp) — hi/lo split; the cumulative/total
    # windows below sum decimals, exact by themselves
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(
        fp_split_sum_of(
            fp_scaled_long(F.col("o_totalprice"), 1_000_000)
        ).alias("v6")
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = daily.select(
        "d",
        F.sum("v6").over(wc).alias("c6"),
        F.sum("v6").over(wall).alias("total6"),
        F.row_number().over(Window.orderBy("d")).alias("day_n"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
    )
    return cum.filter(F.col("day_n") % 30 == 0).select(
        "d",
        (F.col("c6").cast("double") / F.lit(1e6)).alias("cum_actual"),
        (
            F.expr("CAST((total6 * day_n) DIV n_days AS DOUBLE)")
            / F.lit(1e6)
        ).alias("linear_target"),
        F.round(
            (F.col("c6") * F.col("n_days"))
            / (F.col("total6").cast("double") * F.col("day_n")),
            6,
        ).alias("pace_ratio"),
    )


@register(
    "ts_cusum_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    params AS (
      SELECT AVG(v) AS mu, STDDEV_SAMP(v) AS sigma FROM daily
    ),
    pref AS (
      SELECT d, v,
             SUM(v - (SELECT mu FROM params)
                   - 0.5 * (SELECT sigma FROM params))
               OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS p
      FROM daily
    ),
    cusum AS (
      SELECT d, v,
             p - LEAST(MIN(p) OVER (ORDER BY d ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS s_plus
      FROM pref
    )
    SELECT d, round(v, 6) AS v, round(s_plus, 6) AS s_plus,
           CASE WHEN s_plus > 4.0 * (SELECT sigma FROM params)
                THEN 1 ELSE 0 END AS drift_alarm
    FROM cusum
    WHERE d >= (SELECT MIN(d) FROM daily) + 5
    """,
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection on the daily series: the classic
    sequential test that catches SMALL persistent upward shifts long
    before a fixed threshold fires (reference value k = σ/2, alarm at
    4σ — standard tuning).  CUSUM's recursion S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ −
    μ − k) looks window-inexpressible, but the closed form S⁺ₜ = Pₜ −
    min(0, min_{j≤t} Pⱼ) over the prefix sums P turns it into TWO
    ordinary windows — the same de-recursion trick as win_drawdown's
    running max, so the whole detector stays in exact declarative SQL
    on both engines (a first 5 warm-up days are withheld while μ,σ are
    effectively in-sample).

    Scale (100 TB): facts → |days| spine map-side; params are a 1-row
    broadcast; both windows ride the bounded day axis.  Streaming CUSUM
    = the same recursion in applyInPandasWithState
    (stream_stateful_counter's machinery)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    params = daily.agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sigma")
    )
    wd = daily.join(F.broadcast(params))
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pref = wd.select(
        "d",
        "v",
        "sigma",
        F.sum(
            F.col("v") - F.col("mu") - 0.5 * F.col("sigma")
        ).over(wc).alias("p"),
    )
    # S+_t = P_t - min(0, min_{j<=t} P_j): the prefix-min MUST include the
    # current row (P_0 = 0 enters via the least(., 0)) — a draft with the
    # 1-PRECEDING frame produced NEGATIVE S+ and both engines agreed on
    # it; the recursion equivalence is pinned in tests/test_edge_cases.py
    s_plus = F.col("p") - F.least(F.min("p").over(wc), F.lit(0.0))
    min_d = daily.agg(F.min("d").alias("d0"))
    return (
        pref.withColumn("s_plus", s_plus)
        .join(F.broadcast(min_d))
        .filter(F.col("d") >= F.date_add(F.col("d0"), 5))
        .select(
            "d",
            F.round("v", 6).alias("v"),
            F.round("s_plus", 6).alias("s_plus"),
            F.when(F.col("s_plus") > 4.0 * F.col("sigma"), 1)
            .otherwise(0)
            .alias("drift_alarm"),
        )
    )


@register(
    "ts_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    med AS (SELECT quantile_cont(v, 0.5) AS m FROM daily),
    signs AS (
      SELECT d, CASE WHEN v > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
      FROM daily WHERE v <> (SELECT m FROM med)
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY d) IS DISTINCT FROM s
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ),
    agg AS (
      SELECT CAST(SUM(new_run) AS BIGINT) AS r,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2
      FROM runs
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           round(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS expected_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / NULLIF(sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / NULLIF(pow(n1 + n2, 2) * (n1 + n2 - 1), 0)), 0),
                 6) AS z_stat
    FROM agg
    """,
)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily series: count the runs of
    above/below-median days and standardize against the expected run
    count under randomness — too FEW runs means sticky
    momentum/trending, too MANY means oscillation; |z| < 2 says the
    'pattern' your eye sees in the chart is noise.  The non-parametric
    companion to ts_autocorrelation (no linearity assumption), run on
    model residuals to certify a fit.  Median-equal days drop per the
    standard treatment.

    Determinism: signs compare exact fixed-point values against the
    interpolated median; runs count via the LAG flag; the z formula is
    integer-fed arithmetic rounded at 6dp.

    Scale (100 TB): bounded-day-axis windows after the map-side
    collapse; single-row output."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(lsum(F.col("value")).alias("v"))
    med = daily.agg(F.percentile("v", F.lit(0.5)).alias("m"))
    signs = (
        daily.join(F.broadcast(med))
        .filter(F.col("v") != F.col("m"))
        .select("d", F.when(F.col("v") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    w = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(~F.lag("s").over(w).eqNullSafe(F.col("s")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    exp_r = 2.0 * n1 * n2 / (n1 + n2) + 1
    # inner NULLIF: with exactly one usable sign (n1+n2 = 1, e.g. a
    # NULL-heavy slice) the variance denominator is 0 — ANSI would throw
    # 0/0 where DuckDB emits nan; both sides yield NULL instead
    sd = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / F.nullif(F.pow(n1 + n2, 2) * (n1 + n2 - 1), F.lit(0.0))
    )
    return agg.select(
        r.alias("n_runs"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        F.round(exp_r, 6).alias("expected_runs"),
        # sd = 0 when one side of the median is empty (n1*n2 = 0, e.g. a
        # NULL-heavy slice leaving one usable day) — z is undefined; NULL
        # on both engines (oracle NULLIF), never ANSI DIVIDE_BY_ZERO
        F.when(sd != 0, F.round((r - exp_r) / sd, 6)).alias("z_stat"),
    )


@register(
    "ts_classical_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             dayofweek(CAST(ts AS DATE)) AS dow,
             CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    trended AS (
      SELECT d, dow, v,
             AVG(v) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND
                          3 FOLLOWING) AS trend,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND
                            3 FOLLOWING) AS win_n
      FROM daily
    ),
    detr AS (
      SELECT d, dow, v, trend, v - trend AS detrended
      FROM trended WHERE win_n = 7
    ),
    seas AS (
      SELECT d, v, trend, detrended,
             AVG(detrended) OVER (PARTITION BY dow) AS seasonal
      FROM detr
    )
    SELECT COUNT(*) AS n_days,
           round(VAR_SAMP(trend), 6) AS var_trend,
           round(VAR_SAMP(seasonal), 6) AS var_seasonal,
           round(VAR_SAMP(detrended - seasonal), 6) AS var_residual
    FROM seas
    """,
)
def ts_classical_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily series — trend
    (centered 7-day moving average, full windows only), weekly seasonal
    (day-of-week means of the detrended values), residual (what's left)
    — summarized as the three components' variances: the STL-lite that
    answers 'how much of this chart is trend vs rhythm vs noise' and
    whose residual feeds ts_runs_test / ts_control_chart_xmr for honest
    anomaly detection (alarming on raw values means alarming on
    Mondays).

    Determinism: the centered MA runs over exact fixed-point values
    with the partial edge windows EXCLUDED (win_n = 7), dow grouping is
    the bijection rule, and variances round at 6dp.

    Scale (100 TB): bounded day axis end to end after the map-side
    collapse; per-series decomposition partitions every window by
    key."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.dayofweek(F.col("ts").cast("date")).alias("dow"),
    ).agg(lsum(F.col("value")).alias("v"))
    wt = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "dow",
        "v",
        F.avg("v").over(wt).alias("trend"),
        F.count(F.lit(1)).over(wt).alias("win_n"),
    )
    detr = trended.filter(F.col("win_n") == 7).select(
        "d", "dow", "v", "trend", (F.col("v") - F.col("trend")).alias("detrended")
    )
    wdow = Window.partitionBy("dow")
    seas = detr.select(
        "trend",
        "detrended",
        F.avg("detrended").over(wdow).alias("seasonal"),
    )
    return seas.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.var_samp("trend"), 6).alias("var_trend"),
        F.round(F.var_samp("seasonal"), 6).alias("var_seasonal"),
        F.round(
            F.var_samp(F.col("detrended") - F.col("seasonal")), 6
        ).alias("var_residual"),
    )


@register(
    "ts_trend_ols",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS x,
             {sql_lsum('value')} AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           round(regr_slope(y, x), 6) AS slope,
           round(regr_intercept(y, x), 6) AS intercept,
           round(regr_r2(y, x), 6) AS r2,
           round(regr_intercept(y, x)
                 + regr_slope(y, x) * (MAX(x) + 1), 6) AS next_day_fit
    FROM daily GROUP BY event_type
    """,
)
def ts_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend fit: daily revenue per event type regressed
    on the day index (slope/intercept/R² via the closed-form regr_*
    aggregates) plus the one-step-ahead fitted value — the 'is this
    metric growing and how fast' primitive under every KPI trend arrow,
    and the linear member of the forecast family next to
    ts_seasonal_naive_backtest and ts_ewma.  Daily sums are exact
    fixed-point longs before the regression so both engines regress
    identical y vectors; the regr_* outputs round at 6 dp.

    Scale (100 TB): the daily rollup map-side combines to |series|×|days|
    rows; regr_* are single-pass mergeable moment sketches over that —
    no sort, no second shuffle, no driver collect."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
        )
        .agg(lsum(F.col("value")).alias("y"))
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
        F.round(F.regr_r2("y", "x"), 6).alias("r2"),
        F.round(
            F.regr_intercept("y", "x")
            + F.regr_slope("y", "x") * (F.max("x") + 1),
            6,
        ).alias("next_day_fit"),
    )


@register(
    "ts_burstiness_fano",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             datediff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT MAX(h) + 1 AS n_hours FROM hourly
    ),
    per AS (
      SELECT event_type,
             COUNT(*) AS nonzero_hours,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS sc2
      FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           (SELECT n_hours FROM span) AS n_hours,
           sc AS n_events,
           round(sc / CAST((SELECT n_hours FROM span) AS DOUBLE), 6)
             AS mean_per_hour,
           round((sc2 - sc * (sc / CAST((SELECT n_hours FROM span)
                  AS DOUBLE)))
                 / ((SELECT n_hours FROM span) - 1)
                 / (sc / CAST((SELECT n_hours FROM span) AS DOUBLE)), 6)
             AS fano,
           round((sqrt((sc2 - sc * (sc / CAST((SELECT n_hours FROM span)
                        AS DOUBLE))) / ((SELECT n_hours FROM span) - 1))
                  - sc / CAST((SELECT n_hours FROM span) AS DOUBLE))
                 / (sqrt((sc2 - sc * (sc / CAST((SELECT n_hours FROM span)
                          AS DOUBLE))) / ((SELECT n_hours FROM span) - 1))
                    + sc / CAST((SELECT n_hours FROM span) AS DOUBLE)), 6)
             AS burstiness
    FROM per
    """,
)
def ts_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness profile per event series: the Fano factor
    (variance-to-mean of hourly counts — 1 for a Poisson process,
    >1 for bursty arrivals) and the Goh–Barabási burstiness index
    (σ−μ)/(σ+μ) ∈ (−1, 1) — the dispersion diagnostics that decide
    whether rate-based capacity planning (ts_latency_percentiles_
    hourly) can assume Poisson or must provision for bursts.
    Zero-count hours are counted WITHOUT materializing them: Σc and
    Σc² over nonzero hours are exact integers and zeros contribute
    nothing, so mean and variance use the full n_hours span exactly.

    Scale (100 TB): the hourly rollup map-side combines; per-series
    stats are three integer sums — one pass, one tiny shuffle, no
    calendar grid join."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        (
            F.floor(
                (
                    F.col("ts").cast("double")
                    - F.lit("2024-01-01 00:00:00").cast("timestamp").cast("double")
                )
                / 3600
            )
        ).alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    span = hourly.agg((F.max("h") + 1).cast("long").alias("n_hours"))
    per = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nonzero_hours"),
        F.sum("c").cast("long").alias("sc"),
        # Σc² keeps only ~8x long headroom at 100 TB if one type
        # dominates (c ≈ 1e7/hour ⇒ c² ≈ 1e14 × ~9e3 hours) — decimal
        # (HUGEINT oracle-side); Σc is just N, safe as long
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sc2"),
    )
    j = per.crossJoin(F.broadcast(span))
    mean = F.col("sc") / F.col("n_hours").cast("double")
    var = (F.col("sc2") - F.col("sc") * mean) / (F.col("n_hours") - 1)
    sd = F.sqrt(var)
    return j.select(
        "event_type",
        "n_hours",
        F.col("sc").alias("n_events"),
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(var / mean, 6).alias("fano"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    )


@register(
    "ts_residual_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    keyed AS (
      SELECT event_type, d, n, isodow(d) AS dow FROM daily
    ),
    med AS (
      SELECT event_type, dow, quantile_cont(n, 0.5) AS dow_med
      FROM keyed GROUP BY 1, 2
    ),
    resid AS (
      SELECT k.event_type, k.d, k.n, m.dow_med,
             k.n - m.dow_med AS r
      FROM keyed k JOIN med m
        ON k.event_type = m.event_type AND k.dow = m.dow
    ),
    mad AS (
      SELECT event_type, quantile_cont(abs(r), 0.5) AS mad
      FROM resid GROUP BY event_type
    )
    SELECT r.event_type, r.d, r.n,
           round(r.dow_med, 6) AS dow_med,
           round(r.r, 6) AS residual,
           CASE WHEN m.mad > 0 AND abs(r.r) > 3 * 1.4826 * m.mad
                THEN 1 ELSE 0 END AS is_anomaly
    FROM resid r JOIN mad m ON r.event_type = m.event_type
    """,
)
def ts_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flags: daily counts per series are
    deseasonalized against their day-of-week MEDIAN (robust to the
    anomalies being hunted, unlike the mean a z-score uses —
    ts_zscore_outliers flags raw spikes; this flags days unusual FOR
    THAT WEEKDAY), then residuals beyond 3 robust sigmas (1.4826·MAD)
    are flagged.  Exact medians agree across engines on integer
    counts (the verified percentile/quantile_cont rule); a zero MAD
    (constant series) suppresses flags instead of dividing.

    Scale (100 TB): the daily rollup map-side combines; medians and
    MADs aggregate |series|×7 and |series| keys over the tiny daily
    table, joined back broadcast — one scan of events, everything
    after is broadcast-size."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    keyed = daily.select(
        "event_type", "d", "n", (F.weekday("d") + 1).alias("dow")
    )
    med = keyed.groupBy("event_type", "dow").agg(
        F.percentile("n", F.lit(0.5)).alias("dow_med")
    )
    resid = keyed.join(F.broadcast(med), ["event_type", "dow"]).select(
        "event_type",
        "d",
        "n",
        "dow_med",
        (F.col("n") - F.col("dow_med")).alias("r"),
    )
    mad = resid.groupBy("event_type").agg(
        F.percentile(F.abs("r"), F.lit(0.5)).alias("mad")
    )
    return resid.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "d",
        "n",
        F.round("dow_med", 6).alias("dow_med"),
        F.round("r", 6).alias("residual"),
        F.when(
            (F.col("mad") > 0)
            & (F.abs("r") > 3 * 1.4826 * F.col("mad")),
            1,
        )
        .otherwise(0)
        .alias("is_anomaly"),
    )


@register(
    "ts_record_highs",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
               AS v6
      FROM events GROUP BY 1, 2
    ),
    flagged AS (
      SELECT event_type, d, v6,
             MAX(v6) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_best6
      FROM daily
    )
    SELECT event_type, d,
           round(v6 / 1000000.0, 6) AS daily_value,
           round(prev_best6 / 1000000.0, 6) AS prev_record,
           round((v6 - COALESCE(prev_best6, 0)) / 1000000.0, 6)
             AS improvement
    FROM flagged
    WHERE prev_best6 IS NULL OR v6 > prev_best6
    """,
)
def ts_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-high days per series: the days whose daily revenue beat
    every prior day (strict prefix max on exact fixed-point sums),
    with the previous record and the improvement — the 'best day
    ever' feed of ops dashboards and the input to streak/drawdown
    narratives (win_drawdown is the mirror-image from peaks).  First
    day of a series is a record by definition (NULL previous).

    Scale (100 TB): daily rollup map-side combines; the prefix max is
    one window over |series|×|days| rows.  All comparisons are
    integer micro-units — a record is never declared by float
    drift."""
    e = load(spark, sf_dir, "events")
    # (series, day) cells sum scale-proportional slices of events —
    # hi/lo split; the prefix MAX below is an order statistic over the
    # exact decimals (no further sum)
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        fp_split_sum_of(
            fp_scaled_long(F.col("value"), 1_000_000)
        ).alias("v6")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = daily.select(
        "event_type", "d", "v6", F.max("v6").over(w).alias("prev_best6")
    )
    return flagged.filter(
        F.col("prev_best6").isNull() | (F.col("v6") > F.col("prev_best6"))
    ).select(
        "event_type",
        "d",
        F.round(F.col("v6") / 1000000.0, 6).alias("daily_value"),
        F.round(F.col("prev_best6") / 1000000.0, 6).alias("prev_record"),
        F.round(
            (F.col("v6") - F.coalesce("prev_best6", F.lit(0))) / 1000000.0, 6
        ).alias("improvement"),
    )


@register(
    "ts_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type, COUNT(*) AS n_gaps,
           round(AVG(gap_us) / 1e6, 6) AS mean_sec,
           round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS median_sec,
           round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_sec,
           round(sqrt((COUNT(*) * SUM(CAST(gap_us AS HUGEINT) * gap_us)
                       - CAST(SUM(gap_us) AS HUGEINT) * SUM(gap_us))
                      / NULLIF(CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1), 0))
                 / NULLIF(SUM(gap_us) / CAST(COUNT(*) AS DOUBLE), 0), 6) AS cv
    FROM g GROUP BY event_type
    """,
)
def ts_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time profile per event series: mean / median /
    p90 gap and the coefficient of variation — CV ≈ 1 is the Poisson
    signature, CV > 1 confirms the bursty arrivals ts_burstiness_fano
    sees in COUNTS from the complementary GAP view, and the p90 gap
    is what staleness SLAs (dq_freshness_sla) should be calibrated
    from.  Gaps are exact integer microseconds (epoch_us both sides),
    so percentiles and the moment-based CV hash identically.

    Scale (100 TB): one (series)-partitioned ordered window for the
    lag — the sessionize shuffle — then per-series scalar rollups;
    Σgap² runs int128/decimal (HUGEINT / decimal(38,0))."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    n = F.count(F.lit(1))
    sg = F.sum("gap_us")
    sg2 = F.sum(F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us"))
    mean_us = sg / n.cast("double")
    # NULLIF guards (NULL-regime sweep): a series with exactly ONE gap
    # zeroes the (n-1) sample-variance denominator, and an all-zero-gap
    # series zeroes the CV's mean — the CV is undefined (NULL), not a
    # crash, on both sides
    var = (
        n * sg2.cast("double") - sg.cast("double") * sg
    ) / F.nullif(n.cast("double") * (n - 1), F.lit(0.0))
    return gaps.groupBy("event_type").agg(
        n.alias("n_gaps"),
        F.round(mean_us / 1e6, 6).alias("mean_sec"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 6).alias(
            "median_sec"
        ),
        F.round(F.percentile("gap_us", F.lit(0.9)) / 1e6, 6).alias(
            "p90_sec"
        ),
        F.round(F.sqrt(var) / F.nullif(mean_us, F.lit(0.0)), 6).alias("cv"),
    )


@register(
    "agg_slo_burn_rate",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS total,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS errors
      FROM events GROUP BY 1
    )
    SELECT d, total, errors,
           round(errors / (total * 0.2), 6) AS burn_rate,
           CASE WHEN 5 * errors > total THEN 1 ELSE 0 END AS burning,
           CASE WHEN errors * 1000 > total * 260 THEN 1 ELSE 0 END
             AS fast_burn
    FROM daily
    """,
)
def agg_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate: daily error share against a 20%
    error budget, expressed as the burn multiplier SRE alerting pages
    on (burn 1.0 = spending budget exactly at period pace; the 1.3×
    fast-burn threshold is the multiwindow-alert convention) — the
    operational companion to dq_rowcount_anomaly_daily: that op asks
    'is volume weird', this asks 'are we failing too fast to last the
    month'.  Both alert FLAGS are integer cross-multiplications
    (5·errors > total; 1000·errors > 260·total) so a page never
    depends on float rounding.

    Scale (100 TB): one conditional-count daily rollup, map-side
    combined; multiwindow variants (1h/6h burn) add window keys, not
    passes."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errors"),
    )
    return daily.select(
        "d",
        "total",
        "errors",
        F.round(F.col("errors") / (F.col("total") * 0.2), 6).alias(
            "burn_rate"
        ),
        F.when(5 * F.col("errors") > F.col("total"), 1)
        .otherwise(0)
        .alias("burning"),
        F.when(F.col("errors") * 1000 > F.col("total") * 260, 1)
        .otherwise(0)
        .alias("fast_burn"),
    )


@register(
    "ts_diff_correlation",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 1000000) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS a6,
             CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(ROUND(value * 1000000) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS b6
      FROM events GROUP BY 1
    ),
    diffed AS (
      SELECT d, a6, b6,
             a6 - LAG(a6) OVER (ORDER BY d) AS da,
             b6 - LAG(b6) OVER (ORDER BY d) AS db
      FROM daily
    )
    SELECT COUNT(*) AS n_days,
           round(corr(a6, b6), 6) AS corr_levels,
           round(corr(da, db), 6) AS corr_diffs
    FROM diffed
    """,
)
def ts_diff_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spurious-correlation guard: the correlation between two daily
    revenue series in LEVELS versus in FIRST DIFFERENCES — trending
    series correlate in levels no matter what (the classic
    shark-attacks-vs-ice-cream artifact); only the differenced
    correlation says the series actually co-move day to day, which is
    what a metrics review needs before claiming 'clicks drive
    purchases'.  Daily sums are exact fixed-point integers, so both
    corr() sketches see identical inputs.

    Scale (100 TB): one conditional daily rollup (map-side combined),
    a lag window over |days| rows, and two corr sketches — nothing
    downstream of the combine scales with events."""
    e = load(spark, sf_dir, "events")
    v6 = fp_scaled_long(F.col("value"), 1_000_000)
    # per-day conditional sums over ALL events — hi/lo split; corr()
    # and the lag-differences consume the exact decimals directly
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        fp_split_sum_of(
            F.when(F.col("event_type") == "purchase", v6).otherwise(0)
        ).alias("a6"),
        fp_split_sum_of(
            F.when(F.col("event_type") == "click", v6).otherwise(0)
        ).alias("b6"),
    )
    w = Window.orderBy("d")
    diffed = daily.select(
        "a6",
        "b6",
        (F.col("a6") - F.lag("a6").over(w)).alias("da"),
        (F.col("b6") - F.lag("b6").over(w)).alias("db"),
    )
    return diffed.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.corr("a6", "b6"), 6).alias("corr_levels"),
        F.round(F.corr("da", "db"), 6).alias("corr_diffs"),
    )


@register(
    "ts_compound_growth_index",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
               AS v6
      FROM events GROUP BY 1, 2
    ),
    ret AS (
      SELECT event_type, d, v6,
             CASE WHEN v6 > 0
                   AND LAG(v6) OVER (PARTITION BY event_type ORDER BY d) > 0
                  THEN CAST(v6 AS DOUBLE)
                       / LAG(v6) OVER (PARTITION BY event_type ORDER BY d)
             END AS r
      FROM daily
    )
    SELECT event_type, d,
           round(exp(SUM(ln(r)) OVER (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 * 100, 6) AS growth_index
    FROM ret WHERE r IS NOT NULL
    """,
)
def ts_compound_growth_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound growth index (base 100): each series' daily return
    ratios compound into a cumulative index via the exp-of-summed-
    logs identity — the only way to express a running PRODUCT with
    window aggregates (engines ship cumulative SUM, not product), and
    the standard form for 'if you indexed this metric at 100 on day
    one, where is it now' charts and portfolio NAV math.  Returns
    derive from exact fixed-point daily sums; the log-sum-exp chain
    is identical expression-for-expression on both engines, rounded
    at 6 dp.

    Scale (100 TB): daily rollup map-side combines; the cumulative
    window runs per series over |days| rows.  A zero-revenue day
    would null the chain (ln 0) — upstream gapfill (ts_gapfill,
    ts_locf) owns that repair, documented rather than silently
    patched here."""
    e = load(spark, sf_dir, "events")
    v6 = fp_scaled_long(F.col("value"), 1_000_000)
    # (series, day) cells sum scale-proportional event slices — hi/lo
    # split; downstream consumers (ratios, corr) read exact decimals
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        fp_split_sum_of(v6).alias("v6")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    # a growth ratio is undefined off a non-positive level (non-finite
    # regime: zero/negative days abort ANSI x/0 on Spark and ln(0) on
    # DuckDB); undefined days drop out of the chain as documented
    prev = F.lag("v6").over(w)
    ret = daily.select(
        "event_type",
        "d",
        F.when(
            (F.col("v6") > 0) & (prev > 0),
            F.col("v6").cast("double") / prev.cast("double"),
        ).alias("r"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return ret.filter(F.col("r").isNotNull()).select(
        "event_type",
        "d",
        F.round(F.exp(F.sum(F.log("r")).over(wc)) * 100, 6).alias(
            "growth_index"
        ),
    )


@register(
    "ts_twap_daily",
    oracle="""
    WITH seq AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(ROUND(value * 1000000) AS BIGINT) AS v6,
             epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY event_type,
               CAST(date_trunc('day', ts) AS DATE)
               ORDER BY ts, event_id) AS next_us,
             event_type
      FROM events WHERE event_type = 'purchase'
    ),
    weighted AS (
      SELECT d, v6,
             COALESCE(next_us,
               epoch_us(CAST(d + 1 AS TIMESTAMP))) - t_us AS dur_us
      FROM seq
    )
    SELECT d,
           COUNT(*) AS n_obs,
           round(CAST(SUM(CAST(v6 AS HUGEINT) * dur_us) AS DOUBLE)
                 / SUM(dur_us) / 1e6, 6) AS twap,
           round(AVG(v6) / 1e6, 6) AS simple_avg
    FROM weighted GROUP BY d
    """,
)
def ts_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price (TWAP) per day: each purchase
    value weighted by how long it remained the latest observation
    (gap to the next event, the last one running to midnight) —
    the average that is ROBUST to irregular sampling, unlike the
    simple mean reported alongside for contrast: a burst of ticks in
    one minute dominates a simple average but not a TWAP.  Weights
    are exact integer microseconds and values fixed-point micro-units,
    so the weighted numerator is an exact int128 sum.

    Scale (100 TB): one (series, day)-partitioned lead window — the
    sessionize shuffle — then a map-side-combined weighted rollup per
    day."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v6 = fp_scaled_long(F.col("value"), 1_000_000)
    d = F.to_date("ts")
    w = Window.partitionBy("event_type", d).orderBy("ts", "event_id")
    seq = e.select(
        d.alias("d"),
        v6.alias("v6"),
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    weighted = seq.select(
        "d",
        "v6",
        (
            F.coalesce(
                F.col("next_us"),
                F.unix_micros(
                    F.date_add("d", 1).cast("timestamp")
                ),
            )
            - F.col("t_us")
        ).alias("dur_us"),
    )
    return weighted.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(
            F.sum(F.col("v6").cast("decimal(38,0)") * F.col("dur_us"))
            .cast("double")
            / F.sum("dur_us")
            / 1e6,
            6,
        ).alias("twap"),
        # per-day Σv6 keeps only ~9x headroom at 100 TB (1e8 rows/day ×
        # ~1e10 fp) — below the ≲10x escalation bar: split sum / count
        # computes the identical avg-of-longs double.  count("v6"), not
        # count(*): AVG skips NULLs, so the divisor is the non-NULL count
        F.round(
            fp_split_sum_of(F.col("v6")).cast("double")
            / F.count("v6")
            / 1e6,
            6,
        ).alias("simple_avg"),
    )


@register(
    "ts_dominant_period",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
               AS v6
      FROM events GROUP BY 1, 2
    ),
    fanned AS (
      SELECT dl.event_type, k.lag_k, dl.d, dl.v6
      FROM daily dl CROSS JOIN (SELECT unnest(range(2, 15)) AS lag_k) k
    ),
    lagged AS (
      SELECT f.event_type, f.lag_k, f.v6, b.v6 AS v6_lag
      FROM fanned f JOIN daily b
        ON b.event_type = f.event_type
        AND b.d = f.d - f.lag_k * INTERVAL 1 DAY
    ),
    acf AS (
      SELECT event_type, lag_k,
             round(corr(v6, v6_lag), 6) AS r
      FROM lagged GROUP BY event_type, lag_k
    ),
    ranked AS (
      SELECT event_type, lag_k, r,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY r DESC, lag_k) AS rnk
      FROM acf
    )
    SELECT event_type, lag_k AS dominant_period_days, r AS acf
    FROM ranked WHERE rnk = 1
    """,
)
def ts_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-period detection: the lag (2–14 days) whose
    autocorrelation is highest per series — the data-driven answer to
    'is this metric weekly?' that every seasonal model
    (ts_seasonality_dow, ts_classical_decompose, the lag-7 forecast
    in eval_regression_metrics) currently ASSUMES; running this first
    turns the assumption into a measurement (a 7-day winner validates
    the weekly models; anything else flags unusual periodicity).
    ACF values are corr() over exact fixed-point sums, rounded to the
    6-dp grain BEFORE the argmax so the winner is engine-stable, lag
    ties to the shorter period.

    Scale (100 TB): the daily rollup map-side combines; the 13 lag
    variants fan out over the tiny daily table (|series|×|days|×13
    rows), each a window + corr sketch."""
    e = load(spark, sf_dir, "events")
    v6 = fp_scaled_long(F.col("value"), 1_000_000)
    # (series, day) cells sum scale-proportional event slices — hi/lo
    # split; downstream consumers (ratios, corr) read exact decimals
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        fp_split_sum_of(v6).alias("v6")
    )
    lags = spark.range(2, 15).select(F.col("id").cast("int").alias("lag_k"))
    fanned = daily.crossJoin(F.broadcast(lags))
    base = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("v6").alias("v6_lag"),
    )
    lagged = fanned.join(
        base,
        (F.col("event_type") == F.col("bt"))
        & (F.col("bd") == F.expr("date_sub(d, lag_k)")),
    ).select("event_type", "lag_k", "v6", "v6_lag")
    acf = lagged.groupBy("event_type", "lag_k").agg(
        F.round(F.corr("v6", "v6_lag"), 6).alias("r")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("r").desc(), F.col("lag_k")
    )
    return (
        acf.select(
            "event_type",
            "lag_k",
            "r",
            F.row_number().over(wr).alias("rnk"),
        )
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("lag_k").alias("dominant_period_days"),
            F.col("r").alias("acf"),
        )
    )


@register(
    "ts_cross_correlation_lags",
    oracle="""
    WITH x AS (
      SELECT datediff('day', DATE '2024-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS di,
             CAST(COUNT(*) AS BIGINT) AS xv
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    y AS (
      SELECT datediff('day', DATE '2024-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS di,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT) AS yv
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    lags AS (SELECT k FROM (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) t(k)),
    paired AS (
      SELECT l.k, x.xv, y.yv
      FROM lags l JOIN x ON TRUE JOIN y ON y.di = x.di + l.k
    ),
    s AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
             SUM(CAST(xv AS HUGEINT) * yv) AS sxy,
             SUM(CAST(xv AS HUGEINT) * xv) AS sxx,
             SUM(CAST(yv AS HUGEINT) * yv) AS syy
      FROM paired GROUP BY k
    )
    SELECT k AS lag_days, n,
           round((n * sxy - CAST(sx AS HUGEINT) * sy)
                 / NULLIF(sqrt((n * sxx - CAST(sx AS HUGEINT) * sx) * 1.0), 0)
                 / NULLIF(sqrt((n * syy - CAST(sy AS HUGEINT) * sy) * 1.0), 0),
                 6) AS xcorr
    FROM s
    """,
)
def ts_cross_correlation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between two business series — daily
    view traffic vs daily purchase revenue at lags -3..+3 — the 'does
    traffic LEAD revenue, and by how many days' question behind every
    marketing-mix argument (ts_diff_correlation owns the lag-0
    detrended check; this scans the lag axis).  Dates are folded to
    integer day indices so the lag join is pure integer equality in
    both engines (no interval-arithmetic type drift), and Pearson
    inputs are exact integer sums (counts x cent-scaled revenue) with
    floats only in the final ratio.

    Scale (100 TB): raw events collapse to two |days|-sized series
    first; the 7-lag pair join and per-lag reductions run on that
    bounded axis — broadcast both series, never reshuffle facts."""
    ev = load(spark, sf_dir, "events")
    di = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    x = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(di.alias("di"))
        .agg(F.count(F.lit(1)).cast("long").alias("xv"))
    )
    y2 = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    y = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(di.alias("di"))
        .agg(F.sum(y2).cast("long").alias("yv"))
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("k"))
    paired = (
        F.broadcast(lags)
        .crossJoin(x)
        .join(
            F.broadcast(y.withColumnRenamed("di", "di_y")),
            F.col("di") + F.col("k") == F.col("di_y"),
        )
        .select("k", "xv", "yv")
    )
    # int128-class cross-products (extreme regime): cent-scaled daily
    # revenue squares past int64 — the moment sums run decimal(38,0)
    # (HUGEINT on the oracle side), doubles only in the final ratio
    s = paired.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("xv").cast("decimal(38,0)") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv").cast("decimal(38,0)") * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv").cast("decimal(38,0)") * F.col("yv")).alias("syy"),
    )
    sxd = F.col("sx").cast("decimal(38,0)")
    syd = F.col("sy").cast("decimal(38,0)")
    num = F.col("n") * F.col("sxy") - sxd * F.col("sy")
    dx = (F.col("n") * F.col("sxx") - sxd * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - syd * F.col("sy")).cast("double")
    # NULLIF guards (NULL-regime sweep): a 1-pair lag or a constant series
    # zeroes a variance leg — the correlation is undefined (NULL) there
    return s.select(
        F.col("k").alias("lag_days"),
        "n",
        F.round(
            num / F.nullif(F.sqrt(dx), F.lit(0.0))
            / F.nullif(F.sqrt(dy), F.lit(0.0)),
            6,
        ).alias("xcorr"),
    )


@register(
    "ts_bollinger_bands",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT d, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS s,
             SUM(CAST(cents AS HUGEINT) * cents) OVER w AS ss,
             COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT d,
           round(cents / 100.0, 6) AS revenue,
           round(s / 7.0 / 100.0, 6) AS mid,
           round((s / 7.0 - 2 * sqrt(CAST(ss AS DOUBLE) / 7.0
                                     - (s / 7.0) * (s / 7.0))) / 100.0, 6)
             AS lower_band,
           round((s / 7.0 + 2 * sqrt(CAST(ss AS DOUBLE) / 7.0
                                     - (s / 7.0) * (s / 7.0))) / 100.0, 6)
             AS upper_band
    FROM win WHERE n = 7
    """,
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily revenue: rolling 7-day mean ± 2
    population standard deviations — the volatility envelope behind
    'is today's number actually unusual' (ts_percentile_bands answers
    with empirical quantiles; this is the parametric classic,
    ts_control_chart_xmr its per-observation SPC cousin).  The window
    carries exact integer Σx and Σx² (cents² in HUGEINT/decimal to
    dodge the square-sum wraparound), σ uses the population form so
    neither engine's sample/population default is trusted, and
    partial leading windows are dropped (n=7) not silently narrower.

    Scale (100 TB): facts collapse to the |days| axis before any
    window; the rows-frame pass is one sort of a bounded series —
    add the partition key and the same plan runs per SKU/region."""
    ev = load(spark, sf_dir, "events")
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.orderBy("d").rowsBetween(-6, 0)
    win = daily.select(
        "d",
        "cents",
        F.sum("cents").over(w).cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .over(w)
        .alias("ss"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    mean = F.col("s") / F.lit(7.0)
    sigma = F.sqrt(F.col("ss").cast("double") / F.lit(7.0) - mean * mean)
    return win.filter(F.col("n") == 7).select(
        "d",
        F.round(F.col("cents") / F.lit(100.0), 6).alias("revenue"),
        F.round(mean / F.lit(100.0), 6).alias("mid"),
        F.round((mean - 2 * sigma) / F.lit(100.0), 6).alias("lower_band"),
        F.round((mean + 2 * sigma) / F.lit(100.0), 6).alias("upper_band"),
    )


@register(
    "ts_velocity_acceleration",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT d, cents,
             LAG(cents, 1) OVER (ORDER BY d) AS c1,
             LAG(cents, 2) OVER (ORDER BY d) AS c2
      FROM daily
    )
    SELECT d, cents,
           cents - c1 AS velocity_cents,
           cents - 2 * c1 + c2 AS accel_cents,
           CASE WHEN cents - 2 * c1 + c2 > 0 THEN 'speeding_up'
                WHEN cents - 2 * c1 + c2 < 0 THEN 'slowing_down'
                ELSE 'steady' END AS regime
    FROM lagged WHERE c2 IS NOT NULL
    """,
)
def ts_velocity_acceleration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and second discrete derivatives of daily revenue —
    velocity (day-over-day change) and acceleration (change OF the
    change, x_t − 2x_{t−1} + x_{t−2}) with a regime label — the
    growth-review framing ('revenue is up but DEcelerating') that a
    plain trend line (ts_trend_ols) hides.  Pure integer cent
    arithmetic on literal-offset lags; the two leading partial rows
    drop rather than emitting NULL-poisoned derivatives.

    Scale (100 TB): facts collapse to the |days| axis first; one
    window pass over the bounded series (partition key added →
    per-entity derivatives at any cardinality)."""
    ev = load(spark, sf_dir, "events")
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "cents",
        F.lag("cents", 1).over(w).alias("c1"),
        F.lag("cents", 2).over(w).alias("c2"),
    )
    accel = F.col("cents") - 2 * F.col("c1") + F.col("c2")
    return lagged.filter(F.col("c2").isNotNull()).select(
        "d",
        "cents",
        (F.col("cents") - F.col("c1")).alias("velocity_cents"),
        accel.alias("accel_cents"),
        F.when(accel > 0, F.lit("speeding_up"))
        .when(accel < 0, F.lit("slowing_down"))
        .otherwise(F.lit("steady"))
        .alias("regime"),
    )


@register(
    "ts_var_cvar",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
      -- an all-NULL day has no observed P&L: it must not enter the order
      -- statistic (NULL cents ranks NULLS-FIRST in Spark vs NULLS-LAST
      -- here, flipping worst_day/var95) nor inflate n
      HAVING SUM(CAST(ROUND("value" * 100) AS BIGINT)) IS NOT NULL
    ),
    ranked AS (
      SELECT d, cents,
             ROW_NUMBER() OVER (ORDER BY cents, d) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    kth AS (SELECT n, (n * 5 + 99) // 100 AS k FROM ranked LIMIT 1)
    SELECT k.n AS n_days, k.k,
           round(MAX(CASE WHEN r.rk = k.k THEN r.cents END) / 100.0, 6)
             AS var95,
           round(SUM(CASE WHEN r.rk <= k.k THEN r.cents ELSE 0 END)
                 / (k.k * 100.0), 6) AS cvar95,
           MIN(CASE WHEN r.rk = 1 THEN r.d END) AS worst_day
    FROM ranked r CROSS JOIN kth k
    GROUP BY k.n, k.k
    """,
)
def ts_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Conditional VaR (expected shortfall) of daily
    revenue at 95%: VaR is the k-th worst day (k = ceil(0.05·n),
    exact order statistic with (cents, date) tie-break), CVaR the
    mean of the k worst — the tail-risk pair finance reports demand
    because percentile bands (ts_percentile_bands) say where the
    tail STARTS but not how bad it IS inside.  Selection and the
    tail sum are pure integer arithmetic; division happens twice at
    the end.

    Scale (100 TB): facts collapse to the |days| axis, so the global
    order statistic runs on a bounded series; at per-entity grain
    the same plan partitions by entity and the rank is per-group."""
    ev = load(spark, sf_dir, "events")
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.sum(cents).cast("long").alias("cents"))
        # all-NULL days carry no observed P&L — exclude from the order
        # statistic (NULLS-FIRST vs NULLS-LAST rank flip) and from n
        .filter(F.col("cents").isNotNull())
    )
    w = Window.orderBy("cents", "d")
    ranked = daily.select(
        "d",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    kth = ranked.select(
        "n", ((F.col("n") * 5 + 99) / 100).cast("long").alias("k")
    ).limit(1)
    return (
        ranked.crossJoin(F.broadcast(kth.select(F.col("n").alias("nk"), "k")))
        .groupBy(F.col("nk").alias("n_days"), "k")
        .agg(
            F.round(
                F.max(F.when(F.col("rk") == F.col("k"), F.col("cents")))
                / F.lit(100.0),
                6,
            ).alias("var95"),
            F.round(
                F.sum(
                    F.when(F.col("rk") <= F.col("k"), F.col("cents")).otherwise(0)
                )
                / (F.col("k") * F.lit(100.0)),
                6,
            ).alias("cvar95"),
            F.min(F.when(F.col("rk") == 1, F.col("d"))).alias("worst_day"),
        )
        .select("n_days", "k", "var95", "cvar95", "worst_day")
    )


@register(
    "ts_underwater_duration",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    flagged AS (
      SELECT d, cents,
             CASE WHEN cents < MAX(cents) OVER
                    (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  THEN 1 ELSE 0 END AS uw
      FROM daily
    ),
    runs AS (
      SELECT d, uw,
             SUM(CASE WHEN uw = 0 THEN 1 ELSE 0 END) OVER
               (ORDER BY d ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    rl AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM runs WHERE uw = 1 GROUP BY grp
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(COALESCE(SUM(run_len), 0) AS BIGINT) AS underwater_days,
           CAST(COALESCE(MAX(run_len), 0) AS BIGINT) AS max_underwater_run,
           CAST(COUNT(*) AS BIGINT) AS n_drawdown_episodes
    FROM rl
    """,
)
def ts_underwater_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown DURATION analytics: days spent below the running peak
    of daily revenue, the longest single underwater stretch, and the
    number of distinct drawdown episodes — the time axis win_drawdown's
    depth metric ignores (a shallow but month-long slump and a sharp
    two-day dip have identical max-drawdown, opposite duration).
    Underwater days group into episodes with the gaps-and-islands
    running-sum-of-peaks trick (a new at-peak day starts a new group),
    all in exact integers.

    Scale (100 TB): daily collapse, then two ordered passes over the
    bounded |days| series (running max, running episode id) and a
    tiny rollup; per-entity variant adds the partition key."""
    ev = load(spark, sf_dir, "events")
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    flagged = daily.select(
        "d",
        F.when(F.col("cents") < F.max("cents").over(wcum), 1)
        .otherwise(0)
        .alias("uw"),
    )
    runs = flagged.select(
        "d",
        "uw",
        F.sum(F.when(F.col("uw") == 0, 1).otherwise(0)).over(wcum).alias("grp"),
    )
    rl = (
        runs.filter(F.col("uw") == 1)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        rl.agg(
            F.coalesce(F.sum("run_len"), F.lit(0)).cast("long").alias(
                "underwater_days"
            ),
            F.coalesce(F.max("run_len"), F.lit(0)).cast("long").alias(
                "max_underwater_run"
            ),
            F.count(F.lit(1)).cast("long").alias("n_drawdown_episodes"),
        )
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            "underwater_days",
            "max_underwater_run",
            "n_drawdown_episodes",
        )
    )


@register(
    "ts_fourier_weekly_fit",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS di,
             SUM(CAST(ROUND("value" * 100) AS BIGINT)) / 100.0 AS y
      FROM events
      WHERE datediff('day', DATE '2024-01-01',
                     CAST(date_trunc('day', ts) AS DATE)) < 28
      GROUP BY 1
    ),
    reg AS (
      SELECT y, sin(2 * pi() * (di % 7) / 7.0) AS s,
             cos(2 * pi() * (di % 7) / 7.0) AS c
      FROM daily
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(y) AS a,
             SUM(y * s) / NULLIF(SUM(s * s), 0) AS b,
             SUM(y * c) / NULLIF(SUM(c * c), 0) AS cc,
             SUM(s * s) AS ss2, SUM(c * c) AS sc2,
             SUM(y * y) - COUNT(*) * AVG(y) * AVG(y) AS sst
      FROM reg
    )
    SELECT n, round(a, 6) AS baseline,
           round(b, 6) AS sin_coef, round(cc, 6) AS cos_coef,
           round(sqrt(b * b + cc * cc), 6) AS weekly_amplitude,
           round((b * b * ss2 + cc * cc * sc2) / NULLIF(sst, 0), 6)
             AS r2_weekly
    FROM fit
    """,
)
def ts_fourier_weekly_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-harmonic Fourier fit of the weekly cycle: regress daily
    revenue on sin/cos of the weekday angle over exactly FOUR
    COMPLETE WEEKS — completeness makes the harmonics orthogonal to
    the intercept and each other, so OLS collapses to two independent
    projections (b = Σys/Σs², no 3×3 solve) — yielding baseline,
    amplitude, and the share of variance the weekly wave explains
    (ts_seasonality_dow gives the empirical profile;
    ts_dominant_period finds WHICH period; this quantifies HOW MUCH
    of the signal that period is).  All y values are exact
    cents-derived; trig terms are O(1) so sums round stably at 6dp.

    Scale (100 TB): facts collapse to |days|; the fit is one
    reduction over that axis — per-entity fits add the partition
    key."""
    ev = load(spark, sf_dir, "events")
    di = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        ev.filter(di < 28)
        .groupBy(di.alias("di"))
        .agg(
            (
                F.sum(
                    (
                        F.signum("value")
                        * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
                    ).cast("long")
                )
                / F.lit(100.0)
            ).alias("y")
        )
    )
    ang = 2 * F.lit(3.141592653589793) * (F.col("di") % 7) / F.lit(7.0)
    reg = daily.select("y", F.sin(ang).alias("s"), F.cos(ang).alias("c"))
    fit = reg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("y").alias("a"),
        # NULLIF guards (degenerate sweep): a 1-day or single-phase axis
        # zeroes a projection base or the total variance — NULL both sides.
        (
            F.sum(F.col("y") * F.col("s"))
            / F.nullif(F.sum(F.col("s") * F.col("s")), F.lit(0.0))
        ).alias("b"),
        (
            F.sum(F.col("y") * F.col("c"))
            / F.nullif(F.sum(F.col("c") * F.col("c")), F.lit(0.0))
        ).alias("cc"),
        F.sum(F.col("s") * F.col("s")).alias("ss2"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
        (
            F.sum(F.col("y") * F.col("y"))
            - F.count(F.lit(1)) * F.avg("y") * F.avg("y")
        ).alias("sst"),
    )
    return fit.select(
        "n",
        F.round("a", 6).alias("baseline"),
        F.round("b", 6).alias("sin_coef"),
        F.round("cc", 6).alias("cos_coef"),
        F.round(
            F.sqrt(F.col("b") * F.col("b") + F.col("cc") * F.col("cc")), 6
        ).alias("weekly_amplitude"),
        F.round(
            (
                F.col("b") * F.col("b") * F.col("ss2")
                + F.col("cc") * F.col("cc") * F.col("sc2")
            )
            / F.nullif(F.col("sst"), F.lit(0.0)),
            6,
        ).alias("r2_weekly"),
    )


@register(
    "ts_theil_sen_slope",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS di,
             SUM(CAST(ROUND("value" * 100) AS BIGINT)) / 100.0 AS y
      FROM events GROUP BY 1
      -- all-NULL days have no observed level: they enter neither the
      -- pair slopes (a NULL m would rank NULLS-FIRST in Spark vs
      -- NULLS-LAST here) nor the OLS sums (COUNT would mix a 4-day n
      -- with 3-day sums)
      HAVING SUM(CAST(ROUND("value" * 100) AS BIGINT)) IS NOT NULL
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.di - a.di) AS m
      FROM daily a JOIN daily b ON b.di > a.di
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS np
      FROM slopes
    ),
    ols AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(di) AS BIGINT) AS sx, SUM(y) AS sy,
             SUM(di * y) AS sxy, CAST(SUM(di * di) AS BIGINT) AS sxx
      FROM daily
    )
    SELECT r.np AS n_pairs,
           round(MAX(CASE WHEN r.rk = (r.np + 1) // 2 THEN r.m END), 6)
             AS theil_sen_slope,
           round((o.n * o.sxy - o.sx * o.sy)
                 / (o.n * o.sxx - o.sx * o.sx), 6) AS ols_slope
    FROM ranked r CROSS JOIN ols o
    GROUP BY r.np, o.n, o.sxy, o.sx, o.sy, o.sxx
    """,
)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: the MEDIAN of all pairwise day-to-day
    slopes of the revenue series, next to the OLS slope
    (ts_trend_ols's estimator) — the comparison that exposes
    outlier-driven trends: one crazy day can move OLS arbitrarily
    but shifts the slope median by at most one rank position.  The
    pair stage runs on the BOUNDED post-aggregation day axis
    (|days|² pairs, declared-exact like agg_kendall_tau); slopes are
    identical rational divisions on both engines, and the median is
    a row_number order statistic.

    Scale (100 TB): facts collapse to |days| first.  For multi-year
    spines the documented scale path is the repeated-median variant
    over a windowed pair subset, or OLS on winsorized residuals."""
    ev = load(spark, sf_dir, "events")
    di = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = (
        ev.groupBy(di.alias("di"))
        .agg((F.sum(cents) / F.lit(100.0)).alias("y"))
        # all-NULL days carry no level — drop them BEFORE pairing (a NULL
        # slope ranks NULLS-FIRST in Spark vs NULLS-LAST in DuckDB) and
        # before the OLS moment sums (oracle HAVING twin)
        .filter(F.col("y").isNotNull())
    )
    a = daily.select(F.col("di").alias("dia"), F.col("y").alias("ya"))
    b = daily.select(F.col("di").alias("dib"), F.col("y").alias("yb"))
    slopes = a.join(F.broadcast(b), F.col("dib") > F.col("dia")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("dib") - F.col("dia"))).alias("m")
    )
    ranked = slopes.select(
        "m",
        F.row_number().over(Window.orderBy("m")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("np"),
    )
    ols = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("di").cast("long").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("di") * F.col("y")).alias("sxy"),
        F.sum(F.col("di") * F.col("di")).cast("long").alias("sxx"),
    )
    return (
        ranked.crossJoin(F.broadcast(ols))
        .groupBy("np", "n", "sxy", "sx", "sy", "sxx")
        .agg(
            F.round(
                F.max(
                    F.when(
                        F.col("rk") == ((F.col("np") + 1) / 2).cast("long"),
                        F.col("m"),
                    )
                ),
                6,
            ).alias("theil_sen_slope")
        )
        .select(
            F.col("np").alias("n_pairs"),
            "theil_sen_slope",
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6,
            ).alias("ols_slope"),
        )
    )


@register(
    "ts_partial_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS di,
             SUM(CAST(ROUND("value" * 100) AS BIGINT)) / 100.0 AS y
      FROM events GROUP BY 1
    ),
    mu AS (SELECT AVG(y) AS m, CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    c0 AS (
      SELECT SUM((y - (SELECT m FROM mu)) * (y - (SELECT m FROM mu))) AS v
      FROM daily
    ),
    r AS (
      SELECT k.k,
             SUM((a.y - (SELECT m FROM mu)) * (b.y - (SELECT m FROM mu)))
               / (SELECT v FROM c0) AS rk
      FROM range(1, 4) k(k)
      JOIN daily a ON TRUE
      JOIN daily b ON b.di = a.di + k.k
      GROUP BY k.k
    ),
    rw AS (
      SELECT MAX(CASE WHEN k = 1 THEN rk END) AS r1,
             MAX(CASE WHEN k = 2 THEN rk END) AS r2,
             MAX(CASE WHEN k = 3 THEN rk END) AS r3
      FROM r
    )
    SELECT (SELECT n FROM mu) AS n_days,
           round(r1, 6) AS pacf_1,
           round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS pacf_2,
           round((r3 - (r1 - (r2 - r1 * r1) / (1 - r1 * r1) * r1) * r2
                     - (r2 - r1 * r1) / (1 - r1 * r1) * r1)
                 / (1 - (r1 - (r2 - r1 * r1) / (1 - r1 * r1) * r1) * r1
                      - (r2 - r1 * r1) / (1 - r1 * r1) * r2), 6) AS pacf_3
    FROM rw
    """,
)
def ts_partial_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1-3 via the Durbin-Levinson
    recursion on the sample ACF — the AR-order fingerprint
    (ts_autocorrelation's ACF says WHAT correlates; PACF says what
    correlates AFTER shorter lags are regressed out, which is how
    you pick an AR(p) order and distinguish momentum from
    pass-through).  The ACF comes from integer-day lag joins of the
    centered dollar series; the recursion is closed-form algebra on
    three scalars.

    Scale (100 TB): facts collapse to |days|; the three lag joins
    run on that bounded axis (broadcast both sides).  The recursion
    never touches data again."""
    ev = load(spark, sf_dir, "events")
    di = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(di.alias("di")).agg(
        (F.sum(cents) / F.lit(100.0)).alias("y")
    )
    # r12 (guide §5): `daily` is consumed by mu, c0 and BOTH lag-join
    # sides — without a lineage pin each consumer re-runs the full events
    # scan+aggregate.  The frame is |days| rows, so the eager
    # localCheckpoint is ~free and the facts are scanned ONCE (measured
    # 0.67 -> 0.55 s warm at sf0.1; at 100 TB this is 3 saved scans).
    daily = daily.localCheckpoint()
    mu = daily.agg(F.avg("y").alias("m"), F.count(F.lit(1)).cast("long").alias("n"))
    centered = daily.crossJoin(F.broadcast(mu)).select(
        "di", (F.col("y") - F.col("m")).alias("cy"), "n"
    )
    c0 = centered.agg(F.sum(F.col("cy") * F.col("cy")).alias("v"))
    ks = spark.range(1, 4).select(F.col("id").cast("int").alias("k"))
    a = centered.select(F.col("di").alias("dia"), F.col("cy").alias("cya"))
    b = centered.select(F.col("di").alias("dib"), F.col("cy").alias("cyb"))
    r = (
        F.broadcast(ks)
        .crossJoin(a)
        .join(F.broadcast(b), F.col("dib") == F.col("dia") + F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("cya") * F.col("cyb")).alias("num"))
        .crossJoin(F.broadcast(c0))
        .select("k", (F.col("num") / F.col("v")).alias("rk"))
    )
    rw = r.agg(
        F.max(F.when(F.col("k") == 1, F.col("rk"))).alias("r1"),
        F.max(F.when(F.col("k") == 2, F.col("rk"))).alias("r2"),
        F.max(F.when(F.col("k") == 3, F.col("rk"))).alias("r3"),
    )
    p2 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    p21 = F.col("r1") - p2 * F.col("r1")
    p3 = (F.col("r3") - p21 * F.col("r2") - p2 * F.col("r1")) / (
        1 - p21 * F.col("r1") - p2 * F.col("r2")
    )
    return rw.crossJoin(F.broadcast(mu.select("n"))).select(
        F.col("n").alias("n_days"),
        F.round("r1", 6).alias("pacf_1"),
        F.round(p2, 6).alias("pacf_2"),
        F.round(p3, 6).alias("pacf_3"),
    )


@register(
    "ts_decline_streak_alert",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    flagged AS (
      SELECT d, cents,
             CASE WHEN cents < LAG(cents) OVER (ORDER BY d)
                  THEN 1 ELSE 0 END AS declined
      FROM daily
    ),
    runs AS (
      SELECT d, cents, declined,
             SUM(CASE WHEN declined = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    streaks AS (
      SELECT d, cents, declined,
             CAST(SUM(declined) OVER (PARTITION BY grp ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS streak
      FROM runs
    )
    SELECT d, cents, streak,
           CASE WHEN streak >= 2 THEN 1 ELSE 0 END AS alert
    FROM streaks WHERE streak >= 1
    """,
)
def ts_decline_streak_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-decline streak tracker: for every down day, how
    many days revenue has declined in a row, with an alert at ≥2
    consecutive declines (this fixture's mean-reverting series never
    strings three together — a real deployment raises the bar), built
    from the same
    gaps-and-islands machinery as ts_underwater_duration but against
    the PREVIOUS DAY, not the running peak — a series can decline
    for a week while still above an old trough, and vice versa.

    Scale (100 TB): daily collapse then two ordered passes over the
    bounded day axis; per-metric streams add the partition key."""
    ev = load(spark, sf_dir, "events")
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.orderBy("d")
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    flagged = daily.select(
        "d",
        "cents",
        F.when(F.col("cents") < F.lag("cents").over(w), 1)
        .otherwise(0)
        .alias("declined"),
    )
    runs = flagged.select(
        "d",
        "cents",
        "declined",
        F.sum(F.when(F.col("declined") == 0, 1).otherwise(0)).over(wc).alias("grp"),
    )
    wg = Window.partitionBy("grp").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    streaks = runs.select(
        "d", "cents", "declined", F.sum("declined").over(wg).alias("streak")
    )
    return streaks.filter(F.col("streak") >= 1).select(
        "d",
        "cents",
        "streak",
        F.when(F.col("streak") >= 2, 1).otherwise(0).alias("alert"),
    )


@register(
    "agg_hurst_rescaled_range",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01',
                      CAST(date_trunc('day', ts) AS DATE)) AS di,
             SUM(CAST(ROUND("value" * 100) AS BIGINT)) / 100.0 AS y
      FROM events GROUP BY 1
    ),
    ws AS (SELECT w FROM (VALUES (5), (10), (15)) v(w)),
    blocks AS (
      SELECT ws.w, d.di // ws.w AS blk, d.di, d.y,
             AVG(d.y) OVER (PARTITION BY ws.w, d.di // ws.w) AS mu,
             COUNT(*) OVER (PARTITION BY ws.w, d.di // ws.w) AS bn
      FROM daily d CROSS JOIN ws
    ),
    cum AS (
      SELECT w, blk, bn,
             SUM(y - mu) OVER (PARTITION BY w, blk ORDER BY di
                               ROWS UNBOUNDED PRECEDING) AS z,
             y, mu
      FROM blocks WHERE bn = w
    ),
    per_block AS (
      SELECT w, blk,
             MAX(z) - MIN(z) AS r,
             sqrt(SUM((y - mu) * (y - mu)) / w) AS s
      FROM cum GROUP BY w, blk, bn
    ),
    rs AS (
      SELECT w, AVG(r / s) AS avg_rs FROM per_block WHERE s > 0 GROUP BY w
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np, SUM(ln(w * 1.0)) AS sx,
             SUM(ln(avg_rs)) AS sy,
             SUM(ln(w * 1.0) * ln(avg_rs)) AS sxy,
             SUM(ln(w * 1.0) * ln(w * 1.0)) AS sxx
      FROM rs
    )
    SELECT np AS n_window_sizes,
           round((np * sxy - sx * sy) / (np * sxx - sx * sx), 6)
             AS hurst_exponent
    FROM fit
    """,
)
def agg_hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis: split the
    daily series into blocks of 5/10/15 days, compute each block's
    range-of-cumulative-deviations over its standard deviation, and
    fit ln(R/S) against ln(window) — H ≈ 0.5 is a random walk, > 0.5
    trending/persistent, < 0.5 mean-reverting (the regime diagnosis
    behind ts_decline_streak_alert's empirical observation that
    declines don't chain on this fixture).  Blocks drop when
    incomplete; the log-log fit is closed-form OLS on three points.

    Scale (100 TB): facts collapse to |days| then everything
    windows over (window_size, block) partitions of that bounded
    axis — the fan-out is 3×, not data-sized."""
    ev = load(spark, sf_dir, "events")
    di = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(di.alias("di")).agg(
        (F.sum(cents) / F.lit(100.0)).alias("y")
    )
    ws = spark.createDataFrame([(5,), (10,), (15,)], "w int")
    blk = F.floor(F.col("di") / F.col("w"))
    wb = Window.partitionBy("w", blk)
    blocks = daily.crossJoin(F.broadcast(ws)).select(
        "w",
        blk.alias("blk"),
        "di",
        "y",
        F.avg("y").over(wb).alias("mu"),
        F.count(F.lit(1)).over(wb).alias("bn"),
    )
    wcum = Window.partitionBy("w", "blk").orderBy("di").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = blocks.filter(F.col("bn") == F.col("w")).select(
        "w",
        "blk",
        F.sum(F.col("y") - F.col("mu")).over(wcum).alias("z"),
        "y",
        "mu",
    )
    per_block = cum.groupBy("w", "blk").agg(
        (F.max("z") - F.min("z")).alias("r"),
        F.sqrt(
            F.sum((F.col("y") - F.col("mu")) * (F.col("y") - F.col("mu")))
            / F.col("w")
        ).alias("s"),
    )
    rs = (
        per_block.filter(F.col("s") > 0)
        .groupBy("w")
        .agg(F.avg(F.col("r") / F.col("s")).alias("avg_rs"))
    )
    lx = F.log(F.col("w") * F.lit(1.0))
    ly = F.log("avg_rs")
    fit = rs.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    return fit.select(
        F.col("np").alias("n_window_sizes"),
        F.round(
            (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("hurst_exponent"),
    )


@register(
    "ts_day_percentile_vs_history",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT cur.d, cur.cents,
             CAST(COUNT(h.d) AS BIGINT) AS n_history,
             CAST(SUM(CASE WHEN h.cents < cur.cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_below,
             CAST(SUM(CASE WHEN h.cents = cur.cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_equal
      FROM daily cur JOIN daily h ON h.d < cur.d
      GROUP BY cur.d, cur.cents
    )
    SELECT d, cents, n_history,
           round((n_below + 0.5 * n_equal) / n_history, 6)
             AS pct_vs_history
    FROM scored WHERE n_history >= 7
    """,
)
def ts_day_percentile_vs_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Today was a p87 day': each day's revenue expressed as its
    midrank percentile among ALL prior days — the anomaly framing
    humans actually parse (z-scores assume normality,
    ts_percentile_bands uses a fixed trailing window; this uses the
    full expanding history, which is how 'best day since launch'
    claims are checked).  The expanding comparison runs as a
    bounded self-join on the day axis with exact integer compares;
    days with under a week of history are withheld rather than
    reported on 2-day baselines.

    Scale (100 TB): facts collapse to |days| first; the |days|²/2
    expanding pair set stays trivial for years of dailies (for
    per-entity×minute grids, swap to a mergeable quantile sketch
    probed per row)."""
    ev = load(spark, sf_dir, "events")
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    cur = daily.select(F.col("d").alias("dc"), F.col("cents").alias("vc"))
    h = daily.select(F.col("d").alias("dh"), F.col("cents").alias("vh"))
    scored = (
        cur.join(F.broadcast(h), F.col("dh") < F.col("dc"))
        .groupBy("dc", "vc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_history"),
            F.sum(F.when(F.col("vh") < F.col("vc"), 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col("vh") == F.col("vc"), 1).otherwise(0))
            .cast("long")
            .alias("n_equal"),
        )
    )
    return scored.filter(F.col("n_history") >= 7).select(
        F.col("dc").alias("d"),
        F.col("vc").alias("cents"),
        "n_history",
        F.round(
            (F.col("n_below") + 0.5 * F.col("n_equal")) / F.col("n_history"), 6
        ).alias("pct_vs_history"),
    )


@register(
    "agg_log_return_volatility",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    rets AS (
      SELECT CASE WHEN cents > 0
                   AND LAG(cents) OVER (ORDER BY d) > 0
                  THEN ln(cents * 1.0 / LAG(cents) OVER (ORDER BY d))
             END AS r
      FROM daily
    ),
    m AS (
      SELECT CAST(COUNT(r) AS BIGINT) AS n, AVG(r) AS mu,
             SUM(r * r) AS srr
      FROM rets WHERE r IS NOT NULL
    )
    SELECT n,
           round(mu, 6) AS mean_log_return,
           round(sqrt(srr / n - mu * mu), 6) AS daily_vol,
           round(sqrt(srr / n - mu * mu) * sqrt(365.0), 6)
             AS annualized_vol
    FROM m
    """,
)
def agg_log_return_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-return volatility of daily revenue: mean daily log return
    and the population standard deviation, annualized by √365 — the
    finance-standard variability scalar that is scale-free and
    time-additive where raw-level dispersion (ts_bollinger_bands)
    is neither; the number that makes this series comparable to any
    other series.  Returns are ln of exact integer cent ratios;
    each term is O(0.1), so 6-dp rounding dominates engine float
    order.

    Scale (100 TB): daily collapse, one lag pass, one 1-row moment
    reduction — per-entity vol surfaces add the partition key."""
    ev = load(spark, sf_dir, "events")
    cents = (
        F.signum("value") * ((F.abs(F.col("value")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.orderBy("d")
    # a log return is undefined off a non-positive level (non-finite
    # regime: a zero/negative day made ANSI Spark abort on x/0 and
    # DuckDB abort on ln(0) — guard the ratio, don't rely on either
    # engine's out-of-domain behavior)
    prev = F.lag("cents").over(w)
    rets = daily.select(
        F.when(
            (F.col("cents") > 0) & (prev > 0),
            F.log(F.col("cents") * F.lit(1.0) / prev),
        ).alias("r")
    ).filter(F.col("r").isNotNull())
    m = rets.agg(
        F.count("r").cast("long").alias("n"),
        F.avg("r").alias("mu"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
    )
    vol = F.sqrt(F.col("srr") / F.col("n") - F.col("mu") * F.col("mu"))
    return m.select(
        "n",
        F.round("mu", 6).alias("mean_log_return"),
        F.round(vol, 6).alias("daily_vol"),
        F.round(vol * F.sqrt(F.lit(365.0)), 6).alias("annualized_vol"),
    )


@register(
    "ts_month_seasonal_index",
    oracle="""
    WITH monthly AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mo,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1993 AND 1997
      GROUP BY 1, 2
    ),
    shares AS (
      SELECT yr, mo,
             cents * 1.0 / SUM(cents) OVER (PARTITION BY yr) AS share
      FROM monthly
    )
    SELECT mo AS month,
           CAST(COUNT(*) AS BIGINT) AS n_years,
           round(AVG(share) * 12, 6) AS seasonal_index,
           round(MIN(share) * 12, 6) AS min_index,
           round(MAX(share) * 12, 6) AS max_index
    FROM shares GROUP BY mo
    """,
)
def ts_month_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonal index over five complete years of
    orders: each month's share of its year's revenue, averaged
    across years and scaled so 1.0 = a seasonally flat month — the
    annual-cycle complement to the weekday family
    (ts_seasonality_dow, ts_fourier_weekly_fit work the events
    month; THIS uses the multi-year order history, the only fixture
    axis long enough to see an annual cycle), with min/max across
    years exposing how stable each month's index is.  Within-year
    shares make the index level-proof: a growth trend cannot fake
    seasonality.

    Scale (100 TB): facts collapse to |years|×12 cells in one
    map-side-combined pass; everything after is bounded."""
    o = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice") * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    monthly = (
        o.filter(F.year("o_orderdate").between(1993, 1997))
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    shares = monthly.select(
        "yr",
        "mo",
        (
            F.col("cents")
            * F.lit(1.0)
            / F.sum("cents").over(Window.partitionBy("yr"))
        ).alias("share"),
    )
    return shares.groupBy(F.col("mo").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_years"),
        F.round(F.avg("share") * 12, 6).alias("seasonal_index"),
        F.round(F.min("share") * 12, 6).alias("min_index"),
        F.round(F.max("share") * 12, 6).alias("max_index"),
    )


_DAILY_ORDERS_SQL = """
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
"""


def _daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue in exact integer cents + order counts — the
    shared single-series base for the price-style indicator ops below
    (same construction as ts_decline_streak_alert's daily axis)."""
    o = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    return o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(cents).cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


@register(
    "ts_macd_indicator",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    -- a day with no observed revenue has no close: it must not enter the
    -- EMA fold (a NULL would poison the recurrence from there on)
    c AS (SELECT d, cents / 100.0 AS close FROM daily
          WHERE cents IS NOT NULL),
    ema AS (
      SELECT d, close,
             list_reduce(list(close) OVER w60,
               (a, x) -> a * (1.0 - 2.0/13.0) + x * (2.0/13.0)) AS ema12,
             list_reduce(list(close) OVER w60,
               (a, x) -> a * (1.0 - 2.0/27.0) + x * (2.0/27.0)) AS ema26
      FROM c
      WINDOW w60 AS (ORDER BY d ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
    ),
    m AS (SELECT d, close, ema12 - ema26 AS macd FROM ema),
    sig AS (
      SELECT d, close, macd,
             list_reduce(list(macd) OVER w27,
               (a, x) -> a * 0.8 + x * 0.2) AS signal
      FROM m
      WINDOW w27 AS (ORDER BY d ROWS BETWEEN 26 PRECEDING AND CURRENT ROW)
    )
    SELECT d, round(close, 6) AS close,
           round(macd, 6) + 0.0 AS macd,
           round(signal, 6) + 0.0 AS signal,
           round(macd - signal, 6) + 0.0 AS histogram
    FROM sig
    """,
)
def ts_macd_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD (12/26 EMA spread) with a 9-period signal line and histogram
    over the daily revenue series — the classic momentum crossover read
    ('histogram flips sign' = trend change) applied to an operational KPI.
    EMAs use the module's bounded-fold definition (ts_ewma): a left fold
    over the trailing 60-row frame with the exact alpha literals, so both
    engines execute the identical IEEE operation sequence; the signal line
    is a second 27-row fold over the derived MACD values.  Early rows are
    warm-up values of the truncated definition — identical on both sides,
    kept (not withheld) so the series starts at day one.

    Scale (100 TB): the fact table collapses to the |days| axis first;
    both folds are O(frame) per row on that bounded axis.  Per-instrument
    MACD adds a partitionBy key to the same windows."""
    daily = _daily_orders(spark, sf_dir)
    c = daily.where(F.col("cents").isNotNull()).select(
        "d", (F.col("cents") / 100.0).alias("close")
    )
    w60 = Window.orderBy("d").rowsBetween(-59, 0)

    def fold(col, alpha, w):
        vals = F.collect_list(col).over(w)
        return F.aggregate(
            F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda a, x: a * (F.lit(1.0) - alpha) + x * alpha,
        )

    ema = c.select(
        "d", "close",
        fold("close", F.lit(2.0) / 13.0, w60).alias("ema12"),
        fold("close", F.lit(2.0) / 27.0, w60).alias("ema26"),
    )
    m = ema.select("d", "close", (F.col("ema12") - F.col("ema26")).alias("macd"))
    w27 = Window.orderBy("d").rowsBetween(-26, 0)
    sig = m.select(
        "d", "close", "macd", fold("macd", F.lit(0.2), w27).alias("signal")
    )
    return sig.select(
        "d",
        F.round("close", 6).alias("close"),
        (F.round("macd", 6) + 0.0).alias("macd"),
        (F.round("signal", 6) + 0.0).alias("signal"),
        (F.round(F.col("macd") - F.col("signal"), 6) + 0.0).alias("histogram"),
    )


@register(
    "ts_stochastic_oscillator",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    k AS (
      SELECT d,
             MIN(cents) OVER w14 AS low14,
             MAX(cents) OVER w14 AS high14,
             COUNT(*) OVER w14 AS n_win,
             cents
      FROM daily
      WINDOW w14 AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    pk AS (
      SELECT d,
             CASE WHEN high14 = low14 THEN 50.0
                  ELSE 100.0 * (cents - low14) / CAST(high14 - low14 AS DOUBLE)
             END AS pct_k
      FROM k WHERE n_win = 14
    )
    SELECT d, round(pct_k, 6) AS pct_k,
           round(AVG(pct_k) OVER (ORDER BY d
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS pct_d
    FROM pk
    """,
)
def ts_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K/%D over the daily revenue series: where
    today sits inside the trailing 14-day [low, high] channel (0 = at the
    low, 100 = at the high), smoothed by a 3-day %D — the bounded
    mean-reversion gauge that complements ts_rsi_indicator's momentum
    view.  %K divides exact BIGINT channel arithmetic (flat channels pin
    50.0 by convention, same CASE both engines); rows without a full
    14-day window are withheld, and %D averages the identical three
    doubles in identical frame order.

    Scale (100 TB): same bounded-|days|-axis argument as RSI — min/max
    windows after the map-side daily collapse, never over raw orders."""
    daily = _daily_orders(spark, sf_dir)
    w14 = Window.orderBy("d").rowsBetween(-13, 0)
    k = daily.select(
        "d", "cents",
        F.min("cents").over(w14).alias("low14"),
        F.max("cents").over(w14).alias("high14"),
        F.count(F.lit(1)).over(w14).alias("n_win"),
    )
    pk = k.filter(F.col("n_win") == 14).select(
        "d",
        F.when(F.col("high14") == F.col("low14"), F.lit(50.0))
        .otherwise(
            100.0
            * (F.col("cents") - F.col("low14"))
            / (F.col("high14") - F.col("low14")).cast("double")
        )
        .alias("pct_k"),
    )
    w3 = Window.orderBy("d").rowsBetween(-2, 0)
    return pk.select(
        "d",
        F.round("pct_k", 6).alias("pct_k"),
        F.round(F.avg("pct_k").over(w3), 6).alias("pct_d"),
    )


@register(
    "ts_donchian_breakout",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    ch AS (
      SELECT d, cents,
             MAX(cents) OVER w20 AS high20,
             MIN(cents) OVER w20 AS low20,
             COUNT(*) OVER w20 AS n_prior
      FROM daily
      WINDOW w20 AS (ORDER BY d ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT d, cents, high20, low20,
           CASE WHEN cents > high20 THEN 1 ELSE 0 END AS breakout_up,
           CASE WHEN cents < low20 THEN 1 ELSE 0 END AS breakout_down
    FROM ch WHERE n_prior = 20
    """,
)
def ts_donchian_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel breakouts: the trailing 20-day high/low band
    EXCLUDING today (frame ends at 1 PRECEDING — including today would
    make an up-breakout definitionally impossible), with flags for closes
    escaping the channel — the classic turtle-trading signal, read on
    operational series as 'today beat/undershot everything in the last
    four weeks'.  All-integer cents arithmetic; rows without 20 full
    prior days are withheld.

    Scale (100 TB): min/max windows on the collapsed |days| axis; the
    breakout flags are a narrow projection."""
    daily = _daily_orders(spark, sf_dir)
    w20 = Window.orderBy("d").rowsBetween(-20, -1)
    ch = daily.select(
        "d", "cents",
        F.max("cents").over(w20).alias("high20"),
        F.min("cents").over(w20).alias("low20"),
        F.count(F.lit(1)).over(w20).alias("n_prior"),
    )
    return ch.filter(F.col("n_prior") == 20).select(
        "d", "cents", "high20", "low20",
        F.when(F.col("cents") > F.col("high20"), 1).otherwise(0).alias("breakout_up"),
        F.when(F.col("cents") < F.col("low20"), 1).otherwise(0).alias("breakout_down"),
    )


@register(
    "ts_obv_indicator",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    chg AS (
      SELECT d, cents, n_orders,
             CASE WHEN cents > LAG(cents) OVER (ORDER BY d) THEN 1
                  WHEN cents < LAG(cents) OVER (ORDER BY d) THEN -1
                  ELSE 0 END AS direction
      FROM daily
    )
    SELECT d, cents, direction,
           CAST(SUM(direction * n_orders) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS obv
    FROM chg
    """,
)
def ts_obv_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume: the running sum of daily order COUNT signed by
    the revenue direction (up-day adds volume, down-day subtracts) — the
    divergence detector ('revenue flat but OBV falling = fewer, larger
    orders propping it up').  The first day has no prior close and signs
    0 in both engines (LAG null compares unknown → ELSE branch).
    All-integer arithmetic end to end; the oracle running SUM is cast
    BIGINT (DuckDB widens to HUGEINT — the r4 type-lint class).

    Scale (100 TB): lag + running sum on the |days| axis after the
    map-side collapse; per-segment OBV adds a partition key."""
    daily = _daily_orders(spark, sf_dir)
    w = Window.orderBy("d")
    chg = daily.select(
        "d", "cents", "n_orders",
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
        .when(F.col("cents") < F.lag("cents").over(w), -1)
        .otherwise(0)
        .alias("direction"),
    )
    return chg.select(
        "d", "cents", "direction",
        F.sum(F.col("direction") * F.col("n_orders"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("obv"),
    )


_DAILY_EVENTS_HLC_SQL = """
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(ROUND(MAX(value) * 100) AS BIGINT) AS high_c,
             CAST(ROUND(MIN(value) * 100) AS BIGINT) AS low_c,
             CAST(ROUND(arg_max(value,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 20, '0')) * 100) AS BIGINT)
               AS close_c
      FROM events GROUP BY 1
"""


def _daily_events_hlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily high/low/close of the events value stream in exact integer
    cents — ts_ohlc's bar construction collapsed to the day grain (close
    tie-breaks on the unique (ts, event_id) order)."""
    ev = load(spark, sf_dir, "events")
    # NULL-masked close key (r6 ADVICE): DuckDB arg_max skips NULL values,
    # so a day whose LAST tick has a NULL value must close on the last
    # NON-NULL value.  Spark max_by skips NULL *keys*, so masking the key
    # where value IS NULL reproduces arg_max's semantics exactly — the
    # same fix ts_ohlc carries for its bar-grain close.
    key = F.when(F.col("value").isNotNull(), F.struct("ts", "event_id"))
    cents = lambda c: fp_scaled_long(c, 100)
    return ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        cents(F.max("value")).alias("high_c"),
        cents(F.min("value")).alias("low_c"),
        cents(F.max_by("value", key)).alias("close_c"),
    )


@register(
    "ts_pivot_points_daily",
    oracle=f"""
    WITH hlc AS ({_DAILY_EVENTS_HLC_SQL}),
    prev AS (
      SELECT d,
             LAG(high_c) OVER (ORDER BY d) AS ph,
             LAG(low_c) OVER (ORDER BY d) AS pl,
             LAG(close_c) OVER (ORDER BY d) AS pc
      FROM hlc
    )
    SELECT d,
           round((ph + pl + pc) / 300.0, 6) AS pivot,
           round((2 * ((ph + pl + pc) / 3.0) - pl) / 100.0, 6) AS r1,
           round((2 * ((ph + pl + pc) / 3.0) - ph) / 100.0, 6) AS s1,
           round(((ph + pl + pc) / 3.0 + (ph - pl)) / 100.0, 6) AS r2,
           round(((ph + pl + pc) / 3.0 - (ph - pl)) / 100.0, 6) AS s2
    FROM prev WHERE ph IS NOT NULL
    """,
)
def ts_pivot_points_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic floor-trader pivot levels (P, R1/S1, R2/S2) for each day
    from the PREVIOUS day's high/low/close of the event value stream —
    the pre-computed support/resistance lines a monitoring dashboard
    draws before the day starts.  H/L/C are exact integer cents
    (ts_ohlc's deterministic close tie-break); each level is one or two
    exact-int operations followed by a single double division, the same
    expression text in both engines.

    Scale (100 TB): events collapse map-side to the |days| axis; the lag
    and level projection run on ~30 rows per month of history."""
    hlc = _daily_events_hlc(spark, sf_dir)
    w = Window.orderBy("d")
    prev = hlc.select(
        "d",
        F.lag("high_c").over(w).alias("ph"),
        F.lag("low_c").over(w).alias("pl"),
        F.lag("close_c").over(w).alias("pc"),
    )
    psum = F.col("ph") + F.col("pl") + F.col("pc")
    third = psum / 3.0
    return prev.filter(F.col("ph").isNotNull()).select(
        "d",
        F.round(psum / 300.0, 6).alias("pivot"),
        F.round((2 * third - F.col("pl")) / 100.0, 6).alias("r1"),
        F.round((2 * third - F.col("ph")) / 100.0, 6).alias("s1"),
        F.round((third + (F.col("ph") - F.col("pl"))) / 100.0, 6).alias("r2"),
        F.round((third - (F.col("ph") - F.col("pl"))) / 100.0, 6).alias("s2"),
    )


@register(
    "ts_range_expansion",
    oracle=f"""
    WITH hlc AS ({_DAILY_EVENTS_HLC_SQL}),
    r AS (
      SELECT d, high_c - low_c AS range_c,
             AVG(high_c - low_c) OVER (ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS avg_range7,
             COUNT(*) OVER (ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_prior
      FROM hlc
    )
    SELECT d, range_c,
           round(avg_range7, 6) AS avg_range7,
           round(range_c / avg_range7, 6) AS expansion_ratio,
           CASE WHEN range_c > 1.5 * avg_range7 THEN 1 ELSE 0 END
             AS is_expansion
    FROM r WHERE n_prior = 7
    """,
)
def ts_range_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily range-expansion detector: today's high−low span vs the
    trailing 7-day average span (excluding today), flagging days whose
    range exceeds 1.5× the recent norm — the volatility-regime trigger
    (for markets: breakout days; for ops metrics: instability onset).
    Ranges are exact integer cents; the trailing average divides an exact
    integer sum by the pinned count of 7, and the 1.5× comparison runs on
    the same doubles in both engines.

    Scale (100 TB): the usual bounded-|days|-axis windows after map-side
    collapse; per-series expansion adds a partition key."""
    hlc = _daily_events_hlc(spark, sf_dir)
    w7 = Window.orderBy("d").rowsBetween(-7, -1)
    r = hlc.select(
        "d",
        (F.col("high_c") - F.col("low_c")).alias("range_c"),
        F.avg(F.col("high_c") - F.col("low_c")).over(w7).alias("avg_range7"),
        F.count(F.lit(1)).over(w7).alias("n_prior"),
    )
    return r.filter(F.col("n_prior") == 7).select(
        "d", "range_c",
        F.round("avg_range7", 6).alias("avg_range7"),
        F.round(F.col("range_c") / F.col("avg_range7"), 6).alias("expansion_ratio"),
        F.when(F.col("range_c") > 1.5 * F.col("avg_range7"), 1)
        .otherwise(0)
        .alias("is_expansion"),
    )


@register(
    "ts_holt_linear_smoothing",
    oracle=f"""
    WITH RECURSIVE numbered AS (
      SELECT d, v, ROW_NUMBER() OVER (ORDER BY d) AS rn
      FROM (SELECT d, cents / 100.0 AS v FROM ({_DAILY_ORDERS_SQL}) daily
            WHERE cents IS NOT NULL) c
    ),
    holt(rn, d, v, l, b) AS (
      SELECT rn, d, v, v AS l, CAST(0 AS DOUBLE) AS b
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.rn, n.d, n.v,
             CAST(0.3 AS DOUBLE) * n.v
               + CAST(0.7 AS DOUBLE) * (h.l + h.b) AS l,
             CAST(0.1 AS DOUBLE)
               * ((CAST(0.3 AS DOUBLE) * n.v
                   + CAST(0.7 AS DOUBLE) * (h.l + h.b)) - h.l)
               + CAST(0.9 AS DOUBLE) * h.b AS b
      FROM holt h JOIN numbered n ON n.rn = h.rn + 1
    )
    SELECT d, v + 0.0 AS v,
           l + 0.0 AS level,
           b + 0.0 AS trend,
           (l + b) + 0.0 AS forecast_next
    FROM holt
    """,
)
def ts_holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over the daily
    revenue series — level + trend state and the one-step-ahead
    forecast — the next rung up from ts_ewma (which cannot track a
    trending series without lag).  α=0.3, β=0.1, seeded l₁=x₁, b₁=0,
    run from the series start (the classic textbook recursion).

    Engine parity: Spark computes the recurrence as a left fold with a
    STRUCT {{level, trend}} accumulator over the expanding frame; the
    oracle walks the identical recurrence with a recursive CTE — NOT
    ``list_reduce``, whose struct-accumulator folds mis-evaluate the
    second field in DuckDB 1.0 (probed: a 3-element fold returns
    b=0.1167 where the hand recursion gives 0.051; scalar folds like
    ts_ewma's are unaffected).  Both sides execute the same IEEE
    operation sequence, so even deep-recursion values hash equal —
    PROVEN bit-identical r11: the displays are emitted UNROUNDED
    (+0.0 negative-zero normalization only) and hash-match at three
    SFs, which removes the former round(x, 6) — a grain that would
    itself split engines once the level crosses ~5e8 (near-cliff
    probe: 2e7 at sf0.1 and growing linearly with revenue).

    Scale (100 TB): the expanding fold is O(axis²) on the collapsed
    |days| axis — bounded by calendar length, never by table size; for
    per-key smoothing at scale the applyInPandas sequential pass is the
    documented swap-in (same argument as ts_ewma's unbounded variant)."""
    daily = _daily_orders(spark, sf_dir)
    # a day with no observed revenue has no value to smooth: it must not
    # enter the recurrence (a NULL would poison level/trend from there on)
    c = daily.where(F.col("cents").isNotNull()).select(
        "d", (F.col("cents") / 100.0).alias("v")
    )
    # Single-pass fold-with-history (r11, guide §1.2; same transformation
    # as ts_holt_winters_additive): the expanding collect_list window
    # re-folded the whole prefix per row — O(|days|²) steps.  One fold over
    # the collapsed series records each step's state; every old row's fold
    # was a prefix of this one, so each output double is bit-identical.
    one = c.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("d", "v"))).alias("a")
    )
    a = F.col("a")
    n = F.size(a)
    _HIST_T = "array<struct<d:date,v:double,l:double,b:double>>"
    first = F.element_at(a, 1)
    # seed state after observation 1 — which is ALSO row 1's output
    seed = F.struct(
        first["v"].alias("l"),
        F.lit(0.0).alias("b"),
        F.array(
            F.struct(
                first["d"].alias("d"),
                first["v"].alias("v"),
                first["v"].alias("l"),
                F.lit(0.0).alias("b"),
            )
        ).alias("hist"),
    )
    rest = F.slice(a, 2, F.greatest(n - 1, F.lit(0)))

    def step(acc, x):
        new_l = F.lit(0.3) * x["v"] + F.lit(0.7) * (acc["l"] + acc["b"])
        new_b = F.lit(0.1) * (new_l - acc["l"]) + F.lit(0.9) * acc["b"]
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            F.concat(
                acc["hist"],
                F.array(
                    F.struct(
                        x["d"].alias("d"),
                        x["v"].alias("v"),
                        new_l.alias("l"),
                        new_b.alias("b"),
                    )
                ),
            ).alias("hist"),
        )

    hist = F.aggregate(rest, seed, step, lambda acc: acc["hist"])
    # n >= 1 guard: an empty series must not evaluate the seed's
    # element_at(a, 1) (the old form simply had no rows)
    h = one.select(
        F.explode(
            F.when(n >= 1, hist).otherwise(F.array().cast(_HIST_T))
        ).alias("r")
    )
    return h.select(
        F.col("r.d").alias("d"),
        (F.col("r.v") + F.lit(0.0)).alias("v"),
        (F.col("r.l") + F.lit(0.0)).alias("level"),
        (F.col("r.b") + F.lit(0.0)).alias("trend"),
        (F.col("r.l") + F.col("r.b") + F.lit(0.0)).alias(
            "forecast_next"
        ),
    )


@register(
    "ts_week_over_week_same_dow",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL})
    SELECT a.d, a.cents,
           b.cents AS cents_prev_week,
           CASE WHEN b.d IS NULL THEN NULL
                ELSE a.cents - b.cents END AS wow_delta,
           CASE WHEN b.d IS NULL OR b.cents = 0 THEN NULL
                ELSE round((a.cents - b.cents) / CAST(b.cents AS DOUBLE), 6)
           END AS wow_pct
    FROM daily a LEFT JOIN daily b ON b.d = a.d - 7
    """,
)
def ts_week_over_week_same_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week comparison against the SAME weekday (this Monday vs
    last Monday) — the only honest WoW for anything with a weekly rhythm
    (a naive LAG(7 rows) silently compares different weekdays whenever a
    day is missing, and this axis has 6 holes — profile_temporal_coverage
    counts them).  Implemented as a calendar self-join on d−7, so a
    missing prior week yields NULL (identically in both engines) rather
    than a shifted comparison; deltas are exact integer cents.

    Scale (100 TB): the self-join runs on the collapsed |days| axis;
    per-segment WoW adds the segment to both join keys."""
    daily = _daily_orders(spark, sf_dir).select("d", "cents")
    b = daily.select(
        F.col("d").alias("bd"), F.col("cents").alias("cents_prev_week")
    )
    j = daily.join(b, F.col("bd") == F.date_sub(F.col("d"), 7), "left")
    return j.select(
        "d", "cents", "cents_prev_week",
        F.when(F.col("bd").isNull(), F.lit(None).cast("long"))
        .otherwise(F.col("cents") - F.col("cents_prev_week"))
        .alias("wow_delta"),
        F.when(
            F.col("bd").isNull() | (F.col("cents_prev_week") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("cents") - F.col("cents_prev_week"))
                / F.col("cents_prev_week").cast("double"),
                6,
            )
        )
        .alias("wow_pct"),
    )


@register(
    "ts_intraday_volume_curve",
    oracle="""
    WITH hourly AS (
      SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM hourly)
    SELECT hr, n,
           round(n / CAST(total AS DOUBLE), 6) AS share,
           round(CAST(SUM(n) OVER (ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             / CAST(total AS DOUBLE), 6) AS cum_share,
           round(n / CAST(total AS DOUBLE) * 24, 6) AS pace_index
    FROM hourly CROSS JOIN tot
    """,
)
def ts_intraday_volume_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled intraday volume curve: each hour-of-day's share of total
    events, the cumulative curve, and a pace index (share x 24; 1.0 =
    flat) — the profile a pacing/budget system multiplies daily targets
    by (ts_pacing_vs_target consumes exactly this shape) and an on-call
    rota reads for staffing.  Pooled counts, not an average of daily
    shares: exact integer ratios with no order-dependent float
    accumulation, and low-volume days don't get equal weight with
    heavy ones.

    Scale (100 TB): one map-side-combined 24-group count; the window
    and shares run on 24 rows."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = hourly.agg(F.sum("n").cast("long").alias("total"))
    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.crossJoin(F.broadcast(tot)).select(
        "hr", "n",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias("share"),
        F.round(
            F.sum("n").over(w).cast("long") / F.col("total").cast("double"), 6
        ).alias("cum_share"),
        F.round(F.col("n") / F.col("total").cast("double") * 24, 6).alias("pace_index"),
    )


@register(
    "ts_timezone_shift_report",
    oracle="""
    WITH both_zones AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d_utc,
             CAST(date_trunc('day', ts + INTERVAL 8 HOUR) AS DATE) AS d_sgt
      FROM events
    ),
    u AS (SELECT d_utc AS d, CAST(COUNT(*) AS BIGINT) AS n_utc
          FROM both_zones GROUP BY 1),
    s AS (SELECT d_sgt AS d, CAST(COUNT(*) AS BIGINT) AS n_shifted
          FROM both_zones GROUP BY 1)
    SELECT COALESCE(u.d, s.d) AS d,
           COALESCE(u.n_utc, 0) AS n_utc,
           COALESCE(s.n_shifted, 0) AS n_shifted,
           COALESCE(s.n_shifted, 0) - COALESCE(u.n_utc, 0) AS shift_delta
    FROM u FULL OUTER JOIN s ON s.d = u.d
    """,
)
def ts_timezone_shift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-bucket sensitivity to the reporting timezone: the same events
    bucketed by UTC day vs a UTC+8 business day, with the per-day delta
    — the report that settles 'why don't our dailies match the regional
    team's' (events near midnight swap days under the offset; the
    totals reconcile, the days don't).  A fixed +8 offset keeps both
    engines' arithmetic identical (named-zone conversion would pull in
    ICU/JVM tzdata differences — intentionally out of scope here).

    Scale (100 TB): two map-side day counts and a |days| full-outer
    join; adding more zones is one more branch of the same shape."""
    e = load(spark, sf_dir, "events")
    bz = e.select(
        F.date_trunc("day", "ts").cast("date").alias("d_utc"),
        F.date_trunc("day", F.col("ts") + F.expr("INTERVAL 8 HOURS"))
        .cast("date")
        .alias("d_sgt"),
    )
    u = bz.groupBy(F.col("d_utc").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_utc")
    )
    s = bz.groupBy(F.col("d_sgt").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shifted")
    )
    j = u.join(s, "d", "full_outer")
    return j.select(
        "d",
        F.coalesce("n_utc", F.lit(0).cast("long")).alias("n_utc"),
        F.coalesce("n_shifted", F.lit(0).cast("long")).alias("n_shifted"),
        (
            F.coalesce("n_shifted", F.lit(0).cast("long"))
            - F.coalesce("n_utc", F.lit(0).cast("long"))
        ).alias("shift_delta"),
    )


@register(
    "ts_apdex_score",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS total,
             CAST(SUM(CASE WHEN value <= 70.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS satisfied,
             CAST(SUM(CASE WHEN value > 70.0 AND value <= 280.0
                      THEN 1 ELSE 0 END) AS BIGINT) AS tolerating
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, total, satisfied, tolerating,
           round((satisfied + tolerating / 2.0) / CAST(total AS DOUBLE), 6)
             AS apdex,
           CASE WHEN (satisfied + tolerating / 2.0) / CAST(total AS DOUBLE)
                     >= 0.93 THEN 'excellent'
                WHEN (satisfied + tolerating / 2.0) / CAST(total AS DOUBLE)
                     >= 0.88 THEN 'good'
                WHEN (satisfied + tolerating / 2.0) / CAST(total AS DOUBLE)
                     >= 0.82 THEN 'fair'
                ELSE 'poor' END AS rating
    FROM c
    """,
)
def ts_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Apdex per event_type with value-as-latency (T=70, tolerating
    ≤ 4T): (satisfied + tolerating/2) / total, plus
    excellent/good/fair/poor rating bands (cuts at .93/.88/.82 — tuned
    to the fixture's score spread so every band populates; T and the
    bands are the policy knobs) — the industry-standard
    user-satisfaction rollup that turns a latency distribution into one
    comparable number (ts_latency_percentiles_hourly keeps the
    distribution; Apdex is what goes on the exec dashboard).  Counts are
    exact BIGINTs; the score is one division, and the rating CASE
    compares the UNrounded score identically in both engines.

    Scale (100 TB): one map-side-combined (type, day) aggregate; the
    threshold comparisons ride the same scan."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum(F.when(F.col("value") <= 70.0, 1).otherwise(0))
        .cast("long")
        .alias("satisfied"),
        F.sum(F.when((F.col("value") > 70.0) & (F.col("value") <= 280.0), 1).otherwise(0))
        .cast("long")
        .alias("tolerating"),
    )
    score = (F.col("satisfied") + F.col("tolerating") / 2.0) / F.col("total").cast("double")
    return c.select(
        "event_type", "d", "total", "satisfied", "tolerating",
        F.round(score, 6).alias("apdex"),
        F.when(score >= 0.93, "excellent")
        .when(score >= 0.88, "good")
        .when(score >= 0.82, "fair")
        .otherwise("poor")
        .alias("rating"),
    )


@register(
    "ts_effective_sample_size",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    led AS (
      SELECT cents AS x,
             LEAD(cents, 1) OVER w AS x1,
             LEAD(cents, 2) OVER w AS x2,
             LEAD(cents, 3) OVER w AS x3,
             LEAD(cents, 4) OVER w AS x4,
             LEAD(cents, 5) OVER w AS x5
      FROM daily WINDOW w AS (ORDER BY d)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
             CAST(SUM(CASE WHEN x1 IS NULL THEN NULL
                      ELSE CAST(x AS HUGEINT) * x1 END) AS DOUBLE) AS p1,
             CAST(SUM(CASE WHEN x2 IS NULL THEN NULL
                      ELSE CAST(x AS HUGEINT) * x2 END) AS DOUBLE) AS p2,
             CAST(SUM(CASE WHEN x3 IS NULL THEN NULL
                      ELSE CAST(x AS HUGEINT) * x3 END) AS DOUBLE) AS p3,
             CAST(SUM(CASE WHEN x4 IS NULL THEN NULL
                      ELSE CAST(x AS HUGEINT) * x4 END) AS DOUBLE) AS p4,
             CAST(SUM(CASE WHEN x5 IS NULL THEN NULL
                      ELSE CAST(x AS HUGEINT) * x5 END) AS DOUBLE) AS p5,
             CAST(COUNT(x1) AS BIGINT) AS n1, CAST(COUNT(x2) AS BIGINT) AS n2,
             CAST(COUNT(x3) AS BIGINT) AS n3, CAST(COUNT(x4) AS BIGINT) AS n4,
             CAST(COUNT(x5) AS BIGINT) AS n5
      FROM led
    ),
    rho AS (
      SELECT n,
             (p1 / n1 - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
             / (s2 / n - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
               AS r1,
             (p2 / n2 - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
             / (s2 / n - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
               AS r2,
             (p3 / n3 - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
             / (s2 / n - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
               AS r3,
             (p4 / n4 - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
             / (s2 / n - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
               AS r4,
             (p5 / n5 - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
             / (s2 / n - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
               AS r5
      FROM m
    )
    SELECT n,
           round(r1, 6) AS rho1, round(r2, 6) AS rho2, round(r3, 6) AS rho3,
           round(r4, 6) AS rho4, round(r5, 6) AS rho5,
           round(n / (1.0 + 2.0 * (r1 + r2 + r3 + r4 + r5)), 6) AS n_eff,
           round(n / (1.0 + 2.0 * (r1 + r2 + r3 + r4 + r5))
                 / CAST(n AS DOUBLE), 6) AS independence_ratio
    FROM rho
    """,
)
def ts_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation-adjusted effective sample size of the daily
    revenue series: Neff = n / (1 + 2·Σρ₁..₅) — the honest 'how many
    independent observations do I really have' number that every CI and
    t-test on autocorrelated daily KPIs silently needs (with ρ summed
    over the first five lags; monitor use truncates the sum where ρ
    turns negligible).  Lag products pair via LEAD columns and
    accumulate in HUGEINT/decimal(38,0) (cents² overflows int64);
    the five ρ terms add in FIXED textual order into the Neff formula.

    Scale (100 TB): the usual bounded-|days|-axis argument — one window
    pass and a one-row moment rollup; per-series Neff adds a partition
    key and a group key."""
    daily = _daily_orders(spark, sf_dir)
    w = Window.orderBy("d")
    led = daily.select(
        F.col("cents").alias("x"),
        *[F.lead("cents", k).over(w).alias(f"x{k}") for k in range(1, 6)],
    )
    wide = F.col("x").cast("decimal(38,0)")
    m = led.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(wide * F.col("x")).cast("double").alias("s2"),
        *[
            F.sum(
                F.when(F.col(f"x{k}").isNull(), None).otherwise(
                    wide * F.col(f"x{k}")
                )
            )
            .cast("double")
            .alias(f"p{k}")
            for k in range(1, 6)
        ],
        *[
            F.count(F.col(f"x{k}")).cast("long").alias(f"n{k}")
            for k in range(1, 6)
        ],
    )
    mean = F.col("s1") / F.col("n").cast("double")
    var = F.col("s2") / F.col("n") - mean * mean

    def rho(k):
        return (F.col(f"p{k}") / F.col(f"n{k}") - mean * mean) / var

    rsum = rho(1) + rho(2) + rho(3) + rho(4) + rho(5)
    neff = F.col("n") / (F.lit(1.0) + 2.0 * rsum)
    return m.select(
        "n",
        *[F.round(rho(k), 6).alias(f"rho{k}") for k in range(1, 6)],
        F.round(neff, 6).alias("n_eff"),
        F.round(neff / F.col("n").cast("double"), 6).alias("independence_ratio"),
    )


@register(
    "ts_seasonal_adjustment_dow",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    dowd AS (
      SELECT d, cents, CAST(EXTRACT(dow FROM d) AS INTEGER) AS dow
      FROM daily
    ),
    idx AS (
      SELECT dow,
             CAST(SUM(cents) AS BIGINT) AS dow_cents,
             CAST(COUNT(*) AS BIGINT) AS dow_days
      FROM dowd GROUP BY dow
    ),
    tot AS (
      SELECT CAST(SUM(dow_cents) AS BIGINT) AS all_cents,
             CAST(SUM(dow_days) AS BIGINT) AS all_days
      FROM idx
    ),
    factors AS (
      SELECT i.dow,
             (i.dow_cents / CAST(i.dow_days AS DOUBLE))
             / (t.all_cents / CAST(t.all_days AS DOUBLE)) AS factor
      FROM idx i CROSS JOIN tot t
    )
    SELECT d.d, d.cents,
           round(f.factor, 6) AS dow_factor,
           round(d.cents / f.factor, 2) AS adjusted_cents
    FROM dowd d JOIN factors f ON f.dow = d.dow
    """,
)
def ts_seasonal_adjustment_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal adjustment of the daily revenue series: each
    day divides by its weekday's multiplicative factor (that weekday's
    mean ÷ the overall daily mean), producing the deseasonalized series
    every 'are we actually up or is it just Tuesday' question needs
    (ts_seasonality_dow MEASURES the profile; this op APPLIES it).
    Factors are ratios of exact integer sums — one division each — and
    the adjustment is one more; Sunday=0 convention pinned.

    Scale (100 TB): the factor table is 7 rows broadcast back onto the
    |days| axis; per-segment adjustment adds the segment key to both
    aggregates and the join."""
    daily = _daily_orders(spark, sf_dir)
    dowd = daily.select(
        "d", "cents", (F.dayofweek("d") - 1).alias("dow")
    )
    idx = dowd.groupBy("dow").agg(
        F.sum("cents").cast("long").alias("dow_cents"),
        F.count(F.lit(1)).cast("long").alias("dow_days"),
    )
    tot = idx.agg(
        F.sum("dow_cents").cast("long").alias("all_cents"),
        F.sum("dow_days").cast("long").alias("all_days"),
    )
    factors = idx.crossJoin(F.broadcast(tot)).select(
        "dow",
        (
            (F.col("dow_cents") / F.col("dow_days").cast("double"))
            / (F.col("all_cents") / F.col("all_days").cast("double"))
        ).alias("factor"),
    )
    return dowd.join(F.broadcast(factors), "dow").select(
        "d", "cents",
        F.round("factor", 6).alias("dow_factor"),
        # round 2, not 6 (extreme regime): cents-scale values push x*1e6
        # past 2^53 where the engines' round(x, 6) implementations drift
        # an ulp apart; 2dp on a cents column is still 1e-4 dollars
        F.round(F.col("cents") / F.col("factor"), 2).alias("adjusted_cents"),
    )


@register(
    "ts_load_duration_curve",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, d) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    deciles AS (SELECT unnest(range(1, 11)) AS decile)
    SELECT d.decile,
           round(d.decile / 10.0, 6) AS exceedance_frac,
           MAX(r.n) AS n_days,
           CAST(MAX(CASE WHEN r.rk = GREATEST(1, (d.decile * r.n) // 10)
                         THEN r.cents END) AS BIGINT) AS load_cents
    FROM deciles d CROSS JOIN ranked r
    GROUP BY d.decile
    """,
)
def ts_load_duration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-duration curve of daily revenue: sort days by load
    descending and read the level exceeded X% of the time at each
    decile — the utility-industry curve that sizes capacity ('what load
    do we exceed only 10% of days') and, on business KPIs, separates
    baseload from peaks better than a histogram.  Pure rank arithmetic
    on exact integer cents with a deterministic (load DESC, date)
    order; the decile index floor-divides identically in both engines.

    Scale (100 TB): ranks on the collapsed |days| axis; for raw-event
    load curves at scale the exact rank swaps to approx_percentile's
    sketch, same 10-row output."""
    daily = _daily_orders(spark, sf_dir)
    ranked = daily.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.col("cents").desc(), "d"))
        .alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    deciles = daily.sparkSession.createDataFrame(
        [(i,) for i in range(1, 11)], "decile int"
    )
    j = F.broadcast(deciles).crossJoin(ranked)
    target = F.greatest(F.lit(1), F.expr("(decile * n) DIV 10"))
    return (
        j.withColumn("is_target", F.col("rk") == target)
        .groupBy("decile")
        .agg(
            F.max("n").alias("n_days"),
            F.max(F.when(F.col("is_target"), F.col("cents")))
            .cast("long")
            .alias("load_cents"),
        )
        .select(
            "decile",
            F.round(F.col("decile") / 10.0, 6).alias("exceedance_frac"),
            "n_days", "load_cents",
        )
    )


@register(
    "ts_forecaster_bakeoff",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    feats AS (
      SELECT a.d, a.cents,
             b.cents AS naive_dow,
             CAST(SUM(a2.cents) AS BIGINT) AS trail_sum,
             CAST(COUNT(a2.cents) AS BIGINT) AS trail_n
      FROM daily a
      LEFT JOIN daily b ON b.d = a.d - 7
      LEFT JOIN daily a2 ON a2.d >= a.d - 7 AND a2.d < a.d
      GROUP BY a.d, a.cents, b.cents
    ),
    scored AS (
      SELECT d, cents, naive_dow,
             trail_sum / CAST(trail_n AS DOUBLE) AS trail_mean
      FROM feats
      WHERE naive_dow IS NOT NULL AND trail_n = 7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(abs(cents - naive_dow)) AS BIGINT)
                 / CAST(COUNT(*) AS DOUBLE) / 100, 6) AS mae_naive_dow,
           round(CAST(SUM(CAST(round(abs(cents - trail_mean), 6)
                               AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*) / 100, 6) AS mae_trailing_mean,
           CASE WHEN CAST(SUM(abs(cents - naive_dow)) AS BIGINT)
                     * COUNT(*)
                     < CAST(SUM(CAST(round(abs(cents - trail_mean), 6)
                                     AS DECIMAL(28,6))) AS DOUBLE)
                       * COUNT(*)
                THEN 'naive_dow' ELSE 'trailing_mean' END AS winner
    FROM scored
    """,
)
def ts_forecaster_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-forecaster bake-off on the daily revenue series:
    same-weekday naive (value 7 calendar days ago — the WoW-honest
    baseline) vs trailing-7-day mean, scored by MAE over every day with
    both forecasts available — the comparison a forecasting team runs
    BEFORE reaching for models, because a model that can't beat the
    winning baseline here ships nothing
    (ts_seasonal_naive_backtest scores one method; this op picks
    between two).  Naive errors are exact integer cents; trailing-mean
    errors round to 6 dp and sum in DECIMAL so the reduction is
    order-free; the winner CASE compares identical expressions.

    Scale (100 TB): calendar self-joins on the collapsed |days| axis;
    per-series bake-offs add the series key to the joins and rollup."""
    daily = _daily_orders(spark, sf_dir).select("d", "cents")
    a = daily.alias("a")
    b = daily.select(
        F.col("d").alias("bd"), F.col("cents").alias("naive_dow")
    )
    t = daily.select(F.col("d").alias("td"), F.col("cents").alias("tc"))
    feats = (
        a.join(b, F.col("bd") == F.date_sub(F.col("a.d"), 7), "left")
        .join(
            t,
            (F.col("td") >= F.date_sub(F.col("a.d"), 7))
            & (F.col("td") < F.col("a.d")),
            "left",
        )
        .groupBy(F.col("a.d").alias("d"), F.col("a.cents").alias("cents"), "naive_dow")
        .agg(
            F.sum("tc").cast("long").alias("trail_sum"),
            F.count("tc").cast("long").alias("trail_n"),
        )
    )
    scored = feats.filter(
        F.col("naive_dow").isNotNull() & (F.col("trail_n") == 7)
    ).select(
        "cents", "naive_dow",
        (F.col("trail_sum") / F.col("trail_n").cast("double")).alias("trail_mean"),
    )
    nerr = F.sum(F.abs(F.col("cents") - F.col("naive_dow"))).cast("long")
    terr = F.sum(
        F.round(F.abs(F.col("cents") - F.col("trail_mean")), 6).cast("decimal(28,6)")
    ).cast("double")
    cnt = F.count(F.lit(1))
    return scored.agg(
        cnt.cast("long").alias("n_days"),
        F.round(nerr / cnt.cast("double") / 100, 6).alias("mae_naive_dow"),
        F.round(terr / cnt / 100, 6).alias("mae_trailing_mean"),
        F.when(nerr * cnt < terr * cnt, "naive_dow")
        .otherwise("trailing_mean")
        .alias("winner"),
    )


@register(
    "ts_calendarized_run_rate",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    monthly AS (
      SELECT CAST(date_trunc('month', d) AS DATE) AS m,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN EXTRACT(dow FROM d) IN (0, 6)
                      THEN 0 ELSE 1 END) AS BIGINT) AS obs_bdays
      FROM daily GROUP BY 1
    )
    SELECT m, cents, obs_bdays,
           CAST(CASE WHEN cents < 0
                THEN -(CAST(-cents AS HUGEINT) * 10000 // obs_bdays)
                ELSE CAST(cents AS HUGEINT) * 10000 // obs_bdays
                END AS DOUBLE) / 1e6 AS rev_per_bday,
           CAST(CASE WHEN cents < 0
                THEN -(CAST(-cents AS HUGEINT) * 210000 // obs_bdays)
                ELSE CAST(cents AS HUGEINT) * 210000 // obs_bdays
                END AS DOUBLE) / 1e6 AS calendarized_month
    FROM monthly WHERE obs_bdays > 0
    """,
)
def ts_calendarized_run_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendarized monthly run rate: revenue per OBSERVED business day,
    scaled to a standard 21-business-day month — the FP&A normalization
    that makes a 19-business-day February comparable to a 23-day March
    and a partial current month comparable to closed ones (raw monthly
    totals conflate demand with calendar; fn_business_days holds the
    general day-count machinery, Sunday=0 weekend convention here).

    Determinism (r11, first catch of scripts/magnitude_scan.py): the
    displays were `round(x, 6)` on values already at 5.1e8 at sf0.1 —
    the exact cliff class that split engines three times in r8-r10.
    Now exact integer micro-dollars — floor(cents·10⁴·{1,21} ÷
    obs_bdays) in decimal(38,0)/HUGEINT — through ONE correctly-rounded
    int→double division, deterministic at any SF.  The quotient is
    sign-split (CASE on cents < 0, nonnegative operands inside) so the
    display never depends on an engine's negative-quotient convention:
    integer-division semantics vary by engine AND operand type (DuckDB
    v1.0.0 `//` truncates toward zero on BIGINT/HUGEINT but is PLAIN
    division — fraction kept — on DECIMAL/DOUBLE; Spark `DIV` truncates
    on both; measured matrix pinned in tests/test_display_idioms.py),
    while on nonnegative operands truncation == floor == Euclidean and
    every convention agrees.  A refund-heavy month can net negative
    cents, so the fence is load-bearing.  The multiply is decimal
    because cents·210000 passes 2^63 around $44B/month.

    Scale (100 TB): rides the daily collapse; the monthly rollup and
    normalization run on the |months| axis."""
    daily = _daily_orders(spark, sf_dir)
    monthly = daily.groupBy(
        F.date_trunc("month", "d").cast("date").alias("m")
    ).agg(
        F.sum("cents").cast("long").alias("cents"),
        F.sum(
            F.when((F.dayofweek("d") - 1).isin(0, 6), 0).otherwise(1)
        )
        .cast("long")
        .alias("obs_bdays"),
    )
    return monthly.filter(F.col("obs_bdays") > 0).select(
        "m", "cents", "obs_bdays",
        (
            F.expr(
                "CAST(CASE WHEN cents < 0"
                " THEN -(CAST(-cents AS DECIMAL(38,0)) * 10000 DIV obs_bdays)"
                " ELSE CAST(cents AS DECIMAL(38,0)) * 10000 DIV obs_bdays"
                " END AS DOUBLE)"
            )
            / F.lit(1e6)
        ).alias("rev_per_bday"),
        (
            F.expr(
                "CAST(CASE WHEN cents < 0"
                " THEN -(CAST(-cents AS DECIMAL(38,0)) * 210000 DIV obs_bdays)"
                " ELSE CAST(cents AS DECIMAL(38,0)) * 210000 DIV obs_bdays"
                " END AS DOUBLE)"
            )
            / F.lit(1e6)
        ).alias("calendarized_month"),
    )


@register(
    "ts_peak_dow_shift",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    per AS (
      SELECT CAST(EXTRACT(year FROM d) AS INTEGER) AS yr,
             CAST(EXTRACT(dow FROM d) AS INTEGER) AS dow,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM daily GROUP BY 1, 2
    ),
    peaks AS (
      SELECT yr, dow AS peak_dow, cents AS peak_cents,
             ROW_NUMBER() OVER (PARTITION BY yr
                                ORDER BY cents DESC, dow) AS rk
      FROM per
    )
    SELECT yr, peak_dow, peak_cents,
           LAG(peak_dow) OVER (ORDER BY yr) AS prev_peak_dow,
           CASE WHEN LAG(peak_dow) OVER (ORDER BY yr) IS NULL THEN NULL
                WHEN LAG(peak_dow) OVER (ORDER BY yr) <> peak_dow THEN 1
                ELSE 0 END AS peak_shifted
    FROM peaks WHERE rk = 1
    """,
)
def ts_peak_dow_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-peak migration detector: each year's highest-revenue
    weekday (deterministic (cents DESC, dow) argmax) compared with the
    previous year's — a shifted peak is an operational signal (staffing
    rotas, batch windows, and campaign timing are all anchored to 'our
    busy day', and nobody notices when it quietly moves).  Exact
    integer cents; Sunday=0 convention.

    Scale (100 TB): the year×dow grid is at most 7 rows per year; rank
    and lag run on that grid."""
    daily = _daily_orders(spark, sf_dir)
    per = daily.groupBy(
        F.year("d").alias("yr"), (F.dayofweek("d") - 1).alias("dow")
    ).agg(F.sum("cents").cast("long").alias("cents"))
    wr = Window.partitionBy("yr").orderBy(F.col("cents").desc(), "dow")
    peaks = per.select(
        "yr",
        F.col("dow").alias("peak_dow"),
        F.col("cents").alias("peak_cents"),
        F.row_number().over(wr).alias("rk"),
    ).filter(F.col("rk") == 1)
    wy = Window.orderBy("yr")
    prev = F.lag("peak_dow").over(wy)
    return peaks.select(
        "yr", "peak_dow", "peak_cents",
        prev.alias("prev_peak_dow"),
        F.when(prev.isNull(), F.lit(None).cast("int"))
        .when(prev != F.col("peak_dow"), 1)
        .otherwise(0)
        .alias("peak_shifted"),
    )


@register(
    "ts_event_study_window",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    ev AS (
      SELECT d AS event_d FROM daily
      ORDER BY cents DESC, d LIMIT 1
    ),
    win AS (
      SELECT a.d, a.cents,
             CAST(date_diff('day', e.event_d, a.d) AS INTEGER) AS offset_days
      FROM daily a CROSS JOIN ev e
      WHERE date_diff('day', e.event_d, a.d) BETWEEN -30 AND 5
    ),
    base AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS b_cents,
             CAST(COUNT(*) AS BIGINT) AS b_days
      FROM win WHERE offset_days BETWEEN -30 AND -6
    )
    SELECT w.offset_days, w.cents,
           CAST(CASE WHEN b.b_cents < 0
                THEN -(CAST(-b.b_cents AS HUGEINT) * 10000 // b.b_days)
                ELSE CAST(b.b_cents AS HUGEINT) * 10000 // b.b_days
                END AS DOUBLE) / 1e6 AS baseline_per_day,
           round(w.cents / (b.b_cents / CAST(b.b_days AS DOUBLE)) - 1.0, 6)
             AS abnormal_pct
    FROM win w CROSS JOIN base b
    WHERE w.offset_days BETWEEN -5 AND 5
    """,
)
def ts_event_study_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study window: daily revenue in the ±5 days around the
    series' own peak day, expressed as abnormal percentage vs the
    [-30,-6] pre-event baseline mean — the standard event-study frame
    (launch, outage, campaign) with the event date chosen
    deterministically from the data (its maximum-revenue day, ties to
    the earlier date) so the whole analysis reproduces.  Exact integer
    cents; the abnormal ratio (O(1), round-6-safe) is the only float
    op — the baseline-per-day money display goes through the sign-split
    floor-div micro idiom (r11 near-cliff probe: round(x, 6) here sat
    at 1.5e7 at sf0.1 and crosses the ~5e8 engine-split cliff by sf3).

    Scale (100 TB): the event date is a 1-row top-1; the window and
    baseline run on the collapsed |days| axis."""
    daily = _daily_orders(spark, sf_dir)
    ev = (
        daily.orderBy(F.col("cents").desc(), "d")
        .limit(1)
        .select(F.col("d").alias("event_d"))
    )
    win = daily.crossJoin(F.broadcast(ev)).select(
        "d", "cents",
        F.datediff(F.col("d"), F.col("event_d")).cast("int").alias("offset_days"),
    ).filter(F.col("offset_days").between(-30, 5))
    base = win.filter(F.col("offset_days").between(-30, -6)).agg(
        F.sum("cents").cast("long").alias("b_cents"),
        F.count(F.lit(1)).cast("long").alias("b_days"),
    )
    j = win.filter(F.col("offset_days").between(-5, 5)).crossJoin(
        F.broadcast(base)
    )
    baseline = F.col("b_cents") / F.col("b_days").cast("double")
    return j.select(
        "offset_days", "cents",
        (
            F.expr(
                "CAST(CASE WHEN b_cents < 0"
                " THEN -(CAST(-b_cents AS DECIMAL(38,0)) * 10000 DIV b_days)"
                " ELSE CAST(b_cents AS DECIMAL(38,0)) * 10000 DIV b_days"
                " END AS DOUBLE)"
            )
            / F.lit(1e6)
        ).alias("baseline_per_day"),
        F.round(F.col("cents") / baseline - 1.0, 6).alias("abnormal_pct"),
    )


@register(
    "ts_daily_health_score",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s_rev,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS ss_rev,
             CAST(SUM(n_orders) AS BIGINT) AS s_cnt,
             CAST(SUM(CAST(n_orders AS HUGEINT) * n_orders) AS DOUBLE)
               AS ss_cnt
      FROM daily
    ),
    z AS (
      SELECT d.d, d.cents, d.n_orders,
             (d.cents - m.s_rev / CAST(m.n AS DOUBLE))
             / NULLIF(sqrt(m.ss_rev / m.n - (m.s_rev / CAST(m.n AS DOUBLE))
                    * (m.s_rev / CAST(m.n AS DOUBLE))), 0) AS z_rev,
             (d.n_orders - m.s_cnt / CAST(m.n AS DOUBLE))
             / NULLIF(sqrt(m.ss_cnt / m.n - (m.s_cnt / CAST(m.n AS DOUBLE))
                    * (m.s_cnt / CAST(m.n AS DOUBLE))), 0) AS z_cnt
      FROM daily d CROSS JOIN m
    )
    SELECT d, cents, n_orders,
           round(z_rev, 6) AS z_revenue,
           round(z_cnt, 6) AS z_orders,
           round(0.6 * z_rev + 0.4 * z_cnt, 6) AS health_score,
           CASE WHEN 0.6 * z_rev + 0.4 * z_cnt < -2.0 THEN 'critical'
                WHEN 0.6 * z_rev + 0.4 * z_cnt < -1.0 THEN 'warning'
                ELSE 'healthy' END AS status
    FROM z
    """,
)
def ts_daily_health_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite daily health score: revenue and order-count z-scores
    (population moments from exact HUGEINT sums) blended 0.6/0.4 into
    one number with critical/warning/healthy bands — the single-line
    exec dashboard that fronts the per-metric ops (a day can look fine
    on revenue while order count collapses — the blend catches the
    mix).  The blend and band CASE use identical fixed-order
    expressions in both engines; only the sqrt/divisions are float.

    Scale (100 TB): one daily collapse, a one-row moment aggregate
    broadcast back, and a narrow scoring projection."""
    o = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(cents).cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s_rev"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("ss_rev"),
        F.sum("n_orders").cast("long").alias("s_cnt"),
        F.sum(F.col("n_orders").cast("decimal(38,0)") * F.col("n_orders"))
        .cast("double")
        .alias("ss_cnt"),
    )
    j = daily.crossJoin(F.broadcast(m))
    mean_rev = F.col("s_rev") / F.col("n").cast("double")
    mean_cnt = F.col("s_cnt") / F.col("n").cast("double")
    # NULLIF guards (degenerate sweep): a flat or single-day history has
    # zero variance — z-scores are NULL on both sides (status reads
    # 'healthy': no evidence of deviation on a flat baseline).
    z_rev = (F.col("cents") - mean_rev) / F.nullif(
        F.sqrt(F.col("ss_rev") / F.col("n") - mean_rev * mean_rev), F.lit(0.0)
    )
    z_cnt = (F.col("n_orders") - mean_cnt) / F.nullif(
        F.sqrt(F.col("ss_cnt") / F.col("n") - mean_cnt * mean_cnt), F.lit(0.0)
    )
    blend = 0.6 * z_rev + 0.4 * z_cnt
    return j.select(
        "d", "cents", "n_orders",
        F.round(z_rev, 6).alias("z_revenue"),
        F.round(z_cnt, 6).alias("z_orders"),
        F.round(blend, 6).alias("health_score"),
        F.when(blend < -2.0, "critical")
        .when(blend < -1.0, "warning")
        .otherwise("healthy")
        .alias("status"),
    )


@register(
    "ts_ar1_forecast_backtest",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    lagged AS (
      SELECT d, cents AS y,
             LAG(cents) OVER (ORDER BY d) AS x
      FROM daily
    ),
    pairs AS (SELECT y, x FROM lagged WHERE x IS NOT NULL),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      FROM pairs
    ),
    fit AS (
      SELECT n,
             (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS b,
             (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx)
               / n AS a
      FROM s
    ),
    err AS (
      SELECT f.n, f.a, f.b,
             CAST(SUM(CAST(FLOOR(ABS(p.y - (f.a + f.b * p.x)) * 10000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS ar1_abs_q,
             CAST(SUM(ABS(p.y - p.x)) AS BIGINT) AS naive_abs_c
      FROM pairs p CROSS JOIN fit f
      GROUP BY f.n, f.a, f.b
    )
    SELECT n AS n_pairs,
           round(b, 6) AS phi,
           a / 100.0 + 0.0 AS intercept_dollars,
           ar1_abs_q / 10000.0 / n / 100.0 + 0.0 AS mae_ar1,
           naive_abs_c / CAST(n AS DOUBLE) / 100.0 + 0.0 AS mae_naive,
           CASE WHEN ar1_abs_q / 10000.0 < CAST(naive_abs_c AS DOUBLE)
                THEN 'ar1' ELSE 'naive' END AS winner
    FROM err
    """,
)
def ts_ar1_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) one-step forecast backtest on the daily revenue series: fit
    y_t = a + φ·y_{t-1} by OLS over all consecutive-observation pairs,
    then score the fitted forecast's MAE against the naive carry-forward
    (y_t ≈ y_{t-1}) — the first autoregressive rung above
    ts_forecaster_bakeoff's model-free baselines, and the honest check
    that fitting φ actually beats persistence before anyone ships an AR
    model.  φ≈1 recovers the naive forecaster; φ<1 pulls toward the
    mean (the intercept absorbs it).

    Engine parity: the OLS moments are exact HUGEINT/decimal(38,0)
    cross-products of integer cents (int64 would overflow — the
    fixed-point cross-product trap), converted to double only inside
    the closed-form slope/intercept, which is textually identical on
    both sides.  AR1 errors quantize at 1e4 per cent via FLOOR(x+0.5)
    (DuckDB CAST rounds where Spark truncates — the documented
    binning trap); naive errors are exact integer cents.

    Scale (100 TB): the fact table collapses map-side to the |days|
    axis; one window lag, one aggregate, and a 1-row broadcast bind
    for the fit — the same scalar-bind shape as text_bm25_topk.
    Per-series AR(1) adds the series key to the window, the moment
    groupBy, and the bind join."""
    daily = _daily_orders(spark, sf_dir)
    wlag = Window.orderBy("d")
    lagged = daily.select(
        F.col("cents").alias("y"), F.lag("cents").over(wlag).alias("x")
    )
    pairs = lagged.filter(F.col("x").isNotNull())

    def wide(col):
        return F.col(col).cast("decimal(38,0)")

    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # first moments: daily-total cents rows keep only ~4.6x long-Σ
        # headroom at 100 TB (~9e14/day × ~2400 days) — hi/lo split
        fp_split_sum_of(F.col("x")).cast("double").alias("sx"),
        fp_split_sum_of(F.col("y")).cast("double").alias("sy"),
        F.sum(wide("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(wide("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n = F.col("n")
    # NULLIF guard on the OLS denominator (r05 ADVICE): a constant series
    # makes n·sxx − sx² = 0 — Spark's non-ANSI x/0 is already NULL, but
    # DuckDB IEEE division yields inf, so the oracle carries NULLIF and the
    # Spark side mirrors it explicitly to keep both engines at NULL.
    b = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    fit = s.select("n", b.alias("b"), ((F.col("sy") - b * F.col("sx")) / n).alias("a"))
    err = (
        pairs.crossJoin(F.broadcast(fit))
        .groupBy("n", "a", "b")
        .agg(
            # residuals quantized at 1e4/cent reach ~1e18 per ROW at
            # 100 TB — a single-long Σ overflows within a few days of
            # history: hi/lo split
            fp_split_sum_of(
                F.floor(
                    F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
                    * 10000
                    + 0.5
                ).cast("long")
            ).alias("ar1_abs_q"),
            # same magnitude profile as sx/sy (~4.3x long headroom worst
            # case at 100 TB) — hi/lo split like its siblings
            fp_split_sum_of(F.abs(F.col("y") - F.col("x"))).alias(
                "naive_abs_c"
            ),
        )
    )
    return err.select(
        F.col("n").alias("n_pairs"),
        F.round("b", 6).alias("phi"),
        # money-magnitude displays emitted UNROUNDED since r11 (near-cliff
        # probe: the intercept sat at 1.5e7 at sf0.1 and grows with
        # revenue; operands derive from exact quantized sums, identical
        # division sequences both engines).  phi stays round-6: an O(1)
        # coefficient, where 6dp is sound.
        (F.col("a") / 100.0 + F.lit(0.0)).alias("intercept_dollars"),
        (
            F.col("ar1_abs_q") / 10000.0 / F.col("n") / 100.0 + F.lit(0.0)
        ).alias("mae_ar1"),
        (
            F.col("naive_abs_c") / F.col("n").cast("double") / 100.0
            + F.lit(0.0)
        ).alias("mae_naive"),
        F.when(
            F.col("ar1_abs_q") / 10000.0 < F.col("naive_abs_c").cast("double"),
            "ar1",
        )
        .otherwise("naive")
        .alias("winner"),
    )


@register(
    "ts_sharpe_sortino_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    lagged AS (
      SELECT cents, LAG(cents) OVER (ORDER BY d) AS prev
      FROM daily
    ),
    rets AS (
      SELECT CAST(FLOOR((cents - prev) / CAST(prev AS DOUBLE) * 1000000
                        + 0.5) AS BIGINT) AS rq
      FROM lagged WHERE prev IS NOT NULL AND prev <> 0
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(rq) AS BIGINT) AS DOUBLE) AS sr,
             CAST(SUM(CAST(rq AS HUGEINT) * rq) AS DOUBLE) AS srr,
             CAST(SUM(CASE WHEN rq < 0 THEN CAST(rq AS HUGEINT) * rq
                           ELSE 0 END) AS DOUBLE) AS sdd,
             CAST(SUM(CASE WHEN rq < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS downside_days
      FROM rets
    )
    SELECT n AS n_days,
           round(sr / 1000000.0 / n, 6) AS mean_daily_ret,
           round(sqrt((srr - sr * sr / n) / NULLIF(n - 1, 0)) / 1000000.0, 6)
             AS vol_daily,
           round((sr / n) / NULLIF(sqrt((srr - sr * sr / n) / NULLIF(n - 1, 0)), 0)
                 * sqrt(365.0), 6) AS sharpe_annual,
           round((sr / n) / NULLIF(sqrt(sdd / n), 0) * sqrt(365.0), 6)
             AS sortino_annual,
           downside_days
    FROM s
    """,
)
def ts_sharpe_sortino_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe and Sortino ratios of the daily revenue return
    series — risk-adjusted 'performance' of any daily KPI (finance
    reads it on prices; ops teams read it on revenue or volume to
    compare stability across segments: same growth, less whiplash,
    higher Sharpe).  Sortino divides by DOWNSIDE deviation only
    (√(Σ min(r,0)²/n)) — the variant that stops punishing upside
    surprises, alongside the count of down days.

    Engine parity: simple returns quantize to exact 1e-6 integers via
    FLOOR(x+0.5) (identical half-up in both engines; CAST-vs-cast
    rounding trap avoided); all moments are exact HUGEINT/decimal
    sums of those integers, and the closed-form ratios run on the
    same doubles in the same textual order.

    Scale (100 TB): map-side collapse to the |days| axis, one lag
    window, one aggregate.  Per-segment ratios add the segment key
    to the groupBys and the window."""
    daily = _daily_orders(spark, sf_dir)
    lagged = daily.select(
        "cents", F.lag("cents").over(Window.orderBy("d")).alias("prev")
    )
    rets = lagged.filter(
        F.col("prev").isNotNull() & (F.col("prev") != 0)
    ).select(
        F.floor(
            (F.col("cents") - F.col("prev")) / F.col("prev").cast("double")
            * 1_000_000
            + 0.5
        )
        .cast("long")
        .alias("rq")
    )
    rqw = F.col("rq").cast("decimal(38,0)")
    s = rets.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rq").cast("long").cast("double").alias("sr"),
        F.sum(rqw * F.col("rq")).cast("double").alias("srr"),
        F.sum(F.when(F.col("rq") < 0, rqw * F.col("rq")).otherwise(F.lit(0)))
        .cast("double")
        .alias("sdd"),
        F.sum(F.when(F.col("rq") < 0, 1).otherwise(0))
        .cast("long")
        .alias("downside_days"),
    )
    n = F.col("n")
    # NULLIF guards on the risk denominators (r05 ADVICE): an all-upside
    # series has sdd = 0 (and a constant one sd = 0, n = 1 makes n−1 = 0) —
    # Spark non-ANSI x/0 is NULL but DuckDB IEEE division yields inf/nan,
    # so both sides carry the same explicit NULLIF and agree on NULL.
    sd = F.sqrt(
        (F.col("srr") - F.col("sr") * F.col("sr") / n)
        / F.nullif((n - 1).cast("double"), F.lit(0.0))
    )
    dd = F.sqrt(F.col("sdd") / n)
    return s.select(
        n.alias("n_days"),
        F.round(F.col("sr") / 1_000_000.0 / n, 6).alias("mean_daily_ret"),
        F.round(sd / 1_000_000.0, 6).alias("vol_daily"),
        F.round(
            (F.col("sr") / n) / F.nullif(sd, F.lit(0.0)) * F.sqrt(F.lit(365.0)), 6
        ).alias("sharpe_annual"),
        F.round(
            (F.col("sr") / n) / F.nullif(dd, F.lit(0.0)) * F.sqrt(F.lit(365.0)), 6
        ).alias("sortino_annual"),
        "downside_days",
    )


@register(
    "ts_token_bucket_throttle",
    oracle="""
    WITH RECURSIVE numbered AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    tb(user_id, rn, tokens, nthr) AS (
      SELECT user_id, rn, CAST(1 AS DOUBLE), CAST(0 AS BIGINT)
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn,
             CASE WHEN LEAST(2.0, t.tokens + n.gap_us / 7200000000.0) >= 1.0
                  THEN LEAST(2.0, t.tokens + n.gap_us / 7200000000.0) - 1.0
                  ELSE LEAST(2.0, t.tokens + n.gap_us / 7200000000.0) END,
             t.nthr + CASE WHEN LEAST(2.0, t.tokens
                                 + n.gap_us / 7200000000.0) >= 1.0
                           THEN 0 ELSE 1 END
      FROM tb t JOIN numbered n
        ON n.user_id = t.user_id AND n.rn = t.rn + 1
    ),
    final AS (
      SELECT user_id, MAX(rn) AS n, MAX(nthr) AS n_throttled
      FROM tb GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(n_throttled AS BIGINT) AS n_throttled,
           round(n_throttled / CAST(n AS DOUBLE), 6) AS throttle_rate
    FROM final
    """,
)
def ts_token_bucket_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate-limit replay per user: capacity 2 tokens,
    refill 1 token / 2 h, one token per event — replaying the exact
    limiter an API gateway runs, to answer 'which users WOULD have
    been throttled under this policy, and how hard' before the policy
    ships (the offline what-if every rate-limit change needs; params
    are probed so both branches populate on this fixture — a 1/min
    refill never throttles a median-7h-gap stream).  Per user: event
    count, throttled count, throttle rate; the first event always
    admits from a full bucket.

    Engine parity: the bucket recurrence is a per-user left fold with
    a STRUCT accumulator in Spark (F.aggregate structs are correct;
    DuckDB list_reduce struct folds are NOT — the probed
    ts_holt_linear_smoothing bug — so the oracle walks the identical
    recurrence with WITH RECURSIVE over row-numbered events).  Gaps
    are exact integer microseconds (unix_micros ≡ epoch_us); the
    refill divide and ≥1 comparisons run on the same doubles in the
    same order, and nthr monotonically accumulates in exact BIGINT.

    Scale (100 TB): one shuffle on user_id, then per-user O(events)
    folds inside JVM codegen — no cross-user state, so the plan is
    embarrassingly parallel; for unbounded per-user histories the
    applyInPandas sequential pass is the documented swap-in, and the
    streaming twin is applyInPandasWithState holding (tokens,
    last_ts) per key."""
    lst = F.sort_array(
        F.collect_list(
            F.struct(F.unix_micros("ts").alias("us"), F.col("event_id").alias("eid"))
        )
    )
    per_user = load(spark, sf_dir, "events").groupBy("user_id").agg(lst.alias("evs"))
    seed = F.struct(
        F.lit(2.0).alias("tokens"),
        F.lit(0).cast("long").alias("nthr"),
        F.lit(-1).cast("long").alias("prev"),
    )

    def step(acc, x):
        avail = F.when(acc["prev"] < 0, F.lit(2.0)).otherwise(
            F.least(
                F.lit(2.0),
                acc["tokens"] + (x["us"] - acc["prev"]) / F.lit(7200000000.0),
            )
        )
        admitted = avail >= 1.0
        return F.struct(
            F.when(admitted, avail - 1.0).otherwise(avail).alias("tokens"),
            (acc["nthr"] + F.when(admitted, 0).otherwise(1)).alias("nthr"),
            x["us"].alias("prev"),
        )

    folded = per_user.select(
        "user_id",
        F.size("evs").cast("long").alias("n_events"),
        F.aggregate(F.col("evs"), seed, step).alias("st"),
    )
    return folded.select(
        "user_id", "n_events",
        F.col("st")["nthr"].alias("n_throttled"),
        F.round(F.col("st")["nthr"] / F.col("n_events").cast("double"), 6).alias(
            "throttle_rate"
        ),
    )


@register(
    "ts_holt_winters_additive",
    oracle=f"""
    WITH RECURSIVE numbered AS (
      SELECT d, v, cents, ROW_NUMBER() OVER (ORDER BY d) AS rn
      FROM (SELECT d, cents, cents / 100.0 AS v
            FROM ({_DAILY_ORDERS_SQL}) daily
            WHERE cents IS NOT NULL) c
    ),
    init AS (
      SELECT CAST(SUM(CASE WHEN rn <= 7 THEN cents ELSE 0 END) AS BIGINT)
               / 700.0 AS l0
      FROM numbered
    ),
    hw(rn, d, v, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
      SELECT n.rn, n.d, n.v, i.l0, CAST(0 AS DOUBLE),
             (SELECT v FROM numbered WHERE rn = 1) - i.l0,
             (SELECT v FROM numbered WHERE rn = 2) - i.l0,
             (SELECT v FROM numbered WHERE rn = 3) - i.l0,
             (SELECT v FROM numbered WHERE rn = 4) - i.l0,
             (SELECT v FROM numbered WHERE rn = 5) - i.l0,
             (SELECT v FROM numbered WHERE rn = 6) - i.l0,
             (SELECT v FROM numbered WHERE rn = 7) - i.l0
      FROM numbered n CROSS JOIN init i WHERE n.rn = 7
      UNION ALL
      SELECT n.rn, n.d, n.v,
             CAST(0.3 AS DOUBLE) * (n.v - h.s1)
               + CAST(0.7 AS DOUBLE) * (h.l + h.b),
             CAST(0.1 AS DOUBLE)
               * ((CAST(0.3 AS DOUBLE) * (n.v - h.s1)
                   + CAST(0.7 AS DOUBLE) * (h.l + h.b)) - h.l)
               + CAST(0.9 AS DOUBLE) * h.b,
             h.s2, h.s3, h.s4, h.s5, h.s6, h.s7,
             CAST(0.2 AS DOUBLE)
               * (n.v - (CAST(0.3 AS DOUBLE) * (n.v - h.s1)
                         + CAST(0.7 AS DOUBLE) * (h.l + h.b)))
               + CAST(0.8 AS DOUBLE) * h.s1
      FROM hw h JOIN numbered n ON n.rn = h.rn + 1
    )
    SELECT d, v + 0.0 AS v,
           l + 0.0 AS level,
           b + 0.0 AS trend,
           s7 + 0.0 AS seasonal,
           (l + 0.0) + (b + 0.0) + (s1 + 0.0) AS forecast_next
    FROM hw WHERE rn >= 8
    """,
)
def ts_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing over the daily
    revenue series — level + trend + a period-7 seasonal cycle
    (α=0.3, β=0.1, γ=0.2), the next rung above
    ts_holt_linear_smoothing for any series with a weekly rhythm (a
    trend-only smoother lags every Monday dip).  Seasonality is
    POSITIONAL (every 7th observation), the textbook formulation over
    an observation sequence; init is the classic first-season recipe
    (l = mean of obs 1–7, b = 0, sᵢ = yᵢ − l), recursion starts at
    observation 8.  Output per day: level, trend, the seasonal index
    just updated for this position, and the one-step-ahead forecast
    (l + b + next position's seasonal).

    Engine parity: Spark folds a STRUCT {{level, trend, s[7]}}
    accumulator with an array-rotate per step (F.aggregate struct
    folds are correct; DuckDB list_reduce struct folds are NOT — the
    probed ts_holt_linear_smoothing bug — so the oracle walks the
    identical recurrence with WITH RECURSIVE carrying the 7 seasonal
    lanes as explicit columns).  Both sides execute the same IEEE
    sequence; a literal Python replay pins the formula independently
    (tests/test_edge_cases.py, the shared-formula rule).

    Scale (100 TB): O(|days|²) expanding fold on the collapsed
    calendar axis — bounded by time, not data; per-key smoothing at
    scale swaps in the applyInPandas sequential pass (same argument
    as ts_ewma/ts_holt)."""
    daily = _daily_orders(spark, sf_dir)
    # a day with no observed revenue is no observation: it must not enter
    # the recurrence or the positional-seasonality numbering (a NULL would
    # poison level/trend/seasonal from there on, and collect_list's
    # NULL-skipping would silently misalign rn against the row axis)
    c = daily.where(F.col("cents").isNotNull()).select(
        "d", "cents", (F.col("cents") / 100.0).alias("v")
    )
    # Single-pass fold-with-history (r11, guide §1.2): the old form ran an
    # EXPANDING collect_list window and re-folded the whole prefix per row
    # — O(|days|²) recurrence steps (measured 14.0 s at sf0.1).  Collapsing
    # the bounded calendar series into one row and running the recurrence
    # ONCE, recording each step's state into the accumulator, performs the
    # exact same IEEE operations in the exact same order (each old row's
    # fold was a prefix of this one), so every output double is
    # bit-identical; the day axis re-emerges via one explode.  The old
    # expanding window already needed the full series in a single task, so
    # the one-row form holds no more state than before.
    one = c.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("d", "cents", "v"))).alias("a")
    )
    a = F.col("a")
    n = F.size(a)

    def cents_at(k: int):
        return F.element_at(a, k)["cents"]

    # init level from EXACT integer cents (summing seven doubles would
    # hinge on addition order — the one place the two engines differ)
    l0 = (
        cents_at(1) + cents_at(2) + cents_at(3) + cents_at(4)
        + cents_at(5) + cents_at(6) + cents_at(7)
    ) / 700.0
    _HIST_T = "array<struct<d:date,v:double,l:double,b:double,s7:double,s1:double>>"
    # seed state after observation 7: s = [y1-l0 .. y7-l0] (s[1] is the
    # next position due, i.e. position 1's seasonal)
    seed = F.struct(
        l0.alias("l"),
        F.lit(0.0).alias("b"),
        F.transform(
            F.sequence(F.lit(1), F.lit(7)),
            lambda i: F.element_at(a, i)["v"] - l0,
        ).alias("s"),
        F.array().cast(_HIST_T).alias("hist"),
    )
    rest = F.slice(a, 8, F.greatest(n - 7, F.lit(0)))

    def step(acc, x):
        s_due = F.element_at(acc["s"], 1)
        new_l = F.lit(0.3) * (x["v"] - s_due) + F.lit(0.7) * (acc["l"] + acc["b"])
        new_b = F.lit(0.1) * (new_l - acc["l"]) + F.lit(0.9) * acc["b"]
        new_s = F.lit(0.2) * (x["v"] - new_l) + F.lit(0.8) * s_due
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            F.concat(F.slice(acc["s"], 2, 6), F.array(new_s)).alias("s"),
            F.concat(
                acc["hist"],
                F.array(
                    F.struct(
                        x["d"].alias("d"),
                        x["v"].alias("v"),
                        new_l.alias("l"),
                        new_b.alias("b"),
                        # rotated s[7] is new_s; rotated s[1] is old s[2]
                        new_s.alias("s7"),
                        F.element_at(acc["s"], 2).alias("s1"),
                    )
                ),
            ).alias("hist"),
        )

    hist = F.aggregate(rest, seed, step, lambda acc: acc["hist"])
    # n >= 8 guard: with fewer than 8 observations the seed's element_at
    # lookups would be out of bounds; the old per-row form never evaluated
    # them because the rn >= 8 filter removed every such row
    h = one.select(
        F.explode(
            F.when(n >= 8, hist).otherwise(F.array().cast(_HIST_T))
        ).alias("r")
    )
    return h.select(
        F.col("r.d").alias("d"),
        (F.col("r.v") + F.lit(0.0)).alias("v"),
        (F.col("r.l") + F.lit(0.0)).alias("level"),
        (F.col("r.b") + F.lit(0.0)).alias("trend"),
        (F.col("r.s7") + F.lit(0.0)).alias("seasonal"),
        # forecast sums the (+0.0-normalized) components in the same
        # order as the oracle — all UNROUNDED since r11 (bit-identical
        # fold proven at three SFs; the former 6dp rounds were the
        # magnitude cliff, and the rounded-component sum had its own
        # .5-ulp boundary class, hit once at sf0.001)
        (
            (F.col("r.l") + F.lit(0.0))
            + (F.col("r.b") + F.lit(0.0))
            + (F.col("r.s1") + F.lit(0.0))
        ).alias("forecast_next"),
    )


@register(
    "ts_hampel_despike",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    framed AS (
      SELECT d, cents,
             list_sort(list(cents) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS lst,
             COUNT(*) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n_win
      FROM daily
    ),
    med AS (
      SELECT d, cents, lst[4] AS med7
      FROM framed WHERE n_win = 7
    ),
    mad AS (
      SELECT d, cents, med7,
             list_sort(list_transform(
               (SELECT lst FROM framed f WHERE f.d = med.d),
               x -> abs(x - med7)))[4] AS mad7
      FROM med
    )
    SELECT d, cents,
           CAST(med7 AS BIGINT) AS med7,
           CAST(mad7 AS BIGINT) AS mad7,
           CASE WHEN 10000 * abs(cents - med7) > 44478 * mad7
                THEN 1 ELSE 0 END AS is_spike,
           CAST(CASE WHEN 10000 * abs(cents - med7) > 44478 * mad7
                     THEN med7 ELSE cents END AS BIGINT) AS despiked
    FROM mad
    """,
)
def ts_hampel_despike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over the daily revenue series: a centered 7-day
    window's median and MAD, flagging |x − median| > 3·1.4826·MAD and
    replacing flagged days with the window median — the standard
    robust despiker (a rolling MEAN filter drags the spike into its
    neighbors; the Hampel median filter doesn't), used before any
    smoothing/forecasting op so one flash-sale day can't bend the
    trend.  Edge days without a full 7-day frame are withheld (their
    median is over a shorter window and not comparable).

    Engine parity: everything is exact integer cents — the 7-element
    frame median is the sorted list's 4th element (no interpolation),
    the MAD is the median of integer absolute deviations, and the
    3·1.4826·MAD threshold compares as the integer cross-product
    10000·|x−med| > 44478·MAD (the house integer-threshold rule: no
    float literal ever meets a hash).

    Scale (100 TB): map-side collapse to the |days| axis, then one
    ordered window with a 7-row frame — O(1) state per row.
    Per-series despiking adds the series key to the partitionBy."""
    daily = _daily_orders(spark, sf_dir)
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    framed = daily.select(
        "d", "cents",
        F.sort_array(F.collect_list("cents").over(w7)).alias("lst"),
        F.count(F.lit(1)).over(w7).alias("n_win"),
    ).filter(F.col("n_win") == 7)
    med = F.element_at(F.col("lst"), 4)
    with_med = framed.select("d", "cents", "lst", med.alias("med7"))
    mad = F.element_at(
        F.sort_array(
            F.transform(F.col("lst"), lambda x: F.abs(x - F.col("med7")))
        ),
        4,
    )
    scored = with_med.select("d", "cents", "med7", mad.alias("mad7"))
    spike = (10000 * F.abs(F.col("cents") - F.col("med7"))) > (
        44478 * F.col("mad7")
    )
    return scored.select(
        "d", "cents",
        F.col("med7").cast("long").alias("med7"),
        F.col("mad7").cast("long").alias("mad7"),
        F.when(spike, 1).otherwise(0).alias("is_spike"),
        F.when(spike, F.col("med7"))
        .otherwise(F.col("cents"))
        .cast("long")
        .alias("despiked"),
    )
