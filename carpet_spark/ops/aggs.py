"""Category E — aggregations (SURVEY.md §2.E).

All money/double sums go through decimal (exprs.dsum/davg) so the
order-insensitive value-hash matches DuckDB bit-for-bit (SURVEY §7.4.1).

Scale notes: every groupBy here compiles to 2-phase HashAggregate
(partial map-side combine → shuffle on group keys → final), which is the
right 100 TB plan: shuffle volume is |groups|, not |rows|.  Low-cardinality
group keys (returnflag×linestatus = 6 groups) make the shuffle negligible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..exprs import davg, dsum, lavg, lsum, sql_davg, sql_dsum, sql_lavg, sql_lsum
from ..registry import register
from ..tables import load


@register(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_davg('l_discount')} AS avg_disc,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate → single-row result; partial aggregation means
    each partition emits one row and the final agg sees |partitions| rows."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        davg(F.col("l_discount")).alias("avg_disc"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


Q1_ORACLE = f"""
SELECT l_returnflag,
       l_linestatus,
       {sql_lsum('l_quantity')} AS sum_qty,
       {sql_lsum('l_extendedprice')} AS sum_base_price,
       {sql_lsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_lsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_lavg('l_quantity')} AS avg_qty,
       {sql_lavg('l_extendedprice')} AS avg_price,
       {sql_lavg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("agg_groupby", oracle=Q1_ORACLE)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship query (SURVEY §7.2 M1).

    6 groups → broadcast-sized result; the scan is the cost.  Filter pushes
    down to parquet row-group stats (l_shipdate max/min per row group).
    Sums use the fixed-point long path (exprs.lsum — primitive-long
    accumulators, hi/lo-split so the merge is exact to ~2.2e12 rows per
    group: a 100 TB Q1 (~6e11 lineitem rows over ~6 groups ⇒ ~1e11
    rows/group) fits with ~20x headroom — see the yardstick note in
    exprs.py; beyond the bound the ANSI overflow aborts loudly and dsum
    is the unbounded decimal path)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            lsum(F.col("l_quantity")).alias("sum_qty"),
            lsum(F.col("l_extendedprice")).alias("sum_base_price"),
            lsum(disc_price).alias("sum_disc_price"),
            lsum(charge).alias("sum_charge"),
            lavg(F.col("l_quantity")).alias("avg_qty"),
            lavg(F.col("l_extendedprice")).alias("avg_price"),
            lavg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group filter on an aggregate — Catalyst keeps it post-agg (cannot
    push), but partial agg still shrinks the shuffle to |custkeys|."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(DISTINCT CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_distinct_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct)/sum(distinct) — Spark expands to a 2-level aggregate
    (distinct keys first, then counts) so it scales without collecting sets.

    DISTINCT-set membership is decided on round(value, 6) in DOUBLE first
    (a dyadic double never sits exactly on a half at the 6th decimal, so
    both engines round alike), then decimal-cast — a direct float→decimal
    cast can round differently between Spark and DuckDB at half boundaries
    and silently change the distinct set (ADVICE r01)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum_distinct(F.round(F.col("value"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_distinct_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "agg_conditional",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           {sql_dsum('CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END')}
             AS discounted_rev,
           COUNT(*) AS n_total
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        dsum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(
                F.lit(0)
            )
        ).alias("discounted_rev"),
        F.count(F.lit(1)).alias("n_total"),
    )


@register(
    "agg_observe_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_qty
    FROM lineitem
    """,
)
def agg_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality metrics via df.observe(Observation): row count, price
    min/max, and a null-counter collected as a SIDE EFFECT of one pass
    over the scan — no second aggregation job.  The op materializes the
    observed values into a single-row DataFrame; count/min/max are exact
    (no float summation), so it hash-checks against the plain aggregate.

    100 TB design: observe() piggybacks AccumulatorV2-style metrics on
    whatever action already runs (the production use is validating a 100 TB
    write without re-scanning it); metric traffic is O(metrics), driver
    merge is per-task constant work."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem")
    obs = Observation("dq_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
    )
    # the action whose pass the metrics ride on (a real pipeline's write)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["min_price"], m["max_price"], m["null_qty"])],
        schema="n_rows long, min_price double, max_price double, null_qty long",
    )
