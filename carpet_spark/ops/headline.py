"""Headline bench queries that complete the BASELINE.md query list.

BASELINE.md measures a TPC-H Q3 shape (`q3_top_orders`) that is not a
single §2 operator — it composes join+agg+topk.  Registered here so bench
and the driver's correctness gate both see it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..exprs import lsum, sql_lsum
from ..registry import register
from ..tables import load


@register(
    "q3_top_orders",
    oracle=f"""
    SELECT l.l_orderkey, o.o_orderdate,
           {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (FIXTURES.md constants): BUILDING customers' orders
    before 1998-03-15, top-10 orders by revenue.  No forced hints: the
    BUILDING-segment customers are a constant FRACTION (~1/5) of an
    unbounded table, so Catalyst/AQE decides — broadcast while it fits,
    sort-merge at 100 TB (r7 VERDICT finding 1).  The only wide op is the
    final groupBy on l_orderkey; top-10 runs as TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BASELINE.md `distinct_users` shape exactly: count(distinct) per
    event_type (agg_distinct is the richer §2 op; this one is the bench
    twin so the timing comparison is like-for-like)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))
