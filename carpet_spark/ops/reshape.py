"""Reshaping operators — pivot (long→wide), unpivot/melt (wide→long),
seeded sampling.

Scale notes: pivot with an EXPLICIT value list compiles to one pass of
conditional aggregates (no second distinct-scan to discover columns — at
100 TB always pass the list); unpivot is a zero-shuffle stack() projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..exprs import sql_dsum
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


@register("sample_seeded")  # rows-only: RNG streams differ across engines
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli 10% sample with a fixed seed — reproducible within Spark
    (same seed → same rows per partition split) but engine-specific RNG, so
    no hash oracle; the size bound is asserted in tests.  At 100 TB
    sampling is the front door to profiling/sketching without a full scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
