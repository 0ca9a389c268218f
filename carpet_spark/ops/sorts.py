"""Category G — sorts / limits / top-k / set ops (SURVEY.md §2.G).

Determinism rule §7.4.2: every ORDER BY carries a unique tie-break key so
LIMIT/OFFSET results are engine-independent.

Scale notes: orderBy+limit compiles to TakeOrderedAndProject (per-partition
top-k + driver merge of k·partitions rows — no global sort); full orderBy
is a range-partitioned sort (sampled boundaries, no single-node sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load


@register(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort.  The driver hash is order-insensitive
    so the observable is the sorted projection's content; ordering itself is
    asserted in unit tests."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return o.select("o_orderkey", "o_orderpriority", "o_totalprice").orderBy(
        F.col("o_orderpriority").asc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@register(
    "topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 by price with a unique (orderkey, linenumber) tie-break.
    Physical plan: TakeOrderedAndProject — each partition keeps 100 rows,
    driver merges; scales to any row count."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination rows 11-20 of a deterministic (unique-key) sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(10).limit(10)
    )


_SLICE_A = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000"
_SLICE_B = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'"


def _slices(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return a, b


@register("set_union_all", oracle=f"{_SLICE_A} UNION ALL {_SLICE_B}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag concat of two overlapping slices (duplicates preserved) — a pure
    metadata union, zero shuffle."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@register("set_union_distinct", oracle=f"{_SLICE_A} UNION {_SLICE_B}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + hash-dedup (one shuffle on all columns)."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


_SEG_A = "SELECT o_custkey FROM orders WHERE o_totalprice > 150000"
_SEG_B = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@register("set_intersect", oracle=f"{_SEG_A} INTERSECT {_SEG_B}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct custkeys present in both segments (set semantics)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersect(b)


@register("set_except", oracle=f"{_SEG_A} EXCEPT {_SEG_B}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.subtract(b)  # subtract == EXCEPT (set semantics)


@register("set_intersect_all", oracle=f"{_SEG_A} INTERSECT ALL {_SEG_B}")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect: keeps min(multiplicity) copies per key."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b)


@register("set_except_all", oracle=f"{_SEG_A} EXCEPT ALL {_SEG_B}")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset except: keeps max(0, mult_a - mult_b) copies per key."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)
