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
from pyspark.sql.window import Window

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


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority class — per-group top-k, the skew-safe way.

    A single window over 5 priority groups means 5 reducers own the whole
    table at 100 TB.  Instead: phase 1 takes top-3 per (group, salt-of-64)
    — 320 tiny partitions, map-heavy, each keeps ≤3 rows — then phase 2
    re-ranks the ≤ groups×64×3 surviving candidates per group.  Any row in
    a group's true top-3 is in its salt bucket's top-3 (row_number over a
    superset can only rank it worse), so the two-phase result is exact.
    The final window sees ≤192 rows per group regardless of table size.
    Tie-break (totalprice DESC, orderkey ASC) is unique, so ranks are
    engine-deterministic."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    salted = Window.partitionBy(
        "o_orderpriority", F.pmod(F.hash("o_orderkey"), F.lit(64))
    ).orderBy(*order_cols)
    cand = (
        o.withColumn("srn", F.row_number().over(salted))
        .filter(F.col("srn") <= 3)
        .drop("srn")
    )
    final = Window.partitionBy("o_orderpriority").orderBy(*order_cols)
    return (
        cand.withColumn("rn", F.row_number().over(final))
        .filter(F.col("rn") <= 3)
    )


@register(
    "set_union_by_name_evolution",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           o_orderpriority,
           NULL AS o_orderstatus
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL BY NAME
    SELECT o_orderkey,
           o_orderstatus,
           o_totalprice
    FROM orders WHERE o_orderkey % 3 = 1
    """,
)
def set_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: combine two table versions whose columns
    differ (an old extract without o_orderstatus, a new one without
    o_orderpriority) by NAME with missing columns null-filled —
    ``unionByName(allowMissingColumns=True)``.  Positional UNION here
    would silently zip o_totalprice under o_orderstatus (same arity,
    different order): the classic schema-drift corruption this operator
    exists to prevent.

    Scale: a union is plan-level concatenation — zero shuffle, zero
    compute; the null-fill is a constant projection.  This is the read
    path for any dataset whose schema grew over time (the write path is
    scan_schema_evolution's mergeSchema)."""
    o = load(spark, sf_dir, "orders")
    v_old = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v_new = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return v_old.unionByName(v_new, allowMissingColumns=True)
