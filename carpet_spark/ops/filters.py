"""Category B — projections / filters / predicates (SURVEY.md §2.B).

All predicates are Catalyst expressions → pushed to the parquet scan
(PushedFilters, verified in test_plans.py).  At 100 TB pushdown means
row-group stats skipping — the filter runs before the data is read.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load


@register(
    "project_compute",
    oracle="""
    SELECT l_orderkey,
           l_linenumber AS line_no,
           l_extendedprice * (1 - l_discount) AS net_price,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           concat_ws('/', l_returnflag, l_linestatus) AS flag_status
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename + arithmetic + cast.  Per-row double arithmetic is IEEE-exact
    and engine-independent (no aggregation ordering involved); float→int
    conversion uses FLOOR on both sides because bare CAST truncates in Spark
    but rounds in DuckDB.  The status concat is concat_ws on BOTH sides:
    Spark's concat_ws skips NULL args where `||` would null the whole
    string — the oracle must spell the same NULL-skipping semantics."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.floor("l_quantity").alias("qty_floor"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@register(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_shipdate
    FROM lineitem
    WHERE (l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
           AND l_quantity IN (1, 25, 50)
           AND NOT l_returnflag = 'N')
       OR (l_discount > 0.09 AND l_quantity < 2)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cond = (
        F.col("l_shipdate").between("1997-01-01", "1997-12-31")
        & F.col("l_quantity").isin(1, 25, 50)
        & ~(F.col("l_returnflag") == "N")
    ) | ((F.col("l_discount") > 0.09) & (F.col("l_quantity") < 2))
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate",
    )


@register(
    "filter_like_regex",
    oracle=r"""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_type LIKE '%PROMO%' OR regexp_matches(p_brand, '^Brand#1\d$')
    """,
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pushes to parquet as StringContains; rlike evaluates post-scan.
    Pattern kept to the regex subset Java and RE2 agree on."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%PROMO%") | F.col("p_brand").rlike(r"^Brand#1\d$")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "filter_null_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber, disc_nz, tax_nz
    FROM (
      SELECT l_orderkey, l_linenumber,
             NULLIF(l_discount, 0.0) AS disc_nz,
             NULLIF(l_tax, 0.0) AS tax_nz
      FROM lineitem
    )
    WHERE disc_nz IS NOT DISTINCT FROM tax_nz
    """,
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>) over derived nullable columns: keeps rows
    where both are NULL (0-discount & 0-tax) or equal non-null."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_nz"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_nz"),
    )
    return li.filter(F.col("disc_nz").eqNullSafe(F.col("tax_nz")))
