"""Spark 4 SQL-surface operators: recursive CTEs, correlated LATERAL
subqueries, and pipe-syntax queries.

These exercise the *SQL dialect* features a reference-engine user would
reach for — each op registers the needed temp views and runs spark.sql,
so Catalyst sees exactly what an end user's SQL would produce.  All are
hash-checked against the equivalent (classic-dialect) DuckDB query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
      FROM customer WHERE c_custkey % 100 = 0
      UNION ALL
      SELECT start_key, cur // 2, depth + 1 FROM chain WHERE cur > 0
    )
    SELECT start_key,
           MAX(depth) AS depth_to_root,
           COUNT(*) AS chain_len
    FROM chain
    GROUP BY start_key
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): walk a synthetic binary org hierarchy
    (parent(k) = k div 2) from every 100th customer up to the root,
    reporting walk depth and chain length — the hierarchical/graph query
    shape (bill-of-materials, org charts, reachability) that needed
    iterative DataFrame loops before WITH RECURSIVE landed.

    100 TB design: each recursion step is one self-join of the frontier —
    Catalyst unions the step plans, so cost is O(depth x frontier); the
    anchor filter keeps the frontier a fixed fraction of customers, and
    depth is log2(maxkey) ~ bounded."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_rcte")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
          FROM customer_rcte WHERE c_custkey % 100 = 0
          UNION ALL
          SELECT start_key, cur DIV 2, depth + 1 FROM chain WHERE cur > 0
        )
        SELECT start_key,
               MAX(depth) AS depth_to_root,
               COUNT(*) AS chain_len
        FROM chain
        GROUP BY start_key
        """
    )


@register(
    "sql_lateral_topn",
    oracle="""
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) l
    """,
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's top-2 orders by price,
    expressed the way a SQL user writes per-row subqueries — Catalyst
    decorrelates the LATERAL into a ranked window under the hood instead
    of executing |customer| separate queries.

    100 TB design: after decorrelation this is one shuffle on o_custkey
    with per-group top-k — same cost as the explicit window formulation,
    proving the declarative form doesn't pay an execution penalty."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM customer_lat c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders_lat o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) l
        """
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the Q1 pricing-summary shape written as
    a |> pipeline — scan |> filter |> aggregate — the linear-dataflow SQL
    dialect.  Semantically identical to the classic GROUP BY (the oracle);
    Catalyst plans both to the same two-phase hash aggregate with the
    shipdate predicate pushed to the scan."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> AGGREGATE CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                       AS sum_qty,
                     COUNT(*) AS n_rows
           GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql_udf_registered",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NULL THEN NULL
                WHEN o_totalprice >= 200000 THEN 'platinum'
                WHEN o_totalprice >= 100000 THEN 'gold'
                ELSE 'standard' END AS tier,
           upper(substr(o_orderpriority, 3)) AS prio
    FROM orders
    """,
)
def sql_udf_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDFs registered into the SQL catalog and called FROM SQL text — the
    surface that lets analysts use engineering-owned Python functions in
    plain SQL (spark.udf.register).  Two registrations: a Python scalar
    UDF (tier) and a pure-SQL function via expr registration is not needed
    for the second — it stays builtin to show the mixed plan.

    The Python UDF is intentionally trivial and OFF the recommended hot
    path (see udf_scalar's demonstration); what this op pins is the
    REGISTRATION surface: named resolution inside spark.sql(...), mixed in
    one projection with builtin expressions."""
    from pyspark.sql.types import StringType

    def tier(p: float) -> str:
        if p is None:  # NULL price -> NULL tier (an unknown amount has no
            return None  # tier; the oracle's CASE does the same)
        if p >= 200000:
            return "platinum"
        if p >= 100000:
            return "gold"
        return "standard"

    spark.udf.register("carpet_tier", tier, StringType())
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqludf")
    return spark.sql(
        """
        SELECT o_orderkey,
               carpet_tier(o_totalprice) AS tier,
               upper(substring(o_orderpriority, 3)) AS prio
        FROM orders_sqludf
        """
    )


@register(
    "sql_named_parameters",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS DOUBLE) AS revenue
    FROM orders
    WHERE o_totalprice >= 200000.0
      AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter API): the query text
    carries ``:threshold`` / ``:status`` placeholders and values bind
    through ``spark.sql(..., args={...})`` — the injection-safe way to
    template SQL (string-formatting user input into SQL text is the
    classic hole; bound parameters are typed literals to the parser, so
    a malicious value can never become syntax).

    Scale: binding happens at parse time — Catalyst sees constant
    literals and pushes both predicates into the parquet scan exactly as
    if they were hard-coded (no plan-cache/soft-parameter penalty)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT))
                    AS DOUBLE) / 1000000 AS DOUBLE) AS revenue
        FROM orders_param
        WHERE o_totalprice >= :threshold
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"threshold": 200000.0, "status": "F"},
    )


@register(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the SQL-dialect convenience (DuckDB-originated,
    adopted by Spark) where the grouping keys are inferred as every
    non-aggregate select item, eliminating the classic
    copy-the-select-list-into-group-by error; this op runs the SAME
    dialect feature on BOTH engines (Spark SQL executes GROUP BY ALL
    natively here, DuckDB in the oracle), extending the
    dialect-parity family (recursive CTE, pipe syntax, LATERAL,
    named parameters).

    Scale (100 TB): sugar only — Catalyst resolves ALL to the
    explicit keys at analysis time, so the physical plan is the
    standard two-phase hash aggregate."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql_gba_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT))
                    AS DOUBLE) / 1000000 AS DOUBLE) AS revenue
        FROM sql_gba_lineitem
        GROUP BY ALL
        """
    )


@register(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON dialect translation: Postgres/DuckDB's
    `DISTINCT ON (key) ... ORDER BY key, v DESC` (keep one row per
    key by an ordering) has no Spark keyword — the engine-portable
    form is the row_number()-over-window idiom this op runs, and the
    oracle executes the NATIVE DISTINCT ON so the translation is
    proven row-for-row equivalent (each customer's highest-value
    order, orderkey tie-break).  The most-asked dialect-migration
    question there is, answered as a verified op.

    Scale (100 TB): one (key)-partitioned window with a rank-1
    filter — Catalyst pushes the filter into the window (no full
    rank materialization), the same plan a native DISTINCT ON
    compiles to."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "sql_order_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL — the companion dialect feature to GROUP BY ALL
    (sql_group_by_all): sort by every select item left-to-right
    without restating the list, the ergonomic default for report
    queries whose full output IS the sort key.  Runs natively on both
    engines (Spark 4 and DuckDB agree on the left-to-right ALL
    expansion), and because the op's result is totally ordered by all
    columns it is also hash-stable by construction — no tie-break
    column needed.

    Scale (100 TB): ALL resolves at analysis time; the physical plan
    is the standard partial-agg → shuffle → final-agg → rangepartition
    sort, identical to writing the columns out."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("sql_oba_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM sql_oba_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "sql_exists_correlated",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              AND o.o_orderdate < TIMESTAMP '1994-01-01'
          )
    """,
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in SQL text — the subquery shape
    analysts write ('customers with a big order but no old finished
    one') that Catalyst must decorrelate into a left-semi plus a
    left-anti hash join; running it through spark.sql pins that
    rewrite path, the SQL twin of join_semi/join_anti's DataFrame API.
    acctbal_cents uses explicit half-away rounding on both sides — a raw
    CAST would round in DuckDB but truncate in Spark, and 2-dp money
    times 100 lands a ulp BELOW the integer for values like 0.29 (21
    such customers at sf0.001).

    Scale (100 TB): both subqueries decorrelate to equi-key hash joins
    on o_custkey (no per-row subquery execution); the two probes share
    the orders scan and the semi/anti sides carry only the join key."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sqlx")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqlx")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(signum(c.c_acctbal)
                    * CAST(abs(c.c_acctbal) * 100 + 0.5 AS BIGINT)
                    AS BIGINT) AS acctbal_cents
        FROM customer_sqlx c
        WHERE EXISTS (
                SELECT 1 FROM orders_sqlx o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders_sqlx o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                  AND o.o_orderdate < TIMESTAMP '1994-01-01'
              )
        """
    )


@register(
    "sql_values_dim_join",
    oracle="""
    WITH prio_dim(prio, weight, tier) AS (
      VALUES ('1-URGENT',        4, 'expedite'),
             ('2-HIGH',          3, 'expedite'),
             ('3-MEDIUM',        2, 'standard'),
             ('4-NOT SPECIFIED', 1, 'standard'),
             ('5-LOW',           0, 'deferred')
    )
    SELECT d.tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(d.weight) AS BIGINT) AS weight_sum,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN prio_dim d ON d.prio = o.o_orderpriority
    GROUP BY d.tier
    """,
)
def sql_values_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension joined against a fact table — the
    'mapping table in the query text' idiom (priority→weight→tier)
    analysts use when the lookup is too small and too volatile to
    deserve a real table.  Exercises the VALUES row constructor with
    column aliases in SQL text and the join-prune path.

    Scale (100 TB): the 5-row VALUES relation becomes a broadcast local
    relation — the fact scan never shuffles for the join, and the
    rollup is a map-side-combined 3-group aggregate.  revenue stays in
    exact integer cents (house money rule)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqlv")
    return spark.sql(
        """
        WITH prio_dim AS (
          SELECT * FROM VALUES
             ('1-URGENT',        4, 'expedite'),
             ('2-HIGH',          3, 'expedite'),
             ('3-MEDIUM',        2, 'standard'),
             ('4-NOT SPECIFIED', 1, 'standard'),
             ('5-LOW',           0, 'deferred')
          AS prio_dim(prio, weight, tier)
        )
        SELECT d.tier,
               COUNT(*) AS n_orders,
               CAST(SUM(d.weight) AS BIGINT) AS weight_sum,
               SUM(CAST(signum(o.o_totalprice)
                        * CAST(abs(o.o_totalprice) * 100 + 0.5 AS BIGINT)
                        AS BIGINT)) AS revenue_cents
        FROM orders_sqlv o
        JOIN prio_dim d ON d.prio = o.o_orderpriority
        GROUP BY d.tier
        """
    )


@register(
    "sql_named_window_clause",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS seq,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                AS BIGINT) AS cum_cents,
           CAST(COUNT(*) OVER w_unordered AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING),
           w_unordered AS (PARTITION BY o_custkey)
    """,
)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL WINDOW clause: two named window specs declared once and
    referenced by three OVER clauses — the dialect feature that keeps a
    12-window analytics query readable and guarantees every aggregate
    uses the SAME frame (copy-pasted inline specs drift; a named spec
    can't).  Semantically identical to win_running's DataFrame API —
    what this op pins is the SQL-text surface through spark.sql.

    Scale (100 TB): both named specs partition by o_custkey, so the
    plan runs one hash exchange shared by all three window functions —
    same single-shuffle shape the DataFrame twin is plan-tested for."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqlw")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS seq,
               SUM(CAST(signum(o_totalprice)
                        * CAST(abs(o_totalprice) * 100 + 0.5 AS BIGINT)
                        AS BIGINT)) OVER w AS cum_cents,
               COUNT(*) OVER w_unordered AS n_orders
        FROM orders_sqlw
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING),
               w_unordered AS (PARTITION BY o_custkey)
        """
    )
