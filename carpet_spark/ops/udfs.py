"""Category K — UDF / UDAF / UDTF surface (SURVEY.md §2.K).

The deliberate tour of Spark's Python extension points, slowest to fastest:
- udf_scalar: row-at-a-time Python UDF (pickled rows — the slow path, kept
  ONLY as API parity; everything else in this engine avoids it);
- udf_pandas: Arrow-batched vectorized scalar UDF;
- udaf_grouped_pandas: applyInPandas grouped-map (per-group pandas frame);
- udtf_split: Spark 4 Python UDTF (lateral 1:N).

Determinism: derived means/stds are computed with exact decimal sums on
both sides (SURVEY §7.4.1) so the float outputs round-trip the hash.
"""

from __future__ import annotations

import re
from decimal import Decimal
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import DoubleType, StringType

from ..registry import register
from ..tables import load


@register(
    "udf_scalar",
    oracle=r"""
    SELECT doc_id,
           -- ß pre-fold (hostile-strings sweep): Java upper('ß') = 'SS'
           -- (then Python lower -> 'ss') while DuckDB upper('ß') = 'ẞ'
           -- (lower -> 'ß'); folding before the case round-trip mirrors
           -- the JVM+Python pipeline exactly
           trim(regexp_replace(
             lower('  ' || upper(replace(text, 'ß', 'ss')) || '   '),
             '\s+', ' ', 'g'))
             AS cleaned
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text as a classic Python UDF (lower + collapse whitespace +
    trim) applied to a deliberately-messy synthesized input.  Row-at-a-time
    pickling: ~10-100x slower than the builtin expression the oracle uses —
    which is exactly the point being demonstrated."""

    @F.udf(returnType=StringType())
    def clean_text(s: str) -> str:
        if s is None:  # NULL text: the concat input is NULL -> NULL out,
            return None  # matching the oracle's NULL-propagating pipeline
        return re.sub(r"\s+", " ", s.lower()).strip()

    d = load(spark, sf_dir, "documents")
    messy = F.concat(F.lit("  "), F.upper("text"), F.lit("   "))
    return d.select("doc_id", clean_text(messy).alias("cleaned"))


_ZSTATS_SQL = """
      SELECT CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu,
             sqrt((CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                   - COUNT(*) * pow(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                                    / COUNT(*), 2))
                  / NULLIF(CAST(COUNT(*) - 1 AS DOUBLE), 0)) AS sigma
      FROM events
"""


@register(
    "udf_pandas",
    oracle=f"""
    WITH stats AS ({_ZSTATS_SQL})
    SELECT event_id, round((value - mu) / sigma, 6) AS zscore
    FROM events CROSS JOIN stats
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized z-score via pandas_udf (Arrow batches, numpy arithmetic).
    Global mean/std are computed once by a deterministic decimal-sum
    aggregate and broadcast-joined in — the pandas UDF itself is pure
    per-batch arithmetic, the scalable shape for normalization at 100 TB."""

    @F.pandas_udf(DoubleType())
    def z(v: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
        return (v - mu) / sigma

    ev = load(spark, sf_dir, "events")
    sum_dec = F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
    sumsq_dec = F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)")).cast(
        "double"
    )
    n = F.count(F.lit(1))
    # NULLIF guard (degenerate sweep): a 1-row table zeroes (n−1) — ANSI
    # Spark throws, DuckDB infs.  The sigma-is-NULL gate keeps the output
    # NULL (not the pandas NaN the UDF would emit) to match the oracle.
    stats = ev.agg(
        (sum_dec / n).alias("mu"),
        F.sqrt(
            (sumsq_dec - n * F.pow(sum_dec / n, 2))
            / F.nullif((n - 1).cast("double"), F.lit(0.0))
        ).alias("sigma"),
    )
    return ev.crossJoin(F.broadcast(stats)).select(
        "event_id",
        F.when(
            F.col("sigma").isNotNull(),
            F.round(z("value", "mu", "sigma"), 6),
        ).alias("zscore"),
    )


@register(
    "udaf_grouped_pandas",
    oracle="""
    SELECT event_id,
           event_type,
           round(value - CAST(SUM(CAST(value AS DECIMAL(28,6)))
                              OVER (PARTITION BY event_type) AS DOUBLE)
                         / COUNT(value) OVER (PARTITION BY event_type), 6)
             AS demeaned
    FROM events
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group demeaning via applyInPandas (grouped-map 'UDAF').

    Scale (100 TB): grouping the pandas stage by event_type alone would
    hand ONE python worker ~1/|types| of the whole table as a single
    Arrow frame — the grouped-map memory trap.  So the exact per-type
    mean is computed JVM-side first (decimal(28,6) sum → double, the
    same expression as the oracle window, so mu is bit-identical to the
    old in-pandas Decimal sum), broadcast back, and the pandas stage
    runs on (event_type, salt) with a 64-way salt: grouped-map API
    demonstrated, per-group frame bounded at ~rows/64·|types| no matter
    the corpus — the salting pattern every scale-proportional
    grouped-map should use when its per-row logic only needs per-GROUP
    constants."""

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        # mu rides in as a column (constant within the salted group);
        # NULL value rows demean to NaN -> Arrow null, matching
        # value - NULL = NULL.  An all-NULL type has NULL mu (the JVM
        # aggregate's SUM(decimal) of zero rows), arriving here as NaN.
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "demeaned": pdf["value"] - pdf["mu"],
            }
        )

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    # SUM(value)/COUNT(value), both NULL-skipping, exactly the oracle's
    # window pair; NULLIF keeps the all-NULL group at NULL under ANSI
    mu = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.nullif(F.count("value").cast("double"), F.lit(0.0))
        ).alias("mu")
    )
    # null-safe equi-join: NULL is a legitimate event_type GROUP (the
    # old groupBy kept it) — a plain inner join would drop those rows
    mu2 = mu.select(F.col("event_type").alias("mu_type"), "mu")
    salted = (
        ev.join(
            F.broadcast(mu2),
            F.col("event_type").eqNullSafe(F.col("mu_type")),
            "left",
        )
        .drop("mu_type")
        # integer hash, pure primitive codegen: crc32 would need a
        # per-row string materialization of event_id just to derive a
        # 6-bit salt (r9 review); the salt only feeds grouping, so any
        # uniform hash gives the identical output
        .withColumn(
            "salt",
            F.pmod(F.xxhash64("event_id"), F.lit(64)).cast("int"),
        )
    )
    out = salted.groupBy("event_type", "salt").applyInPandas(
        demean, schema="event_id long, event_type string, demeaned double"
    )
    # round JVM-side: Spark and DuckDB round doubles identically (probed);
    # numpy's half-even rounding would not
    return out.select("event_id", "event_type", F.round("demeaned", 6).alias("demeaned"))


@register(
    "udtf_split",
    oracle="""
    WITH t AS (SELECT c_custkey,
                      string_split(concat_ws(',', c_mktsegment, c_name,
                                             CAST(c_nationkey AS VARCHAR)),
                                   ',') AS parts
               FROM customer)
    SELECT c_custkey,
           unnest(parts) AS part,
           unnest(range(1, len(parts) + 1)) AS idx
    FROM t
    """,
)
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) exploding a csv-ish string into (part, idx)
    rows via a SQL LATERAL join — the table-function extension point."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="part string, idx int")
    class SplitCsv:
        def eval(self, s: str):
            for i, p in enumerate(s.split(",")):
                yield p, i + 1

    spark.udtf.register("split_csv", SplitCsv)
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_udtf")
    return spark.sql(
        """
        SELECT c_custkey, t.part, t.idx
        FROM customer_udtf,
             LATERAL split_csv(concat_ws(',', c_mktsegment, c_name,
                                         CAST(c_nationkey AS STRING))) t
        """
    )


@register(
    "udf_cogrouped_pandas",
    oracle="""
    SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           round(COALESCE(o.sum_price, 0.0), 6) AS sum_price,
           c.c_acctbal AS acctbal
    FROM (SELECT o_custkey,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS sum_price
          FROM orders GROUP BY o_custkey) o
    FULL JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def udf_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF: ``groupby(...).cogroup(...).applyInPandas``
    over orders x customer on custkey — the last Python extension point in
    the §2.K tour.  Each call receives BOTH sides' rows for one key (either
    side possibly empty, so it also demonstrates full-outer cogroup
    semantics).  Exact Decimal order-price sums keep the double output
    bit-identical to the oracle's CAST(SUM(DECIMAL) AS DOUBLE).

    100 TB design: cogroup is a single co-partitioned shuffle of both
    inputs on the key (same exchange shape as a SortMergeJoin) and streams
    one key's rows at a time through Arrow — per-key state never exceeds
    one customer's orders."""

    def merge(key, orders_pdf: pd.DataFrame, cust_pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL prices arrive as NaN — exclude them exactly as SQL SUM does
        # (a Decimal('NaN') would otherwise poison the whole group's sum)
        dec_sum = sum(
            (Decimal(repr(v)) for v in orders_pdf["o_totalprice"]
             if not pd.isna(v)),
            Decimal(0),
        )
        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_orders": [len(orders_pdf)],
                "sum_price": [float(dec_sum)],
                "acctbal": [
                    float(cust_pdf["c_acctbal"].iloc[0]) if len(cust_pdf) else None
                ],
            }
        )

    # Pre-partition both sides by the cogroup key at defaultParallelism
    # (r11, guide §2.4/§4): cogroup's required ClusteredDistribution is
    # already satisfied, so no further exchange is inserted and the ~15k
    # per-key Python calls fan out over every core instead of the 8
    # default shuffle partitions.  Same shuffled bytes either way — the
    # repartition REPLACES the exchange cogroup would have inserted.
    n = spark.sparkContext.defaultParallelism
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = o.repartition(n, "o_custkey")
    c = c.repartition(n, "c_custkey")
    out = (
        o.groupby("o_custkey")
        .cogroup(c.groupby("c_custkey"))
        .applyInPandas(
            merge,
            schema="custkey long, n_orders long, sum_price double, acctbal double",
        )
    )
    # round JVM-side (same rationale as udaf_grouped_pandas above)
    return out.select(
        "custkey", "n_orders", F.round("sum_price", 6).alias("sum_price"), "acctbal"
    )


def _arrow_l2_batches(batches):
    """mapInArrow kernel for udf_arrow_map — module-level so the
    null/ragged fallback is unit-testable (tests/test_edge_cases.py)."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        if len(batch) == 0:
            continue
        emb = batch.column("embedding")
        # flatten+reshape only when the batch is provably rectangular
        # (no nulls, equal lengths); otherwise fall back to a per-list
        # offset walk so a null or ragged vector can't silently
        # misalign the flattened buffer
        lengths = np.diff(emb.offsets.to_numpy(zero_copy_only=False))
        if emb.null_count == 0 and len(set(lengths.tolist())) == 1:
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(len(emb), -1)
            out = pa.array(np.sqrt((mat * mat).sum(axis=1)))
        else:
            # NULL vectors must come out as Arrow NULLS, not NaN — mapInArrow
            # has no pandas NaN->null conversion, and sqrt(NULL) is NULL in
            # the oracle (a NaN here fails the native-type compare)
            out = pa.array(
                [
                    None
                    if v is None
                    else float(np.sqrt(np.sum(np.asarray(v, dtype=np.float64) ** 2)))
                    for v in emb.to_pylist()
                ],
                type=pa.float64(),
            )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("vec_id"),
                batch.column("label"),
                out,
            ],
            names=["vec_id", "label", "l2_norm"],
        )


@register(
    "udf_arrow_map",
    oracle="""
    SELECT vec_id,
           label,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python extension point — the
    executor hands RecordBatches straight to Python with NO pandas
    conversion, and the function streams batches back.  Computes each
    embedding's L2 norm in float64 numpy over the Arrow list column.

    100 TB design: per-batch streaming keeps memory at O(batch), the
    Arrow wire format avoids both pickling and pandas boxing (the two
    costs udf_scalar and udf_pandas pay respectively), and the op is a
    pure narrow map — zero shuffle at any scale."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    out = emb.mapInArrow(
        _arrow_l2_batches, schema="vec_id long, label int, l2_norm double"
    )
    return out.select("vec_id", "label", F.round("l2_norm", 6).alias("l2_norm"))


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT event_id,
           round(value * 0.0625 + 12.5, 6) AS calibrated
    FROM events
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER) — the API for UDFs with
    expensive one-time setup: the body runs ONCE per partition, initializes
    its state (here a calibration table standing in for a loaded model /
    tokenizer / decoder), then streams Arrow batches through it.  The
    per-batch work is identical to a plain pandas UDF; the per-PARTITION
    init is what a per-batch UDF cannot amortize — at 100 TB the difference
    between loading a model 10^5 times (once per executor-partition) and
    10^8 times (once per batch).

    The 'model' is deterministic (scale=1/16, offset=12.5 — both exact in
    binary floating point, so the oracle's literal arithmetic matches
    bit-for-bit)."""
    @F.pandas_udf(DoubleType())
    def calibrate(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-partition setup (the expensive part in real use)
        model = {"scale": 0.0625, "offset": 12.5}
        for v in batches:
            yield v * model["scale"] + model["offset"]

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(calibrate("value"), 6).alias("calibrated")
    )


@register(
    "udf_pandas_struct",
    oracle="""
    WITH s AS (
      SELECT event_id, value,
             AVG(value) OVER () AS mu,
             STDDEV_SAMP(value) OVER () AS sigma
      FROM events
      WHERE user_id % 40 = 0
    )
    SELECT event_id,
           round((value - mu) / sigma, 6) AS zscore,
           round(ln(1.0 + abs(value)), 6) AS log1p_abs,
           CASE WHEN value >= 0 THEN 1 ELSE -1 END AS sign
    FROM s
    """,
)
def udf_pandas_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT-returning pandas UDF: one Arrow-batched function computes
    several derived features and returns them as a single struct column
    that is then unpacked — the multi-output feature-engineering shape
    that otherwise needs N separate UDF calls (N serializations of the
    same input) or a fragile string concat.  The global mean/std feed in
    as ordinary columns (window over the filtered slice), keeping the
    UDF itself stateless and per-batch.

    Scale (100 TB): one Python worker round-trip per batch regardless
    of output arity — the struct adds columns, not passes; everything
    before and after the UDF stays JVM-side.  The %40 filter pushes to
    the scan and bounds output."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<zscore: double, log1p_abs: double, sign: int>")
    def feats(value: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.DataFrame:
        import numpy as np

        z = ((value - mu) / sigma).round(6)
        l = np.log1p(value.abs()).round(6)
        s = np.where(value >= 0, 1, -1).astype("int32")
        return pd.DataFrame({"zscore": z, "log1p_abs": l, "sign": s})

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 40 == 0)
    w = Window.partitionBy()
    base = ev.select(
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
    )
    out = base.select(
        "event_id", feats("value", "mu", "sigma").alias("f")
    )
    return out.select(
        "event_id",
        F.col("f.zscore").alias("zscore"),
        F.col("f.log1p_abs").alias("log1p_abs"),
        F.col("f.sign").alias("sign"),
    )


@register(
    "udf_pandas_grouped_forecast",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    xy AS (
      SELECT event_type, d, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1 AS x
      FROM daily
      WHERE y IS NOT NULL
    ),
    moments AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
             MAX(d) AS last_d
      FROM xy GROUP BY event_type
    ),
    fitted AS (
      SELECT event_type, n, last_d,
             (n * sxy - sx * sy)
               / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE) AS b,
             (sy - (n * sxy - sx * sy)
                   / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE) * sx)
               / CAST(n AS DOUBLE) AS a
      FROM moments
    ),
    hs AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS h)
    SELECT f.event_type, h.h,
           f.last_d + CAST(h.h AS INTEGER) AS target_d,
           round(f.b, 6) AS slope_cents_per_day,
           round(f.a + f.b * (f.n - 1 + h.h), 6) AS forecast_cents
    FROM fitted f CROSS JOIN hs h
    """,
)
def udf_pandas_grouped_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group trend forecast via applyInPandas: each event_type's
    daily value series gets an OLS line fit INSIDE a grouped-map pandas
    UDF and projects 7 days ahead — the 'one small model per group'
    shape (per-SKU demand, per-tenant load) that pushes scikit-style
    fitting to executors instead of looping on the driver.

    Engine parity: the UDF computes the closed-form OLS from exact
    PYTHON-int moment sums (arbitrary precision, no numpy overflow) and
    divides once — the oracle computes the identical closed form from
    exact BIGINT/HUGEINT sums, and int/int division is correctly
    rounded in both, so slopes and forecasts hash equal.

    Scale (100 TB): groups process in parallel, each bounded by its own
    |days| axis; the daily collapse happens BEFORE the UDF so pandas
    sees ≤|days| rows per group, never raw events."""
    from pyspark.sql.types import (
        DateType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )
    import datetime as _dtm

    e = load(spark, sf_dir, "events")
    from ..exprs import fp_scaled_long

    cents = fp_scaled_long(F.col("value"), 100)
    daily = (
        e.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .agg(F.sum(cents).cast("long").alias("y"))
        # a day whose values were ALL NULL has no observation — drop it
        # from the fit on both sides (the x indices must stay aligned)
        .where(F.col("y").isNotNull())
    )

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("h", IntegerType()),
            StructField("target_d", DateType()),
            StructField("slope_cents_per_day", DoubleType()),
            StructField("forecast_cents", DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        n = len(pdf)
        ys = [int(v) for v in pdf["y"]]
        sx = sum(range(n))
        sy = sum(ys)
        sxy = sum(i * y for i, y in enumerate(ys))
        sxx = sum(i * i for i in range(n))
        # degenerate-sweep guard: a 1-point series has no slope — emit
        # NULL slope/forecast, matching the oracle's NULLIF'd closed form
        den = n * sxx - sx * sx
        b = (n * sxy - sx * sy) / float(den) if den else None
        a = (sy - b * sx) / float(n) if b is not None else None
        last_d = pdf["d"].iloc[-1]
        et = pdf["event_type"].iloc[0]
        rows = [
            (
                et,
                h,
                last_d + _dtm.timedelta(days=h),
                b,
                a + b * (n - 1 + h) if b is not None else None,
            )
            for h in range(1, 8)
        ]
        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "h", "target_d",
                "slope_cents_per_day", "forecast_cents",
            ],
        )

    out = daily.groupBy("event_type").applyInPandas(fit, schema)
    return out.select(
        "event_type", "h", "target_d",
        F.round("slope_cents_per_day", 6).alias("slope_cents_per_day"),
        F.round("forecast_cents", 6).alias("forecast_cents"),
    )
