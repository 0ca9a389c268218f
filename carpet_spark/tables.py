"""Table loaders — the engine's source layer (SURVEY.md §1.2/§1.3).

All inputs are driver-generated parquet under ``{sf_dir}/{table}.parquet``.
Loaders are plain ``spark.read.parquet`` so Catalyst keeps full pushdown /
pruning freedom; the normalizations are the events ns-timestamp cast and
the non-finite ingest contract below.

Non-finite ingest contract (r11, tenth regime): the METRIC surface —
``events.value`` and ``embeddings.embedding`` — normalizes NaN/±Inf to
NULL (whole-vector NULL when any element is non-finite) at the source
layer, on BOTH engines (testing.duck_connect mirrors it in the table
views).  At 100 TB one poisoned metric from a bad upstream division is
routine, and under ANSI mode any fixed-point/decimal conversion of it
ABORTS THE JOB; treating it as missing at ingest degrades per-row
instead, and the NULL path of every op is already under the parity gate
(nulls regime, r6).  Money columns (l_*, o_totalprice, acctbal,
retailprice) stay raw — non-finite money is a schema violation upstream
ingestion owns — so their scans keep full predicate pushdown; the
exprs.fin() guards give those paths defense-in-depth anyway.

Scale note (100 TB): a scan here is a ``LogicalRelation(ParquetFileFormat)``
— predicate pushdown, column pruning, and partition pruning all apply
automatically downstream; nothing is materialized driver-side.  The
sanitize Project costs value-predicate pushdown on events.value only —
a deliberate trade: parquet row-group stats are unreliable for a
NaN-bearing column anyway (writers drop min/max when NaN is present).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .exprs import _DBL_MAX, fin
from .session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one table; normalize the events ns-timestamp to a real timestamp.

    events.ts is parquet TIMESTAMP(NANOS) → with nanosAsLong=true it arrives
    as bigint ns-since-epoch; ``ts div 1000`` is exact integer µs (never
    float-divide: 1e18 ns exceeds double's 53-bit exact-integer range), and
    DuckDB truncates ns→µs identically (SURVEY §1.3 [verified]).
    """
    ensure_runtime_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, table)
    cached = _SOURCE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        df = sanitize_events_values(_normalize_event_ts(df))
    elif table == "embeddings":
        df = _sanitize_embeddings(df)
    # Memoize the analyzed source plan per (session, path): repeated queries
    # skip file listing + parquet schema inference, the way a catalog table
    # with cached metadata behaves on a real cluster.  DataFrames are
    # immutable lazy plans, so sharing one instance across queries is safe;
    # downstream filters/projections still push down per query.
    _SOURCE_CACHE[key] = df
    return df


_SOURCE_CACHE: dict[tuple, DataFrame] = {}


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Schema-adaptive ts normalization: the test generator has shipped
    events.ts both as parquet TIMESTAMP(NANOS) (arrives as bigint ns with
    nanosAsLong=true) and as native TIMESTAMP(MICROS).  Branch on the
    *arrived* dtype so either vintage of the data works unchanged; the
    bigint branch uses exact integer µs division (never float-divide:
    1e18 ns exceeds double's 53-bit exact range), matching DuckDB's own
    ns→µs truncation (SURVEY §1.3 [verified])."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        # timestamp_micros() yields TIMESTAMP (ltz), so every downstream op
        # (unix_micros, window(), stream watermarks) was written against
        # TIMESTAMP.  Session timezone is pinned to UTC (session.py:20), so
        # the ntz→ltz cast is value-identical — it only restores the type.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def sanitize_events_values(df: DataFrame) -> DataFrame:
    """Non-finite ingest contract for the metric column (module
    docstring): NaN/±Inf value → NULL, identical on the streaming path
    (ops/streaming._events_stream applies the same function)."""
    return df.withColumn("value", fin(F.col("value")))


def _sanitize_embeddings(df: DataFrame) -> DataFrame:
    """Whole-vector NULL when ANY element is non-finite: a poisoned
    coordinate invalidates every distance/norm the vector enters, and
    the registry's NULL-vector path is parity-proven (nulls regime).
    ``filter`` drops elements whose predicate is not TRUE on both
    engines (DuckDB ``list_filter`` twin in testing.duck_connect), so
    the idiom is NULL-element-stable too."""
    nonfinite = F.filter(
        F.col("embedding"), lambda e: ~(F.abs(e) <= F.lit(_DBL_MAX))
    )
    return df.withColumn(
        "embedding", F.when(F.size(nonfinite) == 0, F.col("embedding"))
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Scale-adaptive parallelism floor for CPU-heavy per-row stages
    (optimization guide §2.4: derive partitioning from the input, don't
    hard-code either the local or the cluster shape).

    The test fixtures are single-row-group parquet files — one scan split —
    so per-row-expensive stages (shingling, regex scoring, image decode,
    pandas UDFs) serialize on one of the 32 cores.  When the plan yields
    fewer partitions than ``defaultParallelism``, hash-repartition up to it
    (on ``cols`` when given, so no sort-before-round-robin pass is needed);
    when the scan already has >= cores splits — every production 100 TB
    layout — this returns ``df`` unchanged and adds NO shuffle.

    Partition-count probe (r12, VERDICT item 9 + ADVICE r11): NOT
    ``df.rdd`` — that plans a second javaToPython query, and on an
    AQE-wrapped lineage (anything containing an exchange/subquery)
    eagerly MATERIALIZES every upstream shuffle/broadcast stage at
    plan-construction time, so probed pipelines executed their expensive
    stages twice (measured: the banded-ANN candidate stage ran once in
    the probe and again for real).  Instead:

    - non-adaptive plan (pure scan/narrow lineage — every P1 call site):
      ``executedPlan().execute().getNumPartitions()`` builds the RDD DAG
      without running a job and reads the true split count;
    - adaptive plan: read the PRE-AQE planned output partitioning from
      ``initialPlan()`` — exact for exchange-topped lineages (explicit
      repartition / aggregate / window), and ``UnknownPartitioning(0)``
      for broadcast-join-over-scan tops, which then take the repartition;
      at those call sites (ann.py banded pipelines) the hash repartition
      REPLACES the downstream distinct's exchange, so nothing is added.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        planned = plan.initialPlan().outputPartitioning().numPartitions()
    else:
        planned = plan.execute().getNumPartitions()
    if planned >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in cols]) if cols else df.repartition(n)
