"""Micro-contracts for the r12 optimization round (VERDICT r11 items +
ADVICE findings).  Each test pins the mechanism of one optimization so a
regression is caught by the fast gate, not by a bench delta."""

import os

import pytest
from pyspark.sql import functions as F


# --- tables.spread(): job-free probe (VERDICT item 9 / ADVICE medium) -----


def _n_jobs(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def test_spread_probe_runs_no_job_on_adaptive_lineage(spark, sf_dir):
    """The r11 probe (`df.rdd`) eagerly materialized every upstream
    shuffle/broadcast stage of an AQE-wrapped lineage, so the banded-ANN
    pipelines executed their candidate stages twice (ADVICE r11).  The
    r12 probe must decide from the plan alone: NO job may run."""
    from carpet_spark.tables import load, spread

    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def ident(batches):
        for b in batches:
            yield b

    m = d.mapInPandas(ident, schema="doc_id long, text string")
    j = (
        m.alias("a")
        .join(m.alias("b").hint("broadcast"), "doc_id")
        .select(F.col("a.doc_id").alias("x"), F.col("b.text").alias("y"))
    )
    before = _n_jobs(spark)
    out = spread(j, "x")
    assert _n_jobs(spark) == before, "spread() probe launched a Spark job"
    # broadcast-join top reports UnknownPartitioning -> the floor applies
    assert "repartitionbyexpression" in out._jdf.queryExecution().logical().toString().lower()


def test_spread_probe_runs_no_job_on_narrow_lineage(spark, sf_dir):
    from carpet_spark.tables import load, spread

    d = load(spark, sf_dir, "documents").select("doc_id")
    before = _n_jobs(spark)
    spread(d, "doc_id")
    assert _n_jobs(spark) == before


def test_spread_noop_on_exchange_topped_wide_plan(spark, sf_dir):
    """An adaptive lineage whose planned output partitioning already meets
    the floor must come back unchanged (pre-AQE planned count is read from
    initialPlan, not by executing)."""
    from carpet_spark.tables import load, spread

    n = spark.sparkContext.defaultParallelism
    wide = load(spark, sf_dir, "orders").repartition(n, "o_orderkey")
    before = _n_jobs(spark)
    assert spread(wide, "o_orderkey") is wide
    assert _n_jobs(spark) == before


# --- streaming._scratch_dir: tmpfs only under a local master (item 7) -----


def test_scratch_dir_non_local_master_is_durable(monkeypatch):
    """On a non-local master the default must NOT be node-local tmpfs —
    checkpoint state must be cluster-visible (VERDICT r11 item 7)."""
    import tempfile

    from carpet_spark.ops import streaming as st

    class _Ctx:
        master = "spark://cluster:7077"

    class _Sess:
        sparkContext = _Ctx()

    monkeypatch.delenv("SPARK_GRAFT_CKPT_DIR", raising=False)
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.getActiveSession", classmethod(lambda cls: _Sess())
    )
    assert st._scratch_dir() == tempfile.gettempdir()


def test_scratch_dir_local_master_prefers_tmpfs(monkeypatch):
    from carpet_spark.ops import streaming as st

    class _Ctx:
        master = "local[8]"

    class _Sess:
        sparkContext = _Ctx()

    monkeypatch.delenv("SPARK_GRAFT_CKPT_DIR", raising=False)
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.getActiveSession", classmethod(lambda cls: _Sess())
    )
    expected = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if expected is None:
        pytest.skip("no tmpfs on this host")
    assert st._scratch_dir() == expected


# --- ann: float vectors feed banding, doubles feed scoring (ADVICE low) ---


def test_banded_signatures_identical_for_float_and_double_input(spark, sf_dir):
    """numpy widens float32 -> float64 exactly inside bucketize, so moving
    dbl_vec off the banding input must not move a single signature."""
    from carpet_spark.exprs import dbl_vec
    from carpet_spark.ops.ann import _PAIR_BANDS, _PAIR_BITS, _pair_planes, banded_signatures
    from carpet_spark.tables import load

    e = load(spark, sf_dir, "embeddings").select("doc_id" if False else "vec_id", "embedding")
    e = e.select(F.col("vec_id").alias("doc_id"), "embedding").limit(200)
    planes = _pair_planes()
    flt = banded_signatures(e, planes, _PAIR_BANDS, _PAIR_BITS)
    dbl = banded_signatures(
        e.select("doc_id", dbl_vec(F.col("embedding")).alias("embedding")),
        planes,
        _PAIR_BANDS,
        _PAIR_BITS,
    )
    a = sorted(map(tuple, flt.collect()))
    b = sorted(map(tuple, dbl.collect()))
    assert a == b


# --- ranks.ranked_by_range / group_percentiles_exact (VERDICT items 2, 8) --


def test_ranked_by_range_equals_global_row_number(spark):
    """The two-phase range rank must reproduce a global row_number over a
    total order EXACTLY (same ranks for every row)."""
    import random

    from pyspark.sql import Window

    from carpet_spark.ranks import ranked_by_range

    random.seed(7)
    rows = [(i, random.randrange(10**9)) for i in range(5000)]
    random.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        (r.k, r.v): r._rank
        for r in ranked_by_range(df, ["v", "k"]).collect()
    }
    w = Window.orderBy("v", "k")
    from pyspark.sql import functions as FF

    ref = {
        (r.k, r.v): r.rn
        for r in df.withColumn("rn", FF.row_number().over(w)).collect()
    }
    assert got == ref


def test_ranked_by_range_grouped_with_null_group(spark):
    from pyspark.sql import Window

    from carpet_spark.ranks import ranked_by_range

    rows = [("a", 3), ("a", 1), (None, 5), (None, 2), ("b", 4), (None, 9)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = sorted(
        (r.g or "", r.v, r._rank)
        for r in ranked_by_range(df, ["v"], ["g"]).collect()
    )
    w = Window.partitionBy("g").orderBy("v")
    ref = sorted(
        (r.g or "", r.v, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    )
    assert got == ref


def _pct_ref_vs_got(spark, rows, groups, ps):
    from carpet_spark.ranks import group_percentiles_exact

    if groups:
        df = spark.createDataFrame(rows, "g string, x double")
        ref = df.groupBy("g").agg(
            *[F.percentile("x", F.lit(p)).alias(n) for n, p in ps.items()]
        ).collect()
        got = group_percentiles_exact(df, "x", ["g"], ps).collect()
    else:
        df = spark.createDataFrame(rows, "x double")
        ref = df.agg(
            *[F.percentile("x", F.lit(p)).alias(n) for n, p in ps.items()]
        ).collect()
        got = group_percentiles_exact(df, "x", [], ps).collect()
    return sorted(map(repr, map(tuple, ref))), sorted(map(repr, map(tuple, got)))


@pytest.mark.parametrize(
    "case,vals",
    [
        ("dups", [2.0, 2.0, 2.0, 3.0, 3.0]),
        ("nan", [1.0, float("nan"), 2.0, float("nan"), 3.0]),
        ("inf", [float("-inf"), 1.0, float("inf"), 2.0]),
        ("nulls", [1.0, None, 2.0, None, 3.0]),
        ("allnull", [None, None]),
        ("huge", [1e16, 1e16 + 2, 1e16 + 4, -1e300, 1e300]),
        ("single", [7.25]),
        ("empty", []),
        ("ulp", [0.1, 0.3, 0.30000000000000004, 0.7]),
    ],
)
def test_group_percentiles_exact_bitwise_global(spark, case, vals):
    """repr-equality (bit-faithful incl. NaN/-0.0 display) vs the Spark
    `percentile` aggregate over adversarial inputs.  The one corner NOT
    covered: inputs mixing -0.0 and 0.0 at a percentile boundary, where
    the aggregate itself is partition-arrival nondeterministic (its
    OpenHashMap keeps them as distinct keys whose sorted tie order is
    merge-order dependent)."""
    ps = {"p05": 0.05, "p333": 1 / 3, "p50": 0.5, "p90": 0.9}
    rows = [(v,) for v in vals]
    ref, got = _pct_ref_vs_got(spark, rows, None, ps)
    assert ref == got


def test_group_percentiles_exact_bitwise_random_grouped(spark):
    import random

    random.seed(12)
    rows = []
    for _ in range(800):
        g = random.choice(["A", "B", "C", None])
        x = None if random.random() < 0.05 else random.uniform(-1e6, 1e6)
        rows.append((g, x))
    rows.append(("onlynull", None))
    ps = {"p05": 0.05, "p50": 0.5, "p90": 0.9}
    ref, got = _pct_ref_vs_got(spark, rows, ["g"], ps)
    assert ref == got
