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
