"""Focused tests for the r11 optimization-round internals.

Each optimization that changed an operator's internals keeps its
correctness evidence in the oracle-parity gate (results are
hash-compared against DuckDB); these tests pin the NEW micro-contracts
the optimizations introduced, which the parity gate exercises only
implicitly.
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest


# --- dedup_near_jaccard prefix filter -------------------------------------
#
# The AllPairs/PPJoin prefix filter is lossless ONLY if the prefix length
# is at least |X| - ceil(t*|X|) + 1.  The op computes ceil(0.7*n) in exact
# integer arithmetic as (7n+9) DIV 10 — no float ever meets the bound.


@pytest.mark.parametrize("n", list(range(1, 501)))
def test_prefix_ceiling_formula_matches_exact_ceil(n):
    """(7n+9) // 10 == ceil(0.7 * n) for every set size the filter sees —
    the integer form can never undershoot (which would lose pairs) nor
    overshoot (which would only cost performance)."""
    assert (7 * n + 9) // 10 == math.ceil(0.7 * n)


def test_prefix_length_never_shorter_than_lossless_bound():
    """prefix_len = n - ceil(0.7n) + 1 >= 1 for all n >= 1: every doc
    contributes at least one prefix shingle, so no document can silently
    drop out of candidate generation."""
    for n in range(1, 501):
        plen = n - (7 * n + 9) // 10 + 1
        assert plen >= 1


# --- tables.spread() ------------------------------------------------------


def test_spread_is_noop_when_partitions_suffice(spark, sf_dir):
    """The scale-adaptive parallelism floor must add NO shuffle when the
    plan already has >= defaultParallelism partitions — the production
    (many-splits) case.  A repartitioned input must come back unchanged
    (same object), keeping the 100 TB plan shuffle-free."""
    from carpet_spark.tables import load, spread

    n = spark.sparkContext.defaultParallelism
    wide = load(spark, sf_dir, "orders").repartition(n, "o_orderkey")
    assert spread(wide, "o_orderkey") is wide


def test_spread_raises_partition_floor_locally(spark, sf_dir):
    """On the single-row-group fixture scan (1 split), spread must raise
    the partition count to defaultParallelism so CPU-heavy per-row stages
    fan out."""
    from carpet_spark.tables import load, spread

    src = load(spark, sf_dir, "documents").select("doc_id", "text")
    n = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() >= n:
        pytest.skip("fixture scan unexpectedly wide — nothing to assert")
    assert spread(src, "doc_id").rdd.getNumPartitions() == n


# --- streaming scratch dir ------------------------------------------------


def test_scratch_dir_env_override(monkeypatch, tmp_path):
    """SPARK_GRAFT_CKPT_DIR must win over the tmpfs default — the knob a
    deployment uses to point RESUMABLE checkpoints at durable storage."""
    from carpet_spark.ops.streaming import _scratch_dir

    monkeypatch.setenv("SPARK_GRAFT_CKPT_DIR", str(tmp_path))
    assert _scratch_dir() == str(tmp_path)


def test_scratch_dir_default_exists(monkeypatch):
    """Whatever the default resolves to (tmpfs or tempdir), it must be an
    existing directory — a bad path would fail every availableNow query."""
    from carpet_spark.ops.streaming import _scratch_dir

    monkeypatch.delenv("SPARK_GRAFT_CKPT_DIR", raising=False)
    assert os.path.isdir(_scratch_dir())


# --- session-level optimizer-rule exclusion -------------------------------


def test_infer_filters_from_generate_excluded(spark):
    """The InferFiltersFromGenerate exclusion (session.py RUNTIME_CONFS)
    must be active on any session our queries run under: the rule turns
    every explode(computed_array) into a pre-Generate filter that
    re-evaluates the array expression below exchanges (measured 8.6 s of
    a 10.9 s stage at sf0.1)."""
    from carpet_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules")
    assert "InferFiltersFromGenerate" in (excluded or "")


# --- exprs.dbl_vec / exprs.vec_dot (pre-widened pair dot) -------------------
#
# The cosine family's pair scoring widens each vector to array<double> ONCE
# per row (dbl_vec) and folds the pre-widened elements (vec_dot), instead of
# re-casting both elements inside every interpreted zip_with lambda.  The
# products are bit-identical (float32 -> float64 widening is exact and the
# fold order is unchanged), so every hash-banked cosine op keeps its driver
# hash; these tests pin that claim.  (An Arrow-batched numpy kernel was also
# built, proven bit-identical, and REJECTED on measurement — the interpreted
# fold on well-spread partitions beats the Arrow round-trip at 64 dims; see
# OPTIMIZATION_r11.md.)


def test_precast_dot_bit_identical_over_all_fixture_pairs(spark, sf_dir):
    """vec_dot over dbl_vec-widened vectors == the inline-cast fold over
    the raw float vectors, for EVERY ordered embedding pair at the fixture
    SF — value-equal AND string-repr-equal (catches a -0.0/0.0 split that
    plain double equality would mask)."""
    import pyspark.sql.functions as F

    from carpet_spark.exprs import dbl_vec, vec_dot
    from carpet_spark.ops.llm import _dot
    from carpet_spark.tables import load

    e = load(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("fa"),
        dbl_vec(F.col("embedding")).alias("da"),
    )
    b = e.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("fb"),
        dbl_vec(F.col("embedding")).alias("db"),
    )
    pairs = a.repartition(spark.sparkContext.defaultParallelism).join(
        F.broadcast(b), F.col("ia") < F.col("ib")
    )
    cmp = pairs.select(
        _dot(F.col("fa"), F.col("fb")).alias("inline"),
        vec_dot(F.col("da"), F.col("db")).alias("precast"),
    )
    bad = cmp.filter(
        ~(
            F.col("inline").eqNullSafe(F.col("precast"))
            & F.col("inline")
            .cast("string")
            .eqNullSafe(F.col("precast").cast("string"))
        )
    ).count()
    assert bad == 0, f"{bad} pairs diverge between precast and inline-cast dot"


def test_precast_dot_matches_inline_on_edge_rows(spark):
    """NULL side / ragged / empty / null-element / -0.0 / order-sensitive
    magnitude rows: the pre-widened fold must propagate every edge exactly
    like the inline-cast fold."""
    import pyspark.sql.functions as F

    from carpet_spark.exprs import dbl_vec, vec_dot
    from carpet_spark.ops.llm import _dot

    ones = [1.0] * 8
    rows = [
        ([1e16, 1.0, -1e16, 1.0, 1e16, 1.0, -1e16, 1.0], ones),
        ([1e8, 1e-8, -1e8, 1e-8, 1e8, -1e8, 1e-8, 1e-8], ones),
        ([-0.0, 0.0, -0.0, 0.0, -0.0, 0.0, -0.0, 0.0], ones),
        ([0.25, -0.5, 0.125, -0.25, 0.0625, 2.0, -4.0, 8.0],
         [1.5, 2.5, -3.5, 4.5, -5.5, 6.5, 7.5, -8.5]),
        ([], []),  # empty: fold init 0.0
        (None, ones),  # NULL side
        (ones, None),
        ([1.0, 2.0], [1.0, 2.0, 3.0]),  # ragged: zip_with pads -> NULL
        ([1.0, None, 2.0] + [0.0] * 5, ones),  # null element -> NULL
    ]
    df = spark.createDataFrame(rows, "xs array<float>, ys array<float>")
    got = df.select(
        _dot(F.col("xs"), F.col("ys")).alias("inline"),
        vec_dot(dbl_vec(F.col("xs")), dbl_vec(F.col("ys"))).alias("precast"),
    ).collect()
    for r in got:
        assert repr(r.inline) == repr(r.precast), (r.inline, r.precast)
