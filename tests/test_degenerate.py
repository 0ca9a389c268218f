"""Degenerate-fixture parity suite (r6): every hash-oracled op re-run on
purpose-built degenerate data where the branches the real fixture always
populates go empty or flat — flat series (zero variance), one-day axes,
single-class labels, empty subpopulations (no purchases, one arm), fully
duplicate documents, and zero-norm embeddings.

This is the gate for the bug class the r5 advisor caught twice and the
r6 sweep then found 51 times: ANSI Spark THROWS on x/0 (a job-killer on
any empty segment at 100 TB) while DuckDB emits IEEE inf/nan, and a
perfectly balanced statistic rounds to -0.0 on one engine.  A regression
here means an op will crash or silently diverge the first time a real
segment degenerates.  scripts/degenerate_sweep.py is the standalone
runner with the same fixture.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from degenerate_sweep import build_fixture  # noqa: E402

from carpet_spark.registry import REGISTRY  # noqa: E402
from carpet_spark.testing import compare, duck_connect  # noqa: E402

HASH_OPS = sorted(n for n, op in REGISTRY.items() if op.oracle is not None)
ROWS_ONLY_OPS = sorted(n for n, op in REGISTRY.items() if op.oracle is None)


@pytest.fixture(scope="module")
def degen_dir():
    return build_fixture()


@pytest.fixture(scope="module")
def degen_duck(degen_dir):
    con = duck_connect(degen_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_degenerate_parity(spark, degen_duck, degen_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, degen_dir), degen_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_degenerate_rows_only_smoke(spark, degen_dir, name):
    """The 16 rows-only ops have no oracle to diverge from, but they can
    still CRASH on degenerate data — and two did when this gate was added
    (zero-norm embeddings hit an unguarded ANSI cosine division in
    dedup_near_embedding_ann; a missing vec_id=0 query row made
    sim_ann_ivf subscript None).  Each op must materialize crash-free;
    semantic contracts stay in test_property.py / test_streaming.py."""
    df = REGISTRY[name].fn(spark, degen_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Empty-fixture regime (r6): 0-row copies of every table with the exact
# production schemas.  Beyond flat/degenerate: at 100 TB an empty
# date-slice / partition / tenant is ROUTINE, and this gate caught 14
# crashes (ANSI x/0, collect()[0] on no rows, schema inference over
# file-less partitioned dirs, globs matching nothing) plus 5 silent
# divergences when first run.  Spark's ROLLUP/CUBE family is the one
# documented engine-inherent exception (see EMPTY_EXPECTED_DIVERGE).
# ---------------------------------------------------------------------------

from degenerate_sweep import EMPTY_EXPECTED_DIVERGE, build_empty_fixture  # noqa: E402


@pytest.fixture(scope="module")
def empty_dir():
    return build_empty_fixture()


@pytest.fixture(scope="module")
def empty_duck(empty_dir):
    con = duck_connect(empty_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n in HASH_OPS if n not in EMPTY_EXPECTED_DIVERGE]
)
def test_empty_parity(spark, empty_duck, empty_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, empty_dir), empty_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", sorted(EMPTY_EXPECTED_DIVERGE))
def test_empty_rollup_family_zero_rows(spark, empty_dir, name):
    """Pin the documented Spark-side behavior for the allowlisted ops:
    ROLLUP/CUBE/GROUPING SETS over an empty input yield ZERO rows in
    Spark (Expand-based implementation) where ANSI engines emit the one
    grand-total row.  If Spark ever adopts the ANSI row, this pin fails
    and the ops graduate into test_empty_parity."""
    assert REGISTRY[name].fn(spark, empty_dir).count() == 0


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_empty_rows_only_smoke(spark, empty_dir, name):
    """Rows-only ops must also survive the empty regime crash-free."""
    df = REGISTRY[name].fn(spark, empty_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Single-row regime (r6): exactly ONE referentially-consistent row per
# table.  The regime between flat-but-populated and empty: n=1 zeroes
# every (n-1) sample-variance denominator, makes every LAG/LEAD NULL,
# collapses every window partition to one row, and gives OLS/correlation
# exactly one point — branches neither of the other regimes reaches.
# First run caught 5 ANSI DIVIDE_BY_ZERO crashes (diff-in-diff (n-1),
# price-volume one-sided periods, PSI one-period split, class
# separability within-SS=0, udf_pandas stddev (n-1)).
# ---------------------------------------------------------------------------

from degenerate_sweep import build_single_fixture  # noqa: E402


@pytest.fixture(scope="module")
def single_dir():
    return build_single_fixture()


@pytest.fixture(scope="module")
def single_duck(single_dir):
    con = duck_connect(single_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_single_row_parity(spark, single_duck, single_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, single_dir), single_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_single_row_rows_only_smoke(spark, single_dir, name):
    """Rows-only ops must also survive the single-row regime crash-free."""
    df = REGISTRY[name].fn(spark, single_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# NULL-bearing regime (r6): populated tables with NULLs salted into every
# non-key metric/text column (keys, dates, timestamps stay non-NULL).  The
# production fixture has NO NULLs anywhere, so full-SF parity never
# exercises an op's NULL path — yet at 100 TB a NULL metric is routine.
# First survey: 30 divergences + 19 crashes out of 674 — bytes(None) in
# mapInPandas decoders, Decimal(NaN) poisoning group sums, Spark-vs-DuckDB
# NULL placement under ASC/DESC ordering, concat vs concat_ws NULL
# propagation, to_json null-field emission, NULL-poisoned recurrences, and
# another layer of ANSI x/0 sites.
# ---------------------------------------------------------------------------

from degenerate_sweep import build_nulls_fixture  # noqa: E402


@pytest.fixture(scope="module")
def nulls_dir():
    return build_nulls_fixture()


@pytest.fixture(scope="module")
def nulls_duck(nulls_dir):
    con = duck_connect(nulls_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_nulls_parity(spark, nulls_duck, nulls_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, nulls_dir), nulls_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_nulls_rows_only_smoke(spark, nulls_dir, name):
    """Rows-only ops must also survive the NULL regime crash-free."""
    df = REGISTRY[name].fn(spark, nulls_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Extreme-value regime (r6): ~1e10-dollar money columns (squares and 1e6
# fixed-point micros overflow int64 — the magnitudes 100 TB aggregates
# actually reach), one negative amount per money column (refund shape),
# 2^53+1 JSON integers, ZWJ-emoji/CJK/combining/RTL text, and a ~40 kB
# document.  First sweep: 10 silent divergences + 7 crashes — unlifted
# int64 moments (ANSI ARITHMETIC_OVERFLOW vs DuckDB auto-HUGEINT), the
# unsigned cents shortcut rounding refunds a cent high, double->string
# scientific notation, sqrt/ln-of-negative, and round(x,6) itself
# drifting cross-engine once x*1e6 crosses 2^53.
# ---------------------------------------------------------------------------

from degenerate_sweep import build_extreme_fixture  # noqa: E402


@pytest.fixture(scope="module")
def extreme_dir():
    return build_extreme_fixture()


@pytest.fixture(scope="module")
def extreme_duck(extreme_dir):
    con = duck_connect(extreme_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_extreme_parity(spark, extreme_duck, extreme_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, extreme_dir), extreme_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_extreme_rows_only_smoke(spark, extreme_dir, name):
    """Rows-only ops must also survive the extreme regime crash-free."""
    df = REGISTRY[name].fn(spark, extreme_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Exact-boundary regime (r6): every value ON an edge some op compares
# against — timestamps on hour/15-min window boundaries with identical-ts
# ties, event gaps of exactly the 30-min session threshold, values exactly
# on the 60/90 alert/conversion cuts, shipdates equal to the TPC-H filter
# dates and to o_orderdate, quantities/discounts/prices on IN-list and
# band edges, identical docs/vectors, orthogonal vectors.  The `>` vs `>=`
# transcription-mismatch detector: a Spark expression and its oracle that
# differ by one comparison operator agree everywhere EXCEPT at equality.
# First sweep caught a live one: agg_net_revenue_retention's oracle took
# period bounds over ALL events while the Spark side bounded the purchase
# stream — invisible until an event sat between the two midpoints.
# ---------------------------------------------------------------------------

from degenerate_sweep import build_boundary_fixture  # noqa: E402


@pytest.fixture(scope="module")
def boundary_dir():
    return build_boundary_fixture()


@pytest.fixture(scope="module")
def boundary_duck(boundary_dir):
    con = duck_connect(boundary_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_boundary_parity(spark, boundary_duck, boundary_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, boundary_dir), boundary_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_boundary_rows_only_smoke(spark, boundary_dir, name):
    """Rows-only ops must also survive the boundary regime crash-free."""
    df = REGISTRY[name].fn(spark, boundary_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Shuffled-row-order regime (r6): the production sf0.001 tables with rows
# deterministically scrambled — same data, arbitrary order, exactly what
# splits/compaction/shuffle do to row order at 100 TB.  Both engines read
# the SAME shuffled file, so a hash divergence can only come from
# order-dependence inside an op (first()/limit without a total order, a
# collect_list outside an ordered frame).  First run: 674/674 green —
# this gate keeps the unique-tie-break discipline (SURVEY §7.4.2) honest.
# ---------------------------------------------------------------------------

from degenerate_sweep import build_shuffled_fixture  # noqa: E402


@pytest.fixture(scope="module")
def shuffled_dir():
    return build_shuffled_fixture()


@pytest.fixture(scope="module")
def shuffled_duck(shuffled_dir):
    con = duck_connect(shuffled_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_shuffled_parity(spark, shuffled_duck, shuffled_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, shuffled_dir), shuffled_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_shuffled_rows_only_smoke(spark, shuffled_dir, name):
    """Rows-only ops must also survive arbitrary row order crash-free."""
    df = REGISTRY[name].fn(spark, shuffled_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Skewed-distribution regime (r7): one key holds ~50% of the rows in every
# fact table — a hot user, a viral SKU, a 30-line fanout order, a dominant
# source, an identical-vector ANN bucket.  The distribution class the other
# fixed-shape regimes never pin, and the one that actually breaks jobs at 100 TB.
# First sweep: 672/674 — caught a zero-variance ANSI x/0 in degree
# assortativity (every source had the same out-degree) and a live oracle
# bug in stream_alert_episodes (MIN(event_id) is not "the alert that paged"
# once ids stop being monotone in event time).
# ---------------------------------------------------------------------------

from degenerate_sweep import build_skew_fixture  # noqa: E402


@pytest.fixture(scope="module")
def skew_dir():
    return build_skew_fixture()


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    con = duck_connect(skew_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_skew_parity(spark, skew_duck, skew_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, skew_dir), skew_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_skew_rows_only_smoke(spark, skew_dir, name):
    """Rows-only ops must also survive the skewed regime crash-free."""
    df = REGISTRY[name].fn(spark, skew_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Hostile-strings regime (r7): every string column carries the values that
# break naive serialization and collation — embedded commas/quotes/
# newlines/tabs/backslashes, padded and EMPTY strings, numeric look-alikes,
# CSV-injection shapes, umlauts/CJK/emoji/RTL, LIKE and regex
# metacharacters as data.  First sweep: 13 real findings — ANSI cast
# crashes on non-numeric prefixes (TRY_CAST class), element_at past a
# 1-token array, Java URI rejecting unsanitized hosts, out-of-taxonomy
# Markov states, DuckDB array_to_string([]) = NULL vs Spark '' (two ops),
# Java vs ICU ß case-mapping (two ops), from_xml surrounding-space strip,
# variant payload-shape assumptions, CSV ''-vs-NULL conflation, Hive
# ''-partition aliasing NULL, and binaryFile skipping zero-byte files.
# ---------------------------------------------------------------------------

from degenerate_sweep import build_hostile_fixture  # noqa: E402


@pytest.fixture(scope="module")
def hostile_dir():
    return build_hostile_fixture()


@pytest.fixture(scope="module")
def hostile_duck(hostile_dir):
    con = duck_connect(hostile_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_hostile_parity(spark, hostile_duck, hostile_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, hostile_dir), hostile_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_hostile_rows_only_smoke(spark, hostile_dir, name):
    """Rows-only ops must also survive hostile strings crash-free."""
    df = REGISTRY[name].fn(spark, hostile_dir)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# Non-finite regime (r11, tenth fixture): NaN / +Inf / -Inf / -0.0 salted
# into events.value, embeddings, and balance columns (money stays finite —
# a non-finite price is a schema violation upstream ingestion owns).  At
# 100 TB one poisoned metric row is routine, and under ANSI mode every
# fixed-point conversion of it ABORTS THE JOB.  First sweep: 602/6/76 —
# fixed by the source-layer ingest contract (tables.py: non-finite metric
# -> NULL, whole-vector NULL on a poisoned coordinate; duck_connect views
# mirror it), exprs.fin() guards at every shared double->exact boundary,
# NULLIF zero-norm guards in the cosine ops (a signed-zero vector has
# norm 0), positive-level guards on the log-return ops, signed-zero
# display normalization in emb_dim_stats, and the exact-integer ECE
# rewrite.  684/684 green after the fixes.
# ---------------------------------------------------------------------------

from degenerate_sweep import build_nonfinite_fixture  # noqa: E402


@pytest.fixture(scope="module")
def nonfinite_dir():
    return build_nonfinite_fixture()


@pytest.fixture(scope="module")
def nonfinite_duck(nonfinite_dir):
    con = duck_connect(nonfinite_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_OPS)
def test_nonfinite_parity(spark, nonfinite_duck, nonfinite_dir, name):
    op = REGISTRY[name]
    compare(op.fn(spark, nonfinite_dir), nonfinite_duck, op.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_nonfinite_rows_only_smoke(spark, nonfinite_dir, name):
    """Rows-only ops must also survive non-finite inputs crash-free."""
    df = REGISTRY[name].fn(spark, nonfinite_dir)
    assert df.count() >= 0
