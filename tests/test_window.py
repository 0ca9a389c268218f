"""Driver-window invariants (SURVEY §7.5, r02 VERDICT item 1).

The driver's CORRECTNESS run covers exactly the first 50 entries of
``queries()`` and canonicalizes results via pandas ``sort_values`` + hash —
which raises ``TypeError: unhashable type`` on array/map cells (that is how
fn_array burned a verification slot in round 2).  These tests make sure a
window regression can never ship again:

- the window is exactly 50 registered, duplicate-free names;
- every windowed op with an oracle produces only scalar (hashable)
  top-level columns;
- rows-only ops in the window are limited to the documented by-design set.
"""

from pyspark.sql.types import ArrayType, MapType

from carpet_spark.registry import (
    REGISTRY,
    _DRIVER_VERIFIED,
    _PLANNED_WINDOWS,
    _PRIORITY_WINDOW,
    queries,
)

SF_SMOKE = "/root/testdata/sf0.001"

# Approximate / streaming ops whose SURVEY §2 downgrade rule allows a
# rows-only driver check.  Anything else in the window must carry an oracle.
ROWS_ONLY_BY_DESIGN = {
    "agg_approx_distinct",
    # stream_dedup_watermark / stream_late_data were in this set through
    # r6; r7 promoted both to hash oracles (single availableNow batch +
    # epoch-zero watermark == batch twin), so they no longer need the
    # allowance.
    # r4 window (rotated out, kept documented) — approximate/RNG/model-backed:
    "agg_hll_merge",        # HLL sketch estimate (property-tested bounds)
    # sample_seeded was in this set through r7; r8 promoted it to a hash
    # oracle (seeded Bernoulli reformulated as an md5-threshold filter).
    "quality_train_score",  # MLlib LR scores; no closed-form SQL oracle
    # r5 window addition:
    "agg_approx_percentile",  # approx_percentile sketch; property-tested
    # r6 window additions — approximate/model-backed by design:
    "sim_knn_join_topk",  # ANN-tier knn join; recall property-tested vs brute
    "sim_ann_ivf",        # IVF buckets from trained centroids; recall-tested
    "emb_pca_project",    # power-iteration PCA basis; variance property-tested
    # mm_phash_dedup was here through r7; r8 promoted it to a hash oracle
    # (exact byte-level block-mean recomputation in SQL).
    # r7 window addition — the last never-sampled rows-only op:
    # sim_mmr_rerank was here through r7; r8 promoted it to a hash oracle
    # (6dp-grid greedy + DuckDB recursive-CTE twin).
}


def test_window_shape():
    assert len(_PRIORITY_WINDOW) == 50
    assert len(set(_PRIORITY_WINDOW)) == 50
    missing = [n for n in _PRIORITY_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    assert list(queries())[:50] == list(_PRIORITY_WINDOW)


def test_window_oracle_coverage():
    rows_only = [
        n for n in _PRIORITY_WINDOW if REGISTRY[n].oracle is None
    ]
    assert set(rows_only) <= ROWS_ONLY_BY_DESIGN, (
        f"hash-able op in window without an oracle: "
        f"{set(rows_only) - ROWS_ONLY_BY_DESIGN}"
    )


# Ops already banked by the driver that are DELIBERATELY scheduled for a
# second sample because their earlier bank was vacuous (spark_rows == 0,
# an empty==empty hash-pass proving nothing).  Each re-bank must follow a
# re-parameterization that makes the op non-vacuous at sf0.01.
PLANNED_REBANKS = {
    "dedup_containment_pairs",  # r9 bank empty; %9 -> %3 slice (r10)
    "text_collocations_pmi",  # r8 bank empty at sf0.01; floor 50 -> 20 (r10)
    # non-vacuous banks gone STALE: the r10 sf0.1 sweep forced both ops'
    # float-round displays onto exact integer arithmetic
    "ts_pacing_vs_target",
    "emb_label_centroids",
    "agg_inventory_turns_gmroi",  # r10 magnitude-scan hardening changed values
    # r11 near-cliff probe hardenings changed displayed values (see the
    # ops' Determinism docstrings)
    "agg_price_volume_mix",
    "ts_seasonality_strength",
    "ts_holt_linear_smoothing",
    "ts_holt_winters_additive",
    "ts_ar1_forecast_backtest",
    "agg_allocation_by_share",  # sampled checksum now exact micro sum
}


def test_planned_windows_shape():
    """The r11-r15 burn-down plan (r09 VERDICT item 6) is a valid rotation
    schedule: every planned window is <=50 duplicate-free registered names,
    disjoint from the live window and from every other planned window."""
    seen: set[str] = set(_PRIORITY_WINDOW)
    for rnd in sorted(_PLANNED_WINDOWS):
        win = _PLANNED_WINDOWS[rnd]
        assert 0 < len(win) <= 50, f"r{rnd} window size {len(win)}"
        assert len(set(win)) == len(win), f"r{rnd} window has duplicates"
        missing = [n for n in win if n not in REGISTRY]
        assert not missing, f"r{rnd} window names not registered: {missing}"
        overlap = set(win) & seen
        assert not overlap, f"r{rnd} window overlaps earlier windows: {overlap}"
        seen.update(win)


def test_planned_windows_cover_all_unbanked():
    """window + planned windows together schedule EVERY op that lacks a
    driver bank, and schedule nothing already banked except the documented
    vacuous re-banks — so finishing the plan leaves zero rotation debt."""
    planned = {n for win in _PLANNED_WINDOWS.values() for n in win}
    scheduled = set(_PRIORITY_WINDOW) | planned
    unbanked = set(REGISTRY) - _DRIVER_VERIFIED
    not_scheduled = unbanked - scheduled
    assert not not_scheduled, (
        f"unbanked ops missing from the burn-down plan: {sorted(not_scheduled)}"
    )
    rebanks = (scheduled & _DRIVER_VERIFIED) - set(_PRIORITY_WINDOW)
    assert rebanks <= PLANNED_REBANKS, (
        f"already-banked ops scheduled without a re-bank rationale: "
        f"{sorted(rebanks - PLANNED_REBANKS)}"
    )


def test_window_outputs_are_hashable(spark):
    """No array/map top-level columns for oracled window ops — the driver's
    pandas canonicalizer cannot hash them."""
    bad = {}
    for name in _PRIORITY_WINDOW:
        op = REGISTRY[name]
        if op.oracle is None:
            continue
        df = op.fn(spark, SF_SMOKE)
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if cols:
            bad[name] = cols
    assert not bad, f"array/map outputs would crash the driver: {bad}"
