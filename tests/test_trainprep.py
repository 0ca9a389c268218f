"""Semantics tests for the training-data-prep ops (ops/trainprep.py).

Hash parity vs DuckDB is covered generically by test_oracle_parity; these
pin the properties parity can't see: sketch accuracy, session-gap
invariants, quantization range, and split determinism.
"""

import pyspark.sql.functions as F

from carpet_spark.registry import REGISTRY
from tests.conftest import SF_SMOKE


def test_hll_merge_estimate_close_to_exact(spark):
    est = (
        REGISTRY["agg_hll_merge"].fn(spark, SF_SMOKE).collect()[0]
    )
    from carpet_spark.tables import load

    exact = load(spark, SF_SMOKE, "events").select(
        F.countDistinct("user_id").alias("d")
    ).collect()[0]["d"]
    # lgConfigK=12 -> ~1.6% standard error; allow 5%
    assert abs(est["est_distinct_users"] - exact) <= max(3, 0.05 * exact)
    assert est["n_types"] >= 1


def test_sessionize_gap_invariant(spark):
    rows = REGISTRY["ts_sessionize"].fn(spark, SF_SMOKE).collect()
    assert rows
    # within a user, consecutive sessions must be separated by > 30 min
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap > 1800, f"sessions closer than gap: {a} -> {b}"
            checked += 1
        for s in sess:
            assert s["duration_sec"] >= 0
            assert s["n_events"] >= 1
    assert checked > 0  # the invariant was actually exercised


def test_emb_quantize_range(spark):
    rows = REGISTRY["emb_quantize"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert abs(r["l2_norm"]) > 0


def test_hash_split_is_content_keyed(spark):
    """Same text => same split: re-running the assignment is idempotent and
    fractions are in the expected ballpark (12/2/2 nibbles)."""
    df = REGISTRY["sample_hash_split"].fn(spark, SF_SMOKE)
    rows = {r["split"]: r["n_docs"] for r in df.collect()}
    total = sum(rows.values())
    assert set(rows) <= {"train", "val", "test"}
    assert rows.get("train", 0) > rows.get("val", 0)
    assert rows.get("train", 0) > rows.get("test", 0)
    # train nibbles = 12/16 of hash space; loose 3-sigma-ish band
    assert 0.55 <= rows.get("train", 0) / total <= 0.92


def test_scrub_redacts_all_planted_pii(spark):
    rows = REGISTRY["pii_text_scrub"].fn(spark, SF_SMOKE).limit(200).collect()
    assert rows
    for r in rows:
        assert "[PHONE]" in r["scrubbed"]
        assert "[EMAIL]" in r["scrubbed"]
        assert "@example.com" not in r["scrubbed"]
        assert r["n_phone"] >= 1 and r["n_email"] >= 1


def test_quality_classifier_beats_baseline_on_holdout(spark):
    """The learned filter must generalize: holdout accuracy well above the
    majority-class rate (en is ~44% of docs, so majority guess ~56%)."""
    df = REGISTRY["quality_train_score"].fn(spark, SF_SMOKE)
    rows = df.filter("in_train = 0").collect()
    assert len(rows) > 20
    acc = sum(1 for r in rows if r["pred"] == r["weak_label"]) / len(rows)
    assert acc >= 0.8, f"holdout accuracy {acc:.3f}"


def test_token_entropy_bounds(spark):
    """0 <= H <= log2(n_tok), repetition-free docs hit the upper bound."""
    import math

    rows = REGISTRY["text_token_entropy"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # +1e-6: the op rounds H to 6 decimals, which can round up past
        # the exact log2(n) bound by half an ulp of the 6th decimal
        assert -1e-6 <= r["token_entropy"] <= math.log2(max(r["n_tok"], 2)) + 1e-6
