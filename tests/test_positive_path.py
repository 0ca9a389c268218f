"""Positive-path parity for ops that were found EMPTY at the default test SF.

An r9 registry-wide scan found 4 hash ops returning zero rows at sf0.01;
for two of them (dedup_containment_pairs, emb_pairwise_cosine_hist) the
output was ALSO empty at sf0.001 and on every adversarial fixture, so
their actual math — threshold comparisons, normalizers, rounding — was
hash-"verified" only as empty == empty, a vacuous pass that would hide a
wrong formula.  (The third, agg_survival_km, was empty at EVERY scale
until its censoring window was re-parameterized in r9; the fourth,
text_collocations_pmi, already had positive rows at sf0.001.)

r10 de-vacuated all three remaining ops at the driver's own SF:
  * dedup_containment_pairs — bounding subset widened from doc_id%9 to
    doc_id%3 (same containment semantics and 0.5 threshold; the %9
    slice just happened to contain no qualifying pair at any SF);
  * emb_pairwise_cosine_hist — pair stride changed from 997 to the
    prime 199 (same deterministic-stride-sample semantics; 997 exceeds
    sf0.01's 500-vector id range, so no pair existed below sf0.1);
  * text_collocations_pmi — support floor lowered 50 → 20 (the max
    bigram count at sf0.01 is 48, so ≥50 selected nothing below sf0.1;
    the r9 scan dismissed this op because sf0.001 happens to contain
    one count-51 bigram, but the DRIVER banks at sf0.01, where its r8
    hash-pass was empty == empty).  Found by the r10 registry-wide
    0-row scan; ≥20 still cuts the rare tail at every SF.

These tests pin each fix non-vacuous AND hash-matching at sf0.01, so a
future change that silently re-vacuates an op fails loudly instead of
passing as empty == empty.  min_rows values are the measured counts at
the time of the fix (3 containment pairs; 8 cosine-histogram buckets;
the full 20-row PMI top-k).
"""

from __future__ import annotations

import pytest

from carpet_spark.registry import REGISTRY
from carpet_spark.testing import compare

SF001_DIR = "/root/testdata/sf0.01"

POSITIVE_AT_DRIVER_SF = [
    ("dedup_containment_pairs", 3),
    ("emb_pairwise_cosine_hist", 8),
    ("text_collocations_pmi", 20),
]


@pytest.mark.parametrize("name,min_rows", POSITIVE_AT_DRIVER_SF)
def test_positive_path_hash_parity_at_driver_sf(spark, duck, name, min_rows):
    op = REGISTRY[name]
    df = op.fn(spark, SF001_DIR)
    assert df.count() >= min_rows, (
        f"{name} went vacuous at sf0.01 — the r10 de-vacuation regressed; "
        "see this module's docstring"
    )
    compare(df, duck, op.oracle, name=f"{name}@sf0.01")


def test_survival_km_is_not_vacuous(spark, duck):
    """agg_survival_km's 7-day censoring made it empty at EVERY reachable
    scale (all users of the 30-day corpus are active into the final ~3
    days); with the 24h window the curve must have real churn points at
    the default test SF, and still hash-match."""
    op = REGISTRY["agg_survival_km"]
    df = op.fn(spark, SF001_DIR)
    assert df.count() >= 1, "agg_survival_km is vacuous again"
    compare(df, duck, op.oracle, name="agg_survival_km@sf0.01")
