"""Positive-path parity for ops that are EMPTY at the default test SF.

An r9 registry-wide scan found 4 hash ops returning zero rows at sf0.01;
for two of them (dedup_containment_pairs, emb_pairwise_cosine_hist) the
output was ALSO empty at sf0.001 and on every adversarial fixture, so
their actual math — threshold comparisons, normalizers, rounding — was
hash-"verified" only as empty == empty, a vacuous pass that would hide a
wrong formula.  (The third, agg_survival_km, was empty at EVERY scale
until its censoring window was re-parameterized; the fourth,
text_collocations_pmi, already had positive rows at sf0.001.)

These tests pin the positive path at sf0.1 — the smallest SF where real
pairs exist — and assert non-emptiness so a future change that silently
re-vacuates an op fails loudly instead of passing as empty == empty.
"""

from __future__ import annotations

import pytest

from carpet_spark.registry import REGISTRY
from carpet_spark.testing import compare, duck_connect

SF01_DIR = "/root/testdata/sf0.1"

POSITIVE_ONLY_AT_SF01 = [
    ("dedup_containment_pairs", 4),
    ("emb_pairwise_cosine_hist", 9),
]


@pytest.fixture(scope="module")
def duck01():
    con = duck_connect(SF01_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name,min_rows", POSITIVE_ONLY_AT_SF01)
def test_positive_path_hash_parity_at_sf01(spark, duck01, name, min_rows):
    op = REGISTRY[name]
    df = op.fn(spark, SF01_DIR)
    assert df.count() >= min_rows, (
        f"{name} went vacuous at sf0.1 — its formula is no longer "
        "exercised anywhere; see this module's docstring"
    )
    compare(df, duck01, op.oracle, name=f"{name}@sf0.1")


def test_survival_km_is_not_vacuous(spark, duck):
    """agg_survival_km's 7-day censoring made it empty at EVERY reachable
    scale (all users of the 30-day corpus are active into the final ~3
    days); with the 24h window the curve must have real churn points at
    the default test SF, and still hash-match."""
    op = REGISTRY["agg_survival_km"]
    df = op.fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 1, "agg_survival_km is vacuous again"
