"""Pinned physical-plan fingerprints for the 9 headline bench queries
(r02 VERDICT item 5).

BENCH_r02.json introduced per-query plan fingerprints as the drift-vs-
regression discriminator: an unchanged fingerprint with a moved timing is
machine drift; a changed fingerprint is a plan change that must be
explained.  This test makes that check CI-local — a plan regression fails
here immediately instead of waiting for the next round's bench diff.

Fingerprints are SF-independent (verified identical at sf0.01 and sf0.1
after the r03 normalization fix in bench._plan_fingerprint), so the test
pins one value per query and runs at the suite's sf_dir.

Provenance of the pinned values vs BENCH_r02.json's:

- window_rank, topk_lineitem, distinct_users, wordcount, tumbling_1h,
  dedup_docs: byte-identical to BENCH_r02 — unchanged plans.
- q1_pricing_summary, q3_top_orders, q5_region_revenue: changed in r03 by
  the intentional lsum/lavg rewrite (F.round -> sign-aware truncation,
  commit b486862, ~1.6x on the Q1 shape) plus the fingerprint
  normalization fix (maxMetadataStringLength raise) that made q3/q5
  SF-stable at all.

When a deliberate plan improvement moves a fingerprint, re-pin it HERE in
the same commit with the reason in the commit message.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest

from bench import HEADLINE, _plan_fingerprint
from carpet_spark.registry import REGISTRY

PINNED = {
    "q1_pricing_summary": "c4bcecea30bf",
    "q3_top_orders": "08fff8ad9b3a",
    "q5_region_revenue": "3c2f849ab82d",
    "window_rank": "63b0dd84f925",
    "topk_lineitem": "94072738dbbb",
    "distinct_users": "c043d40e06e3",
    "wordcount": "1c44349af4ab",
    "tumbling_1h": "e4dd1ef6206f",
    "dedup_docs": "0dca9d0652c2",
}


def test_pin_set_matches_headline():
    assert set(PINNED) == set(HEADLINE)


@pytest.mark.parametrize("name", sorted(PINNED))
def test_headline_plan_fingerprint_pinned(spark, sf_dir, name):
    df = REGISTRY[HEADLINE[name]].fn(spark, sf_dir)
    got = _plan_fingerprint(df)
    assert got == PINNED[name], (
        f"{name}: physical plan changed (fingerprint {got} != pinned "
        f"{PINNED[name]}). If intentional, re-pin with the reason in the "
        "commit message; if not, diff .explain('formatted') vs the last "
        "good commit."
    )
