"""Parity pins at sf0.1 for bugs INVISIBLE at the default test SF.

The r10 full-registry sf0.1 parity sweep (driver-faithful compare of
all 684 hash ops at 10× the gate's SF) found two defects the sf0.01
gate structurally cannot see:

* dq_json_schema_check — its oracle guarded json_extract behind
  `json_valid(p) AND …`, but DuckDB adaptively reorders conjunction
  clauses by measured cost once enough vectors have flowed, so the
  extract started THROWING on the injected malformed payloads.  Green
  at sf0.01 (too few vectors to trigger the reorder), crash at sf0.1.
  Fixed by nesting the extract in a CASE branch (selection-vector
  gated, never reordered).

* agg_forecast_reconciliation_topdown — `round(top·share, 6)` at
  ~1.26e9-cent magnitude asks for a grain below the double's
  representable resolution (x·10⁶ ≈ 1.26e15, ulp ≈ 0.25), where the
  engines' rounding algorithms legitimately disagree by 1 ulp; the
  raw IEEE products were bit-identical.  Fixed by exact integer
  disaggregation: floor(top·t3 ÷ total) via decimal(38,0)/HUGEINT.

* ts_pacing_vs_target — same magnitude-grain class on the cumulative
  and linear-target money displays (~3.3e9 dollars).  Fixed by
  emitting exact integer micro-units through one correctly-rounded
  IEEE int→double division, with the linear target floor-divided to
  integer micro-units first; no float round remains.

* emb_label_centroids — the mean of an exact decimal(18,6) sum can sit
  exactly ON a 6dp half (sf0.1: 1.606750/500 = 0.0032135), where
  Spark's HALF_UP and DuckDB's double-round split.  Fixed by a pure
  integer round-half-away-from-zero: (2·|m6| + cnt) ÷ (2·cnt) on
  micro-unit decimals/HUGEINT, sign reapplied, one int→double divide.

Each fix is pinned here with the full driver-faithful hash compare at
sf0.1, so a regression fails in the gate instead of surfacing (or
silently hiding) at scale.  Keep this module small — it is for bugs
PROVEN to need sf0.1 to manifest, not general parity (that lives in
test_oracle_parity at the default SF).

MAGNITUDE_HARDENED (r10 ADVICE): the r10 magnitude scan (max |double
output| ≥ 5e8) additionally forced three ops off `round(x, 6)` onto the
exact-integer display idiom BEFORE an engine split was observed at
sf0.1 — ab_cuped_adjustment, agg_supplier_concentration_tiers and
agg_inventory_turns_gmroi.  Their formulas changed for a reason that
only manifests at magnitude, so they get the same sf0.1 pin: a
regression reintroducing a 6dp float round there would stay green at
sf0.01 and only split at larger SFs.
"""

from __future__ import annotations

import pytest

from carpet_spark.registry import REGISTRY
from carpet_spark.testing import compare, duck_connect

SF01_DIR = "/root/testdata/sf0.1"

SF01_ONLY_BUGS = [
    "dq_json_schema_check",
    "agg_forecast_reconciliation_topdown",
    "ts_pacing_vs_target",
    "emb_label_centroids",
]

# hardened by the r10 magnitude scan without an observed split — pinned
# at the SF the hardening was motivated by (see module docstring)
MAGNITUDE_HARDENED = [
    "ab_cuped_adjustment",
    "agg_supplier_concentration_tiers",
    "agg_inventory_turns_gmroi",
    # r11: first catch of the automated scripts/magnitude_scan.py —
    # round(x,6) on displays already at 5.1e8 at sf0.1; now exact
    # integer floor-div micro-dollars (see the op docstring)
    "ts_calendarized_run_rate",
    # r11 near-cliff probe (1e7 <= max|x| < 5e8 with a float round):
    # money-per-day displays onto sign-split floor-div micro; effects
    # unrounded; seasonality SS rebuilt as exact integer closed forms
    # with the hi/lo 2^32 conversion split (DuckDB 128-bit->double is
    # not correctly rounded above 2^53)
    "agg_month_end_lift",
    "ts_event_study_window",
    "agg_price_volume_mix",
    "ts_seasonality_strength",
    # recurrence/regression money displays emitted unrounded (folds
    # proven bit-identical cross-engine at three SFs)
    "ts_holt_linear_smoothing",
    "ts_holt_winters_additive",
    "ts_ar1_forecast_backtest",
    # sampled allocation checksum: float sum -> exact micro-long sum
    "agg_allocation_by_share",
]


@pytest.fixture(scope="module")
def duck01():
    con = duck_connect(SF01_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", SF01_ONLY_BUGS + MAGNITUDE_HARDENED)
def test_sf01_parity_regression_pin(spark, duck01, name):
    op = REGISTRY[name]
    compare(op.fn(spark, SF01_DIR), duck01, op.oracle, name=f"{name}@sf0.1")
