"""Partition-shape invariance pins (r11).

The full two-JVM sweep (scripts/partition_invariance_sweep.py) proves
every hash op's output independent of parallelism shape — shuffle
width, input split sizing, core count.  This in-gate slice pins the
property for the ops with the most to lose, by re-running them in the
SAME session under a hostile runtime shape (shuffle=17, 64 KB input
splits, AQE partition coalescing off) and demanding the driver-faithful
canonical multiset is EXACTLY equal — float bits included.

Why these ops: the nine r10/r11 magnitude-hardened ops emit unrounded
or exact-integer money displays whose correctness argument is "the fold
is bit-identical regardless of partitioning" (SCALE.md r11) — this test
is that argument, executed.  The classics (groupBy sum, window rank,
top-k, moment stats) pin the broader reduction discipline.
"""

from __future__ import annotations

from collections import Counter

import pytest

import __spark_entry__ as entry
from carpet_spark.testing import canon_pd_cell

SF_DIR = "/root/testdata/sf0.01"

# shape knobs that are runtime-settable (core count is not; the
# offline sweep covers local[4] vs local[32])
_HOSTILE = {
    "spark.sql.shuffle.partitions": "17",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}

PINNED_OPS = [
    # the nine magnitude-hardened displays (r10 sweep + r11 near-cliff probe)
    "agg_allocation_by_share",
    "agg_month_end_lift",
    "agg_price_volume_mix",
    "ts_ar1_forecast_backtest",
    "ts_calendarized_run_rate",
    "ts_event_study_window",
    "ts_holt_linear_smoothing",
    "ts_holt_winters_additive",
    "ts_seasonality_strength",
    # reduction-discipline classics
    "agg_groupby",
    "agg_stats",
    "win_rank",
    "topk",
    "dedup_exact",
]


def _multiset(df) -> Counter:
    pdf = df.toPandas()
    ordered = pdf[sorted(pdf.columns, key=str.lower)]
    return Counter(
        tuple(canon_pd_cell(v) for v in row)
        for row in ordered.itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("op", PINNED_OPS)
def test_output_invariant_under_hostile_partitioning(spark, op):
    q = entry.queries()[op]
    saved = {k: spark.conf.get(k, None) for k in _HOSTILE}
    baseline = _multiset(q(spark, SF_DIR))
    try:
        for k, v in _HOSTILE.items():
            spark.conf.set(k, v)
        hostile = _multiset(q(spark, SF_DIR))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert baseline == hostile, (
        f"{op}: output changed with partition shape — "
        f"{sum((baseline - hostile).values())} rows differ; "
        f"sample spark-only {list((baseline - hostile).items())[:3]} "
        f"vs hostile-only {list((hostile - baseline).items())[:3]}"
    )
    assert sum(baseline.values()) > 0, f"{op}: vacuous at {SF_DIR}"
