"""Semantic edge cases for the product-analytics ops — micro fixtures
where the correct answer is hand-checkable (ordering constraints, cohort
boundaries, streak gaps)."""

import datetime as dt
import os

import pytest
from pyspark.sql import Row

from carpet_spark.registry import REGISTRY


def _write_events(spark, base, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )


@pytest.fixture(scope="module")
def funnel_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("funnel"))
    T = lambda d, h: dt.datetime(2024, 1, d, h, 0, 0)
    rows = [
        # user 1: full ordered funnel
        Row(event_id=1, ts=T(1, 9), user_id=1, event_type="signup", value=0.0, props="{}"),
        Row(event_id=2, ts=T(1, 10), user_id=1, event_type="view", value=0.0, props="{}"),
        Row(event_id=3, ts=T(1, 11), user_id=1, event_type="click", value=0.0, props="{}"),
        Row(event_id=4, ts=T(1, 12), user_id=1, event_type="purchase", value=0.0, props="{}"),
        # user 2: purchase BEFORE signup — must not reach stage 4
        Row(event_id=5, ts=T(2, 8), user_id=2, event_type="purchase", value=0.0, props="{}"),
        Row(event_id=6, ts=T(2, 9), user_id=2, event_type="signup", value=0.0, props="{}"),
        Row(event_id=7, ts=T(2, 10), user_id=2, event_type="view", value=0.0, props="{}"),
        # user 3: view only, never signed up — reaches no stage
        Row(event_id=8, ts=T(3, 9), user_id=3, event_type="view", value=0.0, props="{}"),
    ]
    _write_events(spark, base, rows)
    return base


def test_funnel_order_constraint(spark, funnel_dir):
    out = {r.stage: r.n_users for r in REGISTRY["funnel_conversion"].fn(spark, funnel_dir).collect()}
    assert out == {"signup": 2, "view": 2, "click": 1, "purchase": 1}


@pytest.fixture(scope="module")
def streak_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("streaks"))
    D = lambda d: dt.datetime(2024, 1, d, 12, 0, 0)
    rows = [
        # user 1: days 1,2,3 then gap then 5 -> longest streak 3 (Jan 1-3)
        *[Row(event_id=10 + i, ts=D(d), user_id=1, event_type="click", value=0.0, props="{}")
          for i, d in enumerate([1, 2, 3, 5])],
        # user 2: two same-length streaks (7-8 and 10-11) -> earliest wins
        *[Row(event_id=20 + i, ts=D(d), user_id=2, event_type="click", value=0.0, props="{}")
          for i, d in enumerate([7, 8, 10, 11])],
        # user 3: one day only
        Row(event_id=30, ts=D(20), user_id=3, event_type="click", value=0.0, props="{}"),
    ]
    _write_events(spark, base, rows)
    return base


def test_streaks_gap_and_tiebreak(spark, streak_dir):
    out = {r.user_id: r for r in REGISTRY["win_activity_streaks"].fn(spark, streak_dir).collect()}
    assert out[1].longest_streak == 3
    assert out[1].streak_start == dt.date(2024, 1, 1)
    assert out[2].longest_streak == 2
    assert out[2].streak_start == dt.date(2024, 1, 7)  # earlier of the two
    assert out[3].longest_streak == 1


def test_retention_week0_equals_cohort_size(spark, streak_dir):
    rows = REGISTRY["retention_cohorts"].fn(spark, streak_dir).collect()
    week0 = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    # every user is active in their own first week by definition
    total_week0 = sum(week0.values())
    assert total_week0 == 3
    # no negative offsets ever
    assert all(r.week_offset >= 0 for r in rows)
