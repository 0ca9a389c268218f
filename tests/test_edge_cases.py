"""Edge-case regressions: short/empty documents through the shingle ops.

ADVICE r01 (medium): F.sequence(1, n-2) is DESCENDING when a doc has <3
whitespace tokens (Spark defaults step to -1), and element_at(toks, 0)
then throws "SQL array indices start at 1" — crashing every shingle-based
op on any short document.  These tests pin the guarded behavior: short
docs contribute an empty shingle/bigram set (matching DuckDB's
range(1, len-1) semantics) and the ops run end-to-end.
"""

import os

import pytest
from pyspark.sql import Row

from carpet_spark.ops import llm  # noqa: F401  (registration side-effects)
from carpet_spark.registry import REGISTRY


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    """A documents table containing 0-, 1-, 2-, and 3-token docs plus a
    true near-dup pair, written as parquet in the driver's layout."""
    base = str(tmp_path_factory.mktemp("short_docs"))
    rows = [
        Row(doc_id=0, text="", lang="en", source="web", n_chars=0),
        Row(doc_id=1, text="one", lang="en", source="web", n_chars=3),
        Row(doc_id=2, text="two tokens", lang="en", source="web", n_chars=10),
        Row(doc_id=3, text="exactly three tokens", lang="en", source="web", n_chars=20),
        Row(
            doc_id=4,
            text="the quick brown fox jumps over the lazy dog today",
            lang="en",
            source="web",
            n_chars=49,
        ),
        Row(
            doc_id=5,
            text="the quick brown fox jumps over the lazy dog tomorrow",
            lang="en",
            source="web",
            n_chars=52,
        ),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "documents.parquet")
    )
    return base


@pytest.mark.parametrize(
    "op_name",
    ["dedup_near_jaccard", "dedup_near_minhash", "dedup_near_simhash", "dedup_clusters"],
)
def test_shingle_ops_survive_short_docs(spark, short_doc_dir, op_name):
    rows = REGISTRY[op_name].fn(spark, short_doc_dir).collect()
    # The only near-dup pair is (4, 5): 8/10 shared 3-shingles = 0.8 >= 0.7.
    if op_name in ("dedup_near_jaccard", "dedup_near_minhash"):
        pairs = {(r.doc_a, r.doc_b) for r in rows}
        assert (4, 5) in pairs
        assert all(a >= 4 for a, _ in pairs), "short docs must not pair"


def test_text_ngrams_survives_short_docs(spark, short_doc_dir):
    rows = REGISTRY["text_ngrams"].fn(spark, short_doc_dir).collect()
    bigrams = {r.bigram: r.cnt for r in rows}
    # 1-token and empty docs contribute nothing; 2-token doc contributes one.
    assert bigrams.get("two tokens") == 1
    assert "one" not in bigrams and "" not in bigrams


def test_shingle_guard_matches_duckdb_empty_semantics(spark, short_doc_dir):
    """dedup_near_jaccard's oracle (range(1, len-1)) yields empty shingles
    for short docs — the Spark side must agree, i.e. produce zero pairs
    among doc_ids 0-3."""
    rows = REGISTRY["dedup_near_jaccard"].fn(spark, short_doc_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(4, 5)}


def test_text_repetition_short_docs(spark, short_doc_dir):
    """Docs with <2 tokens have no bigrams: they must be EXCLUDED (not
    crash, not emit a 0/0 row) — mirroring the oracle's len>=2 filter."""
    out = REGISTRY["text_repetition"].fn(spark, short_doc_dir).collect()
    ids = {r["doc_id"] for r in out}
    assert 0 not in ids and 1 not in ids  # empty + 1-token excluded
    assert 2 in ids and 4 in ids
    row2 = next(r for r in out if r["doc_id"] == 2)
    assert row2["n_bigrams"] == 1 and row2["dup_bigram_frac"] == 0.0


def test_topk_per_group_group_smaller_than_k(spark, sf_dir):
    """A group with fewer rows than k returns all its rows with contiguous
    ranks starting at 1 (no padding, no missing ranks)."""
    out = REGISTRY["topk_per_group"].fn(spark, sf_dir).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["o_orderpriority"], []).append(r["rn"])
    for grp, rns in by_grp.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), (grp, rns)
        assert len(rns) <= 3


def test_pack_shards_budget_invariant(spark, sf_dir):
    """Every shard except a hash-partition's last must have accumulated
    >= budget tokens once its successor starts; shard ids are contiguous
    from 0 within each hash partition."""
    rows = REGISTRY["pack_shards"].fn(spark, sf_dir).collect()
    parts = {}
    for r in rows:
        parts.setdefault(r["hash_part"], []).append(r)
    for hp, rs in parts.items():
        rs.sort(key=lambda r: r["doc_id"])
        shard_ids = sorted({r["shard_id"] for r in rs})
        assert shard_ids == list(range(len(shard_ids))), hp
        cum = 0
        for r in rs:
            assert r["shard_id"] == cum // 2000
            cum += r["n_tokens"]


@pytest.fixture(scope="module")
def micro_events_dir(spark, tmp_path_factory):
    """A tiny events table exercising the asof/window edge cases: equal
    ties, single-event users, users with no signup at all."""
    import datetime as dt

    base = str(tmp_path_factory.mktemp("micro_events"))
    T = lambda s: dt.datetime(2024, 1, 1, 12, 0, s)
    rows = [
        # user 1: signups at :10 and :30; event at :20 is EXACTLY equidistant
        Row(event_id=100, ts=T(10), user_id=1, event_type="signup", value=1.0, props="{}"),
        Row(event_id=101, ts=T(20), user_id=1, event_type="click", value=2.0, props="{}"),
        Row(event_id=102, ts=T(30), user_id=1, event_type="signup", value=3.0, props="{}"),
        # user 2: a single event, no signup anywhere
        Row(event_id=200, ts=T(5), user_id=2, event_type="click", value=7.0, props="{}"),
        # user 3: signup at the same timestamp as the event
        Row(event_id=300, ts=T(40), user_id=3, event_type="signup", value=0.0, props="{}"),
        Row(event_id=301, ts=T(40), user_id=3, event_type="click", value=0.0, props="{}"),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    return base


def test_asof_nearest_tie_prefers_earlier(spark, micro_events_dir):
    out = {r.event_id: r for r in REGISTRY["join_asof_nearest"].fn(spark, micro_events_dir).collect()}
    # equidistant (10s both ways) -> the EARLIER signup (event 100)
    assert out[101].sig_id == 100
    # no signup for user 2 -> NULL match
    assert out[200].sig_id is None
    # same-timestamp signup matches at distance 0
    assert out[301].sig_id == 300


def test_ewma_single_event_is_identity(spark, micro_events_dir):
    out = {r.event_id: r.ewma for r in REGISTRY["ts_ewma"].fn(spark, micro_events_dir).collect()}
    assert out[200] == 7.0  # one-row frame: seed only, no fold
    # user 1 third event: fold(1.0, 2.0, 3.0) = (1*0.8 + 2*0.2)*0.8 + 3*0.2
    assert abs(out[102] - ((1.0 * 0.8 + 2.0 * 0.2) * 0.8 + 3.0 * 0.2)) < 1e-9


def test_zscore_excludes_short_frames(spark, micro_events_dir):
    # every user here has < 5 events -> no row survives the n >= 5 guard
    assert REGISTRY["ts_zscore_outliers"].fn(spark, micro_events_dir).count() == 0


@pytest.fixture(scope="module")
def interval_events_dir(spark, tmp_path_factory):
    """Events for the interval-merge edge cases: touching (s == prev end),
    overlapping, disjoint, and zero-length intervals on one user."""
    import datetime as dt

    base = str(tmp_path_factory.mktemp("interval_events"))
    T = lambda s: dt.datetime(2024, 1, 1, 12, 0, s)
    rows = [
        # user 1: [0,10] then touching [10,20] (merges: s == prev end is
        # NOT s > prev_max), then disjoint [30,35]
        Row(event_id=1, ts=T(0), user_id=1, event_type="a", value=10.0, props="{}"),
        Row(event_id=2, ts=T(10), user_id=1, event_type="a", value=10.0, props="{}"),
        Row(event_id=3, ts=T(30), user_id=1, event_type="a", value=5.0, props="{}"),
        # user 2: containment — [0,20] swallows [5,6]
        Row(event_id=4, ts=T(0), user_id=2, event_type="a", value=20.0, props="{}"),
        Row(event_id=5, ts=T(5), user_id=2, event_type="a", value=1.0, props="{}"),
        # user 3: zero-length interval (value < 1 floors to 0)
        Row(event_id=6, ts=T(0), user_id=3, event_type="a", value=0.5, props="{}"),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    return base


def test_interval_merge_touching_contained_zero(spark, interval_events_dir):
    from carpet_spark.ops.timeseries import ts_interval_merge

    got = {
        r["user_id"]: (r["n_intervals"], r["covered_s"])
        for r in ts_interval_merge(spark, interval_events_dir).collect()
    }
    # user 1: [0,20] merged + [30,35] = 2 intervals, 25 s
    assert got[1] == (2, 25)
    # user 2: containment collapses to [0,20]
    assert got[2] == (1, 20)
    # user 3: zero-length interval still counts, covers 0 s
    assert got[3] == (1, 0)


def test_attribution_same_instant_touch_is_credited(spark, micro_events_dir):
    """A view/click at the exact purchase ts must be creditable (touch
    sorts before conversion at equal ts) — micro_events has no purchases,
    so build the one case inline."""
    import datetime as dt
    import os as _os

    from carpet_spark.ops.analytics import attribution_last_touch

    base = str(micro_events_dir) + "_attr"
    T = lambda s: dt.datetime(2024, 1, 1, 12, 0, s)
    rows = [
        # same-instant click + purchase → credited to 'click'
        Row(event_id=1, ts=T(10), user_id=1, event_type="click", value=0.0, props="{}"),
        Row(event_id=2, ts=T(10), user_id=1, event_type="purchase", value=5.0, props="{}"),
        # purchase with no touch at all → unattributed
        Row(event_id=3, ts=T(20), user_id=2, event_type="purchase", value=3.0, props="{}"),
        # touch OUTSIDE the 7-day lookback → unattributed
        Row(event_id=4, ts=dt.datetime(2024, 1, 1), user_id=3, event_type="view", value=0.0, props="{}"),
        Row(event_id=5, ts=dt.datetime(2024, 1, 9), user_id=3, event_type="purchase", value=2.0, props="{}"),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    got = {
        r["channel"]: (r["n_conversions"], r["revenue"])
        for r in attribution_last_touch(spark, base).collect()
    }
    assert got["click"] == (1, 5.0)
    assert got["unattributed"] == (2, 5.0)


def test_reconcile_diff_partitions_sum_to_union(spark, sf_dir):
    """added+removed+changed+unchanged must account for every key on
    either side exactly once."""
    from carpet_spark.ops.mutations import reconcile_table_diff
    from carpet_spark.tables import load

    got = {r["status"]: r["n"] for r in reconcile_table_diff(spark, sf_dir).collect()}
    o = load(spark, sf_dir, "orders")
    n = o.count()
    n_removed_keys = o.filter("o_orderkey % 1009 = 0").count()
    n_added = o.filter("o_orderkey % 997 = 0").count()
    assert got.get("removed", 0) == n_removed_keys
    assert got.get("added", 0) == n_added
    # every surviving original key is either changed or unchanged
    assert got.get("changed", 0) + got.get("unchanged", 0) == n - n_removed_keys


def test_csv_permissive_quarantine_counts(spark, sf_dir):
    from carpet_spark.ops.scans import scan_csv_permissive
    from carpet_spark.tables import load

    row = scan_csv_permissive(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem").filter("l_orderkey % 199 = 0")
    assert row["n_rows"] == li.count()
    assert row["n_corrupt"] == li.filter("l_orderkey % 1000 = 0").count()
    assert row["n_good"] + row["n_corrupt"] == row["n_rows"]


def test_business_days_matches_bruteforce(spark, sf_dir):
    """The closed-form W(d2)-W(d1) must equal a literal weekday count for
    every sampled span — a shared Spark/DuckDB formula is a shared bug
    (the first draft agreed across engines and was wrong ~35% of the
    time), so this pins the semantics against an independent oracle."""
    import datetime as dt

    from carpet_spark.ops.functions import fn_business_days
    from carpet_spark.tables import load

    rows = fn_business_days(spark, sf_dir).collect()
    assert rows, "op returned no rows"

    from collections import Counter

    li = load(spark, sf_dir, "lineitem").filter("l_orderkey % 499 = 0")
    o = load(spark, sf_dir, "orders")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .selectExpr(
            "l_orderkey", "l_linenumber",
            "cast(o_orderdate as date) d1", "cast(l_shipdate as date) d2",
        )
        .collect()
    )

    def brute(d1: dt.date, d2: dt.date) -> int:
        n, d = 0, d1 + dt.timedelta(days=1)
        while d <= d2:
            if d.isoweekday() <= 5:
                n += 1
            d += dt.timedelta(days=1)
        return n

    # (l_orderkey, l_linenumber) is NOT unique in this fixture — compare
    # full row multisets, not a keyed dict
    expected = Counter(
        (r["l_orderkey"], r["l_linenumber"], (r["d2"] - r["d1"]).days,
         brute(r["d1"], r["d2"]))
        for r in pairs
        if r["d2"] >= r["d1"]
    )
    got = Counter(
        (r["l_orderkey"], r["l_linenumber"], r["cal_days"], r["business_days"])
        for r in rows
    )
    assert got == expected


def test_cusum_closed_form_matches_recursion(spark, sf_dir):
    """S+ from the two-window closed form must equal the literal CUSUM
    recursion replayed in Python over the same daily series — the
    second shared-formula pin (a draft with the prefix-min excluding
    the current row went negative and both engines agreed on it)."""
    import pyspark.sql.functions as F

    from carpet_spark.exprs import lsum
    from carpet_spark.ops.timeseries import ts_cusum_drift
    from carpet_spark.tables import load

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(lsum(F.col("value")).alias("v"))
        .orderBy("d")
        .collect()
    )
    vs = [r["v"] for r in daily]
    mu = sum(vs) / len(vs)
    var = sum((x - mu) ** 2 for x in vs) / (len(vs) - 1)
    sigma = var ** 0.5
    s, expected = 0.0, {}
    for r, x in zip(daily, vs):
        s = max(0.0, s + x - mu - 0.5 * sigma)
        expected[r["d"]] = s

    got = {r["d"]: r["s_plus"] for r in ts_cusum_drift(spark, sf_dir).collect()}
    assert got, "no rows"
    for d, s_plus in got.items():
        assert abs(s_plus - expected[d]) < 1e-4, (d, s_plus, expected[d])
        assert s_plus >= 0.0


# --- r03 ADVICE regressions -------------------------------------------------


def test_jsonlines_commit_tolerates_none_messages(tmp_path):
    """A task that wrote nothing (or a failed attempt) can surface as a
    None commit message — commit() must manifest only the real parts and
    abort() must not raise (r03 ADVICE: scans.py JsonLinesWriter)."""
    from carpet_spark.ops.scans import JsonLinesWriter, PartCommit

    out = str(tmp_path / "sink")
    os.makedirs(out, exist_ok=True)
    part = os.path.join(out, "part-test.jsonl")
    with open(part, "w") as f:
        f.write('{"a": 1}\n')

    w = JsonLinesWriter({"path": out})
    w.commit([PartCommit(path=part, rows=1), None])
    with open(os.path.join(out, "_MANIFEST")) as f:
        manifested = [line.strip() for line in f if line.strip()]
    assert manifested == [part]

    w.abort([None, PartCommit(path=part, rows=1)])
    assert not os.path.exists(part)


def test_arrow_l2_batches_null_and_ragged():
    """The flatten+reshape fast path must NOT fire for batches with null
    or ragged embedding lists; the fallback walks per-list offsets so
    values never misalign (r03 ADVICE: udfs.py udf_arrow_map)."""
    import math

    import pyarrow as pa

    from carpet_spark.ops.udfs import _arrow_l2_batches

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2, 3, 4], type=pa.int64()),
            pa.array([0, 1, 0, 1], type=pa.int32()),
            pa.array([[3.0, 4.0], None, [5.0, 12.0, 0.0], [8.0, 6.0]],
                     type=pa.list_(pa.float32())),
        ],
        names=["vec_id", "label", "embedding"],
    )
    (out,) = list(_arrow_l2_batches([batch]))
    norms = out.column("l2_norm").to_pylist()
    assert norms[0] == pytest.approx(5.0)
    assert norms[1] is None or math.isnan(norms[1])
    assert norms[2] == pytest.approx(13.0)
    assert norms[3] == pytest.approx(10.0)

    # rectangular batch still takes the vectorized path and agrees
    rect = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2], type=pa.int64()),
            pa.array([0, 1], type=pa.int32()),
            pa.array([[3.0, 4.0], [6.0, 8.0]], type=pa.list_(pa.float32())),
        ],
        names=["vec_id", "label", "embedding"],
    )
    (out2,) = list(_arrow_l2_batches([rect]))
    assert out2.column("l2_norm").to_pylist() == pytest.approx([5.0, 10.0])


# --- r04 VERDICT item 2: third pins for identical-sequence oracles ----------
#
# attribution_markov_removal and ts_holt_linear_smoothing verify Spark
# against a DuckDB oracle that walks the SAME non-trivial recurrence — the
# SURVEY §5 shared-formula rule (the fn_business_days lesson: both engines
# once agreed on a wrong formula) requires each to also carry an
# independent brute-force or invariant pin.


def test_markov_attribution_invariants(spark, sf_dir):
    """Independent pins for the Markov removal-effect recursion:

    1. Flow conservation — for an absorbing chain whose transition
       probabilities are MLE edge-count ratios, the absorption probability
       into 'conv' from 'start' equals the EMPIRICAL converter fraction
       C/U exactly (every visit to a transient state has one outgoing
       edge, so U·p_start = C by summing p over observed visits).  This
       identity is a property of the estimator, not of the fixed-point
       iteration the oracle replays — a genuinely third mechanism.
    2. Removal monotonicity — redirecting a channel's inbound edges to the
       absorbing 'null' can only shed conversion mass, so
       conv_prob_without ≤ base_conv_prob and removal_effect ∈ [0, 1].
    3. Shares are a normalization: non-negative, sum to 1.
    """
    import pyspark.sql.functions as F

    from carpet_spark.ops.analytics import attribution_markov_removal
    from carpet_spark.tables import load

    rows = attribution_markov_removal(spark, sf_dir).collect()
    assert len(rows) == 4, rows

    conv = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max((F.col("event_type") == "purchase").cast("int")).alias("c"))
        .agg(F.sum("c").alias("converters"), F.count(F.lit(1)).alias("users"))
        .collect()[0]
    )
    empirical = conv["converters"] / conv["users"]

    share_sum = 0.0
    for r in rows:
        base = r["base_conv_prob"]
        assert abs(base - empirical) < 1e-3, (base, empirical)
        assert 0.0 <= r["conv_prob_without"] <= base + 1e-9, r
        assert -1e-9 <= r["removal_effect"] <= 1.0 + 1e-9, r
        # removal_effect is definitionally (base - without) / base
        assert r["removal_effect"] == pytest.approx(
            (base - r["conv_prob_without"]) / base, abs=2e-6
        )
        assert r["attribution_share"] >= -1e-9
        share_sum += r["attribution_share"]
    assert abs(share_sum - 1.0) < 1e-5, share_sum


def test_holt_matches_hand_computed_series(spark, tmp_path):
    """Holt level/trend reproduce a hand-computed 5-point series
    (α=0.3, β=0.1, l₁=x₁, b₁=0) on a purpose-built orders fixture —
    independent of both the Spark struct fold and the oracle's recursive
    CTE, which execute the same IEEE sequence and could share a bug."""
    import datetime as dt

    from pyspark.sql import Row

    from carpet_spark.ops.timeseries import ts_holt_linear_smoothing

    vals = [10.0, 12.0, 11.0, 15.0, 14.0]
    orders = spark.createDataFrame(
        [
            Row(o_orderdate=dt.date(2024, 1, 1) + dt.timedelta(days=i),
                o_totalprice=v)
            for i, v in enumerate(vals)
        ]
    )
    fix = str(tmp_path / "holt_fixture")
    os.makedirs(fix, exist_ok=True)
    orders.coalesce(1).write.mode("overwrite").parquet(f"{fix}/orders.parquet")

    got = {
        r["d"].isoformat(): (r["level"], r["trend"], r["forecast_next"])
        for r in ts_holt_linear_smoothing(spark, fix).collect()
    }
    assert len(got) == 5

    # hand recursion (worked to full precision on paper, asserted at 6dp):
    #   t2: l = .3*12 + .7*10        = 10.6      b = .1*.6       = 0.06
    #   t3: l = .3*11 + .7*10.66     = 10.762    b = .0162+.054  = 0.0702
    #   t4: l = .3*15 + .7*10.8322   = 12.08254  b = 0.195234
    #   t5: l = .3*14 + .7*12.277774 = 12.794442 b = 0.246901
    hand = {
        "2024-01-01": (10.0, 0.0),
        "2024-01-02": (10.6, 0.06),
        "2024-01-03": (10.762, 0.0702),
        "2024-01-04": (12.08254, 0.195234),
        "2024-01-05": (12.794442, 0.246901),
    }
    for d, (l_exp, b_exp) in hand.items():
        l_got, b_got, f_got = got[d]
        assert l_got == pytest.approx(l_exp, abs=1e-6), (d, l_got, l_exp)
        assert b_got == pytest.approx(b_exp, abs=1e-6), (d, b_got, b_exp)
        assert f_got == pytest.approx(l_exp + b_exp, abs=2e-6), (d, f_got)


def test_macd_matches_python_replay(spark, sf_dir):
    """MACD/signal/histogram must match a literal Python replay of the
    bounded-fold EMA definition over the same daily closes — the Spark
    expression and the DuckDB oracle fold the identical sequence, so a
    transcribed-wrong alpha or frame would agree across engines."""
    from carpet_spark.ops.timeseries import _daily_orders, ts_macd_indicator

    daily = sorted(
        (r["d"], r["cents"] / 100.0)
        for r in _daily_orders(spark, sf_dir).collect()
    )
    closes = [v for _, v in daily]

    def fold(xs, alpha):
        a = xs[0]
        for x in xs[1:]:
            a = a * (1.0 - alpha) + x * alpha
        return a

    ema12 = [fold(closes[max(0, i - 59): i + 1], 2.0 / 13.0)
             for i in range(len(closes))]
    ema26 = [fold(closes[max(0, i - 59): i + 1], 2.0 / 27.0)
             for i in range(len(closes))]
    macd = [a - b for a, b in zip(ema12, ema26)]
    signal = [fold(macd[max(0, i - 26): i + 1], 0.2)
              for i in range(len(macd))]

    got = {r["d"]: r for r in ts_macd_indicator(spark, sf_dir).collect()}
    assert len(got) == len(daily)
    for (d, close), m, s in zip(daily, macd, signal):
        r = got[d]
        assert r["close"] == pytest.approx(close, abs=1e-6)
        assert r["macd"] == pytest.approx(m, abs=2e-6), (d, r["macd"], m)
        assert r["signal"] == pytest.approx(s, abs=2e-6)
        assert r["histogram"] == pytest.approx(m - s, abs=3e-6)


def test_adstock_matches_python_replay(spark, sf_dir):
    """Adstock-vs-raw Pearson must match a Python replay of the λ=0.5
    carry-over recursion and the closed-form correlation over the same
    daily series (same shared-formula rationale as the MACD pin); also
    pins the sanity property |corr| ≤ 1."""
    import math

    import pyspark.sql.functions as F

    from carpet_spark.exprs import lsum
    from carpet_spark.ops.analytics import agg_adstock_decay_correlation
    from carpet_spark.tables import load

    daily = sorted(
        (r["d"], r["clicks"], r["purch"])
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(
            lsum(
                F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)
            ).alias("clicks"),
            lsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("purch"),
        )
        .collect()
    )
    adstock, a = [], None
    for _, clicks, _p in daily:
        a = clicks if a is None else clicks + 0.5 * a
        adstock.append(a)

    def q(x):  # micro-unit quantization, matching (x*1e6 + .5).cast("long")
        return int(x * 1_000_000 + 0.5)

    ax = [q(v) for v in adstock]
    cx = [q(c) for _, c, _p in daily]
    py = [q(p) for _, _c, p in daily]

    def pearson(xs, ys):
        n = len(xs)
        sx, sy = float(sum(xs)), float(sum(ys))
        sxy = float(sum(x * y for x, y in zip(xs, ys)))
        sxx = float(sum(x * x for x in xs))
        syy = float(sum(y * y for y in ys))
        return (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )

    row = agg_adstock_decay_correlation(spark, sf_dir).collect()[0]
    assert row["n"] == len(daily)
    assert abs(row["corr_adstock"]) <= 1.0 and abs(row["corr_raw"]) <= 1.0
    assert row["corr_adstock"] == pytest.approx(pearson(ax, py), abs=2e-6)
    assert row["corr_raw"] == pytest.approx(pearson(cx, py), abs=2e-6)


def test_holt_winters_matches_python_replay(spark, sf_dir):
    """Holt-Winters additive output must match a literal Python replay of
    the triple recurrence (α=.3, β=.1, γ=.2, period 7, first-season
    init) over the same daily series — the same shared-formula rule as
    the Holt/MACD pins: the Spark struct fold and the recursive-CTE
    oracle execute one transcription of the formula, so only an
    independent replay can catch a transcription error."""
    from carpet_spark.ops.timeseries import (
        _daily_orders,
        ts_holt_winters_additive,
    )

    daily = sorted(
        (r["d"], r["cents"]) for r in _daily_orders(spark, sf_dir).collect()
    )
    v = [c / 100.0 for _, c in daily]
    l = sum(c for _, c in daily[:7]) / 700.0
    b = 0.0
    s = [x - l for x in v[:7]]
    expected = {}
    for t in range(7, len(v)):
        s_due = s[0]
        new_l = 0.3 * (v[t] - s_due) + 0.7 * (l + b)
        new_b = 0.1 * (new_l - l) + 0.9 * b
        new_s = 0.2 * (v[t] - new_l) + 0.8 * s_due
        l, b = new_l, new_b
        s = s[1:] + [new_s]
        expected[daily[t][0]] = (l, b, new_s, s[0])

    got = {
        r["d"]: r for r in ts_holt_winters_additive(spark, sf_dir).collect()
    }
    assert len(got) == len(expected) and got, (len(got), len(expected))
    for d, (l_e, b_e, s_e, due_e) in expected.items():
        r = got[d]
        assert r["level"] == pytest.approx(l_e, abs=1e-5), (d, r["level"], l_e)
        assert r["trend"] == pytest.approx(b_e, abs=1e-5)
        assert r["seasonal"] == pytest.approx(s_e, abs=1e-5)
        assert r["forecast_next"] == pytest.approx(l_e + b_e + due_e, abs=3e-5)


def test_token_bucket_matches_python_replay(spark, tmp_path):
    """Token-bucket throttle counts must match a literal Python replay of
    the limiter semantics (capacity 2, refill 1 token / 2 h, 1 token per
    event, first event admits from a full bucket) on a hand-built fixture
    — the Spark struct fold and the WITH RECURSIVE oracle walk one
    transcription of the recurrence, so only an independent replay can
    catch a transcribed-wrong refill rate or comparison (the r5 verdict's
    one missing pin).  The fixture forces every interesting branch:

    - user 1: a 3-event burst (third event must throttle), then a >4 h
      gap that refills to CAP (not beyond), then a second burst whose
      third event throttles again;
    - user 2: a single event (always admits);
    - user 3: events exactly 2 h apart (refill exactly covers spend —
      never throttles);
    - user 4: a sub-minute hammer of 5 (only the bucket's 2 initial
      tokens admit).
    """
    import datetime as dt

    from carpet_spark.ops.timeseries import ts_token_bucket_throttle

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(user, minutes, eid):
        return Row(
            event_id=eid,
            ts=t0 + dt.timedelta(minutes=minutes),
            user_id=user,
            event_type="click",
            value=1.0,
            props="{}",
        )

    fixture = (
        # user 1: burst, refill past cap, burst again
        [ev(1, 0, 1), ev(1, 1, 2), ev(1, 2, 3)]          # 3rd throttled
        + [ev(1, 6 * 60, 4), ev(1, 6 * 60 + 1, 5), ev(1, 6 * 60 + 2, 6)]
        # user 2: singleton
        + [ev(2, 0, 7)]
        # user 3: exactly one refill period apart
        + [ev(3, i * 120, 10 + i) for i in range(4)]
        # user 4: 5-event hammer
        + [ev(4, i * 0.2, 20 + i) for i in range(5)]
    )
    fix = str(tmp_path / "tb_fixture")
    os.makedirs(fix, exist_ok=True)
    spark.createDataFrame(fixture).coalesce(1).write.mode("overwrite").parquet(
        f"{fix}/events.parquet"
    )

    # Literal replay of the limiter SEMANTICS, written from the policy
    # statement (not from the Spark step function): per user in (ts,
    # event_id) order, avail = min(CAP, tokens + gap_h / REFILL_H); admit
    # iff avail >= 1, spending one token.
    CAP, REFILL_US = 2.0, 7_200_000_000.0
    expected = {}
    by_user: dict[int, list] = {}
    for r in sorted(fixture, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.ts)
    for user, tss in by_user.items():
        tokens, nthr, prev = CAP, 0, None
        for ts in tss:
            avail = (
                CAP
                if prev is None
                else min(CAP, tokens + (ts - prev).total_seconds() * 1e6 / REFILL_US)
            )
            if avail >= 1.0:
                tokens = avail - 1.0
            else:
                tokens = avail
                nthr += 1
            prev = ts
        expected[user] = (len(tss), nthr)

    # the fixture must exercise both branches for the burst users
    assert expected[1] == (6, 2)
    assert expected[2] == (1, 0)
    assert expected[3] == (4, 0)
    assert expected[4] == (5, 3)

    got = {
        r["user_id"]: (r["n_events"], r["n_throttled"], r["throttle_rate"])
        for r in ts_token_bucket_throttle(spark, fix).collect()
    }
    assert set(got) == set(expected)
    for user, (n_exp, thr_exp) in expected.items():
        n_got, thr_got, rate_got = got[user]
        assert (n_got, thr_got) == (n_exp, thr_exp), (user, got[user], expected[user])
        assert rate_got == pytest.approx(thr_exp / n_exp, abs=1e-6)


# --- r6 identical-sequence sweep pins (r5 VERDICT item 4): the remaining
# ops whose oracle recursion/fold could share a transcription bug with the
# Spark side each get a third, independent mechanism — a closed form, a
# hand-built fixture with known answers, or a Python replay.


def test_recursive_cte_matches_closed_form(spark, sf_dir):
    """sql_recursive_cte walks parent(k) = k div 2 to the root on BOTH
    engines with near-identical SQL — the closed form is the independent
    pin: halvings from k to 1 is bit_length(k) − 1, plus the final step
    to 0, so depth_to_root = bit_length(k) and chain_len = depth + 1."""
    rows = REGISTRY["sql_recursive_cte"].fn(spark, sf_dir).collect()
    assert rows, "anchor selected no customers"
    for r in rows:
        k = r["start_key"]
        assert r["depth_to_root"] == int(k).bit_length(), r
        assert r["chain_len"] == r["depth_to_root"] + 1, r


def test_fn_lambda_matches_python_replay(spark, sf_dir):
    """fn_lambda's six higher-order expressions (including the seeded
    string fold piped4, a fold transcribed into both engines) must match
    a plain-Python replay over the same split semantics."""
    from carpet_spark.tables import load

    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    got = {r["doc_id"]: r for r in REGISTRY["fn_lambda"].fn(spark, sf_dir).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        toks = text.split(" ")  # F.split keeps empty tokens; str.split(' ') too
        r = got[doc_id]
        assert r["upper5"] == " ".join(t.upper() for t in toks[:5]), doc_id
        assert r["long_toks"] == " ".join(t for t in toks if len(t) > 5), doc_id
        assert r["has_the"] == int("the" in toks), doc_id
        assert r["all_short"] == int(all(len(t) <= 12 for t in toks)), doc_id
        assert r["char_sum"] == sum(len(t) for t in toks), doc_id
        assert r["piped4"] == "|".join(toks[:4]), doc_id


def test_bfs_hops_on_hand_built_graph(spark, tmp_path):
    """graph_bfs_hops on a hand-built temporal-adjacency fixture: a
    9-node path (hop i = distance i, nodes past the 6-hop cap absent), a
    disconnected pair (absent), and a consecutive-duplicate user (no
    self-edge).  Both engines cap at 6, so only a known-answer fixture
    can prove the cap and the frontier expansion are right."""
    import datetime as dt

    base = str(tmp_path / "bfs_fixture")
    os.makedirs(base, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # path 0-1-2-...-8 via consecutive appearances in event_type 'c'
    # (with one duplicated consecutive user: must NOT create a self-edge)
    seq = [0, 0, 1, 2, 3, 4, 5, 6, 7, 8]
    rows += [
        Row(event_id=i, ts=t0 + dt.timedelta(minutes=i), user_id=u,
            event_type="c", value=1.0, props="{}")
        for i, u in enumerate(seq)
    ]
    # disconnected pair in its own timeline
    rows += [
        Row(event_id=100 + i, ts=t0 + dt.timedelta(minutes=i), user_id=100 + i,
            event_type="x", value=1.0, props="{}")
        for i in range(2)
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        f"{base}/events.parquet"
    )
    got = {
        r["user_id"]: r["hops"]
        for r in REGISTRY["graph_bfs_hops"].fn(spark, base).collect()
    }
    assert got == {i: i for i in range(7)}, got  # 7,8 beyond the 6-hop cap


def test_connected_components_on_hand_built_graph(spark, tmp_path):
    """graph_connected_components on a hand-built co-purchase fixture
    with known components: {20,40,60} bridged through two orders,
    {80,100}, an isolated sampled part 120 (singleton via the node
    self-seed), and unsampled partkeys that must be filtered out."""
    base = str(tmp_path / "cc_fixture")
    os.makedirs(base, exist_ok=True)
    orders = {
        1: [20, 40, 33],   # 33 not % 20 == 0 -> dropped
        2: [40, 60],       # bridges 60 into {20,40}
        3: [80, 100],
        4: [120],          # isolated sampled node
        5: [7, 9],         # fully unsampled order
    }
    rows = [
        Row(l_orderkey=ok, l_partkey=pk)
        for ok, parts in orders.items()
        for pk in parts
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        f"{base}/lineitem.parquet"
    )
    got = {
        r["node"]: (r["component_rep"], r["component_size"])
        for r in REGISTRY["graph_connected_components"].fn(spark, base).collect()
    }
    assert got == {
        20: (20, 3), 40: (20, 3), 60: (20, 3),
        80: (80, 2), 100: (80, 2),
        120: (120, 1),
    }, got


def test_dedup_apply_materializes_cluster_winners(spark, sf_dir):
    """dedup_apply must equal documents minus every cluster's non-min
    members: exactly one survivor per cluster (the min doc_id rep), all
    docs outside the similarity graph untouched — checked against the
    dedup_clusters labels it composes, which are themselves
    precision/recall-tested against exact Jaccard elsewhere."""
    from carpet_spark.tables import load

    labels = {
        r["doc_id"]: r["cluster_rep"]
        for r in REGISTRY["dedup_clusters"].fn(spark, sf_dir).collect()
    }
    all_docs = {
        r["doc_id"] for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    }
    kept = {r["doc_id"] for r in REGISTRY["dedup_apply"].fn(spark, sf_dir).collect()}

    losers = {d for d, rep in labels.items() if rep != d}
    assert kept == all_docs - losers
    # per cluster: the unique survivor is the min doc_id
    by_rep: dict = {}
    for d, rep in labels.items():
        by_rep.setdefault(rep, []).append(d)
    for rep, members in by_rep.items():
        survivors = set(members) & kept
        assert survivors == {min(members)}, (rep, sorted(members), survivors)


def test_fp_scaled_long_rounds_half_away_from_zero(spark):
    """Pin the signed fixed-point conversion against Python's exact
    half-away-from-zero reference — including NEGATIVE amounts, where the
    unsigned shortcut ``(x*100 + 0.5).cast(long)`` silently rounds a
    half-cent HIGH (cast-to-long truncates toward zero, so -2999999999.5
    becomes -2999999999 instead of ROUND's -3000000000).  The extreme
    regime found this live in nine money ops; this pin keeps the helper
    honest in isolation."""
    import pyspark.sql.functions as F

    from carpet_spark.exprs import fp_scaled_long

    cases = [
        30000000.005,      # half-cent boundary, positive
        -30000000.005,     # half-cent boundary, negative (the bug class)
        -29999999.995,
        1.0e10, -1.0e10,   # extreme-regime magnitudes
        0.25, -0.25, 0.0,
        123.456, -123.456,
    ]

    def ref(x: float, factor: int) -> int:
        import math

        y = abs(x) * factor + 0.5
        return int(math.copysign(math.floor(y), x)) if x != 0 else 0

    df = spark.createDataFrame([(v,) for v in cases], "x double")
    got = {
        r["x"]: (r["c100"], r["c1m"])
        for r in df.select(
            "x",
            fp_scaled_long(F.col("x"), 100).alias("c100"),
            fp_scaled_long(F.col("x"), 1_000_000).alias("c1m"),
        ).collect()
    }
    for v in cases:
        assert got[v] == (ref(v, 100), ref(v, 1_000_000)), (v, got[v])
