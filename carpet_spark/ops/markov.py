"""Markov steady-state — the iterative extension of agg_transition_matrix.

Same exact-integer discipline as graph.py's PageRank: the transition
matrix holds ppm probabilities (integer division), the distribution
vector holds 1e12-scaled mass, and every power-iteration step is
integer multiply + DIV — both engines compute bit-identical longs, so
the unrolled-CTE oracle hash-matches the DataFrame loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load

_MK_SCALE = 1_000_000_000_000  # distribution fixed point (1e12)
_MK_ITER = 10

_SEQ_SQL = """
    SELECT LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS i,
           event_type AS j
    FROM events
"""

_P_SQL = f"""
    SELECT i, j, CAST(COUNT(*) * 1000000 //
           SUM(COUNT(*)) OVER (PARTITION BY i) AS BIGINT) AS p_ppm
    FROM ({_SEQ_SQL}) WHERE i IS NOT NULL
    GROUP BY i, j
"""


def _markov_oracle() -> str:
    base = (
        f"WITH p AS MATERIALIZED ({_P_SQL}),\n"
        "states AS MATERIALIZED (SELECT DISTINCT i AS s FROM p),\n"
        "ns AS (SELECT COUNT(*) AS n FROM states),\n"
        f"d0 AS (SELECT s, CAST({_MK_SCALE} // (SELECT n FROM ns)"
        " AS BIGINT) AS mass FROM states)"
    )
    steps = []
    for it in range(1, _MK_ITER + 1):
        prev = it - 1
        steps.append(
            f"d{it} AS (\n"
            f"  SELECT st.s, CAST(COALESCE((\n"
            f"    SELECT SUM(d.mass * p.p_ppm // 1000000)\n"
            f"    FROM d{prev} d JOIN p ON p.i = d.s\n"
            f"    WHERE p.j = st.s), 0) AS BIGINT) AS mass\n"
            f"  FROM states st)"
        )
    empirical = """
    emp AS (
      SELECT event_type AS s, COUNT(*) AS n_events FROM events
      GROUP BY event_type
    ),
    emp_tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t FROM emp)
    """
    return (
        base
        + ",\n"
        + ",\n".join(steps)
        + ",\n"
        + empirical
        + f"""
    SELECT d.s AS event_type, d.mass AS steady_mass,
           round(e.n_events / CAST((SELECT t FROM emp_tot) AS DOUBLE), 6)
             AS empirical_share
    FROM d{_MK_ITER} d JOIN emp e ON d.s = e.s
    """
    )


@register("ts_markov_steady_state", oracle=_markov_oracle())
def ts_markov_steady_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state distribution of the behavioral Markov chain: the
    per-user event-type transition matrix (agg_transition_matrix's
    object) powered to its fixed point by 10 integer power-iteration
    rounds — 'where does a user's session END UP spending its time if
    behavior today persists', reported against the empirical share so
    the gap flags non-stationarity.  The matrix holds ppm integers
    and the mass vector 1e12-scaled longs (graph_pagerank's exactness
    discipline), so the DataFrame loop and the unrolled-CTE oracle
    produce bit-identical masses.

    Scale (100 TB): the transition counts are one lag-window pass
    over events (the sessionize shuffle); everything after runs on a
    |states|² matrix — iteration cost is independent of data volume,
    the defining property of the aggregate-then-iterate shape."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("i"),
        F.col("event_type").alias("j"),
    ).filter(F.col("i").isNotNull())
    counts = seq.groupBy("i", "j").agg(F.count(F.lit(1)).alias("n"))
    # r11 optimization (guide §2.4 + §1.2 step 1): the 10 distributed
    # power-iteration rounds ran over a |event_types|² matrix — a
    # BOUNDED-VOCABULARY object (single-digit states at any data
    # volume) — yet each round planned a join + groupBy + state
    # re-join, 30 of the op's 35 Exchanges; at sf0.1 the op spent
    # 3.6 s scheduling trivial shuffle stages.  Aggregate-then-iterate
    # done right: the heavy passes (sessionize lag + counts) stay
    # distributed, the ≤K² ppm matrix is collected (same
    # bounded-metadata collect class as agg_transition_matrix's,
    # adjudicated bounded in r10), and the 10 rounds run as exact
    # integer arithmetic on the driver — bit-identical to the
    # distributed loop: per-edge mass*ppm//1e6 then per-state sum, all
    # values non-negative so Python // == SQL DIV, and summation order
    # is irrelevant on exact longs.  35 -> 6 Exchanges, 3.61 -> 1.28 s
    # sf0.1 noop (collect included in the timed region); iteration cost at 100 TB is O(1) driver work instead
    # of 30 shuffle stages.
    p = counts.select(
        "i",
        "j",
        F.expr("CAST(n * 1000000 DIV SUM(n) OVER (PARTITION BY i) AS BIGINT)").alias(
            "p_ppm"
        ),
    )
    pm = {(r["i"], r["j"]): r["p_ppm"] for r in p.collect()}
    states_l = sorted({i for (i, _) in pm})
    # Empty-sweep guard: zero states means the result is empty and the
    # seed literal is dead — clamp the divisor.
    n_states = len(states_l) or 1
    mass = {s: _MK_SCALE // n_states for s in states_l}
    for _ in range(_MK_ITER):
        new = dict.fromkeys(states_l, 0)
        for (i, j), ppm in pm.items():
            if j in new:  # mass flowing to a non-state j is dropped,
                new[j] += mass[i] * ppm // 1_000_000  # like the oracle's
            # per-state correlated SUM over p.j = st.s
        mass = new
    dist = spark.createDataFrame(
        [(s, mass[s]) for s in states_l], "s string, mass long"
    )
    emp = e.groupBy(F.col("event_type").alias("s")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    emp_tot = emp.agg(F.sum("n_events").cast("long").alias("t"))
    return (
        dist.join(emp, "s")
        .crossJoin(F.broadcast(emp_tot))
        .select(
            F.col("s").alias("event_type"),
            F.col("mass").alias("steady_mass"),
            F.round(F.col("n_events") / F.col("t").cast("double"), 6).alias(
                "empirical_share"
            ),
        )
    )
