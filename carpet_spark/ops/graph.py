"""Graph operators — iterative algorithms over relational edge lists.

PageRank here is the representative *iterative* workload (the category the
task brief calls out as genuinely non-SQL-expressible in one query).  Two
design decisions make it verifiable and scalable:

1. **Exact integer arithmetic.**  Float PageRank is order-dependent under
   parallel summation (double addition is non-associative), so a
   hash-parity oracle would flake.  Ranks are scaled to BIGINT at 1e12 and
   every step uses integer division — both engines compute bit-identical
   longs, so the driver's value-hash is stable.  (dedup_clusters uses the
   same trick for its label-propagation loop.)
2. **Distributed iteration shape.**  Each step is join(ranks, edges) →
   groupBy(dst).sum — ranks and edges stay DataFrames throughout, nothing
   rank-sized ever hits the driver.  ``localCheckpoint`` every few rounds
   truncates the lineage so the plan doesn't deepen unboundedly — at a
   billion vertices this is the standard Pregel-on-DataFrames loop.

The oracle unrolls the same fixed iteration count as chained CTEs —
possible precisely because the arithmetic is exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..exprs import fp_split_sum_of
from ..registry import register
from ..tables import load

_SCALE = 1_000_000_000_000  # rank fixed-point scale (1e12)
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
_N_ITER = 10

# Directed trade graph: customer-nation → supplier-nation, keeping only
# pairs whose trade volume exceeds the MEAN pair volume (written as
# ``w * n_pairs > total_w`` — integer compare, no float division, so both
# engines pick the identical edge set at any SF).  The raw pair graph is
# complete at test scale; thresholding makes out-degrees uneven (5..16)
# so ranks actually discriminate.
_PAIRS_SQL = """
    SELECT cn.n_nationkey AS src, sn.n_nationkey AS dst, COUNT(*) AS w
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
    GROUP BY 1, 2
"""
_EDGES_SQL = f"""
    WITH p AS ({_PAIRS_SQL})
    SELECT src, dst FROM p
    WHERE w * (SELECT COUNT(*) FROM p) > (SELECT SUM(w) FROM p)
"""


def _pagerank_oracle() -> str:
    base = (
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL}),\n"
        "verts AS MATERIALIZED (SELECT n_nationkey AS v FROM nation),\n"
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),\n"
        "nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),\n"
        f"r0 AS (SELECT v, CAST({_SCALE} // (SELECT n FROM nv) AS BIGINT) AS rank"
        " FROM verts)"
    )
    steps = []
    for i in range(1, _N_ITER + 1):
        p = i - 1
        steps.append(
            f"r{i} AS (\n"
            f"  SELECT v, CAST({_SCALE} * ({_DAMP_DEN} - {_DAMP_NUM})"
            f" // ({_DAMP_DEN} * (SELECT n FROM nv)) AS BIGINT)\n"
            f"       + COALESCE((SELECT SUM(contrib) FROM (\n"
            f"           SELECT e.dst, r.rank * {_DAMP_NUM}"
            f" // ({_DAMP_DEN} * d.outdeg) AS contrib\n"
            f"           FROM r{p} r JOIN edges e ON e.src = r.v\n"
            f"           JOIN deg d ON d.src = r.v) c WHERE c.dst = verts.v), 0)"
            f" AS rank\n"
            f"  FROM verts)"
        )
    return (
        base + ",\n" + ",\n".join(steps)
        + f"\nSELECT v AS nationkey, CAST(rank AS BIGINT) AS pr_fixed"
        f" FROM r{_N_ITER}"
    )


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (10 iterations, damping 0.85) over the
    nation-to-nation trade graph.  See module docstring for why the
    arithmetic is exact-integer and the loop is the Pregel-on-DataFrames
    shape."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    tot = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("w").alias("total_w")
    )
    edges = (
        pairs.crossJoin(F.broadcast(tot))
        .filter(F.col("w") * F.col("n_pairs") > F.col("total_w"))
        .select("src", "dst")
        .localCheckpoint()  # edge list computed once, lineage truncated
    )
    verts = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("v")
    )
    n = verts.count()  # scalar graph metadata, like ann.py's k-means state
    # Empty-sweep guard: with zero vertices every frame below is empty,
    # so the two n-divisors are dead literals — clamp to avoid the
    # driver-side ZeroDivisionError an empty vertex slice would raise.
    n = n or 1
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = edges.join(deg, "src").localCheckpoint()

    ranks = verts.select("v", F.lit(_SCALE // n).cast("long").alias("rank"))
    teleport = _SCALE * (_DAMP_DEN - _DAMP_NUM) // (_DAMP_DEN * n)
    # r12 (VERDICT item 5): the rank and contribution frames are bounded
    # by the VERTEX count (|nations|), so both per-round join hints are
    # broadcast-safe at ANY scale and skip AQE's per-round size
    # re-estimation.  The suggested kmeans++ every-round-checkpoint
    # cadence was MEASURED and REJECTED: interleaved fresh-session A/B
    # over cadences {1, 5, 10} × {hint, no hint} shows every-round no
    # better than the existing every-5 (and slightly worse cold — 10
    # eager actions vs 2); pagerank never had kmeans++'s 94-exchange
    # lineage pathology because it already truncates every 5 rounds
    # (OPTIMIZATION_r12.md has the table).
    for i in range(_N_ITER):
        contribs = (
            F.broadcast(ranks).join(edges_deg, ranks.v == edges_deg.src)
            .select(
                F.col("dst"),
                F.expr(f"rank * {_DAMP_NUM} DIV ({_DAMP_DEN} * outdeg)").alias(
                    "contrib"
                ),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            verts.join(F.broadcast(contribs), verts.v == contribs.dst, "left")
            .select(
                "v",
                (F.lit(teleport) + F.coalesce("inflow", F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
        if (i + 1) % 5 == 0:  # truncate lineage every 5 rounds
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("v").alias("nationkey"), F.col("rank").alias("pr_fixed")
    )


_BFS_MAX_HOPS = 6


@register(
    "graph_bfs_hops",
    oracle=f"""
    WITH RECURSIVE edges AS (
      SELECT prev AS src, user_id AS dst FROM (
        SELECT user_id,
               LAG(user_id) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS prev
        FROM events
      ) WHERE prev IS NOT NULL AND prev <> user_id
    ),
    bidir AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    reach (user_id, hops) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION
      SELECT b.dst, r.hops + 1
      FROM reach r JOIN bidir b ON b.src = r.user_id
      WHERE r.hops < {_BFS_MAX_HOPS}
    )
    SELECT user_id, MIN(hops) AS hops FROM reach GROUP BY user_id
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability: minimum hop count from user 0 over the
    temporal-adjacency graph (an undirected edge links users who appear
    consecutively in the same event_type's timeline — deterministic,
    data-derived, ~|events| edges).  The second iterative-graph shape
    beside PageRank: per-node DISTANCE, the frontier-expansion loop.

    Iteration is hop-exact so the hash oracle is safe (no floats at all):
    each round joins the frontier to the edge list, takes the min hop per
    node, and localCheckpoints to truncate lineage — the Pregel BFS on
    DataFrames; at scale each round is one join + one agg on the edge
    partitioning.  Capped at {_BFS_MAX_HOPS} hops on BOTH sides (the
    oracle is a recursive CTE with the same cap), so results match even
    if the graph's true diameter exceeds the cap."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    e = (
        ev.select("event_type", "ts", "event_id", "user_id")
        .withColumn("prev", F.lag("user_id").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("user_id")))
        .select(F.col("prev").alias("src"), F.col("user_id").alias("dst"))
    )
    bidir = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    bidir = bidir.localCheckpoint()

    frontier = spark.createDataFrame([(0,)], "user_id long").withColumn(
        "hops", F.lit(0)
    )
    seen = frontier
    for hop in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(bidir, frontier.user_id == bidir.src)
            .select(F.col("dst").alias("user_id"))
            .distinct()
            .join(seen.select("user_id"), "user_id", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return seen


@register(
    "graph_triangle_count",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT
             LEAST(o_custkey % 500, o_orderkey % 500) AS a,
             GREATEST(o_custkey % 500, o_orderkey % 500) AS b
      FROM orders
      WHERE (o_custkey % 500) <> (o_orderkey % 500)
    ),
    t AS (
      SELECT COUNT(*) AS n_triangles
      FROM raw e1
      JOIN raw e2 ON e2.a = e1.b
      JOIN raw e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT COUNT(*) FROM raw) AS n_edges, n_triangles FROM t
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting — the clustering-coefficient /
    community-density primitive — via the ORIENTED two-join algorithm:
    store each undirected edge once as (a<b), build wedges a→b→c with
    one equi self-join, then close them against the edge set with a
    second.  Orientation is the whole trick: without it every triangle
    is found 6 times and the wedge join explodes on high-degree nodes in
    both directions (edges synthesized deterministically from orders —
    the fixture has no edge table).

    Scale (100 TB): cost is Σ wedges = Σ_v out-deg(v)², the quantity
    orientation minimizes — ordering by (degree, id) instead of raw id
    provably bounds out-degree at O(√|E|) on any graph (the classic
    MapReduce refinement; id-orientation is used here because the
    synthetic graph is near-regular, and the ORDER is what the oracle
    must reproduce).  Both joins are equi-key hash joins — shuffle on
    wedge midpoint then on (a,b) — never a cartesian; output is one
    row."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 500
    y = F.col("o_orderkey") % 500
    edges = (
        o.filter(x != y)
        .select(F.least(x, y).alias("a"), F.greatest(x, y).alias("b"))
        .distinct()
    )
    # fan out the wedge probe side by midpoint (r11 finding, r12 form;
    # guide §2.4/§3.4): the wedge join explodes ~170x beyond its input
    # bytes, so ANY input-sized partitioning — the planned width or AQE's
    # byte-based coalescing — under-parallelizes it; the explicit
    # repartition of the (tiny) edge list is unconditional because the
    # explosion, not the input, is what must spread
    e1 = edges.repartition(spark.sparkContext.defaultParallelism, F.col("b"))
    e2 = edges.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    wedges = e1.join(e2, e1.b == e2.b2).select("a", "b", "c")
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = wedges.join(
        e3, (wedges.a == e3.a3) & (wedges.c == e3.c3)
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_edges.crossJoin(tri)


@register(
    "graph_degree_stats",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT
             LEAST(o_custkey % 500, o_orderkey % 500) AS a,
             GREATEST(o_custkey % 500, o_orderkey % 500) AS b
      FROM orders
      WHERE (o_custkey % 500) <> (o_orderkey % 500)
    ),
    deg AS (
      SELECT v, COUNT(*) AS degree FROM (
        SELECT a AS v FROM raw UNION ALL SELECT b FROM raw
      ) GROUP BY v
    )
    SELECT COUNT(*) AS n_nodes,
           CAST(SUM(degree) / 2 AS BIGINT) AS n_edges,
           MIN(degree) AS min_deg,
           MAX(degree) AS max_deg,
           round(AVG(degree), 6) AS avg_deg,
           round(quantile_cont(degree, 0.5), 6) AS p50_deg,
           round(quantile_cont(degree, 0.99), 6) AS p99_deg
    FROM deg
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution profile of the (synthesized) graph — node and
    edge counts, min/avg/max and p50/p99 degree — the FIRST query run on
    any new graph, because every downstream cost model keys on it:
    wedge counts for triangles scale with Σdeg², join fan-out with max
    degree, and a p99≫p50 gap says 'salt the hubs before you self-join'
    (graph_triangle_count's orientation note).

    Scale (100 TB): degrees come from one union + count aggregate over
    the edge list (map-side combined, |V| rows out); the percentile
    runs over the |V|-row degree table (exact here; switch to
    approx_percentile when |V| stops fitting a task, SURVEY §2.E)."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 500
    y = F.col("o_orderkey") % 500
    edges = (
        o.filter(x != y)
        .select(F.least(x, y).alias("a"), F.greatest(x, y).alias("b"))
        .distinct()
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
        F.min("degree").alias("min_deg"),
        F.max("degree").alias("max_deg"),
        F.round(F.avg("degree"), 6).alias("avg_deg"),
        F.round(F.percentile("degree", F.lit(0.5)), 6).alias("p50_deg"),
        F.round(F.percentile("degree", F.lit(0.99)), 6).alias("p99_deg"),
    )


@register(
    "graph_common_neighbors",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT
             LEAST(o_custkey % 500, o_orderkey % 500) AS a,
             GREATEST(o_custkey % 500, o_orderkey % 500) AS b
      FROM orders
      WHERE (o_custkey % 500) <> (o_orderkey % 500)
    ),
    adj AS (
      SELECT a AS v, b AS n FROM raw UNION ALL SELECT b, a FROM raw
    ),
    deg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY v),
    wedge AS (
      SELECT x.v AS u, y.v AS w, COUNT(*) AS common
      FROM adj x JOIN adj y ON x.n = y.n AND x.v < y.v
      GROUP BY 1, 2
    )
    SELECT w.u, w.w, w.common,
           round(w.common / CAST(du.d + dw.d - w.common AS DOUBLE), 6)
             AS jaccard
    FROM wedge w
    JOIN deg du ON du.v = w.u
    JOIN deg dw ON dw.v = w.w
    WHERE w.common >= 12
    ORDER BY jaccard DESC, w.u ASC, w.w ASC
    LIMIT 25
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood overlap: for node pairs sharing
    ≥12 common neighbors, the Jaccard of their neighbor sets — the
    classic 'people you may know' / co-purchase-suggestion score, and
    the simplest baseline every fancier graph-ML model must beat.
    Common-neighbor counting is the SAME wedge join as
    graph_triangle_count (pairs meeting at a shared midpoint), so the
    scale story carries over: cost = Σ deg², bounded by
    degree-ordering the adjacency when hubs appear.

    Scale (100 TB): adjacency doubles the edge list (flatMap); the
    wedge join shuffles on the midpoint; degree tables broadcast onto
    the support-floored pairs; top-25 is TakeOrdered.  The support
    floor is what keeps the candidate-pair set from going quadratic —
    the same role the band threshold plays in LSH dedup."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 500
    y = F.col("o_orderkey") % 500
    edges = (
        o.filter(x != y)
        .select(F.least(x, y).alias("a"), F.greatest(x, y).alias("b"))
        .distinct()
    )
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    # fan out the probe side by the wedge midpoint (r11 finding, r12
    # form; guide §2.4/§3.4): AQE coalesces the small adjacency input to
    # ~2 partitions by BYTES, but the wedge join EXPLODES ~170x (30.4M
    # pairs at sf0.1) — the explosion ground through 2 cores (measured
    # 17.3 s; 32-wide probe brings the op to ~2 s).  Unconditional
    # repartition: the explosion, not the input size, is what must
    # spread, so no input-sized heuristic (planned width or post-AQE
    # count) is the right gate.
    l = adj.repartition(spark.sparkContext.defaultParallelism, F.col("n")).select(
        F.col("v").alias("u"), "n"
    )
    r = adj.select(F.col("v").alias("w"), F.col("n").alias("n2"))
    wedge = (
        l.join(r, (l.n == r.n2) & (l.u < r.w))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= 12)
    )
    du = deg.select(F.col("v").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("v").alias("w"), F.col("d").alias("dw"))
    scored = (
        wedge.join(F.broadcast(du), "u")
        .join(F.broadcast(dw), "w")
        .select(
            "u",
            "w",
            "common",
            F.round(
                F.col("common")
                / (F.col("du") + F.col("dw") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("u").asc(), F.col("w").asc()
    ).limit(25)


@register(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey % 20 = 0
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT DISTINCT pa AS src, pb AS dst FROM pairs
      UNION SELECT DISTINCT pb, pa FROM pairs
    ),
    nodes AS (SELECT DISTINCT l_partkey AS node FROM li),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
    ),
    labeled AS (
      SELECT node, MIN(r) AS component_rep FROM reach GROUP BY node
    )
    SELECT node, component_rep,
           COUNT(*) OVER (PARTITION BY component_rep) AS component_size
    FROM labeled
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone connected components over the part co-purchase graph
    (sampled parts are adjacent when they appear in the same order) —
    the generic CC operator that dedup_clusters embeds for its
    similarity graph, exposed for any edge set: substitute shared
    devices, shared payment instruments, or citation links and the
    same loop yields fraud rings / identity clusters / dedup groups.
    Each node reports its component's min-id representative and the
    component size; isolated nodes are their own singleton component
    (the closure oracle covers them via the node self-seed).

    Scale (100 TB): iterative min-label propagation — per round one
    edge⋈label shuffle and a map-side-combined min, converging in
    O(diameter) rounds with localCheckpoint lineage cuts and a hard
    non-convergence error; the driver sees one count per round, never
    rows.  The recursive-CTE closure oracle is viable only on the
    bounded fixture; at scale only the loop survives."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 20 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    edges = (
        pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        li.select(F.col("l_partkey").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(20):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # r12 (guide §5): the changed-row probe used to be a SECOND join
        # of new vs old labels per round; the update join already sees
        # both, so the flag rides the same frame and the convergence
        # check is a filter-count on the checkpointed rows — one join and
        # one pass per round instead of two.
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
                (
                    F.least(F.col("label"), F.coalesce("nmin", F.col("label")))
                    != F.col("label")
                ).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "graph_connected_components: no convergence in 20 rounds"
        )
    from pyspark.sql import Window as _W

    wc = _W.partitionBy("component_rep")
    return labels.select(
        "node", F.col("label").alias("component_rep")
    ).withColumn("component_size", F.count(F.lit(1)).over(wc))


@register(
    "graph_adamic_adar",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey % 20 = 0
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT DISTINCT pa AS src, pb AS dst FROM pairs
      UNION SELECT DISTINCT pb, pa FROM pairs
    ),
    deg AS (
      SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
    ),
    two_hop AS (
      SELECT e1.src AS a, e2.dst AS b, e1.dst AS mid
      FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
      WHERE e1.src < e2.dst
    ),
    candidates AS (
      SELECT t.a, t.b, t.mid FROM two_hop t
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.src = t.a AND e.dst = t.b
      )
    ),
    scored AS (
      SELECT c.a, c.b,
             COUNT(*) AS common_neighbors,
             round(SUM(1.0 / ln(d.d)), 6) AS adamic_adar
      FROM candidates c JOIN deg d ON c.mid = d.node
      GROUP BY c.a, c.b
    ),
    ranked AS (
      SELECT a, b, common_neighbors, adamic_adar,
             ROW_NUMBER() OVER (ORDER BY adamic_adar DESC, a, b) AS rnk
      FROM scored
    )
    SELECT rnk, a, b, common_neighbors, adamic_adar
    FROM ranked WHERE rnk <= 20
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the part co-purchase graph: for
    node pairs at distance 2 that are NOT yet connected, score
    Σ 1/ln(deg(common neighbor)) — rare shared neighbors count more
    than hub neighbors, which is why AA beats raw common-neighbor
    counts (graph_common_neighbors) for 'you may also need' part
    recommendations and identity-graph candidate generation; top-20
    predicted links reported.  Midpoints always have degree ≥ 2
    (they connect two distinct endpoints), so ln(deg) never hits
    zero.

    Scale (100 TB): the two-hop expansion is the one fanout —
    bounded by Σ deg², with hub capping (drop mids above a degree
    cap) as the documented skew valve; scoring is a map-side
    combinable aggregate keyed by the candidate pair, and the
    direct-edge exclusion is an anti join on the same keys."""
    from pyspark.sql import Window as _W

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 20 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    two_hop = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e1.src") < F.col("e2.dst"))
        .select(
            F.col("e1.src").alias("a_"),
            F.col("e2.dst").alias("b_"),
            F.col("e1.dst").alias("mid"),
        )
    )
    candidates = two_hop.join(
        edges.withColumnsRenamed({"src": "a_", "dst": "b_"}),
        ["a_", "b_"],
        "left_anti",
    )
    scored = (
        candidates.join(deg, candidates.mid == deg.node)
        .groupBy("a_", "b_")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("adamic_adar"),
        )
    )
    wr = _W.orderBy(F.col("adamic_adar").desc(), F.col("a_"), F.col("b_"))
    return (
        scored.select(
            F.row_number().over(wr).alias("rnk"),
            F.col("a_").alias("a"),
            F.col("b_").alias("b"),
            "common_neighbors",
            "adamic_adar",
        )
        .filter(F.col("rnk") <= 20)
    )


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The module's canonical directed trade edge set (same derivation as
    graph_pagerank: above-mean-volume nation→nation pairs), shared by the
    edge-statistics ops below.  localCheckpoint: computed once per call,
    lineage truncated before self-joins."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    tot = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("w").alias("total_w")
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .filter(F.col("w") * F.col("n_pairs") > F.col("total_w"))
        .select("src", "dst")
        .localCheckpoint()
    )


@register(
    "graph_reciprocity",
    oracle=f"""
    WITH e AS MATERIALIZED ({_EDGES_SQL})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reciprocal,
           round(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS reciprocity
    FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
    """,
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity of the directed trade graph: the fraction of
    nation→nation links whose reverse link also clears the volume
    threshold — the 'is trade mutual or extractive' scalar, and for
    any directed behavioral graph (follows, messages, payments) the
    first structure check before community algorithms that assume
    symmetry.  Distinct edges make the reverse lookup a 0/1 left
    join, so the count is exact.

    Scale (100 TB): the heavy part is the same one-fact-shuffle edge
    derivation pagerank documents; the reciprocity self-join runs on
    the collapsed |edges| set (equi keys (dst,src) — a plain hash
    join, broadcast-sized here, shuffle-partitioned at billions of
    edges)."""
    e = _trade_edges(spark, sf_dir)
    r = e.select(F.col("src").alias("rsrc"), F.col("dst").alias("rdst"))
    j = e.join(
        r, (F.col("rsrc") == F.col("dst")) & (F.col("rdst") == F.col("src")), "left"
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.when(F.col("rsrc").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_reciprocal"),
        F.round(
            F.sum(F.when(F.col("rsrc").isNotNull(), 1).otherwise(0))
            * F.lit(1.0)
            / F.count(F.lit(1)),
            6,
        ).alias("reciprocity"),
    )


@register(
    "graph_assortativity_degree",
    oracle=f"""
    WITH e AS MATERIALIZED ({_EDGES_SQL}),
    odeg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
    ideg AS (SELECT dst, COUNT(*) AS idg FROM e GROUP BY dst),
    j AS (
      SELECT o.od AS x, i.idg AS y
      FROM e JOIN odeg o ON o.src = e.src JOIN ideg i ON i.dst = e.dst
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM j
    )
    SELECT m AS n_edges,
           round((m * sxy - sx * sy)
                 / NULLIF(sqrt((m * sxx - sx * sx) * 1.0), 0)
                 / NULLIF(sqrt((m * syy - sy * sy) * 1.0), 0), 6)
             AS assortativity
    FROM s
    """,
)
def graph_assortativity_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed degree assortativity: Pearson correlation between the
    out-degree of an edge's source and the in-degree of its target —
    negative means hubs feed the periphery (disassortative, the usual
    shape of trade and social graphs), positive means a rich club.
    Degrees are small exact integers, so every Pearson input is an
    integer sum and floats appear only in the final ratio (the same
    discipline ts_cross_correlation_lags uses).

    Scale (100 TB): two |verts|-sized degree aggregates joined back to
    edges on their natural keys — degree tables broadcast below a few
    hundred million vertices, and the final reduction is one row."""
    e = _trade_edges(spark, sf_dir)
    odeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ideg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    j = (
        e.join(F.broadcast(odeg), "src")
        .join(F.broadcast(ideg), "dst")
        .select(F.col("od").alias("x"), F.col("idg").alias("y"))
    )
    # degree×degree products over |edges| rows: a hub with degree ~1e8
    # pushes the long Σ past 2^63 well before 100 TB — cross-products
    # run in decimal(38,0) (HUGEINT oracle-side) and the first moments
    # on the hi/lo split (degree rows ≪ the split's 1.1e11 fp bound)
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        fp_split_sum_of(F.col("x").cast("long")).alias("sx"),
        fp_split_sum_of(F.col("y").cast("long")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("m").alias("n_edges"),
        # NULLIF guards (skew sweep): a graph where every source has the
        # same out-degree (one hot supplier) zeroes a variance axis — the
        # correlation is undefined; NULL on both engines, never ANSI x/0
        F.round(
            num
            / F.nullif(F.sqrt(dx), F.lit(0.0))
            / F.nullif(F.sqrt(dy), F.lit(0.0)),
            6,
        ).alias("assortativity"),
    )


@register(
    "graph_k_core_peel",
    oracle=f"""
    WITH de AS MATERIALIZED ({_EDGES_SQL}),
    e0 AS MATERIALIZED (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM de
    ),
    d1 AS (
      SELECT x AS vtx, COUNT(*) AS deg FROM (
        SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0
      ) GROUP BY x
    ),
    v1 AS (SELECT vtx FROM d1 WHERE deg >= 14),
    e1 AS (
      SELECT e0.u, e0.v FROM e0
      JOIN v1 a ON a.vtx = e0.u JOIN v1 b ON b.vtx = e0.v
    ),
    d2 AS (
      SELECT x AS vtx, COUNT(*) AS deg FROM (
        SELECT u AS x FROM e1 UNION ALL SELECT v FROM e1
      ) GROUP BY x
    ),
    v2 AS (SELECT vtx FROM d2 WHERE deg >= 14),
    e2 AS (
      SELECT e1.u, e1.v FROM e1
      JOIN v2 a ON a.vtx = e1.u JOIN v2 b ON b.vtx = e1.v
    ),
    d3 AS (
      SELECT x AS vtx, COUNT(*) AS deg FROM (
        SELECT u AS x FROM e2 UNION ALL SELECT v FROM e2
      ) GROUP BY x
    ),
    v3 AS (SELECT vtx FROM d3 WHERE deg >= 14),
    e3 AS (
      SELECT e2.u, e2.v FROM e2
      JOIN v3 a ON a.vtx = e2.u JOIN v3 b ON b.vtx = e2.v
    )
    SELECT 1 AS peel_round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v1) AS n_vertices,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e1) AS n_edges
    UNION ALL SELECT 2, (SELECT COUNT(*) FROM v2),
                        (SELECT COUNT(*) FROM e2)
    UNION ALL SELECT 3, (SELECT COUNT(*) FROM v3),
                        (SELECT COUNT(*) FROM e3)
    """,
)
def graph_k_core_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-core peeling of the undirected trade graph: repeatedly drop
    vertices with degree < 14 and the edges that hang off them,
    reporting surviving vertex/edge counts per round — the
    cohesive-subgraph extraction (k-core) that separates the densely
    interlocked trading core from hangers-on, where one thresholded
    pass (graph_degree_stats) cannot: removing a weak vertex can
    demote its neighbors, hence the iteration.  Three fixed rounds
    with the same Pregel-on-DataFrames discipline as graph_pagerank
    (localCheckpoint per round truncates lineage; counts at each
    round expose the convergence trajectory).

    Scale (100 TB): each round is a degree combine plus two
    semi-joins of edges against surviving vertices — at billions of
    edges the loop runs until fixpoint with the same per-round
    cost, vertex set shrinking monotonically."""
    directed = _trade_edges(spark, sf_dir)
    e = (
        directed.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    rows = []
    for rnd in range(1, 4):
        deg = (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 14).select(F.col("x").alias("vtx"))
        e = (
            e.join(keep.withColumnRenamed("vtx", "u"), "u")
            .join(keep.withColumnRenamed("vtx", "v"), "v")
            .select("u", "v")
            .localCheckpoint()
        )
        nv = keep.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
        ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        rows.append(
            nv.crossJoin(ne).select(
                F.lit(rnd).alias("peel_round"), "n_vertices", "n_edges"
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register(
    "graph_clustering_coefficient",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT
             LEAST(o_custkey % 500, o_orderkey % 500) AS a,
             GREATEST(o_custkey % 500, o_orderkey % 500) AS b
      FROM orders
      WHERE (o_custkey % 500) <> (o_orderkey % 500)
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM raw e1
      JOIN raw e2 ON e2.a = e1.b
      JOIN raw e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tv AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
        SELECT x AS v FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY v
    ),
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT a AS v FROM raw UNION ALL SELECT b FROM raw
      ) GROUP BY v
    )
    SELECT d.v AS node, d.degree,
           COALESCE(t.t, 0) AS n_tri,
           round(2.0 * COALESCE(t.t, 0)
                 / (d.degree * (d.degree - 1.0)), 6) AS clustering
    FROM deg d LEFT JOIN tv t ON t.v = d.v
    WHERE d.degree >= 2
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient — 2·tri(v) / (deg(v)·(deg(v)−1)),
    the 'how clique-like is this node's neighborhood' score behind
    community detection, spam-account triage, and graph-health dashboards.
    Reuses graph_triangle_count's oriented enumeration (each triangle found
    exactly once with a<b<c), then credits all three corners and joins
    against undirected degrees; nodes with deg ≥ 2 and no triangles report
    0, not a dropped row.

    Scale (100 TB): the oriented wedge join bounds cost at Σ out-deg² (the
    quantity orientation minimizes, O(|E|^1.5) worst case); per-vertex
    credit is a map-side-combinable count on vertex ids, and the final
    left join runs on |V| rows."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 500
    y = F.col("o_orderkey") % 500
    edges = (
        o.filter(x != y)
        .select(F.least(x, y).alias("a"), F.greatest(x, y).alias("b"))
        .distinct()
    )
    e2 = edges.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    # fan out the wedge probe side by midpoint (r11 finding, r12 form;
    # guide §2.4/§3.4): the wedge join explodes far beyond its input
    # bytes, so any input-sized partitioning under-parallelizes it —
    # unconditional repartition of the tiny edge list (see
    # graph_triangle_count); the downstream triangle-closing join
    # inherits the partitioning (narrow broadcast probe)
    e1 = edges.repartition(spark.sparkContext.defaultParallelism, F.col("b"))
    wedges = e1.join(e2, e1.b == e2.b2).select("a", "b", "c")
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = wedges.join(e3, (wedges.a == e3.a3) & (wedges.c == e3.c3)).select(
        "a", "b", "c"
    )
    # r12 (guide §1.2): the three-way union consumed `tri` THREE times —
    # each branch re-ran the whole wedge+closing join (only exchanges are
    # reused across consumers, not the joins above them).  Exploding the
    # corner array credits all three corners in ONE pass over the
    # triangles: identical per-vertex counts, measured 3.1-3.5 s ->
    # 1.5-1.6 s for the full op at sf0.1.
    tv = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        deg.join(tv, "v", "left")
        .filter(F.col("degree") >= 2)
        .select(
            F.col("v").alias("node"),
            "degree",
            F.coalesce(F.col("t"), F.lit(0).cast("long")).alias("n_tri"),
            F.round(
                2.0 * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1.0))),
                6,
            ).alias("clustering"),
        )
    )


@register(
    "graph_jaccard_neighbors",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey % 20 = 0
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT DISTINCT pa AS src, pb AS dst FROM pairs
      UNION SELECT DISTINCT pb, pa FROM pairs
    ),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
    ),
    two_hop AS (
      SELECT e1.src AS a, e2.dst AS b
      FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
      WHERE e1.src < e2.dst
    ),
    candidates AS (
      SELECT t.a, t.b, CAST(COUNT(*) AS BIGINT) AS common
      FROM two_hop t
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.src = t.a AND e.dst = t.b
      )
      GROUP BY t.a, t.b
    ),
    scored AS (
      SELECT c.a, c.b, c.common,
             round(c.common / CAST(da.d + db.d - c.common AS DOUBLE), 6)
               AS jaccard
      FROM candidates c
      JOIN deg da ON da.node = c.a
      JOIN deg db ON db.node = c.b
    ),
    ranked AS (
      SELECT a, b, common, jaccard,
             ROW_NUMBER() OVER (ORDER BY jaccard DESC, a, b) AS rnk
      FROM scored
    )
    SELECT rnk, a, b, common, jaccard FROM ranked WHERE rnk <= 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction on the part co-purchase graph:
    for non-adjacent distance-2 pairs, |N(a)∩N(b)| / |N(a)∪N(b)| — the
    degree-normalized sibling of graph_common_neighbors and
    graph_adamic_adar (same candidate set, so the three scores are
    directly comparable per pair); top-20 predicted links.  The union size
    is computed as da+db−common, all exact BIGINTs — no neighbor-set
    materialization.

    Scale (100 TB): identical skeleton to adamic_adar — the two-hop
    expansion bounded by Σ deg² with hub capping as the skew valve, an
    anti join to drop existing edges, then two |V|-row degree joins;
    ranking is a global top-k over candidate pairs
    (TakeOrderedAndProject, never a full sort at the final limit)."""
    from pyspark.sql import Window as _W

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 20 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    two_hop = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e1.src") < F.col("e2.dst"))
        .select(F.col("e1.src").alias("a_"), F.col("e2.dst").alias("b_"))
    )
    candidates = (
        two_hop.join(
            edges.withColumnsRenamed({"src": "a_", "dst": "b_"}),
            ["a_", "b_"],
            "left_anti",
        )
        .groupBy("a_", "b_")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    da = deg.withColumnsRenamed({"node": "a_", "d": "da"})
    db = deg.withColumnsRenamed({"node": "b_", "d": "db"})
    scored = (
        candidates.join(da, "a_")
        .join(db, "b_")
        .select(
            "a_", "b_", "common",
            F.round(
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    wr = _W.orderBy(F.col("jaccard").desc(), F.col("a_"), F.col("b_"))
    return (
        scored.select(
            F.row_number().over(wr).alias("rnk"),
            F.col("a_").alias("a"),
            F.col("b_").alias("b"),
            "common",
            "jaccard",
        )
        .filter(F.col("rnk") <= 20)
    )
