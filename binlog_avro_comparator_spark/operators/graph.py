"""Graph analytics over relational edges: link-analysis operators a
curation/analytics pipeline derives from its own fact tables (here the
customer--supplier purchase graph), complementing the dedup tier's
connected components (dedup.dedup_clusters) with importance scoring.

Determinism contract: ranks live in INTEGER units (1e-12 of total
mass) and every per-iteration step is integer arithmetic -- floor
division for the spread, integer scaling for damping -- so sums are
order-independent and every engine produces bit-identical ranks at any
partitioning (the repo-wide exact-sum discipline; doubles appear only
in the final display column, derived from identical integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: total rank mass in integer units (1 unit = 1e-12 of the graph's mass)
RANK_UNIT = 1_000_000_000_000

#: damping factor as an integer ratio (0.85 = 17/20)
DAMP_NUM, DAMP_DEN = 17, 20


def purchase_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Undirected customer--supplier purchase edges, one row per
    direction.  Node ids are prefixed strings ('c:' / 's:') so the two
    key spaces never collide.  The distinct pair set compacts the fact
    table BEFORE any rank iteration touches it: lineitem rows collapse
    to at most |customers| x |suppliers| edges, usually far fewer."""
    pairs = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    # prefixes make the two directions disjoint: plain unionAll, no dedup
    return pairs.unionAll(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list (both
    directions present -- so there are no dangling nodes and no
    teleport-mass correction term).

    Shape per iteration: ONE join of the (cached, degree-annotated)
    edge frame against the current rank frame on src, then ONE
    map-side-combined sum by dst -- the Pregel message-passing step as
    two shuffles, no window, no driver collect (n_iter is a fixed
    hyperparameter, not a convergence probe; for convergence-driven
    runs see dedup.dedup_clusters' 1-row probe + localCheckpoint
    pattern, which applies verbatim here).  The edge frame is
    persisted because every iteration re-reads it; at 100 TB you would
    also pre-partition it by src so the per-iteration join reuses one
    partitioning.  Integer contract: spread = units DIV degree (floor),
    new rank = (1-d) mass share + (17 * inbound) DIV 20 -- every engine
    agrees bit-for-bit at any partitioning.

    Returns (node, rank_units, rank) sorted nowhere -- callers order.
    """
    from ..functions.caching import scoped_cache

    # cache both the edge list and its degree table through the owned
    # registry (callers release via cache_scope): edges feeds deg + the
    # annotated join, deg feeds the init ranks, the node count AND the
    # join -- uncached, the upstream edge derivation (often a distinct
    # over a fact join) would re-run once per consumer.  An eager
    # unpersist here would fire at plan-BUILD time, before the lazy
    # result ever materializes, and silently recompute the edge join
    # once per iteration.
    edges = scoped_cache(edges)
    deg = scoped_cache(edges.groupBy("src").agg(F.count("*").alias("__deg")))
    ann = scoped_cache(edges.join(deg, "src"))
    n_nodes = deg.select(F.count("*").alias("__n"))
    # base mass = floor(0.15 * UNIT / N) in pure integers, applied
    # inside the loop as (3*U) DIV (20*N)
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src").alias("node"),
        F.expr(f"CAST({RANK_UNIT} AS BIGINT) DIV __n").alias("units"),
    )
    for _ in range(n_iter):
        inbound = (
            ann.join(ranks, ann["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("units DIV __deg").alias("__contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("__contrib").alias("__in"))
        )
        ranks = inbound.crossJoin(F.broadcast(n_nodes)).select(
            F.col("dst").alias("node"),
            (
                F.expr(f"CAST({3 * RANK_UNIT} AS BIGINT) DIV (20 * __n)")
                + F.expr(f"({DAMP_NUM} * __in) DIV {DAMP_DEN}")
            ).alias("units"),
        )
    return ranks.select(
        "node",
        F.col("units").alias("rank_units"),
        F.round(F.col("units").cast("double") / F.lit(float(RANK_UNIT)), 6).alias(
            "rank"
        ),
    )


def supplier_pagerank(
    orders: DataFrame, lineitem: DataFrame, n_iter: int = 3
) -> DataFrame:
    """PageRank over the purchase graph, suppliers only -- 'which
    suppliers sit at the center of the purchase network' as a ranked
    table.  Returns (node, rank_units, rank) for 's:' nodes."""
    pr = pagerank(purchase_edges(orders, lineitem), n_iter=n_iter)
    return pr.filter(F.col("node").startswith("s:"))


def triangles(edges: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Triangle enumeration over an ID-ORIENTED edge list (every edge
    stored once with ``a < b`` -- exactly the shape the dedup tier's
    candidate-pair operators emit): a triangle is (x, y, z), x<y<z,
    with all three oriented edges present.  Over near-dup pairs,
    triangles are mutually-similar cliques -- the dedup-QA signal
    separating genuine duplicate clusters from chains of borderline
    pairs (a cluster that is all triangles collapses safely; a chain
    does not).

    Shape: the classic oriented wedge join -- TWO equi-joins, wedge
    (x,y)+(y,z) closed by (x,z).  ID orientation means each triangle
    is found exactly once, no permutation dedup pass.  Skew bound:
    wedge fan-out is per-node out-degree squared; upstream candidate
    generators already cap per-node candidates (band sizing, rare-
    shingle df caps), and at web scale you would re-orient by DEGREE
    (lowest-degree vertex first) -- the standard bound making wedge
    volume O(m^1.5); ID order stands in for it at fixture scale and
    keeps the oracle twin trivial.  Returns (doc_a, doc_b, doc_c),
    a < b < c."""
    e = edges.select(F.col(a).alias("__x"), F.col(b).alias("__y"))
    wedge = e.join(
        e.select(F.col("__x").alias("__y"), F.col("__y").alias("__z")), "__y"
    )
    closing = e.select(F.col("__x"), F.col("__y").alias("__z"))
    return (
        wedge.join(closing, ["__x", "__z"])
        .select(
            F.col("__x").alias("doc_a"),
            F.col("__y").alias("doc_b"),
            F.col("__z").alias("doc_c"),
        )
    )


def kcore_nodes(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    a: str = "doc_a",
    b: str = "doc_b",
) -> DataFrame:
    """Rounds-bounded k-core peel: repeatedly drop nodes with degree
    < k in the surviving subgraph -- the density decomposition that
    separates a near-dup graph's collapsible CORES (every member
    mutually entangled) from its peripheral chains (pairs that peel
    away).  Complements triangles (local density) with the global
    view; over LSH pairs, core membership is the safest dedup-collapse
    signal.

    Fixed ``rounds`` iterations, pagerank-style, so the plan is ONE
    lazy chain with no convergence probe and the oracle unrolls the
    same rounds: each round is one self-join of the edge frame against
    the survivor set + one map-side-combined degree count.  A true
    fixpoint peel needs diameter-many rounds; near-dup graphs are
    shallow, and the rounds-bounded result is a SUPERSET of the exact
    core (never drops a true core member), which is the safe direction
    for a collapse gate.  Edge frame is checkpointed once -- it feeds
    every round.  Returns (doc_id, core_degree) for survivors."""
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    alive = sym.select(F.col("src").alias("node")).distinct()
    deg = None
    for _ in range(rounds):
        deg = (
            sym.join(alive.withColumnRenamed("node", "src"), "src")
            .join(
                alive.select(F.col("node").alias("dst")), "dst"
            )
            .groupBy("src")
            .agg(F.count("*").alias("core_degree"))
            .filter(F.col("core_degree") >= k)
        )
        alive = deg.select(F.col("src").alias("node"))
    return deg.select(F.col("src").alias("doc_id"), "core_degree")
