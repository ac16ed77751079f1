"""Distributed graph primitives (beyond the connected-components solver in
:mod:`kafka_streaming_spark.functions.dedup`): integer PageRank and
oriented-edge triangle counting.

Both keep every numeric decision in exact integer arithmetic so results
are independent of partitioning/summation order and reproduce
bit-identically in a SQL oracle — the same portability contract as the
dedup/ANN stacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect(pairs: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Both orientations of an undirected edge list → (src, dst)."""
    return pairs.select(F.col(u).alias("src"), F.col(v).alias("dst")).unionAll(
        pairs.select(F.col(v).alias("src"), F.col(u).alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Damped PageRank (d = 0.85) in exact integer micro-units: per round,
    contribution = ``rank DIV degree`` and new rank = ``150000 +
    (85 * inbound_sum) DIV 100``.  Every node must have out-degree ≥ 1
    (run :func:`undirect` first for undirected graphs — that also removes
    the dangling-node mass leak).

    Scale shape: each round is one join + one groupBy shuffle, both
    partitioned on the node key; O(iters) passes over the edge list, no
    driver state.  For many rounds at 100 TB, cut lineage every few
    iterations exactly as the connected-components solver does.

    Returns ``(node, rank_micro, degree)`` for every node.
    """
    # The edge list and degree table are read EVERY round: cache both so
    # the (possibly expensive) edge-building subplan upstream runs once,
    # not once per iteration — the "materialize the edge list first" step
    # every iterative graph algorithm starts with.  Callers/bench release
    # with spark.catalog.clearCache(); at 100 TB swap for a checkpoint or
    # a temp table write.
    #
    # r12: r11 additionally hash-repartitioned the cached edge list by dst
    # hoping the per-round inbound groupBy(dst) would reuse that layout
    # (guide §2.4).  Measured: the per-round exchanges do NOT disappear
    # (an AQE-wrapped cached plan does not expose its output partitioning
    # to the outer plan, with canChangeCachedPlanOutputPartitioning either
    # way), so the pin was one full extra edge-list shuffle for nothing —
    # reverted.
    edges = edges.cache()
    deg = (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .cache()
    )
    r = deg.select("node", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(iters):
        contrib = r.join(deg, "node").select(
            F.col("node").alias(src), F.expr("r DIV degree").alias("__c")
        )
        # broadcast_ranks: when the NODE table fits an executor (edges may
        # still be arbitrarily large), broadcasting the per-node
        # contributions makes the big edges⋈contrib join map-side — the
        # only remaining shuffle per round is the inbound groupBy.  Leave
        # False when nodes themselves are beyond broadcast scale.
        if broadcast_ranks:
            contrib = F.broadcast(contrib)
        inbound = (
            edges.join(contrib, src)
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum("__c").alias("__s"))
        )
        # LEFT join from the full node set (ADVICE r4): a node with zero
        # in-degree receives no inbound mass but must keep its 150000 base
        # rank and keep contributing in later rounds — groupBy(dst) alone
        # would silently drop it from r after round 1.
        r = deg.select("node").join(inbound, "node", "left").select(
            "node",
            F.expr("150000 + (85 * coalesce(__s, 0)) DIV 100").alias("r"),
        )
    return r.join(deg, "node").select(
        "node", F.col("r").alias("rank_micro"), "degree"
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    broadcast_labels: bool = False,
    label_bits: int | None = None,
) -> DataFrame:
    """Synchronous majority-vote label propagation (community detection):
    every node starts labeled with its own id; each round a node adopts
    the most frequent label among its NEIGHBORS, ties broken by the
    smallest label.  The classic LPA visits nodes in random order — this
    synchronous, min-tiebreak variant is fully deterministic, so the
    rounds unroll bit-identically into a SQL oracle (same portability
    contract as :func:`pagerank`).  Distinct from the min-label
    connected-components solver in ``functions.dedup``: majority vote
    finds dense communities, not mere reachability.

    ``edges`` must contain both orientations (run :func:`undirect`), so
    every node appears as ``dst`` and keeps a label each round.

    Scale shape mirrors :func:`pagerank`: the edge list is cached once;
    each round is one edges⋈labels join on the node key and one
    (node, label) count aggregate whose per-node arg-max is a true
    aggregate (``max_by`` over a (count, -label) struct — map-side
    partials, no window sort).  O(iters) passes, no driver state.

    ``label_bits`` (r11): when labels are known non-negative and bounded
    (label < 2^label_bits, per-(node, label) neighbor count
    < 2^(63-label_bits)), the per-round arg-max is computed as a plain
    ``max`` over the injective packing ``cnt·2^B + (2^B-1-label)`` —
    max count first, then smallest label, decoded exactly.  A packed
    BIGINT max runs in HashAggregate with map-side partials; the generic
    struct ``max_by`` falls back to SortAggregate (struct aggregation
    buffers are not hash-mutable), paying a per-partition sort of the
    joined edge stream twice per round.  Leave ``None`` when labels can
    exceed the bound (the exact struct path remains).

    Returns ``(node, label)`` after ``iters`` rounds.
    """
    if label_bits is not None and not (0 < label_bits < 63):
        raise ValueError(f"label_bits must be in (0, 63), got {label_bits}")
    edges = edges.cache()
    # Seed from dst (with both orientations present — the documented
    # precondition — the src and dst node sets are identical, so this is
    # a no-op vs seeding from src; a DIRECTED edge list would violate the
    # precondition and change the node set, so run undirect() first).
    lab = edges.select(F.col(dst).alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iters):
        # broadcast_labels: same lever as pagerank's broadcast_ranks —
        # when the NODE table fits an executor (edges may still be
        # arbitrarily large), broadcasting the label map makes the big
        # edges⋈labels join map-side; the only shuffle left per round is
        # the (node, label) count.  Leave False beyond broadcast scale.
        lab_join = lab.withColumnRenamed("node", src)
        if broadcast_labels:
            lab_join = F.broadcast(lab_join)
        neigh = (
            edges.join(lab_join, src)
            .groupBy(F.col(dst).alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        if label_bits is not None:
            # arg-max via injective BIGINT packing (bounds documented
            # above): exact, order-independent, HashAggregate-able.
            shift = F.lit(1 << label_bits)
            top = F.lit((1 << label_bits) - 1)
            packed = neigh.select(
                "node", (F.col("__cnt") * shift + (top - F.col("label"))).alias("__p")
            )
            lab = packed.groupBy("node").agg(
                (top - F.max("__p") % shift).alias("label")
            )
        else:
            # arg-max as an aggregate, not a window: max over the struct
            # (count, -label) is "most frequent, then smallest label".
            lab = neigh.groupBy("node").agg(
                F.max_by(
                    "label", F.struct(F.col("__cnt"), (-F.col("label")).alias("__t"))
                ).alias("label")
            )
    return lab


def triangle_count(pairs: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Count triangles in an undirected graph given each edge ONCE in a
    consistent orientation (``u < v`` by id here): the oriented join
    ``(u,v) ⋈ (v,w) ⋈ (u,w)`` finds every triangle exactly once — no
    division by 6, no direction blowup.  At scale orient by DEGREE
    instead of id (the classic O(m^1.5) hub-bounding fix); id orientation
    keeps the SQL oracle exact for the registered configuration.

    Returns a 1-row DataFrame ``(n_triangles)``.
    """
    e1 = pairs.select(F.col(u).alias("u"), F.col(v).alias("v"))
    e2 = e1.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = e1.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    return (
        e1.join(e2, "v")
        .join(e3, (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    broadcast_frontier: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distances: seeds start at distance 0; each
    synchronous round relaxes ``dist(dst) = min(dist(dst), dist(src)+1)``
    over the edge list.  Returns ``(node, dist)`` for every node reachable
    within ``rounds`` hops — the k-hop-neighborhood / blast-radius
    primitive (fraud rings, dependency fallout, social reach).

    Scale shape: each round is one edges⋈dist join plus one min-groupBy,
    both partitioned on the node key — O(rounds) passes over the edge
    list, no driver state, and min() makes every round order-independent
    (bit-identical under any partitioning).  ``broadcast_frontier`` makes
    the per-round join map-side when the DISTANCE TABLE fits an executor
    (same lever as pagerank's ``broadcast_ranks``); leave False beyond
    broadcast scale.  For many rounds, cut lineage every few iterations
    exactly as the connected-components solver does.

    ``seeds``: a DataFrame with a ``node`` column (distances are relative
    to the nearest seed).
    """
    # FRONTIER propagation, not full min-relaxation: in an unweighted
    # graph a node's distance is simply the round it is first reached, so
    # each round only the NEWLY discovered nodes (the frontier) need to
    # push — round k joins edges against |frontier_k| nodes instead of
    # every settled node, and the min-groupBy collapses to a distinct +
    # anti-join.  Same result set, a fraction of the per-round shuffle
    # volume (the classic level-synchronous BFS shape).
    edges = edges.cache()
    frontier = seeds.select("node").distinct()
    dist = frontier.select("node", F.lit(0).cast("long").alias("dist"))
    # Eager per-round lineage cut + unpersist ONLY past the default
    # shallow horizon: at <= 3 rounds the cached-partition accumulation
    # ADVICE r5 flagged is bounded by construction and the per-round
    # count jobs are pure overhead (+3s on x_bfs_hops at sf0.1); deeper
    # traversals get the O(1)-rounds cache residency.
    eager = rounds > 3
    prev_frontier = prev_dist = None
    for k in range(1, rounds + 1):
        f_join = frontier.withColumnRenamed("node", src)
        if broadcast_frontier:
            f_join = F.broadcast(f_join)
        reached = (
            edges.join(f_join, src).select(F.col(dst).alias("node")).distinct()
        )
        new = reached.join(dist, "node", "left_anti").cache()
        dist = dist.unionAll(
            new.select("node", F.lit(k).cast("long").alias("dist"))
        )
        if eager:
            # Materialize this round's dist (which also fills the
            # frontier cache it reads through), THEN release the
            # previous round's — the lineage-cut pattern the
            # connected-components solver uses.
            dist = dist.cache()
            dist.count()
            if prev_frontier is not None:
                prev_frontier.unpersist()
            if prev_dist is not None:
                prev_dist.unpersist()
            prev_frontier, prev_dist = new, dist
        frontier = new
    return dist


def bellman_ford(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    checkpoint: str = "local",
) -> DataFrame:
    """Weighted multi-source shortest paths: ``rounds`` synchronous
    Bellman-Ford relaxations of ``dist(dst) = min(dist(dst),
    dist(src) + w)`` over an integer-weighted edge list.  Returns
    ``(node, dist)`` for every node reachable within ``rounds`` hops —
    exact shortest distances for paths of that hop count (the weighted
    counterpart of :func:`bfs_distances`; BFS's frontier shortcut does
    NOT apply here because a later, longer-hop path can be cheaper, so
    every settled node re-relaxes each round).

    Scale shape: each round is one edges⋈dist equi-join plus one
    min-groupBy, both partitioned on the node key — O(rounds) passes
    over the edge list, no driver state; min() keeps every round
    order-independent (bit-identical under any partitioning).  For many
    rounds, checkpoint every few iterations exactly as the
    connected-components solver does.

    ``seeds``: a DataFrame with a ``node`` column (distance 0 sources).
    """
    from kafka_streaming_spark.functions.dedup import _materialize

    edges = edges.cache()
    dist = (
        seeds.select("node")
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
    )
    for rnd in range(rounds):
        cand = edges.join(dist.withColumnRenamed("node", src), src).select(
            F.col(dst).alias("node"),
            (F.col("dist") + F.col(w)).cast("long").alias("dist"),
        )
        # dist feeds BOTH the union and the relaxation join: without a
        # per-round materialization the lineage doubles every round
        # (2^rounds edge passes — the multiplicative re-execution trap).
        # r12: eager lineage cut per round (``checkpoint`` backend, same
        # contract as k_core / dedup_clusters) — one materialization pass
        # instead of the r5 cache-write + count-job chain.
        dist = _materialize(
            dist.unionAll(cand).groupBy("node").agg(F.min("dist").alias("dist")),
            checkpoint,
            f"bford_r{rnd}",
            eager=True,
        )
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
    checkpoint: str = "local",
) -> DataFrame:
    """Bounded K-CORE PEELING: ``rounds`` synchronous passes removing every
    node of degree < k (and its edges) — each removal can drop neighbors
    below k, so the full k-core is the fix-point; the bounded form peels
    the outermost ``rounds`` shells, which is both what the unrolled SQL
    oracle can replay and the practical form (real graphs converge in a
    few rounds; iterate with lineage cuts for the exact fix-point, as the
    connected-components solver does).

    Input must carry BOTH orientations of each undirected edge
    (:func:`undirect`).  Per round: one degree groupBy + two semi-joins,
    all partitioned on node keys — no driver state, deterministic
    (degree thresholding has no tie ambiguity).  Returns the surviving
    edge list (both orientations).

    ``checkpoint`` selects the per-round lineage-cut backend (same
    contract as :func:`kafka_streaming_spark.functions.dedup.
    dedup_clusters`): default ``"local"`` (``localCheckpoint`` — one
    materialization pass, full lineage cut, no per-round count job; r12
    interleaved A/B vs the r5 cache+count chain: 5.50s → 4.87s on
    x_kcore_trade) for tests/single-node; pass ``"reliable"`` or a
    storage path on real clusters so a lost executor doesn't force a
    full recompute of every previous round.
    """
    # cache() on an already-cached caller DataFrame returns the SAME
    # object, so round-1's unpersist would evict the caller's cache as a
    # side effect (ADVICE r6).  Only unpersist edge lists this function
    # itself materialized.
    from kafka_streaming_spark.functions.dedup import _materialize

    edges_was_cached = edges.storageLevel.useMemory or edges.storageLevel.useDisk
    alive = edges if edges_was_cached else edges.cache()
    owned = not edges_was_cached
    for rnd in range(rounds):
        deg = alive.groupBy(src).agg(F.count(F.lit(1)).alias("__c"))
        keep = deg.filter(F.col("__c") >= k).select(src)
        prev, prev_owned = alive, owned
        # Materialize the peeled shell eagerly (it feeds the next round's
        # degree groupBy AND both semi-join probes), then release the
        # previous round's edge list — one live edge list at a time, not
        # one per round (ADVICE r5).  The eager checkpoint replaces the
        # r5 cache()+count() chain: one pass instead of a cache write
        # plus a count job, and a hard lineage cut per round.
        alive = _materialize(
            alive.join(keep, src, "left_semi").join(
                keep.withColumnRenamed(src, dst), dst, "left_semi"
            ),
            checkpoint,
            f"kcore_r{rnd}",
            eager=True,
        )
        owned = False
        if prev_owned:
            prev.unpersist()
    return alive
