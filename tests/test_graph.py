"""Crafted-graph invariants for functions.graph — shapes where the right
answer is known in closed form, complementing the DuckDB oracle on the
derived trade/co-purchase graphs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streaming_spark.functions import graph as G


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["u", "v"])


def test_triangle_count_closed_forms(spark):
    k4 = _pairs(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    assert G.triangle_count(k4).collect()[0]["n_triangles"] == 4
    path = _pairs(spark, [(1, 2), (2, 3), (3, 4)])
    assert G.triangle_count(path).collect()[0]["n_triangles"] == 0
    star = _pairs(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    assert G.triangle_count(star).collect()[0]["n_triangles"] == 0
    one_tri_plus_tail = _pairs(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    assert G.triangle_count(one_tri_plus_tail).collect()[0]["n_triangles"] == 1


def test_pagerank_symmetry_and_hub_dominance(spark):
    """On a symmetric cycle every node gets the identical rank; on a star
    the hub outranks every leaf; ranks are deterministic across runs."""
    cycle = G.undirect(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]))
    ranks = {r["node"]: r["rank_micro"] for r in G.pagerank(cycle, iters=3).collect()}
    assert len(set(ranks.values())) == 1

    star = G.undirect(_pairs(spark, [(1, 2), (1, 3), (1, 4), (1, 5)]))
    sr = {r["node"]: r["rank_micro"] for r in G.pagerank(star, iters=2).collect()}
    assert all(sr[1] > sr[leaf] for leaf in (2, 3, 4, 5))
    assert len({sr[leaf] for leaf in (2, 3, 4, 5)}) == 1  # leaves identical

    again = {r["node"]: r["rank_micro"] for r in G.pagerank(star, iters=2).collect()}
    assert again == sr


def test_pagerank_degree_column_is_exact(spark):
    star = G.undirect(_pairs(spark, [(1, 2), (1, 3), (1, 4)]))
    deg = {r["node"]: r["degree"] for r in G.pagerank(star, iters=1).collect()}
    assert deg == {1: 3, 2: 1, 3: 1, 4: 1}


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two K4 cliques joined by a single bridge edge (4—5): after 2
    synchronous majority rounds every clique-A node carries label 1 and
    every clique-B node label 5 — the bridge is outvoted.  Hand trace:
    round 1 gives all-distinct neighbor labels, so each node takes its
    MIN neighbor (tiebreak); round 2 is a genuine majority vote that
    pulls node 4 back from B's reach and node 5 back from A's."""
    edges = G.undirect(
        _pairs(
            spark,
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]  # clique A
            + [(5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8)]  # clique B
            + [(4, 5)],  # bridge
        )
    )
    got = {r["node"]: r["label"] for r in G.label_propagation(edges, iters=2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 5}


def test_label_propagation_is_deterministic_on_ties(spark):
    """A 4-cycle is maximally tie-prone (every neighbor label count is
    equal); the min-label tiebreak must make repeated runs identical."""
    cyc = G.undirect(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]))
    a = sorted(G.label_propagation(cyc, iters=3).collect())
    b = sorted(G.label_propagation(cyc, iters=3).collect())
    assert a == b
    assert {r["node"] for r in a} == {1, 2, 3, 4}


def test_pagerank_directed_keeps_zero_indegree_nodes(spark):
    """ADVICE r4: a directed chain 1→2→3 satisfies the documented
    precondition (out-degree ≥ 1 per source node) yet node 1 has zero
    in-degree — it must stay in the output with the base rank 150000 and
    keep contributing mass in later rounds, matching a Python reference
    of the exact integer recurrence."""
    edges = _pairs(spark, [(1, 2), (2, 3), (3, 4)]).selectExpr(
        "u AS src", "v AS dst"
    )
    got = {
        r["node"]: (r["rank_micro"], r["degree"])
        for r in G.pagerank(edges, iters=2).collect()
    }

    # Python reference over nodes with out-degree >= 1 (the function's
    # documented domain: 1, 2, 3), exact integer arithmetic.
    deg = {1: 1, 2: 1, 3: 1}
    rank = {n: 1_000_000 for n in deg}
    out_edges = {1: [2], 2: [3], 3: [4]}
    for _ in range(2):
        inbound = {n: 0 for n in deg}
        for s, targets in out_edges.items():
            c = rank[s] // deg[s]
            for t in targets:
                if t in inbound:
                    inbound[t] += c
        rank = {n: 150_000 + (85 * inbound[n]) // 100 for n in deg}

    assert set(got) == {1, 2, 3}
    assert got == {n: (rank[n], deg[n]) for n in deg}
    assert got[1][0] == 150_000  # zero in-degree -> pure base rank


def test_bfs_distances_path_and_multi_source(spark):
    """Path graph 1-2-3-4-5: from seed {1}, dist(k) = k-1 capped by the
    round budget; with seeds {1, 5} every node is within 2 hops of its
    NEAREST seed; broadcast_frontier must not change any distance."""
    path = G.undirect(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    seed1 = spark.createDataFrame([(1,)], ["node"])

    d2 = {r["node"]: r["dist"] for r in G.bfs_distances(path, seed1, rounds=2).collect()}
    assert d2 == {1: 0, 2: 1, 3: 2}  # node 4, 5 unreachable in 2 rounds

    d4 = {r["node"]: r["dist"] for r in G.bfs_distances(path, seed1, rounds=4).collect()}
    assert d4 == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    seeds = spark.createDataFrame([(1,), (5,)], ["node"])
    dm = {r["node"]: r["dist"] for r in G.bfs_distances(path, seeds, rounds=2).collect()}
    assert dm == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}

    db = {
        r["node"]: r["dist"]
        for r in G.bfs_distances(path, seeds, rounds=2, broadcast_frontier=True).collect()
    }
    assert db == dm


def test_k_core_clique_with_tail(spark):
    """K4 plus a pendant tail, k=3: the tail node peels in round 1 (degree
    1) and the clique survives intact (each node keeps degree 3); on a
    path graph, k=2 peels everything within two rounds (ends fall first,
    exposing new ends)."""
    k4_tail = G.undirect(
        _pairs(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)])
    )
    core = G.k_core(k4_tail, k=3, rounds=2)
    nodes = {r["src"] for r in core.select("src").distinct().collect()}
    assert nodes == {1, 2, 3, 4}
    assert core.count() == 12  # K4, both orientations

    path = G.undirect(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    assert G.k_core(path, k=2, rounds=2).count() == 0


def test_label_propagation_packed_max_equals_struct_max_by(spark):
    """The r11 packed-BIGINT arg-max (label_bits) must agree bit-for-bit
    with the exact struct max_by path on tie-heavy graphs, including a
    label at the packing's upper bound 2^bits - 1, and under
    broadcast_labels on both sides."""
    top = (1 << 6) - 1  # 63: upper-bound label for label_bits=6
    # Two cliques bridged, remapped so one clique carries the bound label;
    # a 4-cycle for maximal ties.
    graphs = [
        _pairs(
            spark,
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
            + [(top, 60), (top, 61), (top, 62), (60, 61), (60, 62), (61, 62)]
            + [(4, top)],
        ),
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]),
        _pairs(spark, [(top - 1, top), (top, 1), (1, top - 1)]),  # triangle at bound
    ]
    for pairs in graphs:
        edges = G.undirect(pairs)
        for bcast in (False, True):
            exact = sorted(
                G.label_propagation(
                    edges, iters=2, broadcast_labels=bcast, label_bits=None
                ).collect()
            )
            packed = sorted(
                G.label_propagation(
                    edges, iters=2, broadcast_labels=bcast, label_bits=6
                ).collect()
            )
            assert packed == exact, (bcast, packed, exact)


def test_label_propagation_label_bits_guard(spark):
    """Out-of-range label_bits must fail fast, not wrap silently."""
    import pytest

    cyc = G.undirect(_pairs(spark, [(1, 2), (2, 1)]))
    for bad in (0, -3, 63, 64):
        with pytest.raises(ValueError):
            G.label_propagation(cyc, iters=1, label_bits=bad)
