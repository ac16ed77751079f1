"""Physical-plan quality gates: the properties that decide whether a query
that passes at sf0.01 still works at 100 TB.  These assert on the
formatted plan BEFORE execution — a regression that un-pushes a filter,
drops a broadcast, or adds a shuffle fails here even though results stay
correct.
"""

from __future__ import annotations

import pytest

from kafka_streaming_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name][0](spark, SF_SMALL)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return je.explainString(mode)


def n_nodes(plan: str, operator: str) -> int:
    """Count physical-plan NODES of a type (the formatted plan lists each
    node once in the tree and once in the detail section — count the
    detail headers, which are unique per node id)."""
    import re

    return len(re.findall(rf"^\(\d+\) {operator}\b", plan, flags=re.MULTILINE))


def test_q1_filter_pushdown_and_column_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # the shipdate predicate must reach the parquet scan ...
    assert "LessThanOrEqual(l_shipdate" in plan
    # ... and the scan must not read join keys / unused columns
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_q3_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "q3_revenue_by_segment")
    assert "BroadcastHashJoin" in plan
    # the lineitem fact side must never be shuffled for a join
    assert "SortMergeJoin" not in plan


def test_q5_star_join_all_broadcast(spark):
    plan = plan_of(spark, "q5_region_rollup")
    assert n_nodes(plan, "BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_filter_routing_prunes_scan(spark):
    plan = plan_of(spark, "f_filter_routing")
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for unused in ("props", "ts", "user_id"):
        assert unused not in read_schema
    assert "GreaterThan(value,50.0)" in plan


def test_salted_agg_is_two_exchanges(spark):
    """Two small shuffles (salted partial → final combine), not one skewed
    one — and no more than two."""
    plan = plan_of(spark, "a_salted_agg")
    assert n_nodes(plan, "Exchange") == 2


def test_band_join_is_local_broadcast_loop(spark):
    plan = plan_of(spark, "j_band_join")
    assert "BroadcastNestedLoopJoin" in plan
    # bands come from a LocalRelation, not a Python-RDD scan
    assert "ExistingRDD" not in plan


def test_asof_join_single_shuffle(spark):
    """The union-sort as-of join must cost exactly one exchange (the window
    partitioning) — a range-join rewrite would show extra exchanges or a
    nested-loop join."""
    plan = plan_of(spark, "j_asof_join")
    assert "NestedLoop" not in plan
    assert n_nodes(plan, "Exchange") == 1


def test_latest_per_key_single_shuffle(spark):
    plan = plan_of(spark, "w_latest_per_key")
    assert n_nodes(plan, "Exchange") == 1


def test_group_agg_partial_before_shuffle(spark):
    """A1 must be a two-phase hash aggregate: partial_ functions before the
    exchange (map-side combine), final after."""
    plan = plan_of(spark, "a_group_agg")
    assert "partial_sum" in plan or "partial_count" in plan
    assert n_nodes(plan, "Exchange") == 1


def node_ids(plan: str, operator: str) -> list[int]:
    import re

    return [int(m) for m in re.findall(rf"^\((\d+)\) {operator}\b", plan, flags=re.MULTILINE)]


def read_schema_with(plan: str, col: str) -> str:
    """The ReadSchema line of the scan that reads ``col`` — how we address
    one table's scan in a multi-scan plan."""
    return next(l for l in plan.splitlines() if "ReadSchema" in l and col in l)


def test_q21_no_expand_and_pruned_lineitem(spark):
    """The two-level (orderkey, suppkey) partial aggregate must keep the
    double-distinct OUT of the plan: an Expand node means Spark reverted to
    the countDistinct rewrite that triples every lineitem row before the
    shuffle.  The lineitem scans must read only the three needed columns."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    assert n_nodes(plan, "Expand") == 0
    for line in (l for l in plan.splitlines() if "ReadSchema" in l and "l_orderkey" in l):
        for unused in ("l_extendedprice", "l_quantity", "l_shipdate", "l_discount"):
            assert unused not in line


def test_q2_window_after_region_prune(spark):
    """The per-part min window must run on region-pruned suppliers: the
    Window node has to sit ABOVE the nation/region broadcast joins (a plan
    that windows the raw per-(part,supplier) costs first does 5x the state
    at 100 TB).  The region predicate must also reach the region scan."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    (window_id,) = node_ids(plan, "Window")
    joins = node_ids(plan, "BroadcastHashJoin")
    assert sum(1 for j in joins if j < window_id) >= 2, (window_id, joins)
    assert "EqualTo(r_name,EUROPE)" in plan
    assert "SortMergeJoin" not in plan


def test_q9_lineitem_scan_pruned(spark):
    """Q9 touches five tables; the fact scan must read exactly the join
    keys + measures — one extra lineitem column is ~15 TB of wasted IO at
    the target scale."""
    plan = plan_of(spark, "q9_product_profit")
    schema = read_schema_with(plan, "l_orderkey")
    for unused in ("l_shipdate", "l_returnflag", "l_linestatus", "l_tax", "l_comment"):
        assert unused not in schema
    assert "SortMergeJoin" not in plan


def test_q8_star_is_broadcast_with_one_shuffle(spark):
    """Seven-table star: every dimension joins broadcast, and the only
    Exchange is the final per-year aggregate shuffle — lineitem itself is
    never repartitioned for a join."""
    plan = plan_of(spark, "q8_market_share")
    assert n_nodes(plan, "BroadcastHashJoin") == 7
    assert "SortMergeJoin" not in plan
    assert n_nodes(plan, "Exchange") == 1


def test_doc_chunk_is_shuffle_free(spark):
    """Chunking is pure map-side: tokenize -> explode -> slice with no
    exchange beyond the input spread() repartition, and the scan reads
    only (doc_id, text)."""
    plan = plan_of(spark, "x_doc_chunk")
    assert n_nodes(plan, "Exchange") <= 1  # spread() round-robin only
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for unused in ("lang", "source", "n_chars"):
        assert unused not in read_schema


def test_keep_best_keeper_is_aggregate_not_window(spark):
    """The keeper per cluster must be a partial-agg-friendly hash
    aggregate (max of struct), NOT a window sort over the full corpus."""
    from kafka_streaming_spark.functions.dedup import keep_best_per_cluster

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    clusters = docs.limit(10).selectExpr("doc_id", "doc_id as cluster_id")
    df = keep_best_per_cluster(docs, clusters)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = je.explainString(mode)
    assert "Window" not in plan
    # struct-max aggregates sort-based, but MUST keep the partial
    # (map-side combine) phase before the one cluster_id shuffle
    assert "partial_max" in plan
    assert n_nodes(plan, "SortAggregate") + n_nodes(plan, "HashAggregate") >= 2
    assert "BroadcastHashJoin" in plan  # clusters side broadcast, corpus unshuffled


# Queries whose plans legitimately contain a Cartesian/nested-loop product:
# bounded-side constructs documented in their docstrings (constant dimension
# cross, id-bounded quadratic verifiers, broadcast band tables, literal
# probe/mask relations).
_CARTESIAN_ALLOWED = {
    "j_cross_join",            # region x nation = 125 rows
    "x_ngram_jaccard_pairs",   # id-bounded exact verifier (doc_id < 40)
    "x_cosine_near_dup",       # id-bounded exact verifier
    "j_band_join",             # broadcast nested loop vs literal band table
    "x_ivf_ann_topk",          # query x centroid assignment (centroids const)
    "x_ivfpq_ann_topk",        # same bounded centroid assignment as IVF
    "x_lsh_ann_topk",          # query x probe-mask literal relation
    "x_cosine_topk",           # bounded query set x corpus (broadcast)
    "q22_idle_rich_customers", # scalar avg threshold as a 1-row broadcast join
    "x_semdedup",              # same bounded centroid assignment as IVF
    "x_ngram_lm_score",        # vocabulary size: 1-row broadcast scalar join
    "x_kmeans_embeddings",     # k-row centroid broadcast per Lloyd round
    "x_bm25_search",           # corpus stats: 1-row broadcast scalar join
    "x_dsir_weights",          # corpus totals: 1-row broadcast scalar join
    "x_doc_sample_weighted",   # corpus max: 1-row broadcast scalar join
    "x_join_size_estimate",    # sampled-count x exact-count: 1-row scalar join
    "x_quantile_binning",      # quartile cutpoints: 1-row broadcast join
    "x_robust_outliers",       # per-group median/MAD: bounded broadcast joins
    "x_market_basket",         # order-count scalar: 1-row broadcast join
    "x_kmv_distinct",          # exact-count scalar: 1-row broadcast join
    "x_tfidf_topk",            # corpus doc-count: 1-row broadcast scalar join
    "x_semdedup_eval",         # id-bounded exact verifier + centroid assignment
    "x_hard_negatives",        # bounded anchor set x corpus (broadcast)
    "x_triangle_count",        # edge-count scalar: 1-row broadcast join
    "x_ann_recall",            # bounded query set x corpus + centroid assign
    "x_lsh_eval",              # bounded-range truth pairs + 1-row metric joins
    "x_token_budget",          # corpus-total scalar: 1-row broadcast join
    "x_gdpr_purge_audit",      # audit scalars: 1-row broadcast joins
    "x_interval_overlap",      # literal window set: broadcast overlap loop
    "x_session_funnel",        # funnel scalars: 1-row broadcast joins
    "x_distribution_drift",    # category totals: 1-row broadcast join
    "x_rfm_segments",          # corpus max date: 1-row broadcast join
    "x_kfold_split",           # corpus doc-count: 1-row broadcast scalar join
    "x_kmv_overlap",           # k-row sketch merges: 1-row broadcast joins
    "x_target_encode",         # global prior: 1-row broadcast scalar join
    "x_hll_mergeability",      # 1-row merged-sketch x 1-row exact join
    "x_cusum_drift",           # corpus totals: 1-row broadcast scalar join
    "x_abc_analysis",          # revenue total: 1-row broadcast scalar join
    "x_benford_audit",         # digit total: 1-row broadcast scalar join
    "x_chi2_independence",     # r×c marginal grid (≤125 rows) + 1-row total
    "x_bitmap_rollup",         # window min-day: 1-row broadcast scalar join
    "x_decile_lift",           # corpus totals: 1-row broadcast scalar joins
    "x_modularity",            # edge-count m: 1-row broadcast scalar join
    "x_knn_classify",          # bounded query set x corpus (broadcast)
    "x_ndcg_eval",             # 3-row query-term broadcast x corpus
    "x_silhouette",            # k-row label-centroid broadcast x corpus
    "x_ks_test",               # sample-total scalar: 1-row broadcast join
    "x_collocations",          # bigram-total scalar: 1-row broadcast join
    "x_hits_rank",             # per-round 1-row max-normalizer broadcasts
    "x_association_rules",     # order-count scalar: 1-row broadcast join
    "x_chi2_feature_select",   # label margins: 1-row broadcast scalar join
    "x_dbscan_clusters",       # 9-row cell-offset stencil broadcast
    "x_local_clustering",      # edge-stat scalar: 1-row broadcast join
    "x_pca_power_iter",        # per-round 1-row max-normalizer broadcasts
    "x_weighted_quantiles",    # 3-row quantile spine broadcast
    "x_fd_histogram",          # 1-row bin-width parameter broadcast
    "x_kfold_cv_ols",          # 1-row totals broadcast (leave-fold-out)
    "x_interarrival_quantiles",  # 3-row quantile spine broadcast
    "x_budget_allocation",     # 1-row budget-pot broadcast
    "x_zonemap_audit",         # 1-row global-envelope broadcast
    "x_hotspot_cells",         # ≤100-cell stencil self-join (non-equi)
}


def _scan_signature(plan: str) -> list[list]:
    """Sorted (table-basename, top-level-column-count) per parquet scan,
    parsed from Location/ReadSchema pairs in the formatted plan.  Nested
    struct/map fields count as one column (depth-tracked commas)."""
    import re

    scans = re.findall(
        r"Location: \w+ \[file:([^\]]+)\][\s\S]*?ReadSchema: (struct<[^\n]*)",
        plan,
    )
    out = []
    for loc, rs in scans:
        tbl = loc.rstrip("/").split("/")[-1].replace(".parquet", "")
        inner = rs[len("struct<"):]
        depth = 0
        n = 1 if inner.strip(">").strip() else 0
        for ch in inner:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                n += 1
        out.append([tbl, n])
    return sorted(out)


# The ONLY physical-plan node types through which Python may enter a
# registered query's plan — every one is Arrow-batched (vectorized IPC
# between JVM and Python).  Explicit, not incidental: the sweep extracts
# every Python/Pandas/Arrow-entry node from each plan and requires
# membership here, so a new API (e.g. mapInArrow) is sanctioned by listing
# it, and row-at-a-time nodes (BatchEvalPython, BatchEvalPythonUDTF) can
# never slip in under a name the old substring ban didn't know.
_PY_NODE_ALLOWED = {
    "ArrowEvalPython",              # scalar pandas UDF
    "AggregateInPandas",            # grouped-agg pandas UDF
    "WindowInPandas",               # window pandas UDF
    "MapInPandas",                  # mapInPandas
    "FlatMapGroupsInPandas",        # applyInPandas
    "FlatMapCoGroupsInPandas",      # cogrouped applyInPandas
    "FlatMapGroupsInPandasWithState",  # applyInPandasWithState
    "MapInArrow",                   # mapInArrow (functions/arrowops.py)
    "FlatMapGroupsInArrow",         # applyInArrow (functions/arrowops.py)
    "ArrowEvalPythonUDTF",          # Arrow-optimized Python UDTF
                                    # (x_udtf_chunk_text pins useArrow=True
                                    # in the decorator; the row-at-a-time
                                    # BatchEvalPythonUDTF stays banned)
}


def test_registry_wide_plan_invariants(spark):
    """Engine-wide sweep over EVERY registered query's optimized physical
    plan: Python enters plans only through the Arrow-batched node
    allow-list above (row-at-a-time BatchEvalPython can never appear),
    no Cartesian/broadcast-nested-loop product
    outside the documented bounded-side allow-list, and — since round 6 —
    the query's Exchange and Sort counts must not exceed their FROZEN
    budgets (tests/plan_budgets.json, measured clean-room per query).
    The budget net catches the two silent plan regressions registry-wide
    — an extra shuffle, or a bounded TakeOrdered degrading to a global
    sort — even when no hand-written per-query gate pins them.  Budgets
    are exact (plans are deterministic for a fixed Spark version and
    testdata); when a deliberate reshape changes a count, re-freeze that
    entry.

    Regenerate after a deliberate plan change::

        from tests.test_plan_quality import plan_of, n_nodes
        p = plan_of(spark, name)
        budgets[name] = {"exchange": n_nodes(p, "Exchange"),
                         "sort": n_nodes(p, "Sort")}
    """
    import json
    import os
    import re

    budget_path = os.path.join(os.path.dirname(__file__), "plan_budgets.json")
    with open(budget_path) as fh:
        budgets = json.load(fh)
    failures = []
    for name in REGISTRY:
        # Clean-room plan: cached subtrees from a PREVIOUS query's
        # eager materialization would otherwise embed their build plans
        # (extra numbered Exchange nodes) into this query's explain.
        spark.catalog.clearCache()
        plan = plan_of(spark, name)
        py_nodes = set(
            re.findall(
                r"^\(\d+\) (\S*(?:Python|Pandas|InArrow)\S*)",
                plan,
                flags=re.MULTILINE,
            )
        )
        bad_py = py_nodes - _PY_NODE_ALLOWED
        if bad_py:
            failures.append(
                f"{name}: Python plan node(s) outside the Arrow-batched"
                f" allow-list: {sorted(bad_py)}"
            )
        has_product = (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        )
        if has_product and name not in _CARTESIAN_ALLOWED:
            failures.append(f"{name}: unexpected cartesian/nested-loop join")
        budget = budgets.get(name)
        if budget is None:
            failures.append(
                f"{name}: no frozen plan budget — add it to"
                f" tests/plan_budgets.json"
            )
            continue
        for op, key in (("Exchange", "exchange"), ("Sort", "sort")):
            n = n_nodes(plan, op)
            if n > budget[key]:
                failures.append(
                    f"{name}: {n} {op} nodes exceeds frozen budget"
                    f" {budget[key]} — a plan regression, or re-freeze"
                    f" after a deliberate reshape"
                )
        # Third pillar: column pruning.  The frozen scan signature is the
        # sorted (table, #columns-read) list from every parquet scan's
        # ReadSchema — a scan that silently starts reading more columns
        # (a dropped projection, a select(*) sneaking in) fails here.
        sig = _scan_signature(plan)
        if sig != budget.get("scans", sig):
            failures.append(
                f"{name}: scan signature {sig} != frozen"
                f" {budget['scans']} — column-pruning regression, or"
                f" re-freeze after a deliberate reshape"
            )
    assert not failures, "\n".join(failures)


def test_span_dedup_partial_agg_and_no_products(spark):
    """Span dedup: the fingerprint bucket aggregation must keep its partial
    (map-side combine) phase before the one fingerprint exchange, and the
    pair-count aggregation likewise — no nested-loop/cartesian anywhere."""
    plan = plan_of(spark, "x_span_dedup")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial_" in plan
    # fingerprint bucket agg + pair-count agg: exactly two aggregation
    # exchanges plus the spread() round-robin, nothing more
    assert n_nodes(plan, "Exchange") <= 3


def test_quality_model_score_is_one_aggregation(spark):
    """The hashing-trick scorer is one explode + one groupBy: a single
    aggregation exchange (plus the input spread), partial sums map-side,
    and a scan that reads only (doc_id, text)."""
    plan = plan_of(spark, "x_quality_model_score")
    assert n_nodes(plan, "Exchange") <= 2
    assert "partial_sum" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for unused in ("lang", "source", "n_chars"):
        assert unused not in read_schema


def test_bucketed_join_query_no_exchange_below_join(spark):
    """j_bucketed_join's contract: both scans are bucketed, the sort-merge
    join has NO Exchange below it (co-location proven from catalog
    metadata), and the only shuffle in the whole plan is the final
    per-segment aggregate's."""
    plan = plan_of(spark, "j_bucketed_join")
    assert "Bucketed: true" in plan
    assert n_nodes(plan, "SortMergeJoin") == 1
    assert n_nodes(plan, "Exchange") == 1  # the groupBy(c_mktsegment) agg only
    (smj,) = node_ids(plan, "SortMergeJoin")
    (ex,) = node_ids(plan, "Exchange")
    # Formatted-plan ids number children before parents, so "above the
    # join" means a LARGER node id than the SMJ's.
    assert ex > smj, f"Exchange (node {ex}) must sit above the join (node {smj})"


def test_epoch_shuffle_no_single_partition_window(spark):
    """The global rank must come from 256 hash-prefix ranges + offset
    stitching — a plan with Exchange SinglePartition means the whole corpus
    funneled through one task for the window sort."""
    plan = plan_of(spark, "x_epoch_shuffle")
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan  # the per-range row_number


def test_pit_join_is_union_sort_not_range_probe(spark):
    """The point-in-time join must compile to the union-sort shape: ONE
    window over facts+versions and NO join operator at all (a range/
    inequality join rewrite would show a nested loop or per-fact probe;
    the only exchanges are the dim dedupe aggregate and the window
    partitioning)."""
    plan = plan_of(spark, "x_pit_join")
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 2


def test_bm25_never_merge_joins_the_corpus(spark):
    """BM25's joins are all bounded-side broadcasts (df, query relation,
    1-row stats); a SortMergeJoin would mean the posting stream got
    shuffled against a corpus-scale side."""
    plan = plan_of(spark, "x_bm25_search")
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "Expand") == 0


def test_countmin_sketch_is_broadcast_probed(spark):
    """The CMS estimate join must broadcast the 2,048-cell sketch, never
    shuffle candidates against it."""
    plan = plan_of(spark, "x_countmin_heavyhitters")
    assert n_nodes(plan, "BroadcastHashJoin") >= 1
    assert n_nodes(plan, "SortMergeJoin") == 0


def test_funnel_is_joins_not_windows(spark):
    """The strict-order funnel must be per-stage min-aggregates + joins
    (state = one timestamp per user per stage), never a window over the
    full per-user event history."""
    plan = plan_of(spark, "x_event_funnel")
    assert n_nodes(plan, "Window") == 0
    assert n_nodes(plan, "SortMergeJoin") == 0


def test_pagerank_edge_list_cached_and_shuffle_bounded(spark):
    """VERDICT r4 item 5: the iterative pagerank plan must (a) materialize
    the edge-building subplan ONCE (cached — without it the lineitem⋈orders
    distinct re-executes every round) and (b) stay within the shuffle
    budget of 2 iterations + setup (≤ 13 exchanges: per round one big
    edges⋈contrib join, one groupBy, one rank maintenance join), with no
    unbounded join shapes."""
    # Assert on the COLD plan: a cache populated by an earlier test changes
    # size statistics and with them the planned join strategies.
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_pagerank_trade")
    assert "InMemoryTableScan" in plan  # edge/degree subplans run once
    assert n_nodes(plan, "Exchange") <= 13
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_triangle_count_edges_cached_and_bounded(spark):
    """The filtered co-purchase edge list feeds four scans (e1/e2/e3 +
    edge count): it must be cached, the only nested-loop joins are the two
    1-row stat broadcasts, and the oriented joins never degenerate to a
    cartesian."""
    spark.catalog.clearCache()  # cold plan — see pagerank gate note
    plan = plan_of(spark, "x_triangle_count")
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "Exchange") <= 13
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") <= 2  # 1-row stats only


def test_market_basket_pairs_stay_within_order(spark):
    """The basket pair join must stay co-partitioned on l_orderkey (pair
    generation is a self-join WITHIN an order, never a corpus-level
    shuffle-against-itself), with the support stats joined as bounded
    broadcasts."""
    plan = plan_of(spark, "x_market_basket")
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") <= 1  # 1-row totals only
    assert n_nodes(plan, "Exchange") <= 9


def test_lsh_eval_joins_are_bucket_or_broadcast(spark):
    """The LSH-recall evaluation must join candidates via the banded
    bucket key or bounded broadcasts (query set, 1-row stats) — a
    SortMergeJoin or cartesian would mean the corpus got paired
    all-against-all, defeating LSH."""
    plan = plan_of(spark, "x_lsh_eval")
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Exchange") <= 9


def test_prefix_filter_join_cached_and_no_products(spark):
    """The prefix-filter similarity join must materialize the exploded
    shingle relation ONCE (it feeds five consumers), never degenerate to
    a cartesian/all-pairs shape, and stay within the shuffle budget of
    its five stages (df counts, sizes, ranking window, candidate join,
    verification join)."""
    spark.catalog.clearCache()  # cold plan — cache state changes strategies
    plan = plan_of(spark, "x_prefix_filter_join")
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 10


def test_bfs_edges_cached_and_shuffle_bounded(spark):
    """BFS: the edge-building subplan (lineitem⋈orders distinct) must run
    once (cached), each of the 3 rounds costs at most the min-groupBy
    shuffles (frontier joins are broadcast), and nothing degenerates to a
    product."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_bfs_hops")
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    # Headroom to 21 (lazy 3-round shape plans 18): with rounds > 3 the
    # r6 eager lineage cut caches the returned dist table itself, and
    # the formatted plan then embeds the cached build plan's exchanges —
    # nodes that already RAN during the per-round materialization, not
    # per-query cost.
    assert n_nodes(plan, "Exchange") <= 21


def test_kcore_edges_cached_and_shuffle_bounded(spark):
    """K-core peeling: each peel round is materialized once behind an
    eager lineage cut (r12: localCheckpoint replaced the cache+count
    chain — the returned plan is the final aggregate over the
    checkpointed survivor RDD, so no parquet re-scan and no join can
    appear above the cut), the keep-set joins must never degenerate to a
    product, and the final aggregate stays within a tiny exchange
    budget."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_kcore_trade")
    assert "Scan ExistingRDD" in plan  # the per-round lineage cut
    assert "Scan parquet" not in plan  # no re-scan above the cut
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 4


def test_grid_nearest_is_blocked_equi_join(spark):
    """The spatial join must stay a grid-cell EQUI-join (9 offset probes),
    never a distance cross join; the bounded query-key range must reach
    the customer scan as a pushed filter."""
    plan = plan_of(spark, "x_grid_nearest_join")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "LessThanOrEqual(c_custkey,500)" in plan
    assert n_nodes(plan, "Exchange") <= 6


def test_acf_reduces_before_windows(spark):
    """ACF must aggregate raw orders to one row per (nation, day) FIRST;
    the lag/stat windows and final fold then share the nation
    partitioning — a handful of small-table exchanges, never a product."""
    plan = plan_of(spark, "x_acf_lag")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 10


def test_bitmap_rollup_reduces_to_masks_before_join(spark):
    """The audience-overlap join must run on per-user BIGINT masks (one
    groupBy reduce), never on day-level rows; the only nested-loop is the
    1-row min-day broadcast."""
    spark.catalog.clearCache()  # cold plan — cache state changes strategies
    plan = plan_of(spark, "x_bitmap_rollup")
    assert "InMemoryTableScan" in plan  # mask table feeds both audiences
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") <= 1
    assert n_nodes(plan, "Exchange") <= 7


def test_golden_record_modes_are_aggregates_not_windows(spark):
    """Mode-per-cluster must be the count-then-struct-min AGGREGATE — a
    Window node here would mean per-cluster member sorts at 100 TB."""
    spark.catalog.clearCache()  # cold plan — cache state changes strategies
    plan = plan_of(spark, "x_golden_record")
    assert n_nodes(plan, "Window") == 0
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_decile_lift_windows_only_after_histogram(spark):
    """The gains table must never sort raw rows: its two ordered windows
    run over the bounded score histogram and the ≤10-row decile table,
    so the whole plan stays within a small exchange budget."""
    plan = plan_of(spark, "x_decile_lift")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Exchange") <= 8


def test_rrf_fusion_prunes_candidates_before_ranking(spark):
    """RRF must rank pruned postings (tf>0 candidates, cached — both
    rank lists read them), never the raw corpus, and the list merge is a
    two-small-lists join — no product shapes anywhere."""
    spark.catalog.clearCache()  # cold plan — cache state changes strategies
    plan = plan_of(spark, "x_rrf_fusion")
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 8


def test_sax_reduces_twice_before_windows(spark):
    """SAX must reduce orders → (nation, day) → (nation, frame) before
    any window; everything ordered runs on the reduced frame table along
    the nation partitioning."""
    plan = plan_of(spark, "x_sax_symbols")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 8


def test_ols_normal_eq_is_one_aggregation(spark):
    """The regression must 'train' inside a single map-side-combinable
    aggregate (sufficient statistics), solved per group in the projection
    — one shuffle, no joins, no windows."""
    plan = plan_of(spark, "x_ols_normal_eq")
    assert n_nodes(plan, "Exchange") <= 2
    assert n_nodes(plan, "Window") == 0
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "BroadcastHashJoin") == 0
    assert "partial" in plan.lower()  # map-side combine before the shuffle


def test_preference_pairs_extremes_are_aggregates(spark):
    """Both pair extremes (chosen argmax, rejected argmin) must come from
    ONE struct-min aggregate over block members — a Window here means
    per-block member sorts at 100 TB."""
    plan = plan_of(spark, "x_preference_pairs")
    assert n_nodes(plan, "Window") == 0
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_leakage_safe_split_stays_on_block_key(spark):
    """Cluster-aware splitting is one anchor groupBy + one key join +
    one fold — no products, bounded exchanges."""
    plan = plan_of(spark, "x_leakage_safe_split")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 6


def test_rolling_median_window_on_reduced_series(spark):
    """The rolling median must window the (nation, day) reduced series —
    exchange budget covers the daily reduce + one nation-partitioned
    window; no products."""
    plan = plan_of(spark, "x_rolling_median")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 5
    assert n_nodes(plan, "Window") == 1  # one frame pass, not per-column


def test_id_completeness_is_one_groupby_no_window(spark):
    """The audit's whole point: bucket-fold completeness, never a global
    lead() window (a single-partition sort at scale)."""
    plan = plan_of(spark, "x_id_completeness_audit")
    assert n_nodes(plan, "Window") == 0
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Exchange") <= 3


def test_pareto_frontier_is_one_shuffle_no_join(spark):
    """The skyline rewrite's whole point: two window functions over one
    brand partitioning — a single exchange, zero joins of any kind."""
    plan = plan_of(spark, "x_pareto_frontier")
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Window") == 2
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
              "BroadcastNestedLoopJoin"):
        assert n_nodes(plan, j) == 0, j


def test_grouped_median_pandas_single_shuffle_arrow(spark):
    """The grouped-map witness: exactly one exchange (the group-key
    shuffle), the Arrow grouped-map operator present, and NO
    row-at-a-time Python anywhere."""
    plan = plan_of(spark, "x_grouped_median_pandas")
    assert n_nodes(plan, "Exchange") == 1
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_arrow_grouped_stats_single_shuffle(spark):
    """The applyInArrow witness: exactly one exchange (the group-key
    shuffle), the Arrow grouped-map node present — same shuffle shape as
    the pandas grouped-map path, but with no pandas conversion on either
    batch edge.  No Python node outside the Arrow-batched set."""
    plan = plan_of(spark, "x_arrow_grouped_stats")
    assert n_nodes(plan, "Exchange") == 1
    assert "FlatMapGroupsInArrow" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_arrow_token_stats_is_narrow(spark):
    """The mapInArrow witness: a pure narrow pass — zero exchanges, zero
    sorts, the MapInArrow node chained directly onto the documents scan
    (which must read only the two needed columns)."""
    plan = plan_of(spark, "x_arrow_token_stats")
    assert n_nodes(plan, "Exchange") == 0
    assert n_nodes(plan, "Sort") == 0
    assert "MapInArrow" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "lang" not in read_schema and "source" not in read_schema


def test_table_fingerprint_one_aggregate_per_table(spark):
    """The fingerprint is one scan + one 1-row aggregate per table: three
    exchanges total, partial aggregation map-side, and each scan reads
    only the hashed identity columns (no doubles/timestamps)."""
    plan = plan_of(spark, "x_table_fingerprint")
    assert n_nodes(plan, "Exchange") == 3
    assert "partial" in plan
    for unused in ("o_totalprice", "c_acctbal", "l_extendedprice", "l_shipdate"):
        assert unused not in plan


def test_image_phash_dedup_is_maps_then_one_shuffle(spark):
    """The multimodal dedup plan: generation → decode → hash are all
    Arrow mapInPandas (no shuffle between them), then exactly one
    exchange for the hash groupBy — the same shape as exact text dedup."""
    plan = plan_of(spark, "x_image_phash_dedup")
    assert n_nodes(plan, "Exchange") == 1
    assert plan.count("MapInPandas") >= 3  # gen, decode, hash stay chained
    assert "BatchEvalPython" not in plan


def test_target_encode_broadcasts_category_stats(spark):
    """Target encoding: the encode pass must be map-side — category stats
    and the global prior reach every row via broadcast (one hash, one
    1-row nested-loop), never a shuffle join on the fact side."""
    plan = plan_of(spark, "x_target_encode")
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "BroadcastHashJoin") == 1
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 1  # 1-row prior only
    assert n_nodes(plan, "Exchange") <= 2


def test_runtime_bloom_filter_injection_available(spark):
    """100 TB lever check: Spark's runtime bloom-filter join (on by
    default) must inject a `might_contain` pre-filter on the fact side of
    a selective shuffle join — at cluster scale (application-side scan
    past the 10 GB threshold) this prunes most of the fact shuffle for
    joins against a filtered dimension.  Local tables sit under the
    threshold, so the gate lowers it for one plan to prove the engine
    wiring stays live (a Spark-conf regression or an overeager broadcast
    would silently drop the filter)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the shuffle form
    try:
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        je = j._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = je.explainString(mode)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_binned_interval_join_no_nested_loop(spark):
    """The time-bin blocking rewrite's whole point: the band join runs as
    a hash equi-join on (user, bin) — never a nested-loop/cartesian — and
    the residual band predicate survives as a filter."""
    plan = plan_of(spark, "x_binned_interval_join")
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "CartesianProduct") == 0
    assert (
        n_nodes(plan, "BroadcastHashJoin")
        + n_nodes(plan, "SortMergeJoin")
        + n_nodes(plan, "ShuffledHashJoin")
        == 1
    )


def test_langid_confusion_cached_input_and_bounded_shuffles(spark):
    """The (actual, pred) projection feeds BOTH class-keyed aggregates: it
    must be cached (one documents scan + one lang-id evaluation, not two),
    and the whole eval costs at most the two class shuffles plus the tiny
    full-outer join — bounded regardless of corpus size."""
    spark.catalog.clearCache()  # cold plan — see pagerank gate note
    plan = plan_of(spark, "x_langid_confusion")
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "Exchange") <= 5
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_gini_impurity_two_phase_and_pruned_scans(spark):
    """Impurity profiling: the class-count aggregate must keep its partial
    (map-side) phase, and each profiled table's scan must read only the
    profiled column — a full-row scan for a one-column profile is wrong."""
    plan = plan_of(spark, "x_gini_impurity")
    assert "partial_count" in plan or "partial_sum" in plan
    for line in (l for l in plan.splitlines() if "ReadSchema" in l):
        assert "o_totalprice" not in line
        assert "c_acctbal" not in line


def test_l_diversity_single_aggregate(spark):
    """The l-diversity audit is ONE grouped aggregate over the QI keys —
    exactly one exchange hierarchy (distinct-count expands internally but
    never joins), and the customer scan reads only QI + sensitive cols."""
    plan = plan_of(spark, "x_l_diversity")
    assert n_nodes(plan, "Exchange") <= 2  # QI shuffle (+distinct expand)
    line = read_schema_with(plan, "c_nationkey")
    assert "c_address" not in line and "c_comment" not in line


def test_assortativity_edges_cached_equi_joins_only(spark):
    """The degree-correlation build must cache the undirected edge list
    (feeds the degree aggregate AND the edges⋈deg⋈deg join) and join only
    on hash-partitionable equi-keys — no nested loop anywhere; the final
    moment reduce is a single-row aggregate."""
    spark.catalog.clearCache()  # cold plan — see pagerank gate note
    plan = plan_of(spark, "x_assortativity")
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 8


def test_pair_distance_hist_blocked_equi_join(spark):
    """The pair sampler's scale contract: pairs form ONLY through the
    `blk` equi-join (hash-partitionable, bounded per block) — never a
    cartesian — and the id ordering survives as a join-level filter, so
    the fold evaluates on N·(N/B) rows, not N²."""
    plan = plan_of(spark, "x_pair_distance_hist")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert (
        n_nodes(plan, "BroadcastHashJoin")
        + n_nodes(plan, "SortMergeJoin")
        + n_nodes(plan, "ShuffledHashJoin")
        == 1
    )


def test_degree_histogram_two_phase_aggregates(spark):
    """Both histogram passes (degree per node, nodes per degree) must keep
    map-side partials; the edge build joins on the order key only."""
    plan = plan_of(spark, "x_degree_histogram")
    assert "partial_count" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Exchange") <= 6


def test_trade_flow_imbalance_broadcast_dims_no_flow_self_join(spark):
    """The imbalance matrix must fold pairs inside ONE aggregate over the
    flow table (least/greatest keying) — never a flow-vs-flow self-join —
    and the two constant nation dims must broadcast."""
    plan = plan_of(spark, "x_trade_flow_imbalance")
    assert n_nodes(plan, "BroadcastHashJoin") >= 2
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    # 6 scan NODES only (lineitem/orders/customer/supplier/nation x2):
    # no second read of the flow aggregate
    assert n_nodes(plan, "Scan parquet") == 6


def test_weighted_shortest_path_edges_cached_relaxation_bounded(spark):
    """Bellman-Ford: every relaxation round is materialized behind an
    eager lineage cut (r12: localCheckpoint replaced the cache+count
    chain — the returned plan is a bare scan of the final checkpointed
    distance RDD, so no parquet re-scan, no join and no exchange can
    appear above the cut)."""
    spark.catalog.clearCache()  # cold plan — see pagerank gate note
    plan = plan_of(spark, "x_weighted_shortest_path")
    assert "Scan ExistingRDD" in plan  # the per-round lineage cut
    assert "Scan parquet" not in plan  # no re-scan above the cut
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") == 0


def test_feature_hashing_single_aggregate_pruned_scan(spark):
    """The hashing-trick featurizer is explode + ONE grouped count — no
    joins at all — and the documents scan reads only (doc_id, text) with
    the id bound pushed down."""
    plan = plan_of(spark, "x_feature_hashing")
    for op in ("Join", "CartesianProduct"):
        assert n_nodes(plan, op) == 0
    line = read_schema_with(plan, "doc_id")
    assert "lang" not in line and "source" not in line
    assert "LessThan(doc_id,200)" in plan


def test_modularity_pairs_cached_one_row_broadcast_only(spark):
    """The modularity build must cache the distinct edge list (it feeds
    the m scalar AND the labeling chain); the only nested-loop join is
    the 1-row m broadcast; everything else is a key equi-join."""
    spark.catalog.clearCache()  # cold plan — see pagerank gate note
    plan = plan_of(spark, "x_modularity")
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") <= 1  # the 1-row m


def test_zscore_normalize_broadcast_stats_single_shuffle(spark):
    """Standardization must broadcast the ≤25-row nation stats back to
    the fan-out join (never shuffle the customer side for it) and keep
    the stats aggregate's map-side partial phase."""
    plan = plan_of(spark, "x_zscore_normalize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_roc_auc_window_on_reduced_spine_only(spark):
    """The Mann-Whitney running sum must run over the grouped distinct-
    score spine, NOT raw events: the plan has exactly one Window, fed by
    a hash aggregate (the score reduction), and no joins at all."""
    plan = plan_of(spark, "x_roc_auc")
    assert n_nodes(plan, "Window") == 1
    assert "Join" not in plan
    assert "partial_sum" in plan


def test_regression_metrics_broadcast_fit_two_phase(spark):
    """Residual scoring must broadcast the 5-row fit back to the events
    fan-out (never shuffle events for the join), keep the stats pass's
    map-side partials, and use no window at all."""
    plan = plan_of(spark, "x_regression_metrics")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert n_nodes(plan, "Window") == 0
    assert "partial_sum" in plan


def test_knn_classify_argmax_is_aggregate(spark):
    """The vote argmax must be a struct-max AGGREGATE, not a second
    ranking window — exactly one Window (the top-k neighbor rank) in the
    whole plan, and the query-set product is the allow-listed broadcast."""
    plan = plan_of(spark, "x_knn_classify")
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "CartesianProduct") == 0


def test_ndcg_windows_on_pruned_postings(spark):
    """Both nDCG rank windows must run on tf>0 postings (the filter sits
    below the windows), and the discount application is pure projection —
    exactly two Windows, no extra."""
    plan = plan_of(spark, "x_ndcg_eval")
    assert n_nodes(plan, "Window") == 2
    assert n_nodes(plan, "CartesianProduct") == 0


def test_silhouette_broadcast_centroids_no_window(spark):
    """Silhouette scoring must broadcast the k-row centroid table (never
    shuffle the corpus against it) and use aggregates only — zero Windows;
    the dimension-exploded centroid pass keeps its map-side partial."""
    plan = plan_of(spark, "x_silhouette")
    assert n_nodes(plan, "Window") == 0
    assert "partial_sum" in plan
    assert n_nodes(plan, "CartesianProduct") == 0


def test_ks_test_windows_on_reduced_spine(spark):
    """Both KS windows (running ECDFs, global max) must run on the grouped
    distinct-score spine — the plan's only data-sized pass is the score
    reduction with its map-side partial."""
    plan = plan_of(spark, "x_ks_test")
    assert n_nodes(plan, "Window") == 2
    assert "partial_sum" in plan
    assert n_nodes(plan, "CartesianProduct") == 0


def test_theil_sen_pairs_on_daily_grain_only(spark):
    """The pairwise-slope join must take the DAY-GRAIN aggregate as both
    inputs (bounded ≤31 rows per group), never raw events: the day
    reduction keeps its partial phase below the self-join, and no
    cartesian appears (the event_type equi-key bounds the pair fan-out)."""
    plan = plan_of(spark, "x_theil_sen")
    assert "partial_sum" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Window") == 2  # rank + per-group count


def test_collocations_cached_counts_partial_topk(spark):
    """The bigram count table must be cached (it feeds the total, both
    marginals, and the scored join) and the top-20 must stay a partial
    TakeOrdered, never a global sort."""
    spark.catalog.clearCache()  # cold plan — see pagerank gate note
    plan = plan_of(spark, "x_collocations")
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan
    assert n_nodes(plan, "Sort") == 0 or "TakeOrderedAndProject" in plan
    assert n_nodes(plan, "CartesianProduct") == 0


def test_schema_merge_scan_is_single_unified_scan(spark):
    """mergeSchema must produce ONE unified parquet scan over both
    generations — no join, no union node stitching the schemas by hand."""
    plan = plan_of(spark, "f_schema_merge_scan")
    assert n_nodes(plan, "Scan parquet") == 1
    assert "Join" not in plan and n_nodes(plan, "Union") == 0


def test_hits_rank_levels_cached_and_bounded(spark):
    """HITS: the pair list AND every node-bounded score level must be
    cached (each level feeds its 1-row max branch plus the normalized
    output — uncached, the pair list re-scans 2^rounds times), the only
    nested loops are the 1-row max broadcasts, and the top-20 is a
    partial TakeOrdered."""
    spark.catalog.clearCache()  # cold plan — see pagerank gate note
    plan = plan_of(spark, "x_hits_rank")
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") <= 5  # 1-row maxes only


def test_bootstrap_ci_rank_on_resample_spine_only(spark):
    """The bootstrap's only window must rank the 32-row-per-group resample
    means, never raw rows: one Window, fed by the (group, b) hash
    aggregate with its map-side partial; the x32 explode is pure map-side
    (no extra exchange for it)."""
    plan = plan_of(spark, "x_bootstrap_ci")
    assert n_nodes(plan, "Window") == 1
    assert "partial_sum" in plan
    assert n_nodes(plan, "CartesianProduct") == 0


def test_partitioned_scan_prunes_partitions(spark):
    """f_partitioned_scan: the event_type predicate must resolve against
    hive partition DIRECTORIES (PartitionFilters on the scan node), never
    as a data filter — and the pruned scan must not read the partition
    column from data files (it comes from the path)."""
    plan = plan_of(spark, "f_partitioned_scan")
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf_line and "in(click,purchase)" in pf_line.replace(" ", "").lower()
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "event_type" not in read_schema  # partition col served from dirs
    assert "props" not in read_schema


def test_covariance_matrix_single_partial_agg_no_joins(spark):
    """x_covariance_matrix: one explode + one 36-group hash aggregate with
    its map-side partial — no join, no window, exactly one agg exchange."""
    plan = plan_of(spark, "x_covariance_matrix")
    assert "Join" not in plan
    assert "partial_" in plan
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Window") == 0


def test_winsorize_percentile_dims_broadcast(spark):
    """x_winsorize: the 5-row per-type percentile table joins back as a
    BroadcastHashJoin; the clamp aggregation keeps its map-side partial."""
    plan = plan_of(spark, "x_winsorize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert n_nodes(plan, "CartesianProduct") == 0
    assert "partial_" in plan


def test_containment_dedup_blocked_equijoin_topk(spark):
    """x_containment_dedup: pair generation must be an equijoin on the
    prefix block key (shuffle or broadcast hash — NEVER nested loop), and
    the top-40 a TakeOrdered, not a global sort."""
    plan = plan_of(spark, "x_containment_dedup")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "TakeOrderedAndProject" in plan
    # Pin the singleton-block prune (8s -> 1.4s at sf0.1): the colliding-
    # block semi join must run BEFORE shingling so singleton blocks (~95%
    # of the corpus) never shuffle their shingle arrays.  Without the
    # prune this plan has no semi join at all.
    assert "LeftSemi" in plan


def test_rendezvous_shards_no_cartesian_bounded_explode(spark):
    """x_rendezvous_shards: the 9x shard explode is map-side; argmax
    resolution is equijoins on doc_id — no nested loop anywhere."""
    plan = plan_of(spark, "x_rendezvous_shards")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_mutual_best_match_aggregate_argmax_no_windows(spark):
    """x_mutual_best_match: both argmaxes must be struct-min AGGREGATES
    over the cached (user, type) pre-aggregate — zero Window nodes (a
    per-event_type window would collapse to 5 partitions), partials kept."""
    spark.catalog.clearCache()  # cold plan
    plan = plan_of(spark, "x_mutual_best_match")
    assert n_nodes(plan, "Window") == 0
    assert "partial_count" in plan or "partial_" in plan
    assert n_nodes(plan, "CartesianProduct") == 0


def test_rolling_corr_single_window_pass(spark):
    """x_rolling_corr: all six co-moment frames share ONE Window node over
    the daily pre-aggregate (Spark fuses same-frame window functions);
    no join, no cartesian."""
    plan = plan_of(spark, "x_rolling_corr")
    assert n_nodes(plan, "Window") == 1
    assert "Join" not in plan


def test_url_pack_codegen_no_joins(spark):
    """f_url_pack: URL synthesis + parse_url must stay pure column
    expressions — no join, no cartesian, no Python fallback; the only
    shuffles are the distinct-aggregate Expand rollup over 7 bounded
    host groups."""
    plan = plan_of(spark, "f_url_pack")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert n_nodes(plan, "Expand") == 1
    assert n_nodes(plan, "Exchange") <= 3
    assert n_nodes(plan, "Generate") == 0


def test_gopher_rules_single_exchange_no_explode(spark):
    """x_gopher_rules: all five gates are per-row column expressions over
    one split — no Generate (explode) node ever appears, no join, and the
    ONLY exchange is the final bounded per-source aggregation (with its
    map-side partial)."""
    plan = plan_of(spark, "x_gopher_rules")
    assert n_nodes(plan, "Generate") == 0
    assert "Join" not in plan
    assert n_nodes(plan, "Exchange") == 1
    assert "partial_" in plan


def test_bad_records_scan_single_exchange(spark):
    """f_bad_records_scan: PERMISSIVE parse is scan-side — no join, the
    only exchange is the bounded per-type aggregation."""
    plan = plan_of(spark, "f_bad_records_scan")
    assert "Join" not in plan
    assert n_nodes(plan, "Exchange") == 1


def test_vocab_coverage_broadcast_probe(spark):
    """x_vocab_coverage: the 500-row vocab must reach the probe as a
    BROADCAST (bounded top-k — TakeOrdered, never a global Sort+Exchange
    of the token stream for ranking), and the probe side joins without a
    shuffle of its own."""
    plan = plan_of(spark, "x_vocab_coverage")
    assert n_nodes(plan, "BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_text_scan_single_exchange_no_join(spark):
    """f_text_scan: line parse is a map-side projection over the text
    scan; the only exchange is the bounded per-source aggregation."""
    plan = plan_of(spark, "f_text_scan")
    assert "Join" not in plan
    assert n_nodes(plan, "Exchange") == 1


def test_bag_set_ops_no_cartesian(spark):
    """s_intersect_all / s_except_all: Spark's replicate-rows rewrite must
    stay a keyed join over per-side counts — no cartesian, no
    nested-loop."""
    for name in ("s_intersect_all", "s_except_all"):
        plan = plan_of(spark, name)
        assert n_nodes(plan, "CartesianProduct") == 0, name
        assert "NestedLoop" not in plan, name


def test_full_outer_join_pre_reduced_two_exchanges(spark):
    """j_full_outer: full-outer cannot broadcast, so the right shape is a
    SortMergeJoin over two hash-partitioned sides — and the orders side
    must arrive PRE-AGGREGATED (its groupBy exchange is also the join
    exchange: 2 exchanges total, not 3)."""
    plan = plan_of(spark, "j_full_outer")
    assert n_nodes(plan, "SortMergeJoin") == 1
    assert "FullOuter" in plan
    assert n_nodes(plan, "Exchange") == 2


def test_vwap_single_exchange_no_window(spark):
    """x_vwap: a weighted average is ONE two-phase aggregate — any window
    or second exchange means the partial-aggregation path broke."""
    plan = plan_of(spark, "x_vwap")
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Window") == 0


def test_ohlc_bars_aggregate_not_window(spark):
    """x_ohlc_bars: open/close ride struct-min/max AGGREGATES (map-side
    combinable) — the windowed first_value formulation would add a Window
    node and a full sort of the event stream."""
    plan = plan_of(spark, "x_ohlc_bars")
    assert n_nodes(plan, "Window") == 0
    assert n_nodes(plan, "Exchange") == 1


def test_drawdown_single_exchange(spark):
    """x_drawdown: running sum, running max, and the per-user reduce all
    share the user_id partitioning — exactly one exchange."""
    plan = plan_of(spark, "x_drawdown")
    assert n_nodes(plan, "Exchange") == 1


def test_rsi_windows_share_one_sort(spark):
    """x_rsi_indicator: raw orders reduce to the daily series first
    (broadcast dims), then ALL window passes share the single
    (nat)-partitioned sort: 2 exchanges total (daily agg + series
    window), 1 Sort."""
    plan = plan_of(spark, "x_rsi_indicator")
    assert n_nodes(plan, "Exchange") == 2
    assert n_nodes(plan, "Sort") == 1
    assert "CartesianProduct" not in plan


def test_association_rules_pair_join_within_order(spark):
    """x_association_rules: the pair self-join must key on l_orderkey (a
    shuffle/exchange join within baskets) — never a cartesian — and the
    item-count + total-count sides join broadcast."""
    plan = plan_of(spark, "x_association_rules")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan


def test_link_prediction_within_key_pair_join(spark):
    """x_link_prediction: candidate pairs form within the shared-customer
    key; degree tables broadcast; ranking is bounded top-k; and the
    PAIR_DEGREE_CAP hub filter (<= 50 on the customer degree) must sit
    in the plan BEFORE the pairing self-join — without it one hub key
    of degree 10^5 puts 10^10 pairs on a single reducer."""
    from kafka_streaming_spark.queries import PAIR_DEGREE_CAP

    plan = plan_of(spark, "x_link_prediction")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert "NestedLoop" not in plan
    assert n_nodes(plan, "BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert f"<= {PAIR_DEGREE_CAP}" in plan


def test_resource_allocation_degree_cap_in_plan(spark):
    """x_resource_allocation: the same PAIR_DEGREE_CAP bound must gate
    the weighted pairing join (VERDICT r5 wrong-item #1)."""
    from kafka_streaming_spark.queries import PAIR_DEGREE_CAP

    plan = plan_of(spark, "x_resource_allocation")
    assert f"<= {PAIR_DEGREE_CAP}" in plan


def test_chi2_feature_select_bounded_topk(spark):
    """x_chi2_feature_select: token ranking must be TakeOrdered (bounded
    top-k), never a global Sort+Exchange of the vocabulary."""
    plan = plan_of(spark, "x_chi2_feature_select")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_holt_fold_is_expression_no_python(spark):
    """x_holt_linear: the sequential recurrence must run as a JVM-side
    array-aggregate expression — no Python anywhere, dims broadcast, and
    only the two aggregation exchanges (nation-month reduce + per-nation
    collect)."""
    plan = plan_of(spark, "x_holt_linear")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert n_nodes(plan, "Exchange") == 2
    assert "CartesianProduct" not in plan


def test_kaplan_meier_reduces_before_fold(spark):
    """x_kaplan_meier: order volume must collapse to per-(priority, day)
    counts BEFORE the window/fold stages — bounded exchanges, no
    cartesian, no row-at-a-time Python.  r12: the ordered survival
    product is the Arrow grouped-map cumprod (O(k) per priority), not
    the O(k²) array_append fold — pin the operator so it can't silently
    regress."""
    plan = plan_of(spark, "x_kaplan_meier")
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "array_append" not in plan
    assert n_nodes(plan, "Exchange") <= 3
    assert "CartesianProduct" not in plan


def test_lttb_argmax_is_aggregate_with_cached_series(spark):
    """x_lttb_downsample: the per-bucket winner is a struct-min AGGREGATE
    (no Window sort); the shared daily series must come from cache
    (InMemoryTableScan), not three re-reductions of orders; neighbor
    stats join broadcast."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_lttb_downsample")
    assert n_nodes(plan, "Window") == 0
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "BroadcastHashJoin") == 2


def test_textrank_bounded_topk_no_python(spark):
    """x_textrank_keywords: string-keyed PageRank must stay JVM-side
    (array transforms for edge building, no Python), rank with bounded
    top-k, and never degrade to a cartesian."""
    plan = plan_of(spark, "x_textrank_keywords")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_rake_single_window_pass_bounded_exchanges(spark):
    """x_rake_keywords: phrase segmentation is ONE cumulative-sum window
    per document (partitioned by doc_id — state bounded by doc length);
    everything downstream is keyed aggregates + bounded top-k."""
    plan = plan_of(spark, "x_rake_keywords")
    assert n_nodes(plan, "Exchange") <= 5
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_readability_is_map_only(spark):
    """x_readability: pure column expressions — no join, no aggregate
    shuffle; the only exchange is the input spread() repartition."""
    plan = plan_of(spark, "x_readability")
    assert n_nodes(plan, "Exchange") <= 1
    assert "Join" not in plan
    assert n_nodes(plan, "Window") == 0


def test_dbscan_pair_join_is_cell_keyed(spark):
    """x_dbscan_clusters: the eps-ball pair join must be keyed on grid
    cells (hash/merge join against the 9-offset stencil), never an
    all-pairs distance product; shared point/neighbor tables come from
    cache."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_dbscan_clusters")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    # the only nested-loop is the 9-row offset stencil broadcast
    assert n_nodes(plan, "BroadcastNestedLoopJoin") <= 4


def test_video_shot_detect_single_window_arrow_decode(spark):
    """x_video_shot_detect: decode stays Arrow-batched (mapInPandas /
    scalar pandas UDF — never BatchEvalPython); one per-asset lag window
    is the only exchange."""
    plan = plan_of(spark, "x_video_shot_detect")
    assert "BatchEvalPython" not in plan
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Window") == 1


def test_compaction_plan_one_window_one_aggregate(spark):
    """x_compaction_plan: cumulative-sum assignment + manifest aggregate —
    two stages, no joins."""
    plan = plan_of(spark, "x_compaction_plan")
    assert "Join" not in plan
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "Exchange") <= 2


def test_xml_scan_single_aggregate(spark):
    """f_xml_scan: the XML round trip reduces with one two-phase
    aggregate — no joins, no window."""
    plan = plan_of(spark, "f_xml_scan")
    assert "Join" not in plan
    assert n_nodes(plan, "Exchange") == 1


def test_seasonal_decompose_cached_detrended_series(spark):
    """x_seasonal_decompose: the detrended series must come from cache
    for its two consumers (seasonal profile + final join) — raw orders
    reduce exactly once; the seasonal profile joins broadcast."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_seasonal_decompose")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_decision_stump_scans_bins_not_rows(spark):
    """x_decision_stump: the candidate-split scan must run on the binned
    table (rows reduce to ≤#bins before any window) — one aggregate
    exchange + one window exchange, bounded top-k."""
    plan = plan_of(spark, "x_decision_stump")
    assert n_nodes(plan, "Exchange") == 2
    assert "TakeOrderedAndProject" in plan


def test_inverted_index_no_expand(spark):
    """x_inverted_index: df/cf/postings aggregate without an Expand
    (the countDistinct rewrite that would triple the token stream)."""
    plan = plan_of(spark, "x_inverted_index")
    assert n_nodes(plan, "Expand") == 0
    assert n_nodes(plan, "Exchange") <= 3


def test_local_clustering_reuses_cached_edges(spark):
    """x_local_clustering: the support-filtered edge list feeds five
    scans (3 triangle legs + degree union) — it must come from cache,
    and the triangle join must never be a cartesian."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_local_clustering")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_calibration_curve_two_exchanges(spark):
    """x_calibration_curve: map-side scoring + one bounded aggregate."""
    plan = plan_of(spark, "x_calibration_curve")
    assert "Join" not in plan
    assert n_nodes(plan, "Exchange") <= 2


def test_revenue_bridge_two_aggregates_no_window(spark):
    """x_revenue_bridge: (segment, year) aggregate → segment pivot —
    two exchanges, zero windows."""
    plan = plan_of(spark, "x_revenue_bridge")
    assert n_nodes(plan, "Exchange") == 2
    assert n_nodes(plan, "Window") == 0


def test_ngram_novelty_keyed_joins_only(spark):
    """x_ngram_novelty: first-seen attribution joins on the TRIGRAM key;
    no window, no cartesian, bounded exchange budget."""
    plan = plan_of(spark, "x_ngram_novelty")
    assert n_nodes(plan, "Window") == 0
    assert "CartesianProduct" not in plan
    assert n_nodes(plan, "Exchange") <= 5


def test_source_similarity_gram_keyed_dot_products(spark):
    """x_source_similarity: pair dot products join on the gram key over
    the CACHED profile table; norms broadcast; never a doc-level cross
    join."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_source_similarity")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    assert n_nodes(plan, "BroadcastHashJoin") >= 2


def test_did_estimate_single_cell_aggregate(spark):
    """x_did_estimate: one 2x2-cell aggregate over the fact join, then a
    1-row reduce — never a window or per-row pass."""
    plan = plan_of(spark, "x_did_estimate")
    assert n_nodes(plan, "Exchange") == 2
    assert n_nodes(plan, "Window") == 0


def test_fifo_allocation_shares_bucket_partitioning(spark):
    """x_fifo_allocation: the two running-sum windows and the allocation
    join all key on the cached (bucket, month) reduction — lineitem is
    reduced exactly once."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_fifo_allocation")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert n_nodes(plan, "Exchange") <= 3


def test_cohort_ltv_cached_order_projection(spark):
    """x_cohort_ltv: the order projection feeds the cohort min AND the
    revenue join from cache; cohort sizes broadcast."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_cohort_ltv")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_concurrency_sweep_no_interval_explode(spark):
    """x_concurrency_sweep: the sweep must be delta-encoded (+1/-1 per
    endpoint day, one Union, one window) — any Generate/explode means
    the O(n x duration) day-materialization crept back in."""
    plan = plan_of(spark, "x_concurrency_sweep")
    assert "Generate" not in plan
    assert n_nodes(plan, "Union") == 1
    assert n_nodes(plan, "Window") == 1


def test_window_funnel_one_sort_three_lookups(spark):
    """x_window_funnel: all three forward-min step lookups must share ONE
    user-partitioned sort; chain completion is a keyed equi-join."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_window_funnel")
    assert n_nodes(plan, "Sort") == 1
    assert n_nodes(plan, "Window") == 3
    assert "CartesianProduct" not in plan


def test_pca_power_iter_constant_beyond_moments(spark):
    """x_pca_power_iter: the covariance moments are cached (one pass over
    the exploded dims); each unrolled round joins the 64-row matrix to
    the 8-row vector — no cartesian beyond the 1-row normalizers."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_pca_power_iter")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_conformal_interval_broadcast_coefficients(spark):
    """x_conformal_interval: coefficients broadcast back to the point
    stream; one ranking window; two exchanges total."""
    plan = plan_of(spark, "x_conformal_interval")
    assert n_nodes(plan, "Exchange") == 2
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "BroadcastHashJoin") == 1


def test_changepoint_scores_all_splits_in_one_window_pass(spark):
    """x_changepoint: every candidate split scores from prefix sums in
    ONE nation-partitioned window pass; the winner is a struct-min
    aggregate, not a second ranking window."""
    plan = plan_of(spark, "x_changepoint")
    assert n_nodes(plan, "Exchange") <= 2
    assert n_nodes(plan, "Sort") <= 2
    assert "CartesianProduct" not in plan


def test_audio_vad_arrow_decode_single_island_window(spark):
    """x_audio_vad_segments: WAV decode stays Arrow-batched; the
    gaps-and-islands merge is one per-asset window."""
    plan = plan_of(spark, "x_audio_vad_segments")
    assert "BatchEvalPython" not in plan
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "Exchange") <= 2


def test_dict_advisor_no_expand_per_column(spark):
    """x_dict_encoding_advisor: each column profile is a two-phase
    count-distinct aggregate; the union is flat (no joins)."""
    plan = plan_of(spark, "x_dict_encoding_advisor")
    assert "Join" not in plan
    assert n_nodes(plan, "Union") == 1


def test_order_reconciliation_detail_prereduced(spark):
    """x_order_reconciliation: the lineitem side must aggregate BEFORE
    the header join (the join never sees raw line volume)."""
    plan = plan_of(spark, "x_order_reconciliation")
    assert "CartesianProduct" not in plan
    assert n_nodes(plan, "Exchange") <= 3
    assert n_nodes(plan, "Window") == 0


def test_sliced_eval_single_aggregate(spark):
    """x_sliced_eval: map-side scoring + one slice-keyed aggregate."""
    plan = plan_of(spark, "x_sliced_eval")
    assert "Join" not in plan
    assert n_nodes(plan, "Exchange") <= 2


def test_markov_windows_on_bounded_transition_table(spark):
    """x_markov_next_event: one lead() window on the event stream; the
    ranking/total windows run on the states^2-bounded transition table."""
    plan = plan_of(spark, "x_markov_next_event")
    assert n_nodes(plan, "Window") <= 3
    assert "CartesianProduct" not in plan


def test_resource_allocation_within_key_pairs(spark):
    """x_resource_allocation: pair generation within the shared-customer
    key, degree broadcast, bounded top-k."""
    plan = plan_of(spark, "x_resource_allocation")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_weighted_quantiles_window_on_collapsed_values(spark):
    """x_weighted_quantiles: cumulative weights run on the value-collapsed
    table; quantile selection is a min-aggregate over the 3-row spine
    cross join, never a per-quantile rescan."""
    plan = plan_of(spark, "x_weighted_quantiles")
    assert n_nodes(plan, "Window") == 2
    assert n_nodes(plan, "Sort") <= 2


def test_fd_histogram_parameter_broadcast(spark):
    """x_fd_histogram: quartiles + cube root reduce to a 1-row parameter
    relation broadcast back to the scan — never a second global sort of
    raw values."""
    plan = plan_of(spark, "x_fd_histogram")
    assert n_nodes(plan, "Sort") <= 1
    assert n_nodes(plan, "Exchange") <= 3


def test_bounce_rate_reuses_sessionizer_shape(spark):
    """x_bounce_rate: one user-partitioned sessionize sort, one session
    reduce, one day rollup."""
    plan = plan_of(spark, "x_bounce_rate")
    assert n_nodes(plan, "Exchange") <= 2
    assert n_nodes(plan, "Sort") == 1


def test_kfold_cv_two_passes_only(spark):
    """x_kfold_cv_ols: one power-sum pass + one scoring pass — the 5
    leave-one-out models must come from coefficient algebra, not 5
    rescans."""
    plan = plan_of(spark, "x_kfold_cv_ols")
    assert n_nodes(plan, "Exchange") <= 4
    assert n_nodes(plan, "BroadcastHashJoin") == 1


def test_fano_two_shuffles(spark):
    """x_fano_factor: events reduce to (type, day) then one bounded
    aggregate — exactly two exchanges, no window."""
    plan = plan_of(spark, "x_fano_factor")
    assert n_nodes(plan, "Exchange") == 2
    assert n_nodes(plan, "Window") == 0


def test_interarrival_windows_on_gap_spine(spark):
    """x_interarrival_quantiles: one stream lag window; cumulative
    quantile windows run on the gap-collapsed spine."""
    plan = plan_of(spark, "x_interarrival_quantiles")
    assert n_nodes(plan, "Window") == 3
    assert "CartesianProduct" not in plan


def test_peak_detection_one_sort(spark):
    """x_peak_detection: all four neighborhood frames share one
    (nation)-partitioned sort over the reduced daily series."""
    plan = plan_of(spark, "x_peak_detection")
    assert n_nodes(plan, "Sort") == 1
    assert n_nodes(plan, "Window") == 1


def test_join_fanout_audit_two_aggregates(spark):
    """x_join_fanout_audit: key-grouped count + bucket rollup, no joins."""
    plan = plan_of(spark, "x_join_fanout_audit")
    assert "Join" not in plan
    assert n_nodes(plan, "Exchange") == 2


def test_als_step_is_aggregate_algebra(spark):
    """x_als_item_step: factors derive from the key (no lookup table);
    the per-item solve is projection algebra over one keyed aggregate."""
    plan = plan_of(spark, "x_als_item_step")
    assert "CartesianProduct" not in plan
    assert n_nodes(plan, "Window") == 0


def test_temporal_join_size_never_joins_pairs(spark):
    """x_temporal_join_size: the quadratic theta join must NOT appear in
    the plan — the answer comes from grouped counts (the oracle runs the
    brute-force join; the engine must not)."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_temporal_join_size")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    # only the orderkey equi-join (lineitem x orders) and the final
    # count-table merge are allowed - no self-join of ev on (s, t, c)
    assert n_nodes(plan, "SortMergeJoin") + n_nodes(plan, "BroadcastHashJoin") <= 3


def test_lag_features_one_sort(spark):
    """x_lag_features: all lag/mean/count frames share one
    (nation)-partitioned sort over the reduced daily series."""
    plan = plan_of(spark, "x_lag_features")
    assert n_nodes(plan, "Sort") == 1
    assert n_nodes(plan, "Window") == 1


def test_share_of_total_windows_on_rollup(spark):
    """x_share_of_total: the share windows run on the dimension-bounded
    rollup — never a join back to per-level totals."""
    plan = plan_of(spark, "x_share_of_total")
    assert n_nodes(plan, "Exchange") <= 3
    assert n_nodes(plan, "Window") == 2


def test_budget_allocation_closed_form(spark):
    """x_budget_allocation: the spill loop is ONE running-sum window over
    the cached segment rollup + a 1-row budget broadcast."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_budget_allocation")
    assert n_nodes(plan, "Window") == 1
    assert "InMemoryTableScan" in plan


def test_pk_audit_no_expand(spark):
    """x_pk_audit: each key audit is one two-phase count-distinct — no
    Expand fallback, no joins."""
    plan = plan_of(spark, "x_pk_audit")
    assert "Join" not in plan
    assert n_nodes(plan, "Expand") == 0


def test_zonemap_audit_envelope_broadcast(spark):
    """x_zonemap_audit: one zone-keyed min/max aggregate + a 1-row global
    envelope broadcast — no window, no re-scan."""
    plan = plan_of(spark, "x_zonemap_audit")
    assert n_nodes(plan, "Window") == 0
    assert n_nodes(plan, "Exchange") <= 3


def test_topic_scores_broadcast_matmul(spark):
    """x_topic_scores: the sparse matmul joins the constant weight matrix
    broadcast; the argmax is a struct-min aggregate, not a window."""
    plan = plan_of(spark, "x_topic_scores")
    assert n_nodes(plan, "BroadcastHashJoin") == 1
    assert n_nodes(plan, "Window") == 0
    assert "CartesianProduct" not in plan


def test_holt_backtest_on_bounded_series(spark):
    """x_holt_backtest: fold + lead join run on the calendar-bounded
    nation-month table — no cartesian, no Python."""
    plan = plan_of(spark, "x_holt_backtest")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_holt_winters_fold_is_expression(spark):
    """x_holt_winters: the triple-exponential fold (7-slot seasonal array
    in the accumulator) stays a JVM expression — no Python, no cartesian,
    two aggregation exchanges."""
    plan = plan_of(spark, "x_holt_winters")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert n_nodes(plan, "Exchange") == 2
    assert "CartesianProduct" not in plan


def test_stratified_estimate_two_aggregates(spark):
    """x_stratified_estimate: one stratum aggregate + one bounded
    reduce — no window, no join."""
    plan = plan_of(spark, "x_stratified_estimate")
    assert "Join" not in plan
    assert n_nodes(plan, "Window") == 0


def test_hotspot_stencil_joins_cells_not_points(spark):
    """x_hotspot_cells: the neighborhood self-join runs on the CACHED
    ≤100-row cell table, never on points."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "x_hotspot_cells")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


# -- round-6 gates: the driver-window queries that lacked one -------------


def test_seasonal_baseline_single_event_pass(spark):
    """x_seasonal_baseline: events reduce to one row per day FIRST; the
    7-row weekday profile joins back broadcast — exchanges stay within
    the daily-reduce + profile-agg + final-join budget, nothing after
    the first aggregate rescans event volume."""
    plan = plan_of(spark, "x_seasonal_baseline")
    assert n_nodes(plan, "Exchange") <= 3
    assert n_nodes(plan, "BroadcastHashJoin") >= 1
    assert n_nodes(plan, "CartesianProduct") == 0


def test_k_anonymity_one_aggregate(spark):
    """x_k_anonymity: ONE groupBy over the quasi-identifier columns —
    output bounded by the QI domain, no joins, no windows."""
    plan = plan_of(spark, "x_k_anonymity")
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Window") == 0


def test_dau_wau_dedup_then_bounded_explode(spark):
    """x_dau_wau: one dedup shuffle over events, then the x7 spine
    explode runs on |user-days| (Generate node), never on raw events;
    the DAU join back is broadcast-able."""
    plan = plan_of(spark, "x_dau_wau")
    assert n_nodes(plan, "Generate") == 1
    assert n_nodes(plan, "Exchange") <= 5
    assert n_nodes(plan, "CartesianProduct") == 0


def test_item_cf_within_order_pairs_one_ranking_window(spark):
    """x_item_cf_topk: co-occurrence pairs form WITHIN the order key
    (basket²-bounded, the market-basket shape); exactly one row_number
    ranking window; no products."""
    plan = plan_of(spark, "x_item_cf_topk")
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_prefix_rollup_explode_plus_one_aggregate(spark):
    """x_prefix_rollup: depth-bounded prefix explode + ONE grouped
    aggregate (map-side partials apply) — no joins, no windows."""
    plan = plan_of(spark, "x_prefix_rollup")
    assert n_nodes(plan, "Generate") == 1
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Window") == 0


def test_recursive_bom_bounded_recursion(spark):
    """x_recursive_bom: the WITH RECURSIVE ancestor expansion must stay
    a single-aggregate linear plan (depth ≤ 5 expansion), never a
    product or a Python fallback."""
    plan = plan_of(spark, "x_recursive_bom")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert "BatchEvalPython" not in plan
    assert n_nodes(plan, "Exchange") <= 2


def test_lateral_topk_decorrelated(spark):
    """f_lateral_topk: Catalyst must DECORRELATE the lateral subquery
    into a join + per-key ranking — a true nested-loop lateral would be
    |nation| rescans of customer (BroadcastNestedLoopJoin/Cartesian)."""
    plan = plan_of(spark, "f_lateral_topk")
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Window") == 1


def test_weighted_median_on_collapsed_values(spark):
    """x_weighted_median: lineitem collapses to (group, distinct value)
    rows first; the cumulative-weight window and the half-total
    selection run on the collapsed table — two windows max, one sort."""
    plan = plan_of(spark, "x_weighted_median")
    assert n_nodes(plan, "Window") <= 2
    assert n_nodes(plan, "Sort") <= 2
    assert n_nodes(plan, "Exchange") <= 2


def test_longest_streak_two_windows_one_partitioning(spark):
    """x_longest_streak: gaps-and-islands — distinct user-days, then two
    windows both partitioned on the user key (the day-number ranking and
    the per-user argmax); no joins."""
    plan = plan_of(spark, "x_longest_streak")
    assert n_nodes(plan, "Window") == 2
    assert n_nodes(plan, "Exchange") <= 2
    assert n_nodes(plan, "CartesianProduct") == 0


def test_pii_redact_pure_mapside(spark):
    """x_pii_redact: the redaction chain is pure map-side column
    expressions — ZERO exchanges, zero joins, zero Python."""
    plan = plan_of(spark, "x_pii_redact")
    assert n_nodes(plan, "Exchange") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_attribution_single_user_window_pass(spark):
    """x_attribution: both first- and last-touch credits come from ONE
    user-partitioned ordered window pass, then two channel-bounded
    aggregates — never a per-model rescan or a touch⋈purchase join."""
    plan = plan_of(spark, "x_attribution")
    assert n_nodes(plan, "Window") <= 2
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Exchange") <= 4


def test_twap_one_window_shuffle(spark):
    """x_twap: ONE (user, day) window shuffle for the lead() duration,
    then a grouped division — nothing else touches event volume."""
    plan = plan_of(spark, "x_twap")
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Window") == 1


def test_gini_ranksum_single_sort(spark):
    """x_gini: the rank-sum identity needs exactly one per-nation rank
    window over collapsed customer revenues — one sort, no products."""
    plan = plan_of(spark, "x_gini")
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "Sort") <= 1
    assert n_nodes(plan, "CartesianProduct") == 0


def test_bitwise_pack_single_aggregate(spark):
    """f_bitwise_pack: pure column expressions + one bounded aggregate."""
    plan = plan_of(spark, "f_bitwise_pack")
    assert n_nodes(plan, "Exchange") <= 1
    assert "BatchEvalPython" not in plan


def test_mann_whitney_one_global_rank(spark):
    """x_mann_whitney: ONE global rank sort over the two pooled samples;
    tie handling is window arithmetic, not a self-join."""
    plan = plan_of(spark, "x_mann_whitney")
    assert n_nodes(plan, "Window") == 1
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "Exchange") <= 2


def test_runs_test_median_as_window_scalar(spark):
    """x_runs_test: the median resolves as a window scalar — NO cross
    join anywhere — and the sign/run windows stay on the daily series."""
    plan = plan_of(spark, "x_runs_test")
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Window") <= 4


def test_linear_interp_fill_two_neighbor_scans(spark):
    """x_linear_interp_fill: spine explode (Generate) + the ignore-nulls
    forward/backward neighbor windows — bounded exchanges, no products."""
    plan = plan_of(spark, "x_linear_interp_fill")
    assert n_nodes(plan, "Generate") == 1
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "Exchange") <= 2


def test_image_histogram_arrow_decode_no_shuffle(spark):
    """x_image_histogram: PNG decode + bincount happen inside ONE Arrow
    mapInPandas island; the per-image histogram needs zero exchanges."""
    plan = plan_of(spark, "x_image_histogram")
    assert n_nodes(plan, "Exchange") == 0
    assert "BatchEvalPython" not in plan
