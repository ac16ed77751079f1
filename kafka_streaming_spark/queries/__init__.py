"""Driver-facing named query registry (the single public surface).

Split from a 20.5k-line monolithic ``queries.py`` in round 9 (VERDICT r8
ask #7) along its section seams.  ``_core`` holds the registry dict, the
``register`` decorator, and the shared numeric/streaming helpers; the
``qNN_*`` modules hold the query definitions and register themselves on
import.  THE IMPORT ORDER BELOW IS LOAD-BEARING: it reproduces the
monolith's registration order exactly, so ``driver_ordered()`` (and hence
the driver's checked-window semantics) is byte-identical to round 8.

Public surface (unchanged): ``REGISTRY``, ``DRIVER_PRIORITY``,
``driver_ordered``, ``register`` — plus every query function as a package
attribute, as before.  Tests that monkeypatch the live-witness poll
deadlines patch ``kafka_streaming_spark.queries._core._LIVE_POLL_DEADLINES``
(the binding ``_drain_live_sink`` actually reads).
"""

from kafka_streaming_spark.queries._core import *  # noqa: F401,F403
from kafka_streaming_spark.queries._core import (  # noqa: F401
    _LIVE_POLL_DEADLINES,
    _bucket_ms,
    _drain_live_sink,
    _fixed,
    _round_fixed,
    _tiny_stream_conf,
    _tws_stream_conf,
)
from kafka_streaming_spark.queries.q01_projections import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q02_dedup_merge_windows import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q03_aggregates import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q04_joins import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q05_llm_pipeline import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q06_ext_joins_session_multimodal import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q07_analytic_windows import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q08_tpch_more import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q09_sliding_grouping_sketches import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q10_lateral_explode_tpch import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q11_json_regex import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q12_training_data import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q13_tpch_ext import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q14_multimodal_codecs import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q15_misc_graph_batch import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q15b_misc_graph_part2 import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q16_late_r5_eval import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q17_late_r5_scan_stream import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q17b_late_r5_stats_text import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q17c_late_r5_ops_forecast import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q18_registrations_r8_r9 import *  # noqa: F401,F403,E402
from kafka_streaming_spark.queries.q19_registrations_r10 import *  # noqa: F401,F403,E402

# ROUND-8 ROTATION (CORRECTNESS_r07 digested): r7 checked 50 keys — all 50
# green (rows+schema+hash), zero errors; union r1-r7 = 283/327 checked, all
# passing, 44 never-checked.  This window = those final 44 (queue order
# preserved from the r7 staging note) + 6 least-recently-checked green
# canaries (oldest coverage is r2; every r1 name re-appeared in the r2
# window): p_parse_project, f_filter_routing, f_scalar_pack,
# d_datetime_pack, w_latest_per_key, w_topk_per_group.  After this window
# every one of the 327 pre-r8 registry queries has a driver row.
#
# REGISTRATION FREEZE LIFTED this round per its own terms (VERDICT r5 #1:
# freeze until never-checked < 50; it is 44).  Round 8 registers the three
# built-and-green surfaces staged in r7 (VERDICT r7 ask #2):
#   1. t_stream_rate_soak — deterministic rate-micro-batch soak witness
#      (io/sources.py::rate_micro_batch_stream; closed-form DuckDB
#      range() oracle).
#   2. x_arrow_grouped_stats / x_arrow_token_stats — applyInArrow /
#      mapInArrow kernels (functions/arrowops.py) with SQL oracles.
#   3. t_stream_ttl_counter — stateful processing-time-TTL witness
#      (streaming/stateful.py::expiring_counter), driven live with
#      processingTime + explicit stop (availableNow never terminates an
#      armed processing-time timeout).
# These queue for the ROUND-9 window (new names first, topped to 50 with
# the next least-recently-checked greens).  Further registrations remain
# value-triaged: Avro source stays BLOCKED (no spark-avro jar, no
# network — DELTA.md); more analytics variants only where a
# reference-parity or LLM-pipeline gap exists.
#
# ROUND-9 ROTATION (staged; computed from the r1-r7 CORRECTNESS union +
# this r8 window): the 4 r8 registrations are the only never-checked
# names; fill to 50 with the 35 remaining r2-coverage greens then the 11
# alphabetically-first r3-coverage greens —
#   x_arrow_grouped_stats, x_arrow_token_stats, t_stream_rate_soak,
#   t_stream_ttl_counter, f_binaryfile_scan, x_observed_metrics,
#   a_cube, a_distinct_count, a_incremental_fold, a_percentiles,
#   a_pivot, g_rollup, j_anti_join, j_asof_join, j_band_join,
#   j_semi_join, l_pagination, q13_cust_distribution, q18_large_orders,
#   q22_idle_rich_customers, q3_revenue_by_segment, q4_priority_count,
#   q5_region_rollup, s_set_except, s_set_intersect, s_set_union,
#   t_session_window, t_sessionize, t_sliding_window, t_tumbling_window,
#   w_analytic_pack, w_moving_avg, x_cosine_near_dup, x_cosine_topk,
#   x_doc_bpe_tokens, x_doc_fingerprint, x_doc_lang_id, x_doc_quality,
#   x_doc_token_stats, x_image_meta, x_ngram_jaccard_pairs,
#   a_group_agg, a_grouping_sets, a_salted_agg, f_json_struct,
#   f_regex_pack, j_cross_join, j_merge_insert_if_absent,
#   p_explode_pack, q10_returned_items
# ROUND-10 ROTATION (staged; computed from the r1-r8 CORRECTNESS union +
# this r9 window): once the r9 run lands, every one of the 337 registry
# names has a driver row, so r10 begins steady-state regression rotation —
# the 50 least-recently-checked greens (all r3/r4 coverage; computed by
# latest-round-with-a-row, registration order as tiebreak; includes the
# four fills displaced from the r9 window, which keep r3 coverage age):
#   j_merge_insert_if_absent, q1_pricing_summary, x_doc_exact_dedup,
#   x_dedup_clusters, x_minhash_near_dup, x_dedup_keep_best,
#   x_doc_chunk, x_simhash, x_ivf_ann_topk, x_lsh_ann_topk,
#   p_explode_pack, j_cross_join, w_first_last_value,
#   q6_revenue_change, q14_promo_share, q19_disjunctive_join,
#   q_supplier_top_per_nation, x_doc_sample_uniform,
#   x_doc_sample_stratified, x_doc_split, x_topk_bigrams, x_pii_scan,
#   x_zorder_scan, x_decontaminate, x_doc_repetition,
#   x_embedding_normalize, q7_nation_volume, q9_product_profit,
#   q10_returned_items, q15_top_supplier, q17_small_qty_revenue,
#   q20_part_suppliers, q21_waiting_suppliers, q8_market_share,
#   q2_min_cost_supplier, q11_important_stock, q16_supplier_count,
#   x_image_pixel_stats, x_audio_energy, x_kmeans_embeddings,
#   x_ann_recall, x_semdedup, x_pq_ann_topk, x_ivfpq_ann_topk,
#   j_interval_join, t_stateful_running, x_event_funnel,
#   x_cohort_retention, x_doc_sample_weighted, x_quantile_binning
# Any r10 registration (triage bar per VERDICT r8 ask #6 still holds)
# goes FIRST and displaces from the tail.
# ROUND-11 ROTATION (staged; computed from the r1-r9 CORRECTNESS union
# assuming this r10 window lands green): the next 50 least-recently-
# checked greens — x_doc_sample_weighted and x_quantile_binning
# (displaced from the r10 tail by the two r10 registrations, so still
# r4-age) plus 37 r4-coverage + 11 r5-coverage, same
# (latest-round-with-a-row, registration order) key:
#   x_doc_sample_weighted, x_quantile_binning, x_robust_outliers, x_event_transitions, x_time_resample, a_array_agg,
#   f_variant_pack, f_hof_pack, a_stats_pack, x_dataset_mix, x_token_pack,
#   x_epoch_shuffle, x_quality_funnel, j_bucketed_join, j_skew_salted_join,
#   x_triangle_count, x_skew_profile, x_kmv_distinct, x_market_basket,
#   x_data_contract, x_snapshot_diff, f_csv_scan, f_jsonl_scan,
#   x_embedding_quantize, q12_late_shipments, x_image_resize_stats,
#   x_video_frame_stats, x_quality_model_score, x_column_profile,
#   x_bloom_filter_probe, x_fuzzy_match, x_scd2_history, x_pit_join,
#   x_pagerank_trade, x_countmin_heavyhitters, x_dsir_weights,
#   x_bm25_search, x_ngram_lm_score, x_span_dedup, x_lsh_eval,
#   x_hard_negatives, x_semdedup_eval, t_stream_tumbling, t_stream_sliding,
#   t_stream_session, t_stream_dedup, t_stream_interval_join,
#   x_trending_topk, x_conversion_latency, a_approx_sketch
#   (f_null_pack and x_dup_rate_by_source fall to the r12 queue)
# Any r11 registration (triage bar stands) goes FIRST, displacing the tail.
DRIVER_PRIORITY: list[str] = [
    # -- ROUND-10 WINDOW: the staged steady-state regression rotation
    # above (the r9 run landed 337/337 coverage, so the window's job is
    # now recency) — the 50 least-recently-checked greens, verified
    # this round against the r1-r9 CORRECTNESS union
    # (tools/rotation.py): staged == computed, byte-identical.
    # New r10 registrations go first and displace from the tail.
    "f_state_changes",
    "t_stream_session_tws",
    "j_merge_insert_if_absent",
    "q1_pricing_summary",
    "x_doc_exact_dedup",
    "x_dedup_clusters",
    "x_minhash_near_dup",
    "x_dedup_keep_best",
    "x_doc_chunk",
    "x_simhash",
    "x_ivf_ann_topk",
    "x_lsh_ann_topk",
    "p_explode_pack",
    "j_cross_join",
    "w_first_last_value",
    "q6_revenue_change",
    "q14_promo_share",
    "q19_disjunctive_join",
    "q_supplier_top_per_nation",
    "x_doc_sample_uniform",
    "x_doc_sample_stratified",
    "x_doc_split",
    "x_topk_bigrams",
    "x_pii_scan",
    "x_zorder_scan",
    "x_decontaminate",
    "x_doc_repetition",
    "x_embedding_normalize",
    "q7_nation_volume",
    "q9_product_profit",
    "q10_returned_items",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q20_part_suppliers",
    "q21_waiting_suppliers",
    "q8_market_share",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_count",
    "x_image_pixel_stats",
    "x_audio_energy",
    "x_kmeans_embeddings",
    "x_ann_recall",
    "x_semdedup",
    "x_pq_ann_topk",
    "x_ivfpq_ann_topk",
    "j_interval_join",
    "t_stateful_running",
    "x_event_funnel",
    "x_cohort_retention",
    # x_doc_sample_weighted and x_quantile_binning displaced to keep
    # the window at 50 (they head the r11 staging queue, keeping their
    # r4 coverage age).
]


def driver_ordered() -> dict[str, tuple[QueryFn, str | None]]:
    """REGISTRY re-keyed so :data:`DRIVER_PRIORITY` names come first (in
    that order) and everything else follows in registration order."""
    prio = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    rest = {n: v for n, v in REGISTRY.items() if n not in prio}
    return {**prio, **rest}


__all__ = ["REGISTRY", "DRIVER_PRIORITY", "driver_ordered", "register"]

