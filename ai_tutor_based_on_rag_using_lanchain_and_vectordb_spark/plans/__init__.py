"""Query plans: each module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE: dict[str, str]`` — DuckDB-ANSI SQL equivalents (subset; ops
  that aren't SQL-expressible get rows-only checks from the driver).

Column names are aliased identically on both sides (the driver's
comparator sorts columns by name before hashing). Float aggregates are
rounded identically on both sides so value-hashes match despite
summation-order differences.
"""

from . import curation, documents, misc, pipeline, relational, streamgate, tpch_extra, trainprep, vectors

ALL_MODULES = (
    relational, documents, vectors, misc, curation, pipeline, tpch_extra,
    trainprep, streamgate,
)

# Round-11 driver-sample priority (the driver checks a ~50-query prefix
# of this registry each round). Per VERDICT r10 "Next round" #1: lead
# with the 79 queries whose latest CORRECTNESS_r* green record is r7 or
# earlier (r5: 13, r6: 47, r7: 19 — computed from CORRECTNESS_r01..r10),
# oldest first, so the driver artifact trail self-heals without a
# judge-run full simulation. Queries NEW in round 11 go LAST — they are
# verified by the in-repo driver-sim (/verify) instead, so first-checks
# don't crowd out stale re-checks again. Semantically the order is
# irrelevant.
_DRIVER_PRIORITY = (
    # last driver-artifact check: r5
    "doc_token_stats",
    "embedding_gate",
    "embedding_lsh_recall",
    "embedding_neardup_pairs",
    "health_status",
    "iso_timestamps",
    "knn_exact",
    "knn_ivf_recall",
    "knn_label_filtered",
    "label_centroids",
    "moving_avg_daily_revenue",
    "priority_shipmode_counts",
    "user_event_pivot",
    # last driver-artifact check: r6
    "active_sessions_24h",
    "api_call_savings",
    "bigram_lm_score",
    "bpe_train_gate",
    "chat_history_topk",
    "cohort_retention",
    "constraint_audit",
    "contamination_overlap",
    "corpus_boilerplate",
    "cube_order_stats",
    "customer_order_distribution",
    "customer_revenue_q10",
    "doc_catalog_list",
    "event_type_counts",
    "expired_session_purge",
    "forecast_revenue_change",
    "gopher_repetition",
    "idle_rich_customers",
    "important_parts_value",
    "json_props_stats",
    "knn_ivfpq_approx",
    "knn_ivfpq_recall",
    "knn_numpy_topk",
    "knn_pq_approx",
    "knn_pq_recall",
    "lang_temperature_sample",
    "large_volume_orders",
    "median_value_by_type",
    "nation_market_share",
    "neardup_components",
    "neardup_keep_best",
    "ngram_jaccard_pairs",
    "product_type_profit",
    "promotable_part_suppliers",
    "props_variant_stats",
    "quality_classifier_filter",
    "quantile_rollup",
    "rate_limit_windows",
    "retention_survivors",
    "session_stats",
    "small_qty_avg_revenue",
    "stratified_exact_sample",
    "top_revenue_supplier",
    "unique_sessions",
    "unpivot_event_fields",
    "volume_shipping_pairs",
    "waiting_suppliers",
    # last driver-artifact check: r7
    "big_spenders_except",
    "doc_dedup_exact",
    "doc_normalized",
    "doc_pii_scrub",
    "doc_previews",
    "engaged_rich_intersect",
    "lapsed_customers_anti",
    "local_supplier_volume",
    "minhash_recall",
    "nation_region_dim",
    "order_priority_check",
    "pricing_summary",
    "purchase_attribution",
    "recent_buyers_semi",
    "running_customer_spend",
    "segment_rollup",
    "top_customers",
    "user_daily_gapfill",
    "value_histogram",
    # last driver-artifact check: r8
    "balance_percentiles",
    "cheapest_supplier_per_part",
    "daily_activity",
    "deterministic_doc_sample",
    "event_gaps",
    "hll_rollup_gate",
    "knn_ivf_approx",
    "knn_ivfpq_exhaustive",
    "knn_pq_exhaustive",
    "midnight_pt_countdown",
    "neardup_verified_pairs",
    "purchase_asof_signup",
    "quality_above_lang_median",
    "rag_chat_answers",
    "recursive_chunks",
    "segment_share",
    "session_previews",
    "session_windows",
    "signup_purchase_funnel",
    "simhash_neardup",
    "splitter_invariants",
    "user_event_journeys",
    "validation_flags",
    # last driver-artifact check: r9
    "association_rules",
    "audience_overlap_matrix",
    "audio_spectral_gate",
    "bm25_index_search",
    "bm25_search_topk",
    "brand_supplier_counts",
    "catalog_merge_upsert",
    "cms_user_counts",
    "copurchase_pairs",
    "customer_spend_quartiles",
    "disjunctive_predicate_revenue",
    "doc_char_entropy",
    "doc_compression_ratio",
    "doc_top_terms",
    "duplicate_spans",
    "event_heavy_hitters",
    "event_value_auc",
    "exact_price_quantiles",
    "fuzzy_part_names",
    "gk_grouped_quantile_gate",
    "gk_quantile_gate",
    "hybrid_rrf_fusion",
    "image_phash_gate",
    "kmv_distinct_users",
    "kmv_overlap_gate",
    "knn_ivf_exhaustive",
    "lang_length_quantiles",
    "leakage_safe_splits",
    "media_decode_gate",
    "media_metadata",
    "multimodal_gate",
    "neardup_k_core",
    "neardup_local_clustering",
    "neardup_pagerank",
    "neardup_triangles",
    "pareto_parts_skyline",
    "price_quantity_corr",
    "promo_revenue_share",
    "rolling_7d_distinct_users",
    "scd2_catalog_history",
    "sequence_packing",
    "session_overlap_counts",
    "shipping_priority",
    "simhash_verified_pairs",
    "streaming_equivalence_gate",
    "user_time_weighted_value",
    "value_calibration_curve",
    "value_winsorized",
    "warc_roundtrip_docs",
    "zorder_order_keys",
    # last driver-artifact check: r10
    "benford_order_totals",
    "bloom_fpp_gate",
    "bloom_novel_docs",
    "corpus_shuffle",
    "curation_pipeline_gate",
    "customer_spend_gini",
    "doc_embeddings",
    "doc_fingerprints",
    "doc_fixed_chunks",
    "doc_lang_id",
    "doc_quality",
    "doc_readability",
    "doc_text_search",
    "domain_curation",
    "embedding_covariance",
    "embedding_sq8_error",
    "event_markov_transitions",
    "ewma_daily_revenue",
    "fuzzy_part_names_k2",
    "label_covariance",
    "lineitem_key_skew_report",
    "mahalanobis_outlier_gate",
    "nation_revenue_hhi",
    "orders_column_profile",
    "part_name_entity_groups",
    "pca_projection_gate",
    "quality_bfs_hops",
    "revenue_autocorrelation",
    "revenue_cusum",
    "revenue_seasonality",
    "segment_conversion_ci",
    "semantic_bfs_hops",
    "semantic_bfs_production",
    "semdedup_exhaustive",
    "semdedup_production",
    "semdedup_prune_gate",
    "session_concurrency_timeline",
    "term_pmi_pairs",
    "user_survival_curve",
    "user_value_ewma",
    "value_cumulative_gains",
    "value_cvar",
    "value_equidepth_histogram",
    "value_ks_test",
    "value_mad_outliers",
    "value_percentile_rank",
    "value_psi_drift",
    "value_time_trend",
    "weighted_doc_sample",
    "weighted_median_price",
)


def _prioritized(full: dict) -> dict:
    out = {name: full[name] for name in _DRIVER_PRIORITY if name in full}
    out.update((k, v) for k, v in full.items() if k not in out)
    return out


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return _prioritized(out)


def all_oracle_sql():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLE)
    return _prioritized(out)
