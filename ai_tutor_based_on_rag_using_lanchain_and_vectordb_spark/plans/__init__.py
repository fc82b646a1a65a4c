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

# Round-9 driver-sample priority (the driver checks a ~50-query prefix
# of this registry each round). Order: (1) the ten operators NEW in
# round 9 (interval join, triangle census, basket mining + rules,
# skyline, GK gates, AUC, calibration, z-order) — these need their
# first official rows; then the round-8/9-changed queries; (2) the
# remaining queries with the stalest official rows; (3) everything
# else. The order is otherwise semantically irrelevant.
_DRIVER_PRIORITY = (
    # (1) new/changed this round — need fresh official rows first
    "neardup_triangles", "copurchase_pairs", "session_overlap_counts",
    "pareto_parts_skyline", "gk_quantile_gate", "event_value_auc",
    "zorder_order_keys", "association_rules", "value_calibration_curve",
    "gk_grouped_quantile_gate", "price_quantity_corr", "doc_top_terms",
    "neardup_k_core", "doc_char_entropy", "doc_compression_ratio",
    "rolling_7d_distinct_users", "value_winsorized",
    "user_time_weighted_value", "neardup_local_clustering",
    "audience_overlap_matrix",
    "simhash_verified_pairs", "fuzzy_part_names", "cms_user_counts",
    "event_heavy_hitters",
    "bm25_index_search", "bm25_search_topk",
    "exact_price_quantiles", "lang_length_quantiles",
    "kmv_distinct_users", "kmv_overlap_gate", "audio_spectral_gate",
    "neardup_pagerank", "leakage_safe_splits", "image_phash_gate",
    "bm25_search_topk", "bm25_index_search",
    "hybrid_rrf_fusion",
    "media_metadata", "media_decode_gate",
    "multimodal_gate",
    "warc_roundtrip_docs", "event_heavy_hitters",
    "streaming_equivalence_gate", "promo_revenue_share",
    "disjunctive_predicate_revenue", "shipping_priority",
    "sequence_packing",
    "catalog_merge_upsert", "scd2_catalog_history",
    "customer_spend_quartiles", "duplicate_spans",
    "brand_supplier_counts", "knn_ivf_exhaustive", "knn_pq_exhaustive",
    "knn_ivfpq_exhaustive",
    # (2) stale official rows (last green row r4)
    "cheapest_supplier_per_part", "deterministic_doc_sample",
    "event_gaps", "midnight_pt_countdown", "purchase_asof_signup",
    "quality_above_lang_median", "segment_share",
    "signup_purchase_funnel", "user_event_journeys", "validation_flags",
    "hll_rollup_gate", "knn_ivf_approx", "neardup_verified_pairs",
    "rag_chat_answers", "recursive_chunks", "simhash_neardup",
    "splitter_invariants",
    # (3) not drawn in r6's sample (latest row r5)
    "session_previews", "daily_activity", "session_windows",
    "balance_percentiles", "purchase_attribution", "user_daily_gapfill",
    "value_histogram", "pricing_summary", "shipping_priority",
    "local_supplier_volume", "top_customers", "recent_buyers_semi",
    "lapsed_customers_anti", "segment_rollup", "order_priority_check",
    "running_customer_spend", "nation_region_dim", "big_spenders_except",
    "engaged_rich_intersect", "doc_dedup_exact", "minhash_recall",
    "doc_pii_scrub", "doc_normalized", "doc_previews",
    "doc_token_stats", "doc_quality", "doc_lang_id", "doc_fixed_chunks",
    "doc_fingerprints", "knn_exact", "knn_label_filtered",
    "embedding_neardup_pairs", "embedding_lsh_recall", "label_centroids",
    "disjunctive_predicate_revenue", "doc_text_search",
    "moving_avg_daily_revenue", "user_event_pivot", "health_status",
    "priority_shipmode_counts", "promo_revenue_share", "iso_timestamps",
    "media_decode_gate", "media_metadata", "multimodal_gate",
    "doc_embeddings", "embedding_gate", "knn_ivf_recall",
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
