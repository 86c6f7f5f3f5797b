"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in :mod:`ult_spark.querydefs` (SURVEY.md §2 map).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: geo-encode events, PIP-ready tile agg.

    Kept import-light: heavy modules load lazily inside the call.
    """
    from ult_spark.pipeline import flagship

    return flagship(spark, "/root/testdata/sf0.001")


# The driver checks the FIRST 50 of queries() per round (round-2 verdict
# #3): order the registry stalest-green-first so every query keeps
# accumulating driver rows at the current code state. Round-7 cohorts
# (computed from CORRECTNESS_r01..r06): first the 7 late-r6 queries that
# have NEVER had a driver row (they landed in slots 51-57 last round —
# r6 verdict "What's wrong #1"), then queries NEW in round 7, then
# approx_users_per_tile_l6 (rows-only by design, re-accumulates a
# rows-green row), then round-4-green backfill (the stalest cohort) up
# to slot 50. Pure reordering — zero change to the queries; everything
# past slot 50 stays covered by tests/test_oracle_contract.py.
_PRIORITY = [
    # never driver-checked (late-r6 window overflow) — must green first
    "host_mirror_pairs", "url_policy_counts", "nn_gfunction_l5",
    "k_core_hosts", "host_triangles", "user_rog", "user_visit_entropy",
    # new in round 7
    "k_core_fixpoint_hosts", "cocitation_oversized_hosts", "emerging_hotspots_bounded",
    "degree_distribution", "label_propagation_hosts", "jaccard_host_links",
    "adamic_adar_links", "stl_decompose_hourly", "hourly_anomalies",
    "idf_top_terms", "minwise_host_sim", "shingle_profile_sizes",
    "dbscan_noise_ratio", "assortativity_hosts", "graph_summary_hosts",
    "event_burstiness", "edge_triangle_support", "personalized_pagerank_hosts",
    "connected_components_hosts", "join_counts_l5", "idw_fill_l6",
    "std_ellipse_l8", "cross_k_l5", "knox_spacetime_l6", "bm25_topk_docs",
    "zipf_slope_docs", "ks_doclen_sources", "spatial_theil_l6",
    "moran_correlogram_l5", "general_g_l6", "spatial_gini_l6",
    "bearing_rose_8", "user_circadian_entropy", "psi_doclen_sources",
    "ktruss_hosts", "ktruss_fixpoint_hosts", "lp_modularity_hosts",
    "rich_club_hosts", "lm_cross_entropy_docs", "acf_hourly",
    "countmin_user_est", "cusum_hourly", "hll_users_pinned",
    "event_type_transitions", "lineitem_pricing_summary",
    "top_unshipped_orders", "revenue_by_nation", "promo_revenue_share",
    "bloom_purchasers_audit", "quantile_bins_doclen", "transitivity_hosts",
    "mad_hourly_anomalies", "customer_ltv_running", "brand_discount_stats",
    "harmonic_centrality_hosts", "cdc_merge_orders", "tile_wow_movers",
    "ann_int8_recall", "hll_users_per_tile_l4", "bloom_semijoin_audit",
    "covisited_cells_l5", "source_quality_dashboard",
    "cell_visitor_entropy_l6", "len_stop_corr_sources",
    "tile_decayed_hotness", "covisit_pagerank_l5", "dup_cluster_size_hist",
    # rows-only by design (HLL), re-accumulates a rows-green row
    "approx_users_per_tile_l6",
    # round-4-green backfill (stalest cohort) to fill the 50-slot window
    "cell_encode_l12", "tile_agg_l8", "tile_pyramid", "cust_nation_region",
    "top_customers", "tiles_except", "pip_join_events", "pip_agg_by_poly",
    "pip_anti_count", "pip_tiles_by_poly_l8", "salted_tile_agg_l8",
    "pyramid_op", "knn_events_k5", "distance_join_errors",
    "zonal_stats_pop", "rasterize_tiles_l6", "dedup_exact", "token_count",
    "doc_fingerprint", "quality_score", "simhash32", "lang_id",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "ann_cosine_topk",
    "ann_lsh_topk", "docs_by_lang_source", "cell_range_join",
    "asof_orders_version", "interval_join_buckets",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ult_spark.querydefs import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from ult_spark.querydefs import ORACLES

    return _ordered(dict(ORACLES))
