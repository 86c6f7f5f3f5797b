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
# accumulating driver rows at the current code state. Round-5 cohorts
# (computed from CORRECTNESS_r01..r04): 26 queries new in round 5, then
# the 46 whose newest green row is round 3 (every other oracle query is
# round-4-green). Pure reordering — zero change to the queries. The
# 46-query r3-stale cohort overflows slot 50 by 22 once the 26 round-5
# queries lead; the tail (compact/range-partition/json/haversine/
# near-dup/spacetime plus cube/grouping-sets/distinct-users/HLL) stays
# pytest-covered via tests/test_oracle_contract.py and rotates in next
# round.
_PRIORITY = [
    # new in round 5
    "url_tracking_dedup", "h3_parent_rollup", "h3_ancestor_counts",
    "gopher_repetition", "pii_scrub_docs", "segment_dedup_w8",
    "decontam_5gram", "pack_sequences_b256", "domain_balance_sqrt",
    "session_trips_30m", "snapshot_diff_orders", "decontam_fuzzy",
    "ring_simplify_stats", "session_cell_path", "poly_contains",
    "gapfill_lerp", "raster_bilinear_events", "od_matrix_l4",
    "user_retention_daily", "token_entropy", "session_speed_stats",
    "dwell_time_by_poly", "session_sinuosity", "curation_funnel",
    "asof_orders_keyed", "cell_range_join_anchored",
    # last driver-green in round 3 (stalest oracle queries)
    "top_tiles_l8", "latest_event_per_user", "topk_per_tile_l4",
    "rollup_type_tile", "hourly_counts", "orders_status_agg",
    "pip_join_events_dist", "poly_intersect", "poly_intersect_area",
    "buffer_cells_l6", "coverage_boundary_l6", "union_area_layer",
    "bbox_cover_l7", "focal_counts_l6", "knn_events_k5_m",
    "knn_events_wrap", "distance_join_errors_m", "zonal_weighted_pop",
    "bpe_token_count", "winnowing_fp", "simhash_near_dup",
    "tfidf_top_terms", "dup_clusters", "ann_ivf_topk", "ann_ivf_trained",
    "event_gaps", "rolling_hour_counts", "tile_rank_ntile",
    "tiles_intersect", "distinct_user_type", "url_host_extract",
    "cell_centroids_l8", "sessionize_users", "multimodal_meta_agg",
    "multimodal_features", "video_frame_plan", "compact_event_cells",
    "range_partitioned_tiles", "props_json_agg", "haversine_to_origin",
    "embedding_near_dup", "near_dup_oversized", "spacetime_rollup",
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
