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
# #3): order the registry so queries with the fewest driver-green rows come
# first — new round-3 queries, then never-driver-checked, then the two
# once-checked cohorts (r1-only / r2-only); twice-green names fill the rest
# in registration order. Pure reordering — zero change to the queries.
_PRIORITY = [
    # new in round 3
    "poly_intersect_area", "zonal_weighted_pop", "union_area_layer",
    "buffer_cells_l6", "coverage_boundary_l6", "dup_clusters",
    "tfidf_top_terms", "ann_ivf_trained", "near_dup_oversized",
    # never driver-checked through r2
    "compact_event_cells", "range_partitioned_tiles", "props_json_agg",
    "haversine_to_origin", "embedding_near_dup", "spacetime_rollup",
    "cube_type_bucket", "grouping_sets_type_bucket",
    "approx_users_per_tile_l6", "distinct_users_per_tile_l6",
    # checked in r1 only
    "cell_centroids_l8", "distinct_user_type", "event_gaps",
    "multimodal_features", "multimodal_meta_agg", "rolling_hour_counts",
    "sessionize_users", "tile_rank_ntile", "tiles_intersect",
    "url_host_extract", "video_frame_plan",
    # checked in r2 only
    "ann_ivf_topk", "bbox_cover_l7", "bpe_token_count",
    "distance_join_errors_m", "focal_counts_l6", "knn_events_k5_m",
    "knn_events_wrap", "pip_join_events_dist", "poly_intersect",
    "simhash_near_dup", "winnowing_fp",
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
