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
# accumulating driver rows at the current code state. Round-4 cohorts
# (computed from CORRECTNESS_r01/02/03): 4 new queries, then the 30 whose
# newest green row is round 2 (none are r1-stale — r3's window caught all
# of those); the remaining 16 slots fill with r3-green names in
# registration order. Pure reordering — zero change to the queries.
_PRIORITY = [
    # new in round 4
    "poly_area_m2", "union_area_m2",
    "poly_intersect_area_dist", "union_area_dist",
    "zonal_weighted_dist", "buffer_cells_dist", "poly_props",
    "sample_docs_strat", "split_counts", "gapfill_hourly", "quadkey_l8",
    "audio_chunk_plan", "pip_depth_events", "poly_distance_events",
    "poly_distance_dist", "sample_k_per_lang", "url_canonical_dedup",
    # last driver-green in round 2 (stalest; pre-r3-refactor rows)
    "cust_nation_region", "top_customers", "tiles_except",
    "pip_join_events", "pip_agg_by_poly", "pip_anti_count",
    "pip_tiles_by_poly_l8", "salted_tile_agg_l8", "pyramid_op",
    "knn_events_k5", "distance_join_errors", "zonal_stats_pop",
    "rasterize_tiles_l6", "dedup_exact", "token_count",
    "doc_fingerprint", "quality_score", "simhash32", "lang_id",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "ann_cosine_topk",
    "ann_lsh_topk", "docs_by_lang_source", "cell_range_join",
    "asof_orders_version", "interval_join_buckets", "percentiles_by_type",
    "tile_samples_l4", "udaf_tile_lat_sum",
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
