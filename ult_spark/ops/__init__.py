"""Operator surface — lazy re-exports of the commonly-used entry points."""

from __future__ import annotations

__all__ = [
    "pip_join", "pip_join_df", "build_cell_index", "build_edge_index",
    "build_cell_index_df", "build_edge_index_df", "knn_join", "poly_intersect_join_df",
    "distance_join", "distance_join_m", "poly_intersect_join",
    "tile_agg", "pyramid", "focal_agg", "zonal_stats", "rasterize",
    "cell_range_join", "asof_join", "sessionize", "compact_cells",
    "compact_cells_native", "uncompact_cells_native",
    "dedup_exact", "minhash_lsh_dedup", "simhash", "jaccard_pairs",
    "lang_id", "quality_score", "token_count", "fingerprint",
    "cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "ivf_assign", "lsh_bands", "prune_buckets", "oversized_buckets",
    "synth_assets", "extract_features", "frame_sample",
    # round 3
    "poly_intersect_area", "union_area", "buffer_cells", "dilate_cells",
    "zonal_weighted", "ivf_train", "dup_clusters", "tfidf_top_terms",
    "coverage_boundary",
    "collapse_exact",
]


def __getattr__(name):
    from importlib import import_module

    homes = {
        "pip_join": "pip", "pip_join_df": "pip", "build_cell_index": "pip",
        "build_cell_index_df": "pip", "build_edge_index_df": "pip",
        "poly_intersect_join_df": "polyjoin",
        "knn_join": "knn", "distance_join": "knn", "distance_join_m": "knn",
        "build_edge_index": "pip", "poly_intersect_join": "polyjoin",
        "tile_agg": "tiles", "pyramid": "tiles", "focal_agg": "tiles",
        "zonal_stats": "zonal", "rasterize": "zonal",
        "cell_range_join": "relational", "asof_join": "relational", "sessionize": "relational",
        "compact_cells": "compact_df", "compact_cells_native": "compact_df",
        "uncompact_cells_native": "compact_df",
        "dedup_exact": "textops", "minhash_lsh_dedup": "textops", "simhash": "textops",
        "jaccard_pairs": "textops", "lang_id": "textops", "quality_score": "textops",
        "token_count": "textops", "fingerprint": "textops",
        "cosine_topk": "ann", "ann_lsh_topk": "ann", "lsh_bands": "ann",
        "prune_buckets": "ann", "oversized_buckets": "ann",
        "ann_ivf_topk": "ann", "ivf_assign": "ann",
        "synth_assets": "multimodal", "extract_features": "multimodal", "frame_sample": "multimodal",
        "poly_intersect_area": "polyarea", "union_area": "polyarea",
        "buffer_cells": "buffer", "dilate_cells": "buffer",
        "coverage_boundary": "buffer",
        "zonal_weighted": "zonal", "ivf_train": "ann",
        "dup_clusters": "textops", "tfidf_top_terms": "textops",
        "collapse_exact": "textops",
    }
    if name in homes:
        return getattr(import_module(f"ult_spark.ops.{homes[name]}"), name)
    raise AttributeError(name)
