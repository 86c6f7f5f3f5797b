"""Physical-layout assertions (SURVEY §2.7 O2, §4): range partitioning by
cell id is spatially coherent, and the hot paths keep the plans we designed
(pushdown, pruning, broadcast, no Python in native paths)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ult_spark import functions as UF


def test_range_partition_by_cell_is_monotone(spark, sf_smoke):
    from ult_spark.querydefs import events_points

    tiles = (
        events_points(spark, sf_smoke)
        .groupBy(UF.latlon_to_cell("lat", "lon", 8).alias("cell"))
        .agg(F.count("*").alias("cnt"))
        .repartitionByRange(8, "cell")
        .sortWithinPartitions("cell")
    )
    pdf = tiles.withColumn("pid", F.spark_partition_id()).toPandas()
    # partitions hold disjoint, ordered cell ranges (Z-order locality)
    bounds = pdf.groupby("pid")["cell"].agg(["min", "max"]).sort_values("min")
    assert (bounds["max"].to_numpy()[:-1] < bounds["min"].to_numpy()[1:]).all()
    # within a partition the rows are sorted
    for _, g in pdf.groupby("pid"):
        assert np.all(np.diff(g["cell"].to_numpy()) > 0)


def test_hot_path_plan_shape(spark, sf_smoke):
    """The flagship pipeline plan: broadcast join, no ArrowEvalPython, scan
    prunes to the columns actually used."""
    from ult_spark.datagen.pages import pages_df
    from ult_spark.pipeline import pages_pipeline

    pages = pages_df(spark, 200, partitions=2)
    plan = pages_pipeline(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan, "hot path must be 100% native"
    assert "BatchEvalPython" not in plan


def test_scan_prunes_html(spark, sf_smoke):
    """Column pruning: a query not touching html must not read it (critical:
    html is the wide column — SURVEY §4)."""
    import tempfile

    from ult_spark.datagen.pages import pages_df

    with tempfile.TemporaryDirectory() as d:
        pages_df(spark, 100, partitions=1).write.parquet(f"{d}/p")
        df = spark.read.parquet(f"{d}/p").groupBy("lang").count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "html" not in plan.split("ReadSchema:")[1].split("\n")[0]


def test_round2_native_ops_have_no_python_eval(spark, sf_smoke):
    """Every round-2 operator is a native Column program: no
    ArrowEvalPython/BatchEvalPython anywhere in their executed plans."""
    from ult_spark.querydefs import QUERIES

    for name in (
        "knn_events_k5_m",
        "knn_events_wrap",
        "distance_join_errors_m",
        "poly_intersect",
        "focal_counts_l6",
        "ann_ivf_topk",
        "simhash_near_dup",
        "bpe_token_count",
        "compact_event_cells",
        "minhash_lsh_pairs",
    ):
        plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_round3_native_ops_have_no_python_eval(spark, sf_smoke):
    """Round-3 operators stay native: overlay area/union/buffer, weighted
    zonal, trained IVF, tf-idf, dup clusters, the capped near-dup plans —
    no Python eval node in any executed plan. (dup_clusters materializes
    per-round via localCheckpoint, so its FINAL plan is checked after the
    checkpoint cascade — still no Python anywhere.)"""
    from ult_spark.querydefs import QUERIES

    for name in (
        "poly_intersect_area",
        "union_area_layer",
        "buffer_cells_l6",
        "zonal_weighted_pop",
        "ann_ivf_trained",
        "tfidf_top_terms",
        "dup_clusters",
        "near_dup_oversized",
        "embedding_near_dup",
    ):
        plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_round4_native_ops_have_no_python_eval(spark, sf_smoke):
    """Round-4 operators stay native Column programs (the distributed-layer
    twins are excluded — their cluster-side layer packing is mapInPandas by
    design and has its own plan asserts in test_polyarea_dist.py)."""
    from ult_spark.querydefs import QUERIES

    for name in (
        "poly_area_m2",
        "union_area_m2",
        "poly_props",
        "gapfill_hourly",
        "sample_docs_strat",
        "split_counts",
        "quadkey_l8",
        "sample_k_per_lang",
        "url_canonical_dedup",
        "audio_chunk_plan",
        "pip_depth_events",
        "poly_distance_events",
    ):
        plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "MapInPandas" not in plan, name


def test_zonal_weighted_candidates_are_hash_join(spark, sf_smoke):
    """Round-3 verdict #3: zonal_weighted's pixel→polygon candidates must be
    a cell-cover HASH equi-join, not a broadcast nested-loop bbox theta
    join — O(pixels × zones) does not survive a large zone layer."""
    from ult_spark.querydefs import QUERIES

    plan = (
        QUERIES["zonal_weighted_pop"](spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_distributed_compact_matches_numpy(spark, sf_smoke):
    from ult_spark.grid import cells as C, compact as CZ
    from ult_spark.ops.compact_df import compact_cells
    from ult_spark.querydefs import events_points

    pts = events_points(spark, sf_smoke)
    cells8 = pts.select(UF.latlon_to_cell("lat", "lon", 8).alias("cell"))
    got = np.sort(np.array([r.cell for r in compact_cells(cells8, anchor_level=4).collect()]))
    local = np.unique(
        C.latlon_to_cell(
            *(pts.toPandas()[c].to_numpy() for c in ("lat", "lon")), 8
        )
    )
    exp = CZ.compact(local)
    assert np.array_equal(got, exp)


def test_round5_native_ops_have_no_python_eval(spark, sf_smoke):
    """Round-5 operators stay native Column programs: URL tracking-param
    dedup, H3 structural joins, the whole curation family (Gopher
    repetition, PII scrub, segment dedup, decontamination), and the
    training-batch assembly + trajectory/diff ops."""
    from ult_spark.querydefs import QUERIES

    for name in (
        "url_tracking_dedup",
        "h3_parent_rollup",
        "h3_ancestor_counts",
        "gopher_repetition",
        "pii_scrub_docs",
        "segment_dedup_w8",
        "decontam_5gram",
        "pack_sequences_b256",
        "domain_balance_sqrt",
        "session_trips_30m",
        "snapshot_diff_orders",
        "decontam_fuzzy",
        "ring_simplify_stats",
        "session_cell_path",
        "poly_contains",
        "gapfill_lerp",
        "raster_bilinear_events",
        "od_matrix_l4",
        "user_retention_daily",
        "token_entropy",
        "session_speed_stats",
        "dwell_time_by_poly",
        "session_sinuosity",
        "curation_funnel",
        "asof_orders_keyed",
        "cell_range_join_anchored",
    ):
        plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_cell_partitioned_layout_prunes_directories(spark, sf_smoke, tmp_path):
    """r5 io/layout.py: Z-order directory clustering + descendant-range
    read = planning-time partition pruning — the scan reads ONLY the
    matching directories (inputFiles shrinks) and returns exactly the
    rows a full-scan filter returns."""
    from ult_spark.grid import cells as C
    from ult_spark.io.layout import read_descendants, write_cell_partitioned
    from ult_spark.querydefs import events_points

    path = str(tmp_path / "cells_l2")
    pts = events_points(spark, sf_smoke).select(
        "event_id", UF.latlon_to_cell("lat", "lon", 8).alias("cell")
    )
    write_cell_partitioned(pts, path)
    total_files = len(spark.read.parquet(path).inputFiles())

    def files_read(make_df) -> int:
        # DataFrame.inputFiles() reflects the UNFILTERED relation; the
        # scan's numFiles metric after execution is the real I/O count.
        # The metric is populated by the scan's lazy partition listing,
        # which happens once per PLAN — a re-collected DataFrame resets
        # it to 0 — so the plan is rebuilt fresh for the metric read.
        df = make_df()
        df.collect()
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return int(leaf.metrics().apply("numFiles").value())

    # ancestor at the dir level itself (level 2): exact directory pruning
    anc = int(C.latlon_to_cell(np.array([20.0]), np.array([30.0]), 2)[0])
    got = read_descendants(spark, path, anc)
    lo, hi = (int(x[0]) for x in C.cell_range(np.array([anc], dtype=np.int64)))
    expect = pts.where(F.col("cell").between(lo, hi))
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in expect.collect()
    )
    assert files_read(lambda: read_descendants(spark, path, anc)) < total_files
    # plan-level evidence: the predicate landed as a partition filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    # deeper-than-dir ancestor (level 5): clamps to ONE covering directory
    anc5 = int(C.latlon_to_cell(np.array([20.0]), np.array([30.0]), 5)[0])
    got5 = read_descendants(spark, path, anc5)
    lo5, hi5 = (int(x[0]) for x in C.cell_range(np.array([anc5], dtype=np.int64)))
    expect5 = pts.where(F.col("cell").between(lo5, hi5))
    assert sorted(r.event_id for r in got5.collect()) == sorted(
        r.event_id for r in expect5.collect()
    )
    # one file per directory at this scale
    assert files_read(lambda: read_descendants(spark, path, anc5)) == 1


def test_round6_native_ops_have_no_python_eval(spark, sf_smoke):
    """Round-6 operators stay native Column programs: cluster-canonical
    retention, the batch session-window twin, the ordered funnel, SCD-2
    intervals, kernel smoothing, and per-host quality stats."""
    from ult_spark.querydefs import QUERIES

    for name in (
        "dup_keep_best",
        "session_window_counts_b",
        "funnel_steps",
        "scd2_orders_intervals",
        "kernel_smooth_l6",
        "host_quality_stats",
        "boilerplate_strip_w2",
        "pagerank_hosts_3it",
        "getis_ord_l6",
        "morans_i_l5",
        "local_moran_l5",
        "emerging_hotspots_l4",
        "pmi_cooccurrence",
        "hits_hosts_3it",
        "overlap_near_dups",
        "quadrat_chi2_l5",
        "cocitation_hosts",
        "semivariogram_l5",
        "host_lang_divergence",
        "geohash_counts_p4",
        "geohash_bridge_p4",
        "source_js_divergence",
        "gearys_c_l5",
        "ripley_k_l5",
        "host_mirror_pairs",
        "url_policy_counts",
        "nn_gfunction_l5",
        "k_core_hosts",
        "host_triangles",
        "user_rog",
        "user_visit_entropy",
    ):
        plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_round7_native_ops_have_no_python_eval(spark, sf_smoke):
    """Round-7 operators stay native Column programs: the fixpoint k-core,
    capped co-citation + surfacing, bounded Mann-Kendall, the link-analysis
    family, hourly decomposition/anomalies, IR statistics, noise ratio."""
    from ult_spark.querydefs import QUERIES

    for name in (
        "k_core_fixpoint_hosts",
        "cocitation_oversized_hosts",
        "emerging_hotspots_bounded",
        "degree_distribution",
        "jaccard_host_links",
        "adamic_adar_links",
        "assortativity_hosts",
        "label_propagation_hosts",
        "stl_decompose_hourly",
        "hourly_anomalies",
        "idf_top_terms",
        "minwise_host_sim",
        "shingle_profile_sizes",
        "dbscan_noise_ratio",
        "moran_correlogram_l5",
        "general_g_l6",
        "spatial_gini_l6",
        "bearing_rose_8",
        "user_circadian_entropy",
        "psi_doclen_sources",
        "ktruss_hosts",
        "lp_modularity_hosts",
        "rich_club_hosts",
        "lm_cross_entropy_docs",
        "acf_hourly",
        "countmin_user_est",
        "cusum_hourly",
        "hll_users_pinned",
        "event_type_transitions",
        "lineitem_pricing_summary",
        "top_unshipped_orders",
        "revenue_by_nation",
        "promo_revenue_share",
        "bloom_purchasers_audit",
        "quantile_bins_doclen",
        "transitivity_hosts",
        "mad_hourly_anomalies",
        "customer_ltv_running",
        "brand_discount_stats",
        "harmonic_centrality_hosts",
        "cdc_merge_orders",
        "tile_wow_movers",
        "ann_int8_recall",
        "hll_users_per_tile_l4",
        "bloom_semijoin_audit",
        "covisited_cells_l5",
        "source_quality_dashboard",
        "cell_visitor_entropy_l6",
        "len_stop_corr_sources",
        "tile_decayed_hotness",
        "covisit_pagerank_l5",
        "dup_cluster_size_hist",
    ):
        plan = QUERIES[name](spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_compact_small_files_roundtrip(spark, tmp_path):
    """r7: 40 tiny files → ceil(bytes/target) outputs, content identical,
    cell-sorted output restores row-group clustering."""
    from pyspark.sql import functions as F

    from ult_spark.io.layout import compact_small_files

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") * 37 % 1000).alias("cell")
    )
    df.repartition(40).write.parquet(src)
    stats = compact_small_files(spark, src, out, target_bytes=10**9)
    assert stats["files_in"] == 40 and stats["files_out"] == 1
    got = spark.read.parquet(out)
    assert got.count() == 4000
    assert got.agg(F.sum("id"), F.sum("cell")).collect() == \
        df.agg(F.sum("id"), F.sum("cell")).collect()


def test_spacetime_layout_prunes_both_dimensions(spark, sf_smoke, tmp_path):
    """r7 io/layout.py: (cell_dir, week) partitioning — a space+time
    range read prunes MORE files than either dimension alone, returns
    exactly the full-scan-filter rows, and both predicates land as
    partition filters."""
    from ult_spark.grid import cells as C
    from ult_spark.io.layout import read_spacetime, write_spacetime_partitioned
    from ult_spark.querydefs import events_points, load

    path = str(tmp_path / "spacetime")
    ev = load(spark, sf_smoke, "events")
    pts = events_points(spark, sf_smoke).select(
        "event_id", "ts", UF.latlon_to_cell("lat", "lon", 8).alias("cell")
    )
    write_spacetime_partitioned(pts, path)
    total_files = len(spark.read.parquet(path).inputFiles())

    def files_read(make_df) -> int:
        df = make_df()
        df.collect()
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return int(leaf.metrics().apply("numFiles").value())

    wks = sorted(
        r.week for r in spark.read.parquet(path).select("week").distinct().collect()
    )
    w_lo, w_hi = wks[0], wks[max(0, len(wks) // 4 - 1)]
    anc = int(C.latlon_to_cell(np.array([20.0]), np.array([30.0]), 2)[0])
    got = read_spacetime(spark, path, anc, w_lo, w_hi)
    lo, hi = (int(x[0]) for x in C.cell_range(np.array([anc], dtype=np.int64)))
    week = F.floor(F.unix_timestamp("ts") / F.lit(604800)).cast("long")
    expect = pts.where(
        F.col("cell").between(lo, hi) & week.between(w_lo, w_hi)
    )
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in expect.collect()
    )
    n_both = files_read(lambda: read_spacetime(spark, path, anc, w_lo, w_hi))
    n_space = files_read(lambda: read_spacetime(spark, path, anc, wks[0], wks[-1]))
    assert n_both <= n_space < total_files
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "week" in pf and "cell_dir" in pf
