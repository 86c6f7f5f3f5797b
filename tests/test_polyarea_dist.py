"""Distributed-layer twins of the overlay-area family (round-3 verdict,
missing #1): poly_intersect_area_df / union_area_df take the layer as a
packed-ring DataFrame, build covers + oriented arrays IN the cluster, and
must be bit-identical to the driver-layer variants — with shuffle-join
plans (no broadcast nested loop, no driver-side layer packing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ult_spark.geom.polyio import default_layer, shifted_layer, to_dataframe
from ult_spark.ops.polyarea import (
    poly_intersect_area,
    poly_intersect_area_df,
    union_area,
    union_area_df,
)


def test_intersect_area_df_matches_driver_variant(spark):
    a = list(default_layer())
    b = shifted_layer(a, 2.0, 3.0)
    drv = {
        (r.a_id, r.b_id): r.area_e6
        for r in poly_intersect_area(spark, a, b).collect()
    }
    dfv = poly_intersect_area_df(to_dataframe(spark, a), to_dataframe(spark, list(b)))
    got = {(r.a_id, r.b_id): r.area_e6 for r in dfv.collect()}
    assert got == drv and len(got) >= 20


def test_union_area_df_matches_driver_variant(spark):
    a = list(default_layer())
    drv = union_area(spark, a).collect()[0].area_e6
    got = union_area_df(to_dataframe(spark, a)).collect()[0].area_e6
    assert got == drv


def test_zonal_weighted_df_matches_driver_variant(spark):
    """The last overlay op without a layer-DataFrame twin: same pinned
    raster, layer as a packed-ring DataFrame, bit-identical sums."""
    from ult_spark.geom.raster import synth_raster
    from ult_spark.ops.zonal import zonal_weighted, zonal_weighted_df

    polys = list(default_layer())
    raster = synth_raster(spark)
    drv = {
        r.poly_id: (r.area_e6, r.wsum_e10)
        for r in zonal_weighted(raster, polys).collect()
    }
    got = {
        r.poly_id: (r.area_e6, r.wsum_e10)
        for r in zonal_weighted_df(raster, to_dataframe(spark, polys)).collect()
    }
    assert got == drv and len(got) == len(polys)
    plan = (
        zonal_weighted_df(raster, to_dataframe(spark, polys))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_buffer_cells_df_matches_driver_variant(spark):
    from ult_spark.ops.buffer import buffer_cells, buffer_cells_df

    polys = list(default_layer())
    drv = {(r.poly_id, r.cell) for r in buffer_cells(spark, polys, level=6, k=2).collect()}
    got = {
        (r.poly_id, r.cell)
        for r in buffer_cells_df(to_dataframe(spark, polys), level=6, k=2).collect()
    }
    assert got == drv and len(got) > 1000


def test_df_twin_plans_are_shuffle_joins(spark):
    """The twins must not broadcast-nested-loop anything and must build the
    layer artifacts cluster-side (MapInPandas nodes present — the polyfill
    and the oriented-edge packing both run in executors)."""
    a = list(default_layer())
    b = shifted_layer(a, 2.0, 3.0)
    for df in (
        poly_intersect_area_df(to_dataframe(spark, a), to_dataframe(spark, list(b))),
        union_area_df(to_dataframe(spark, a)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "MapInPandas" in plan
