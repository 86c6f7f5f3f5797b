"""Raster↔vector operators (SURVEY §2.5 A7/A8).

A7 zonal statistics: raster pixels → PIP-join pixel centers against zone
polygons → groupBy(zone) native aggregates. The pixel side reuses the exact
two-stage PIP join, so zonal stats inherit its broadcast-index pruning.

A8 rasterize: per-tile aggregates → (row, col, value) grid rows at a level,
using the native cell→(x, y) de-interleave — the inverse of the encode.

At 100 TB the raster side is just another big table keyed by cell; both
directions are one shuffle (the groupBy), with pruning/refine scan-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.geom.polyio import PackedPolygon
from ult_spark.geom.raster import GeoRef, PINNED_GEOREF, pixel_center_cols
from ult_spark.ops.pip import pip_join


def zonal_stats(
    raster: DataFrame,
    polys: list[PackedPolygon],
    ref: GeoRef = PINNED_GEOREF,
    value: str = "value",
) -> DataFrame:
    """Per-polygon count/sum/min/max/mean over pixel values.

    Sum/mean go through the e4 integer representation so results are exact
    under any parallelism (and match the DuckDB oracle bit-for-bit).
    """
    lat, lon = pixel_center_cols(ref)
    px = raster.select(
        F.col(value),
        F.floor(F.col(value) * 10000).cast("long").alias("_v_e4"),
        lat.alias("lat"),
        lon.alias("lon"),
    )
    joined = pip_join(px, polys)
    return joined.groupBy("poly_id").agg(
        F.count("*").alias("cnt"),
        F.sum("_v_e4").alias("sum_e4"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
        (F.sum("_v_e4") / F.count("*") / F.lit(10000.0)).alias("vmean"),
    )


def rasterize(
    tiles: DataFrame,
    level: int,
    cell: str = "cell",
    value: str = "cnt",
) -> DataFrame:
    """Tile aggregates → grid rows (x, y, value) at ``level`` (native)."""
    return tiles.select(
        UF.cell_x(cell, level).alias("x"),
        UF.cell_y(cell, level).alias("y"),
        F.col(value).alias("value"),
    )
