"""Raster grid — relational pixel representation + synthesis (SURVEY §1.1.4, S5).

A georeferenced grid stored as (band, row, col, value) pixel rows plus a
georeference (origin, cell size). Exploded-pixel form keeps raster↔vector
operations (zonal stats, rasterize) plain joins + groupBys, which is the
Spark-native answer to BASELINE.json "raster-to-vector zonal aggregation".

The pinned synthetic raster (FIXTURES.md B3): one band "pop",
value = ((row * ncols + col) * 2246822519 % 100000) / 100.0 — integer
arithmetic, reproducible in DuckDB for oracle parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GeoRef:
    origin_lat: float = -60.0
    origin_lon: float = -170.0
    cell_deg: float = 1.0
    nrows: int = 120
    ncols: int = 340


PINNED_GEOREF = GeoRef()


def synth_raster(spark: SparkSession, ref: GeoRef = PINNED_GEOREF, band: str = "pop") -> DataFrame:
    """Deterministic pixel grid via spark.range — no driver-side matérialization."""
    n = ref.nrows * ref.ncols
    return (
        spark.range(n)
        .select(
            F.lit(band).alias("band"),
            (F.col("id") / ref.ncols).cast("int").alias("row"),
            (F.col("id") % ref.ncols).cast("int").alias("col"),
            ((F.col("id") * F.lit(2246822519) % F.lit(100000)).cast("double") / F.lit(100.0)).alias("value"),
        )
    )


RASTER_SQL = (
    "SELECT 'pop' AS band, CAST(i // {ncols} AS INT) AS row, CAST(i % {ncols} AS INT) AS col, "
    "((i * 2246822519) % 100000) / 100.0 AS value "
    "FROM (SELECT CAST(range AS BIGINT) AS i FROM range({n}))"
)


def raster_sql(ref: GeoRef = PINNED_GEOREF) -> str:
    """DuckDB SQL generating the identical pixel grid (oracle side)."""
    return RASTER_SQL.format(ncols=ref.ncols, n=ref.nrows * ref.ncols)


def pixel_center_cols(ref: GeoRef = PINNED_GEOREF) -> tuple[F.Column, F.Column]:
    """(lat, lon) Columns of each pixel's center."""
    lat = F.lit(ref.origin_lat) + (F.col("row").cast("double") + F.lit(0.5)) * F.lit(ref.cell_deg)
    lon = F.lit(ref.origin_lon) + (F.col("col").cast("double") + F.lit(0.5)) * F.lit(ref.cell_deg)
    return lat, lon


def pixel_center_sql(ref: GeoRef = PINNED_GEOREF) -> tuple[str, str]:
    lat = f"({ref.origin_lat} + (CAST(row AS DOUBLE) + 0.5) * {ref.cell_deg})"
    lon = f"({ref.origin_lon} + (CAST(col AS DOUBLE) + 0.5) * {ref.cell_deg})"
    return lat, lon
