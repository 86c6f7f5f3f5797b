"""ult_spark — PySpark-native geospatial aggregation engine (see SURVEY.md).

Typical usage::

    from ult_spark import functions as UF
    from ult_spark.ops import pip_join, tile_agg, pyramid, knn_join

    pts = df.withColumn("cell", UF.latlon_to_cell("lat", "lon", 12))
    tiles = tile_agg(pip_join(pts, layer), value="v", salt_by="url")
"""

__version__ = "0.2.0"

__all__ = ["functions", "get_spark"]


def get_spark(*args, **kwargs):
    from ult_spark.session import get_spark as _g

    return _g(*args, **kwargs)
