"""Flagship pipeline assembly (SURVEY.md §3 E1/E2).

v0 flagship: derive deterministic coordinates for the events table, encode
cells at the working resolution, aggregate per tile with a pyramid rollup,
and rank the hottest tiles. Upgraded to the full pages→extract→PIP→salted-agg
pipeline as those stages land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.querydefs import events_points, val_e4


def flagship(spark: SparkSession, sf_dir: str, level: int = 8) -> DataFrame:
    pts = events_points(spark, sf_dir)
    tiles = (
        pts.withColumn("cell", UF.latlon_to_cell("lat", "lon", level))
        .groupBy("cell")
        .agg(F.count("*").alias("cnt"), F.sum(val_e4()).alias("sum_val_e4"))
    )
    return tiles.orderBy(F.desc("cnt"), F.asc("cell")).limit(50)
