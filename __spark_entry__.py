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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ult_spark.querydefs import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ult_spark.querydefs import ORACLES

    return dict(ORACLES)
