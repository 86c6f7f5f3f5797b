"""Remaining relational/temporal operator surface (SURVEY §2.4/2.5/2.6/2.7).

Each operator here is a thin, idiomatic DataFrame program; they exist as
named functions (not just query-catalog lambdas) so library users get the
same surface the queries exercise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ult_spark import functions as UF


def cell_range_join(points: DataFrame, ranges: DataFrame, point_cell: str = "cell") -> DataFrame:
    """J4: points ⋈ mixed-level index cells by descendant-range containment.

    ``ranges`` carries (lo, hi) from :func:`ult_spark.functions.cell_range`
    of compacted cells — contiguity of quadtree descendant ids makes the
    containment a pure BETWEEN (range join). Both sides range-partitioned by
    cell id when large ("range-partitioned shuffles keyed on cell id")."""
    return points.join(
        ranges, (F.col(point_cell) >= ranges.lo) & (F.col(point_cell) <= ranges.hi), "inner"
    )


def asof_join(
    left: DataFrame,
    versions: DataFrame,
    row_key: str,
    left_ts: str,
    ver_ts: str,
) -> DataFrame:
    """J5: attach the latest version row with ver_ts <= left_ts per left row.

    ``row_key`` uniquely identifies left rows. Small version side →
    broadcast conditional join + row_number pick (never a sort-merge of the
    big side)."""
    joined = left.join(F.broadcast(versions), F.col(ver_ts) <= F.col(left_ts), "left")
    order = Window.partitionBy(row_key).orderBy(F.desc(ver_ts))
    return joined.withColumn("_rn", F.row_number().over(order)).where(F.col("_rn") == 1).drop("_rn")


def sessionize(
    df: DataFrame, key: str, ts: str, gap_seconds: int, tiebreak: str | None = None
) -> DataFrame:
    """T4-as-batch: gaps-and-islands sessionization — new session when the
    gap to the previous event of ``key`` exceeds ``gap_seconds``.
    ``tiebreak`` makes the ordering total when timestamps collide."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    new_sess = F.when(
        prev.isNull() | (F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev) > gap_seconds), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
