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


def time_bucket_gapfill(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Gap-filled time-bucket rollup (the TimescaleDB
    ``time_bucket_gapfill`` + ``locf`` shape, r4): per (key, bucket) counts
    with EVERY bucket in the key's [min, max] range present — missing
    buckets get cnt 0 plus a last-observation-carried-forward column.

    Relational end-to-end: one groupBy for the observed buckets, a tiny
    per-key min/max agg, a native ``sequence`` explode to synthesize the
    full bucket axis (rows = key × its own span — never a global cross
    join), a left join back, and one window for the LOCF. Buckets are
    integer hours (floor(unix/3600)) so the axis arithmetic is exact in
    both engines. At scale the explode output is O(keys × span), dwarfed
    by the input; the only input-sized shuffle is the first groupBy."""
    b = F.floor(F.unix_timestamp(F.col(ts)) / F.lit(bucket_s)).cast("long")
    obs = df.groupBy(F.col(key).alias("k"), b.alias("bucket")).agg(
        F.count("*").alias("_cnt")
    )
    span = obs.groupBy("k").agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    axis = span.select(
        "k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket")
    )
    w = Window.partitionBy("k").orderBy("bucket")
    return (
        axis.join(obs, ["k", "bucket"], "left")
        .select(
            F.col("k").alias(key),
            "bucket",
            F.coalesce("_cnt", F.lit(0)).alias("cnt"),
            F.last("_cnt", ignorenulls=True).over(w).alias("locf"),
        )
    )


def time_bucket_gapfill_sql(key: str = "event_type", bucket_s: int = 3600) -> str:
    """DuckDB mirror over the events view — same integer bucket axis via
    unnest(generate_series), same LOCF window."""
    return (
        "WITH obs AS (SELECT "
        f"{key} AS k, CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / {bucket_s}) AS BIGINT) AS bucket, "
        "count(*) AS _cnt FROM events GROUP BY 1, 2), "
        "span AS (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1), "
        "axis AS (SELECT k, unnest(generate_series(lo, hi)) AS bucket FROM span) "
        f"SELECT a.k AS {key}, a.bucket, CAST(coalesce(_cnt, 0) AS BIGINT) AS cnt, "
        "last_value(_cnt IGNORE NULLS) OVER "
        "(PARTITION BY a.k ORDER BY a.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf "
        "FROM axis a LEFT JOIN obs USING (k, bucket)"
    )
