"""Count-min sketch over a keyed event stream, with an exact-vs-estimate
audit — the heavy-hitter memory-bound counter (Cormode & Muthukrishnan
2005). BASELINE.json is the spec (the reference repo is empty, SURVEY.md
§0); HLL distinct sketches live in querydefs (approx_users_per_tile_l6).

The sketch is d hash rows × w buckets of ADDITIVE counters, so it builds
in ONE pass as d partial-agg groupBys folded into a single
explode(d)+groupBy((row, bucket)) — at 100 TB the shuffle carries at most
d·w rows per map partition (the sketch, not the data), and merging
sketches across executors is the same counter addition Spark's partial
aggregation already does. Estimates only ever OVERCOUNT (collisions add,
never subtract): est(k) = min over rows of the k-bucket counter, and
est ≥ exact is a theorem the audit query asserts row by row.

Hash rows are the cross-engine-pinned md5 56-bit lanes at different hex
offsets (textops._h56 ≡ DuckDB ('0x'||substr(md5(x),o,14))::bigint), so
both engines build the IDENTICAL sketch — the oracle certifies counter
values, not just statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ult_spark.ops.textops import _h56

DEFAULT_D = 4
DEFAULT_W = 64


def _lane(col, d: int, w: int):
    """Row-d bucket of ``col``: md5 hex lane at offset 2d+1, mod w."""
    return F.pmod(_h56(col, 2 * d + 1), F.lit(w)).cast("long")


def countmin_estimates(
    df: DataFrame,
    key: str,
    top: int = 20,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(key, exact, est, overcount) for the exact top-``top`` keys by
    frequency (total order: count DESC, key ASC — LIMIT-safe), where
    ``est`` is the count-min estimate from a ``d``×``w`` sketch built
    over the same input. ``overcount = est − exact ≥ 0`` measures
    collision pressure at this width: size w ≥ e/ε for ε·N additive
    error (w=64 here keeps collisions visible at test scale on purpose).

    Plan: one explode(d)+groupBy for the sketch (≤ d·w rows out of the
    shuffle regardless of input size), one exact groupBy + top-k window
    (the heavy-hitter probe set), then a broadcast-able (row, bucket)
    join and a per-key min — the probe side is ``top``·d rows."""
    k = F.col(key).cast("string")
    lanes = F.array(
        *[
            F.struct(F.lit(i).alias("d"), _lane(k, i, w).alias("bucket"))
            for i in range(d)
        ]
    )
    sk = (
        df.select(F.explode(lanes).alias("l"))
        .groupBy(F.col("l.d").alias("d"), F.col("l.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    exact = df.groupBy(k.alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    tw = Window.orderBy(F.desc("exact"), F.asc("key"))
    probe = (
        exact.withColumn("rk", F.row_number().over(tw))
        .where(F.col("rk") <= top)
        .select(
            "key",
            "exact",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("d"),
                            _lane(F.col("key"), i, w).alias("bucket"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("l"),
        )
        .select("key", "exact", F.col("l.d").alias("d"), F.col("l.bucket").alias("bucket"))
    )
    return (
        probe.join(sk, ["d", "bucket"])
        .groupBy("key", "exact")
        .agg(F.min("cnt").cast("long").alias("est"))
        .select("key", "exact", "est", (F.col("est") - F.col("exact")).alias("overcount"))
    )


def countmin_estimates_sql(
    table: str, key: str, top: int = 20, d: int = DEFAULT_D, w: int = DEFAULT_W
) -> str:
    lane = (
        lambda col, i: f"(('0x' || substr(md5({col}), {2 * i + 1}, 14))::BIGINT % {w} + {w}) % {w}"
    )
    lanes_src = " UNION ALL ".join(
        f"SELECT {i} AS d, {lane(f'CAST({key} AS VARCHAR)', i)} AS bucket FROM {table}"
        for i in range(d)
    )
    probe_lanes = " UNION ALL ".join(
        f"SELECT key, exact, {i} AS d, {lane('key', i)} AS bucket FROM topk"
        for i in range(d)
    )
    return (
        f"WITH sk AS MATERIALIZED (SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM ({lanes_src}) GROUP BY 1, 2), "
        f"exact AS MATERIALIZED (SELECT CAST({key} AS VARCHAR) AS key, "
        f"CAST(count(*) AS BIGINT) AS exact FROM {table} GROUP BY 1), "
        f"topk AS MATERIALIZED (SELECT key, exact FROM (SELECT key, exact, "
        f"row_number() OVER (ORDER BY exact DESC, key ASC) AS rk FROM exact) "
        f"WHERE rk <= {top}), "
        f"probe AS (SELECT key, exact, d, bucket FROM ({probe_lanes})) "
        "SELECT p.key, p.exact, CAST(min(sk.cnt) AS BIGINT) AS est, "
        "CAST(min(sk.cnt) - p.exact AS BIGINT) AS overcount "
        "FROM probe p JOIN sk USING (d, bucket) GROUP BY 1, 2"
    )
