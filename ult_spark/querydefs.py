"""Driver-contract query catalog: Spark implementations + DuckDB oracles.

Each entry pairs a ``(spark, sf_dir) -> DataFrame`` callable with an ANSI-SQL
string that DuckDB evaluates on the same parquet tables (SURVEY.md §5.5).
``__spark_entry__.queries()`` / ``oracle_sql()`` re-export these.

Determinism rules (the driver hash-compares values, so results must match
bit-for-bit between Spark and DuckDB):

- money/value aggregates go through ``floor(x * 10^k)`` integer conversion
  (floor is IEEE-exact; Spark/DuckDB ``round`` tie-break rules differ);
- DuckDB ``sum(BIGINT)`` returns HUGEINT → every oracle sum is wrapped in
  ``CAST(... AS BIGINT)`` to match Spark's long;
- no raw timestamps in outputs (epoch seconds as bigint instead);
- every ``LIMIT`` is preceded by a total ordering (ties broken by a key);
- rolled-up NULL keys are coalesced to sentinels in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.io.testdata import load

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# pinned integer conversions (see module docstring)
VAL_E4 = "CAST(floor(value * 10000) AS BIGINT)"


def val_e4(col: str = "value") -> F.Column:
    return F.floor(F.col(col) * 10000).cast("long")


def cents(col: str) -> F.Column:
    return F.floor(F.col(col) * 100).cast("long")


def cents_sql(col: str) -> str:
    return f"CAST(floor({col} * 100) AS BIGINT)"


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + the pinned deterministic lat/lon derivation (FIXTURES.md §A)."""
    return load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value",
        UF.event_lat().alias("lat"), UF.event_lon().alias("lon"),
    )


def _cell(level: int) -> str:
    return UF.cell_sql(UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level)


# ---------------------------------------------------------------------------
# C1: cell encode (native columns; oracle = same bit math in SQL)

@q("cell_encode_l12", f"SELECT event_id, {_cell(12)} AS cell FROM events")
def cell_encode_l12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_points(spark, sf_dir).select(
        "event_id", UF.latlon_to_cell("lat", "lon", 12).alias("cell")
    )


# A1: per-tile aggregate — native hash agg, partial+final via Catalyst

@q(
    "tile_agg_l8",
    f"SELECT {_cell(8)} AS cell, count(*) AS cnt, "
    f"CAST(sum({VAL_E4}) AS BIGINT) AS sum_val_e4 FROM events GROUP BY 1",
)
def tile_agg_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_points(spark, sf_dir)
        .withColumn("cell", UF.latlon_to_cell("lat", "lon", 8))
        .groupBy("cell")
        .agg(F.count("*").alias("cnt"), F.sum(val_e4()).alias("sum_val_e4"))
    )


# A3: multi-resolution pyramid rollup — re-aggregation of partials is exact
# because 4 complete quadtree siblings ⇔ 1 parent (SURVEY.md §1.2)

@q(
    "tile_pyramid",
    " UNION ALL ".join(
        f"SELECT {lvl} AS level, {_cell(lvl)} AS cell, count(*) AS cnt "
        f"FROM events GROUP BY 2"
        for lvl in (4, 6, 8)
    ),
)
def tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).withColumn(
        "cell", UF.latlon_to_cell("lat", "lon", 8)
    )
    finest = pts.groupBy("cell").agg(F.count("*").alias("cnt"))
    out = finest.select(F.lit(8).alias("level"), "cell", "cnt")
    cur = finest
    for lvl in (6, 4):
        cur = cur.groupBy(UF.cell_parent("cell", lvl).alias("cell")).agg(
            F.sum("cnt").alias("cnt")
        )
        out = out.unionByName(cur.select(F.lit(lvl).alias("level"), "cell", "cnt"))
    return out


# O1: global top-N hottest tiles (total ordering → deterministic limit cut)

@q(
    "top_tiles_l8",
    f"SELECT cell, cnt FROM (SELECT {_cell(8)} AS cell, count(*) AS cnt "
    f"FROM events GROUP BY 1) ORDER BY cnt DESC, cell ASC LIMIT 20",
)
def top_tiles_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_points(spark, sf_dir)
        .groupBy(UF.latlon_to_cell("lat", "lon", 8).alias("cell"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("cell"))
        .limit(20)
    )


# W3: dedup latest event per user (window rank)

@q(
    "latest_event_per_user",
    "SELECT user_id, event_id FROM events "
    "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id")
    )


# W1: top-k events per tile

@q(
    "topk_per_tile_l4",
    f"SELECT cell, event_id, rk FROM (SELECT {_cell(4)} AS cell, event_id, "
    f"row_number() OVER (PARTITION BY {_cell(4)} ORDER BY value DESC, event_id ASC) AS rk "
    f"FROM events) WHERE rk <= 3",
)
def topk_per_tile_l4(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).withColumn(
        "cell", UF.latlon_to_cell("lat", "lon", 4)
    )
    w = Window.partitionBy("cell").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        pts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("cell", "event_id", F.col("rk").cast("long").alias("rk"))
    )


# A4: rollup with grouping id

@q(
    "rollup_type_tile",
    f"SELECT coalesce(event_type, 'ALL') AS etype, coalesce(cell, -1) AS cell, "
    f"count(*) AS cnt, CAST(grouping(event_type, cell) AS BIGINT) AS gid "
    f"FROM (SELECT event_type, {_cell(4)} AS cell FROM events) "
    f"GROUP BY ROLLUP(event_type, cell)",
)
def rollup_type_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).select(
        "event_type", UF.latlon_to_cell("lat", "lon", 4).alias("cell")
    )
    return (
        pts.rollup("event_type", "cell")
        .agg(F.count("*").alias("cnt"), F.grouping_id().cast("long").alias("gid"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce("cell", F.lit(-1)).alias("cell"),
            "cnt",
            "gid",
        )
    )


# T2-shape on batch: tumbling hourly counts (epoch seconds, no raw timestamps)

@q(
    "hourly_counts",
    "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, "
    "event_type, count(*) AS cnt FROM events GROUP BY 1, 2",
)
def hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_start"),
            "event_type",
            "cnt",
        )
    )


# relational coverage: joins + aggregates on the TPC-H-ish tables

@q(
    "orders_status_agg",
    "SELECT o_orderstatus AS status, count(*) AS cnt, "
    f"CAST(sum({cents_sql('o_totalprice')}) AS BIGINT) AS total_cents "
    "FROM orders GROUP BY 1",
)
def orders_status_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("cnt"), F.sum(cents("o_totalprice")).alias("total_cents"))
    )


@q(
    "cust_nation_region",
    "SELECT r_name, n_name, count(*) AS cnt, "
    f"CAST(sum({cents_sql('c_acctbal')}) AS BIGINT) AS bal_cents "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2",
)
def cust_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("cnt"), F.sum(cents("c_acctbal")).alias("bal_cents"))
    )


@q(
    "top_customers",
    "SELECT c_custkey, "
    f"{cents_sql('c_acctbal')} AS bal_cents "
    "FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(10)
        .select("c_custkey", cents("c_acctbal").alias("bal_cents"))
    )


# O4: set ops — tiles seen for even event_ids but not odd ones

@q(
    "tiles_except",
    f"SELECT DISTINCT {_cell(6)} AS cell FROM events WHERE event_id % 2 = 0 "
    f"EXCEPT SELECT DISTINCT {_cell(6)} AS cell FROM events WHERE event_id % 2 = 1",
)
def tiles_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).withColumn(
        "cell", UF.latlon_to_cell("lat", "lon", 6)
    )
    even = pts.where(F.col("event_id") % 2 == 0).select("cell").distinct()
    odd = pts.where(F.col("event_id") % 2 == 1).select("cell").distinct()
    return even.subtract(odd)


# ---------------------------------------------------------------------------
# J1+J2: point-in-polygon join (broadcast compacted index + exact ray-cast).
# Oracle: brute-force crossing count over inlined polygon edges — the pinned
# edge rule is pure IEEE arithmetic so Spark NumPy and DuckDB agree exactly.

def _pip_oracle_cte() -> str:
    from ult_spark.geom.polyio import default_layer, edges_values_sql

    edges = edges_values_sql(list(default_layer()))
    return (
        f"WITH pts AS (SELECT event_id, value, {UF.EVENT_LAT_SQL} AS py, "
        f"{UF.EVENT_LON_SQL} AS px FROM events), "
        f"hits AS (SELECT event_id, poly_id, any_value(value) AS value FROM pts, {edges} "
        f"GROUP BY event_id, poly_id "
        f"HAVING sum(CASE WHEN (ey1 > py) != (ey2 > py) "
        f"AND px < (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1 "
        f"THEN 1 ELSE 0 END) % 2 = 1) "
    )


def _pip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.pip import pip_join

    return pip_join(events_points(spark, sf_dir), list(default_layer()))


@q("pip_join_events", _pip_oracle_cte() + "SELECT event_id, poly_id FROM hits")
def pip_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pip_points(spark, sf_dir).select("event_id", "poly_id")


@q(
    "pip_agg_by_poly",
    _pip_oracle_cte()
    + "SELECT poly_id, count(*) AS cnt, "
    f"CAST(sum({VAL_E4}) AS BIGINT) AS sum_val_e4 FROM hits GROUP BY 1",
)
def pip_agg_by_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pip_points(spark, sf_dir)
        .groupBy("poly_id")
        .agg(F.count("*").alias("cnt"), F.sum(val_e4()).alias("sum_val_e4"))
    )


@q(
    "pip_anti_count",
    _pip_oracle_cte()
    + "SELECT count(*) AS cnt FROM events WHERE event_id NOT IN (SELECT event_id FROM hits)",
)
def pip_anti_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.pip import pip_join

    anti = pip_join(events_points(spark, sf_dir), list(default_layer()), how="left_anti")
    return anti.agg(F.count("*").alias("cnt"))


# A7-shape on points: zonal tile aggregate per polygon at a finer cell level

@q(
    "pip_tiles_by_poly_l8",
    _pip_oracle_cte().replace(
        "SELECT event_id, value,", "SELECT event_id, value, user_id,"
    ).replace(
        "hits AS (SELECT event_id, poly_id, any_value(value) AS value FROM pts,",
        "hits AS (SELECT event_id, poly_id, any_value(value) AS value, "
        "any_value(py) AS py, any_value(px) AS px FROM pts,",
    )
    + f"SELECT poly_id, {UF.cell_sql('py', 'px', 8)} AS cell, count(*) AS cnt "
    "FROM hits GROUP BY 1, 2",
)
def pip_tiles_by_poly_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pip_points(spark, sf_dir)
        .groupBy("poly_id", UF.latlon_to_cell("lat", "lon", 8).alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


# A2: salted tile aggregate — same oracle as the unsalted plan, proving the
# two-stage skew-safe layout is result-identical (SURVEY.md §2.5)

@q(
    "salted_tile_agg_l8",
    f"SELECT {_cell(8)} AS cell, count(*) AS cnt, "
    f"CAST(sum({VAL_E4}) AS BIGINT) AS sum_val FROM events GROUP BY 1",
)
def salted_tile_agg_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.tiles import tile_agg

    pts = events_points(spark, sf_dir).withColumn(
        "cell", UF.latlon_to_cell("lat", "lon", 8)
    ).withColumn("v", val_e4())
    return tile_agg(pts, cell="cell", value="v", salt_by="event_id", salt_buckets=16)


# A3 via the pyramid operator (oracle shared shape with tile_pyramid)

@q(
    "pyramid_op",
    " UNION ALL ".join(
        f"SELECT {lvl} AS level, {_cell(lvl)} AS cell, count(*) AS cnt, "
        f"CAST(sum({VAL_E4}) AS BIGINT) AS sum_val FROM events GROUP BY 2"
        for lvl in (8, 6, 4)
    ),
)
def pyramid_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.tiles import pyramid, tile_agg

    pts = events_points(spark, sf_dir).withColumn(
        "cell", UF.latlon_to_cell("lat", "lon", 8)
    ).withColumn("v", val_e4())
    finest = tile_agg(pts, cell="cell", value="v")
    return pyramid(finest, [8, 6, 4], sum_cols=("cnt", "sum_val"))


# A5: exact distinct users per tile

@q(
    "distinct_users_per_tile_l6",
    f"SELECT {_cell(6)} AS cell, count(DISTINCT user_id) AS users FROM events GROUP BY 1",
)
def distinct_users_per_tile_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_points(spark, sf_dir)
        .groupBy(UF.latlon_to_cell("lat", "lon", 6).alias("cell"))
        .agg(F.countDistinct("user_id").alias("users"))
    )
