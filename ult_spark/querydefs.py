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
from ult_spark.io.testdata import fanout, load

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
    """events + the pinned deterministic lat/lon derivation (FIXTURES.md §A).

    r8 note: deliberately NOT fanned out. Measured at sf1.0: fanout here
    made every consumer WORSE (tile_agg 0.59→2.4 s, cell_range_join
    1.1→12.7 s) — the lat/lon+cell bit math is cheap per row, and the
    single-task scan means map-side partial aggregation collapses each
    downstream groupBy to one partial per key, so the following shuffles
    were near-free; fanning out multiplied the partial-agg shuffle rows by
    the partition count. Fan-out is reserved for md5-heavy chains
    (guide §1.2: fix the algorithm where the cost actually is).
    """
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


@q("pip_join_events_dist", _pip_oracle_cte() + "SELECT event_id, poly_id FROM hits")
def pip_join_events_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-layer PIP twin (ops/pip.py pip_join_df): cluster-side
    polyfill + shuffle joins, nothing broadcast — same oracle as
    pip_join_events because the semantics are identical."""
    from ult_spark.geom.polyio import default_layer, to_dataframe
    from ult_spark.ops.pip import pip_join_df

    layer_df = to_dataframe(spark, list(default_layer()))
    return pip_join_df(events_points(spark, sf_dir), layer_df).select(
        "event_id", "poly_id"
    )


def _pip_depth_oracle() -> str:
    from ult_spark.geom.polyio import default_layer, edges_values_sql

    edges = edges_values_sql(list(default_layer()))
    vx, vy = "(e2.ex2 - e2.ex1)", "(e2.ey2 - e2.ey1)"
    denom = f"({vx} * {vx} + {vy} * {vy})"
    traw = f"(((p.px - e2.ex1) * {vx} + (p.py - e2.ey1) * {vy}) / {denom})"
    t = (
        f"(CASE WHEN {denom} = 0.0 THEN 0.0::DOUBLE "
        f"ELSE least(greatest({traw}, 0.0::DOUBLE), 1.0::DOUBLE) END)"
    )
    d = (
        f"sqrt((p.px - (e2.ex1 + {t} * {vx})) * (p.px - (e2.ex1 + {t} * {vx})) "
        f"+ (p.py - (e2.ey1 + {t} * {vy})) * (p.py - (e2.ey1 + {t} * {vy})))"
    )
    return _pip_oracle_cte() + (
        f"SELECT h.event_id, h.poly_id, CAST(floor(min({d}) * 1000000) AS BIGINT) AS depth_e6 "
        f"FROM hits h JOIN pts p ON p.event_id = h.event_id "
        f"JOIN (SELECT * FROM {edges}) e2 ON e2.poly_id = h.poly_id GROUP BY 1, 2"
    )


@q("pip_depth_events", None)
def pip_depth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP join + distance-to-boundary (r4, ops/pip.py pip_depth_join):
    per matched event, how deep inside its polygon it sits — floor(1e6 ×
    min point-segment distance over the polygon's edges), computed as one
    extra row-local HOF column on the standard two-broadcast PIP plan."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.pip import pip_depth_join

    return pip_depth_join(events_points(spark, sf_dir), list(default_layer())).select(
        "event_id", "poly_id", "depth_e6"
    )


ORACLES["pip_depth_events"] = _pip_depth_oracle()


def _poly_distance_oracle(radius: float) -> str:
    from ult_spark.geom.polyio import default_layer, edges_values_sql

    edges = edges_values_sql(list(default_layer()))
    vx, vy = "(ex2 - ex1)", "(ey2 - ey1)"
    denom = f"({vx} * {vx} + {vy} * {vy})"
    traw = f"(((p.px - ex1) * {vx} + (p.py - ey1) * {vy}) / {denom})"
    t = (
        f"(CASE WHEN {denom} = 0.0 THEN 0.0::DOUBLE "
        f"ELSE least(greatest({traw}, 0.0::DOUBLE), 1.0::DOUBLE) END)"
    )
    d = (
        f"sqrt((p.px - (ex1 + {t} * {vx})) * (p.px - (ex1 + {t} * {vx})) "
        f"+ (p.py - (ey1 + {t} * {vy})) * (p.py - (ey1 + {t} * {vy})))"
    )
    return (
        f"WITH pts AS (SELECT event_id, {UF.EVENT_LAT_SQL} AS py, "
        f"{UF.EVENT_LON_SQL} AS px FROM events), "
        f"pe AS (SELECT p.event_id, poly_id, "
        "sum(CASE WHEN (ey1 > p.py) != (ey2 > p.py) "
        "AND p.px < (ex2 - ex1) * (p.py - ey1) / (ey2 - ey1) + ex1 "
        "THEN 1 ELSE 0 END) % 2 = 1 AS inside, "
        f"min({d}) AS mind FROM pts p, {edges} GROUP BY 1, 2) "
        "SELECT event_id, poly_id, CAST(floor((CASE WHEN inside THEN 0.0::DOUBLE "
        "ELSE mind END) * 1000000) AS BIGINT) AS dist_e6 "
        f"FROM pe WHERE CAST(floor((CASE WHEN inside THEN 0.0::DOUBLE "
        f"ELSE mind END) * 1000000) AS BIGINT) <= {int(radius * 1_000_000)}"
    )


@q("poly_distance_events", None)
def poly_distance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_DWithin against the polygon layer (r4, ops/pip.py
    poly_distance_join): every (event, polygon) pair within 3° — 0 inside,
    else min point-segment boundary distance; candidates from the
    radius-dilated cover (hash join), exact refine drops the slack."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.pip import poly_distance_join

    return poly_distance_join(
        events_points(spark, sf_dir), list(default_layer()), radius=3.0
    ).select("event_id", "poly_id", "dist_e6")


@q("poly_distance_dist", None)
def poly_distance_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-layer ST_DWithin twin (r4, ops/pip.py
    poly_distance_join_df): cluster-side dilated cover, shuffle joins,
    nothing broadcast — same oracle, bit-identical results."""
    from ult_spark.geom.polyio import default_layer, to_dataframe
    from ult_spark.ops.pip import poly_distance_join_df

    return poly_distance_join_df(
        events_points(spark, sf_dir),
        to_dataframe(spark, list(default_layer())),
        radius=3.0,
    ).select("event_id", "poly_id", "dist_e6")


ORACLES["poly_distance_events"] = _poly_distance_oracle(3.0)
ORACLES["poly_distance_dist"] = ORACLES["poly_distance_events"]


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

    anti = pip_join(
        events_points(spark, sf_dir),
        list(default_layer()),
        how="left_anti",
        id_cols=["event_id"],
    )
    return anti.agg(F.count("*").alias("cnt"))


# J-family: polygon-polygon intersects join (round-1 verdict missing #3) —
# default layer vs a deterministically shifted copy; overlapping, nested,
# and disjoint pairs all occur. Result depends only on the pinned layers
# (the operator is layer x layer), so the oracle inlines the same inputs.

@q("poly_intersect", None)
def poly_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.geom.polyio import default_layer, shifted_layer
    from ult_spark.ops.polyjoin import poly_intersect_join

    a = list(default_layer())
    return poly_intersect_join(spark, a, shifted_layer(a, 2.0, 3.0))


@q("poly_intersect_area", None)
def poly_intersect_area_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlay beyond boolean intersects (round-2 verdict #4): exact
    Green's-theorem intersection area over clipped edges, quantized per edge
    at 1e6 (ops/polyarea.py pinned rule), same two deterministic layers as
    poly_intersect."""
    from ult_spark.geom.polyio import default_layer, shifted_layer
    from ult_spark.ops.polyarea import poly_intersect_area

    a = list(default_layer())
    return poly_intersect_area(spark, a, shifted_layer(a, 2.0, 3.0))


@q("poly_props", None)
def poly_props_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-polygon ST_Area/ST_Centroid/ST_Perimeter/ST_Envelope surface
    (r4, ops/polyarea.py poly_props): deg² and geodesic-m² areas,
    Green's-theorem centroid from two integer sums, perimeter, bbox — all
    e6-quantized per edge before any sum."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.polyarea import poly_props

    return poly_props(spark, list(default_layer()))


@q("poly_area_m2", None)
def poly_area_m2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic intersection areas (r4): integer SQUARE METRES via the
    cos(lat)-weighted Green integral (ops/polyarea.py _seg_green_m2) — the
    area twin of the `_m` distance operators."""
    from ult_spark.geom.polyio import default_layer, shifted_layer
    from ult_spark.ops.polyarea import poly_intersect_area_m2

    a = list(default_layer())
    return poly_intersect_area_m2(spark, a, shifted_layer(a, 2.0, 3.0))


@q("union_area_m2", None)
def union_area_m2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic union (dissolve) area of the pinned layer in square metres
    (r4, ops/polyarea.py union_area_m2)."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.polyarea import union_area_m2

    return union_area_m2(spark, list(default_layer()))


@q("poly_intersect_area_dist", None)
def poly_intersect_area_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-layer twin (r4, ops/polyarea.py poly_intersect_area_df):
    covers + oriented arrays built cluster-side, shuffle joins only — same
    oracle as poly_intersect_area because results are bit-identical."""
    from ult_spark.geom.polyio import default_layer, shifted_layer, to_dataframe
    from ult_spark.ops.polyarea import poly_intersect_area_df

    a = list(default_layer())
    return poly_intersect_area_df(
        to_dataframe(spark, a), to_dataframe(spark, list(shifted_layer(a, 2.0, 3.0)))
    )


@q("union_area_dist", None)
def union_area_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-layer union (dissolve) area (r4, union_area_df): the
    same depth-aware boundary integral with the layer delivered as a
    DataFrame and nothing broadcast."""
    from ult_spark.geom.polyio import default_layer, to_dataframe
    from ult_spark.ops.polyarea import union_area_df

    return union_area_df(to_dataframe(spark, list(default_layer())))


@q("buffer_cells_l6", None)
def buffer_cells_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid buffer (r3 overlay family): each pinned polygon's L6 cover
    dilated by a 2-cell Chebyshev disk (ops/buffer.py — morphological
    dilation, the cell-native buffer)."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.buffer import buffer_cells

    return buffer_cells(spark, list(default_layer()), level=6, k=2)


@q("coverage_boundary_l6", None)
def coverage_boundary_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary sides of each polygon's L6 cover (r3 vectorize-inverse:
    O(perimeter) output via one explode + one left_anti self-join,
    ops/buffer.py coverage_boundary)."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.buffer import coverage_boundary
    from ult_spark.ops.pip import build_cell_index

    base = build_cell_index(spark, list(default_layer()), 6).select(
        "poly_id", F.col("icell").alias("cell")
    )
    return coverage_boundary(base, level=6)


def _attach_buffer_oracle() -> None:
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.buffer import buffer_cells_sql, coverage_boundary_sql

    ORACLES["buffer_cells_l6"] = buffer_cells_sql(list(default_layer()), level=6, k=2)
    ORACLES["coverage_boundary_l6"] = coverage_boundary_sql(list(default_layer()), level=6)


_attach_buffer_oracle()


@q("union_area_layer", None)
def union_area_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union (dissolve) area of the whole pinned layer (r3): depth-aware
    Green's boundary integral — only edge portions inside NO other polygon
    count, half-weight on shared boundaries (ops/polyarea.py union_area)."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.polyarea import union_area

    return union_area(spark, list(default_layer()))


def _attach_poly_area_oracle() -> None:
    from ult_spark.geom.polyio import default_layer, shifted_layer
    from ult_spark.ops.polyarea import poly_intersect_area_sql, union_area_sql

    a = list(default_layer())
    ORACLES["poly_intersect_area"] = poly_intersect_area_sql(a, shifted_layer(a, 2.0, 3.0))
    ORACLES["union_area_layer"] = union_area_sql(a)
    # the distributed twins are bit-identical by construction — same oracles
    ORACLES["poly_intersect_area_dist"] = ORACLES["poly_intersect_area"]
    ORACLES["union_area_dist"] = ORACLES["union_area_layer"]
    from ult_spark.ops.polyarea import (
        poly_intersect_area_m2_sql,
        union_area_m2_sql,
    )

    ORACLES["poly_area_m2"] = poly_intersect_area_m2_sql(a, shifted_layer(a, 2.0, 3.0))
    ORACLES["union_area_m2"] = union_area_m2_sql(a)
    from ult_spark.ops.polyarea import poly_props_sql

    ORACLES["poly_props"] = poly_props_sql(a)


_attach_poly_area_oracle()


def _attach_poly_intersect_oracle() -> None:
    from ult_spark.geom.polyio import default_layer, shifted_layer
    from ult_spark.ops.polyjoin import poly_intersect_sql

    a = list(default_layer())
    ORACLES["poly_intersect"] = poly_intersect_sql(a, shifted_layer(a, 2.0, 3.0))


_attach_poly_intersect_oracle()


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


# §2.10 UDTF: bbox → covering cells as a SQL table function; the oracle
# mirrors the grid arithmetic with generate_series × generate_series so the
# UDTF's inlined Morton copy can never drift from the pinned encoding
# unnoticed (workflow rule: every operator ships with an oracle pair).

_BBOX = (-31.7, 12.4, 100.2, 151.9, 7)


@q("bbox_cover_l7", None)
def bbox_cover_l7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.tablefuncs import register_table_functions

    register_table_functions(spark)
    la0, la1, lo0, lo1, lvl = _BBOX
    return spark.sql(
        f"SELECT cell, x, y FROM bbox_cover({la0}, {la1}, {lo0}, {lo1}, {lvl})"
    )


def _attach_bbox_cover_oracle() -> None:
    la0, la1, lo0, lo1, lvl = _BBOX
    x0, x1 = UF.grid_x_sql(str(lo0), lvl), UF.grid_x_sql(str(lo1), lvl)
    y0, y1 = UF.grid_y_sql(str(la0), lvl), UF.grid_y_sql(str(la1), lvl)
    ORACLES["bbox_cover_l7"] = (
        f"SELECT {UF.xy_cell_sql('x', 'y', lvl)} AS cell, x, y "
        f"FROM (SELECT unnest(generate_series({x0}, {x1})) AS x), "
        f"(SELECT unnest(generate_series({y0}, {y1})) AS y)"
    )


_attach_bbox_cover_oracle()


# A-family: focal (neighborhood) statistics — 3x3 kernel count smoothing
# over the L6 tile grid (x wraps, y clamps; ops/tiles.py focal_agg)

@q("focal_counts_l6", None)
def focal_counts_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.tiles import focal_agg

    return focal_agg(events_points(spark, sf_dir), level=6, k=1)


def _attach_focal_oracle() -> None:
    from ult_spark.ops.tiles import focal_agg_sql

    ORACLES["focal_counts_l6"] = focal_agg_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6, k=1
    )


_attach_focal_oracle()


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


# ---------------------------------------------------------------------------
# J3: kNN join via cell-ring expansion; J9: distance join.
# Metric: squared planar degrees (IEEE-exact in both engines; SURVEY §2.4).

KNN_QPTS = [(1, 20.0, -100.0), (2, -20.0, -30.0), (3, 10.0, 60.0),
            (4, -35.0, 130.0), (5, 48.0, 2.0)]
_KNN_VALUES = ", ".join(f"({i}, {la}, {lo})" for i, la, lo in KNN_QPTS)
_SQD = "(qlat - lat) * (qlat - lat) + (qlon - lon) * (qlon - lon)"


@q(
    "knn_events_k5",
    f"WITH q(qid, qlat, qlon) AS (VALUES {_KNN_VALUES}), "
    f"pts AS (SELECT event_id, {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon FROM events) "
    f"SELECT qid, event_id, sq_dist, rk FROM ("
    f"SELECT qid, event_id, {_SQD} AS sq_dist, "
    f"CAST(row_number() OVER (PARTITION BY qid ORDER BY {_SQD} ASC, event_id ASC) AS BIGINT) AS rk "
    f"FROM q, pts) WHERE rk <= 5",
)
def knn_events_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.knn import knn_join

    qpts = spark.createDataFrame(KNN_QPTS, "qid long, qlat double, qlon double")
    pts = events_points(spark, sf_dir).select("event_id", "lat", "lon")
    # explicit start_radius (round-2 ADVICE #3): the None default runs an
    # eager density count() at plan-construction time; results are exact
    # under ANY radius, so hot-path queries pin one (1 = the density-derived
    # value at the bench scale sf0.1; exactness holds at any sf, stragglers
    # fall to the outer disk or the brute fallback)
    return knn_join(qpts, pts, k=5, did="event_id", start_radius=1).select(
        "qid", "event_id", "sq_dist", "rk"
    )


# J3 geodesic variant: rank by great-circle METERS (round-1 verdict missing
# #2 — nearest-by-degrees != nearest-by-meters at high latitude). The
# haversine expression below is the operation-for-operation mirror of
# ult_spark.functions.haversine_m; JVM and libm agree to the last ulp on it
# at these magnitudes (precedent: haversine_to_origin hash-green r1).
_HAV = (
    "((2.0 * 6371008.8) * asin(sqrt("
    "sin(radians(lat - qlat) / 2) * sin(radians(lat - qlat) / 2) "
    "+ cos(radians(qlat)) * cos(radians(lat)) "
    "* sin(radians(lon - qlon) / 2) * sin(radians(lon - qlon) / 2))))"
)


@q(
    "knn_events_k5_m",
    f"WITH q(qid, qlat, qlon) AS (VALUES {_KNN_VALUES}), "
    f"pts AS (SELECT event_id, {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon FROM events) "
    f"SELECT qid, event_id, dist_mm, rk FROM ("
    f"SELECT qid, event_id, CAST(floor({_HAV} * 1000) AS BIGINT) AS dist_mm, "
    f"CAST(row_number() OVER (PARTITION BY qid ORDER BY {_HAV} ASC, event_id ASC) AS BIGINT) AS rk "
    f"FROM q, pts) WHERE rk <= 5",
)
def knn_events_k5_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.knn import knn_join

    qpts = spark.createDataFrame(KNN_QPTS, "qid long, qlat double, qlon double")
    pts = events_points(spark, sf_dir).select("event_id", "lat", "lon")
    res = knn_join(qpts, pts, k=5, did="event_id", metric="haversine_m", start_radius=1)
    return res.select(
        "qid",
        "event_id",
        F.floor(F.col("dist_m") * 1000).cast("long").alias("dist_mm"),
        "rk",
    )


# J3 antimeridian variant: wrapped planar metric, query points ON the seam
# (round-1 verdict missing #1 / next-round #7)

KNN_WRAP_QPTS = [(1, 10.0, 179.9), (2, -30.0, -179.9), (3, 0.0, 179.99)]
_KNN_WRAP_VALUES = ", ".join(f"({i}, {la}, {lo})" for i, la, lo in KNN_WRAP_QPTS)
_SQDW = (
    "((qlat - lat) * (qlat - lat) "
    "+ least(abs(qlon - lon), 360.0 - abs(qlon - lon)) "
    "* least(abs(qlon - lon), 360.0 - abs(qlon - lon)))"
)


@q(
    "knn_events_wrap",
    f"WITH q(qid, qlat, qlon) AS (VALUES {_KNN_WRAP_VALUES}), "
    f"pts AS (SELECT event_id, {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon FROM events) "
    f"SELECT qid, event_id, sq_dist, rk FROM ("
    f"SELECT qid, event_id, {_SQDW} AS sq_dist, "
    f"CAST(row_number() OVER (PARTITION BY qid ORDER BY {_SQDW} ASC, event_id ASC) AS BIGINT) AS rk "
    f"FROM q, pts) WHERE rk <= 5",
)
def knn_events_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.knn import knn_join

    qpts = spark.createDataFrame(KNN_WRAP_QPTS, "qid long, qlat double, qlon double")
    pts = events_points(spark, sf_dir).select("event_id", "lat", "lon")
    return knn_join(qpts, pts, k=5, did="event_id", metric="sq_deg_wrap", start_radius=1).select(
        "qid", "event_id", "sq_dist", "rk"
    )


@q(
    "distance_join_errors",
    f"WITH err AS (SELECT event_id, {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon "
    f"FROM events WHERE event_type = 'error') "
    f"SELECT a.event_id AS lid, b.event_id AS rid FROM err a, err b "
    f"WHERE a.event_id < b.event_id AND "
    f"(a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) <= 0.25",
)
def distance_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.knn import distance_join

    err = (
        events_points(spark, sf_dir)
        .where(F.col("event_type") == "error")
        .select("event_id", "lat", "lon")
    )
    left = err.select(F.col("event_id").alias("lid"), F.col("lat").alias("llat"), F.col("lon").alias("llon"))
    right = err.select(F.col("event_id").alias("rid"), F.col("lat").alias("rlat"), F.col("lon").alias("rlon"))
    return (
        distance_join(left, right, radius_deg=0.5)
        .where(F.col("lid") < F.col("rid"))
        .select("lid", "rid")
    )


# J9 geodesic variant: all error-event pairs within 150 km great-circle
# distance (latitude-aware candidate cells, wrap-correct; ops/knn.py
# distance_join_m). Haversine mirror identical to _HAV but pair-named.

_HAV_AB = (
    "((2.0 * 6371008.8) * asin(sqrt("
    "sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2) "
    "+ cos(radians(a.lat)) * cos(radians(b.lat)) "
    "* sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2))))"
)


@q(
    "distance_join_errors_m",
    f"WITH err AS (SELECT event_id, {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon "
    f"FROM events WHERE event_type = 'error') "
    f"SELECT a.event_id AS lid, b.event_id AS rid, "
    f"CAST(floor({_HAV_AB}) AS BIGINT) AS dist_floor_m FROM err a, err b "
    f"WHERE a.event_id < b.event_id AND {_HAV_AB} <= 150000.0",
)
def distance_join_errors_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.knn import distance_join_m

    err = (
        events_points(spark, sf_dir)
        .where(F.col("event_type") == "error")
        .select("event_id", "lat", "lon")
    )
    left = err.select(F.col("event_id").alias("lid"), F.col("lat").alias("llat"), F.col("lon").alias("llon"))
    right = err.select(F.col("event_id").alias("rid"), F.col("lat").alias("rlat"), F.col("lon").alias("rlon"))
    return (
        distance_join_m(left, right, radius_m=150000.0)
        .where(F.col("lid") < F.col("rid"))
        .select("lid", "rid", F.floor("dist_m").cast("long").alias("dist_floor_m"))
    )


# ---------------------------------------------------------------------------
# A7/A8: raster↔vector. The raster is synthesized identically in both engines
# (pinned integer formula), so zonal stats get full value parity.

def _zonal_oracle() -> str:
    from ult_spark.geom.polyio import default_layer, edges_values_sql
    from ult_spark.geom.raster import pixel_center_sql, raster_sql

    lat, lon = pixel_center_sql()
    edges = edges_values_sql(list(default_layer()))
    return (
        f"WITH raster AS ({raster_sql()}), "
        f"pts AS (SELECT row, col, value, CAST(floor(value * 10000) AS BIGINT) AS v_e4, "
        f"{lat} AS py, {lon} AS px FROM raster), "
        f"hits AS (SELECT row, col, poly_id, any_value(value) AS value, "
        f"any_value(v_e4) AS v_e4 FROM pts, {edges} GROUP BY row, col, poly_id "
        f"HAVING sum(CASE WHEN (ey1 > py) != (ey2 > py) "
        f"AND px < (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1 THEN 1 ELSE 0 END) % 2 = 1) "
        f"SELECT poly_id, count(*) AS cnt, CAST(sum(v_e4) AS BIGINT) AS sum_e4, "
        f"min(value) AS vmin, max(value) AS vmax, "
        f"CAST(sum(v_e4) AS BIGINT) / count(*) / 10000.0 AS vmean FROM hits GROUP BY 1"
    )


@q("zonal_stats_pop", _zonal_oracle())
def zonal_stats_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.geom.polyio import default_layer
    from ult_spark.geom.raster import synth_raster
    from ult_spark.ops.zonal import zonal_stats

    return zonal_stats(synth_raster(spark), list(default_layer()))


@q("zonal_weighted_pop", None)
def zonal_weighted_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AREA-WEIGHTED zonal stats (r3 overlay follow-up): each pixel
    contributes in proportion to the exact area of its rectangle clipped
    to the polygon — boundary pixels split instead of whole-assigned
    (ops/zonal.py zonal_weighted, built on the polyarea clipping kernel)."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.geom.raster import synth_raster
    from ult_spark.ops.zonal import zonal_weighted

    return zonal_weighted(synth_raster(spark), list(default_layer()))


@q("zonal_weighted_dist", None)
def zonal_weighted_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-layer twin of zonal_weighted_pop (r4): zone layer as a
    packed-ring DataFrame, cluster-side cover + oriented arrays + native
    array bboxes, shuffle hash join on the cell key — same oracle because
    results are bit-identical (ops/zonal.py zonal_weighted_df)."""
    from ult_spark.geom.polyio import default_layer, to_dataframe
    from ult_spark.geom.raster import synth_raster
    from ult_spark.ops.zonal import zonal_weighted_df

    return zonal_weighted_df(
        synth_raster(spark), to_dataframe(spark, list(default_layer()))
    )


@q("buffer_cells_dist", None)
def buffer_cells_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-layer grid buffer (r4, ops/buffer.py buffer_cells_df):
    cluster-side polyfill cover + the identical dilation stage — same
    oracle as buffer_cells_l6."""
    from ult_spark.geom.polyio import default_layer, to_dataframe
    from ult_spark.ops.buffer import buffer_cells_df

    return buffer_cells_df(to_dataframe(spark, list(default_layer())), level=6, k=2)


def _attach_zonal_weighted_oracle() -> None:
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.zonal import zonal_weighted_sql

    ORACLES["zonal_weighted_pop"] = zonal_weighted_sql(list(default_layer()))
    ORACLES["zonal_weighted_dist"] = ORACLES["zonal_weighted_pop"]
    ORACLES["buffer_cells_dist"] = ORACLES["buffer_cells_l6"]


_attach_zonal_weighted_oracle()


@q(
    "rasterize_tiles_l6",
    "SELECT x, y, count(*) AS value FROM (SELECT "
    f"greatest(0, least(CAST(floor((({UF.EVENT_LON_SQL}) + 180.0) / 360.0 * 64.0) AS BIGINT), 63)) AS x, "
    f"greatest(0, least(CAST(floor((({UF.EVENT_LAT_SQL}) + 90.0) / 180.0 * 64.0) AS BIGINT), 63)) AS y "
    "FROM events) GROUP BY 1, 2",
)
def rasterize_tiles_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.tiles import tile_agg
    from ult_spark.ops.zonal import rasterize

    tiles = tile_agg(
        events_points(spark, sf_dir).withColumn("cell", UF.latlon_to_cell("lat", "lon", 6))
    )
    return rasterize(tiles, level=6, value="cnt")


# ---------------------------------------------------------------------------
# Webtext / training-data ops over `documents` + `embeddings` (task brief):
# dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), text analysis
# (lang-id, quality, token count, fingerprint), similarity search (ANN).

def _doc(fn_name):
    def loader(spark, sf_dir):
        import ult_spark.ops.textops as T

        return getattr(T, fn_name)(load(spark, sf_dir, "documents"))

    return loader


def _textops_sql(name):
    import ult_spark.ops.textops as T

    return getattr(T, name)


q("dedup_exact", _textops_sql("DEDUP_EXACT_SQL"))(_doc("dedup_exact"))
q("token_count", _textops_sql("TOKEN_COUNT_SQL"))(_doc("token_count"))
q("bpe_token_count", _textops_sql("BPE_TOKEN_COUNT_SQL"))(_doc("bpe_token_count"))
q("doc_fingerprint", _textops_sql("FINGERPRINT_SQL"))(_doc("fingerprint"))
q("quality_score", _textops_sql("QUALITY_SQL"))(_doc("quality_score"))
q("simhash32", _textops_sql("simhash_sql")())(_doc("simhash"))
q("winnowing_fp", _textops_sql("winnowing_sql")())(_doc("winnowing_fingerprints"))
q("lang_id", _textops_sql("lang_id_sql")())(_doc("lang_id"))


@q("minhash_lsh_pairs", None)  # oracle attached below (generated SQL)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.textops import minhash_lsh_dedup

    return minhash_lsh_dedup(load(spark, sf_dir, "documents"), threshold=0.2)


@q("simhash_near_dup", None)
def simhash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-banded simhash pair search (pigeonhole: hamming<=3 over 4x8-bit
    chunks never misses); ops/textops.py simhash_near_dup."""
    from ult_spark.ops.textops import simhash_near_dup

    return simhash_near_dup(load(spark, sf_dir, "documents"), max_hamming=3)


@q("ngram_jaccard_pairs", None)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.textops import jaccard_pairs, shingles

    return jaccard_pairs(shingles(load(spark, sf_dir, "documents")), None, threshold=0.1)


@q("tfidf_top_terms", None)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document salient terms by tf-idf (r3 curation op): exact integer
    tf/dfreq, pinned ln idf, floored e6 scores, deterministic ties
    (ops/textops.py tfidf_top_terms)."""
    from ult_spark.ops.textops import tfidf_top_terms

    return tfidf_top_terms(load(spark, sf_dir, "documents"), k=3)


@q("dup_clusters", None)
def dup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (r3): connected components of the minhash pair
    graph via min-label propagation + pointer jumping in one lazy plan;
    oracle = the true WITH RECURSIVE fixpoint (ops/textops.py
    dup_clusters)."""
    from ult_spark.ops.textops import dup_clusters

    return dup_clusters(load(spark, sf_dir, "documents"), threshold=0.2)


@q("dup_keep_best", None)
def dup_keep_best_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-canonical near-dup retention (r6): per duplicate cluster keep
    the argmax-token-count representative (tie: min doc_id), emit keep/drop
    + reason for every document (ops/textops.py dup_keep_best)."""
    from ult_spark.ops.textops import dup_keep_best

    return dup_keep_best(load(spark, sf_dir, "documents"), threshold=0.2)


@q("cluster_safe_split", None)
def cluster_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-atomic train/val/test split (r6, ops/textops.py
    cluster_safe_split): split key = h56 of the near-dup cluster id, so
    near-duplicates never straddle a split boundary — the leakage doc-id
    hashing cannot prevent."""
    from ult_spark.ops.textops import cluster_safe_split

    return cluster_safe_split(load(spark, sf_dir, "documents"), threshold=0.2)


def _attach_text_oracles() -> None:
    from ult_spark.ops.textops import (
        dup_clusters_sql,
        jaccard_pairs_sql,
        minhash_lsh_sql,
        simhash_near_dup_sql,
    )

    ORACLES["minhash_lsh_pairs"] = minhash_lsh_sql(0.2)
    ORACLES["ngram_jaccard_pairs"] = jaccard_pairs_sql(0.1)
    ORACLES["simhash_near_dup"] = simhash_near_dup_sql(3)
    ORACLES["dup_clusters"] = dup_clusters_sql(0.2)
    from ult_spark.ops.textops import dup_keep_best_sql, tfidf_top_terms_sql

    ORACLES["tfidf_top_terms"] = tfidf_top_terms_sql(3)
    ORACLES["dup_keep_best"] = dup_keep_best_sql(0.2)
    from ult_spark.ops.textops import cluster_safe_split_sql

    ORACLES["cluster_safe_split"] = cluster_safe_split_sql(0.2)


_attach_text_oracles()

ANN_QUERY_IDS = [0, 1, 2]


@q("ann_cosine_topk", None)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10; emits floor(sim*1e6) for exact parity."""
    from ult_spark.ops.ann import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    data = emb.select("vec_id", vec.alias("dvec"))
    qs = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), vec.alias("qvec")
    )
    out = cosine_topk(qs, data.where(~F.col("vec_id").isin(ANN_QUERY_IDS)), k=10)
    return out.select(
        "qid", "vec_id", F.floor(F.col("sim") * 1000000).cast("long").alias("sim_e6"), "rk"
    )


ORACLES["ann_cosine_topk"] = (
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings), "
    "qs AS (SELECT vec_id AS qid, vec AS qvec FROM v WHERE vec_id IN (0, 1, 2)), "
    "sims AS (SELECT qid, vec_id, "
    "list_sum(list_transform(list_zip(qvec, vec), p -> p[1] * p[2])) / "
    "sqrt(list_sum(list_transform(qvec, x -> x * x)) * list_sum(list_transform(vec, x -> x * x))) AS sim "
    "FROM qs, v WHERE vec_id NOT IN (0, 1, 2)) "
    "SELECT qid, vec_id, CAST(floor(sim * 1000000) AS BIGINT) AS sim_e6, rk FROM ("
    "SELECT qid, vec_id, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rk "
    "FROM sims) WHERE rk <= 10"
)


@q("ann_lsh_topk", None)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.ann import ann_lsh_topk

    return ann_lsh_topk(load(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5)


@q("ann_ivf_topk", None)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat scale path: pinned coarse centroids, nprobe-list candidates,
    exact integer-dot re-rank (ops/ann.py ann_ivf_topk)."""
    from ult_spark.ops.ann import ann_ivf_topk

    return ann_ivf_topk(load(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5)


@q("ann_ivf_trained", None)
def ann_ivf_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED centroids (round-2 verdict #5): 2 Lloyd rounds of
    integer k-means chained as one lazy plan (ops/ann.py ivf_train), then
    the same nprobe/re-rank plan as ann_ivf_topk."""
    from ult_spark.ops.ann import ann_ivf_topk, ivf_train

    emb = load(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, ANN_QUERY_IDS, k=5, cents=ivf_train(emb, rounds=2))


def _attach_ann_oracles() -> None:
    from ult_spark.ops.ann import ann_ivf_topk_sql, ann_lsh_topk_sql

    ORACLES["ann_lsh_topk"] = ann_lsh_topk_sql(ANN_QUERY_IDS, k=5)
    ORACLES["ann_ivf_topk"] = ann_ivf_topk_sql(ANN_QUERY_IDS, k=5)
    ORACLES["ann_ivf_trained"] = ann_ivf_topk_sql(ANN_QUERY_IDS, k=5, rounds=2)


_attach_ann_oracles()


# documents rollup (A4-shape on the webtext payload)

@q(
    "docs_by_lang_source",
    "SELECT lang, source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS chars "
    "FROM documents GROUP BY 1, 2",
)
def docs_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("cnt"), F.sum("n_chars").alias("chars"))
    )


# ---------------------------------------------------------------------------
# Batch 3: remaining SURVEY §2 surface — J4/J5/J6, A6/A9/A10, W4/W5/W6,
# O5/O6, E3 url ops, C6 centroid, batch sessionization.

def _compacted_ranges():
    """Compacted polygon-index cells (mixed levels) with descendant ranges —
    shared by the Spark query and (as VALUES) the DuckDB oracle."""
    import numpy as np

    from ult_spark.geom.polyio import default_layer
    from ult_spark.grid import cells as C, compact as CZ
    from ult_spark.grid.polyfill import polyfill

    rows = []
    for p in default_layer():
        packed = CZ.compact(polyfill(p, 6))
        lo, hi = C.cell_range(packed)
        rows.extend(
            (int(l), int(h), p.poly_id) for l, h in zip(lo.tolist(), hi.tolist())
        )
    return rows


@q("cell_range_join", None)
def cell_range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.relational import cell_range_join

    ranges = spark.createDataFrame(_compacted_ranges(), "lo long, hi long, poly_id long")
    pts = events_points(spark, sf_dir).select(
        "event_id", UF.latlon_to_cell("lat", "lon", 12).alias("cell")
    )
    return cell_range_join(pts, ranges).select("event_id", "poly_id")


def _attach_range_oracle() -> None:
    vals = ", ".join(f"({l}, {h}, {p})" for l, h, p in _compacted_ranges())
    ORACLES["cell_range_join"] = (
        f"WITH r(lo, hi, poly_id) AS (VALUES {vals}), "
        f"pts AS (SELECT event_id, {_cell(12)} AS cell FROM events) "
        "SELECT event_id, poly_id FROM pts JOIN r ON cell BETWEEN lo AND hi"
    )


_attach_range_oracle()


ASOF_VERSIONS = [
    (1, "1992-01-01"), (2, "1994-06-15"), (3, "1996-01-01"), (4, "1997-07-04"),
]


@q(
    "asof_orders_version",
    "WITH v(version_id, vts) AS (VALUES "
    + ", ".join(f"({i}, TIMESTAMP '{d} 00:00:00')" for i, d in ASOF_VERSIONS)
    + ") SELECT o_orderkey, version_id FROM ("
    "SELECT o_orderkey, version_id, row_number() OVER "
    "(PARTITION BY o_orderkey ORDER BY vts DESC) AS rn "
    "FROM orders LEFT JOIN v ON vts <= o_orderdate) WHERE rn = 1",
)
def asof_orders_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.relational import asof_join

    versions = spark.createDataFrame(
        [(i, f"{d} 00:00:00") for i, d in ASOF_VERSIONS], "version_id long, vts string"
    ).select("version_id", F.to_timestamp("vts").alias("vts"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return asof_join(orders, versions, "o_orderkey", "o_orderdate", "vts").select(
        "o_orderkey", "version_id"
    )


@q(
    "interval_join_buckets",
    "WITH b(bucket_id, lo, hi) AS (VALUES (0, 0, 600), (1, 600, 1800), (2, 1800, 3600)) "
    "SELECT bucket_id, count(*) AS cnt FROM events JOIN b "
    "ON CAST(floor(epoch(ts)) AS BIGINT) % 3600 >= lo "
    "AND CAST(floor(epoch(ts)) AS BIGINT) % 3600 < hi GROUP BY 1",
)
def interval_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    buckets = spark.createDataFrame(
        [(0, 0, 600), (1, 600, 1800), (2, 1800, 3600)], "bucket_id long, lo long, hi long"
    )
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp("ts") % 3600
    )
    return (
        ev.join(F.broadcast(buckets), (ev.sec >= buckets.lo) & (ev.sec < buckets.hi))
        .groupBy("bucket_id")
        .agg(F.count("*").alias("cnt"))
    )


@q(
    "percentiles_by_type",
    "SELECT event_type, CAST(floor(quantile_cont(value, 0.25) * 1000000) AS BIGINT) AS p25_e6, "
    "CAST(floor(quantile_cont(value, 0.5) * 1000000) AS BIGINT) AS p50_e6, "
    "CAST(floor(quantile_cont(value, 0.75) * 1000000) AS BIGINT) AS p75_e6 "
    "FROM events GROUP BY 1",
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.floor(F.expr(f"percentile(value, {p})") * 1000000)
            .cast("long")
            .alias(f"p{int(p * 100)}_e6")
            for p in (0.25, 0.5, 0.75)
        ]
    )


@q(
    "tile_samples_l4",
    f"SELECT cell, array_to_string((list_sort(list(event_id)))[1:5], ',') AS sample_ids "
    f"FROM (SELECT {_cell(4)} AS cell, event_id FROM events) GROUP BY 1",
)
def tile_samples_l4(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).select(
        UF.latlon_to_cell("lat", "lon", 4).alias("cell"), "event_id"
    )
    return pts.groupBy("cell").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array(F.collect_list("event_id")), 1, 5),
                lambda x: x.cast("string"),
            ),
        ).alias("sample_ids")
    )


@q(
    "udaf_tile_lat_sum",
    f"SELECT cell, CAST(sum(CAST(floor(lat * 1000000) AS BIGINT)) AS BIGINT) AS lat_sum_e6 "
    f"FROM (SELECT {_cell(6)} AS cell, {UF.EVENT_LAT_SQL} AS lat FROM events) GROUP BY 1",
)
def udaf_tile_lat_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: grouped-agg pandas UDAF (Arrow) — integer-exact custom stat."""
    from pyspark.sql.functions import PandasUDFType
    from pyspark.sql.types import LongType

    def _lat_sum(lat):
        import numpy as np

        return int(np.floor(lat.to_numpy(np.float64) * 1000000).astype(np.int64).sum())

    # explicit GROUPED_AGG: `from __future__ import annotations` stringifies
    # type hints, which pyspark's hint-inference cannot resolve
    lat_sum_e6 = F.pandas_udf(_lat_sum, LongType(), PandasUDFType.GROUPED_AGG)

    pts = events_points(spark, sf_dir).select(
        UF.latlon_to_cell("lat", "lon", 6).alias("cell"), "lat"
    )
    return pts.groupBy("cell").agg(lat_sum_e6("lat").alias("lat_sum_e6"))


@q(
    "event_gaps",
    "SELECT event_id, coalesce(es - lag(es) OVER "
    "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC), -1) AS prev_gap_s "
    "FROM (SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)",
)
def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.coalesce(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).cast("long"),
            F.lit(-1),
        ).alias("prev_gap_s"),
    )


@q(
    "rolling_hour_counts",
    "SELECT event_id, CAST(count(*) OVER (PARTITION BY event_type "
    "ORDER BY CAST(floor(epoch(ts)) AS BIGINT) "
    "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_cnt FROM events",
)
def rolling_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return load(spark, sf_dir, "events").select(
        "event_id", F.count("*").over(w).alias("trailing_cnt")
    )


@q(
    "tile_rank_ntile",
    f"SELECT cell, CAST(dense_rank() OVER (ORDER BY cnt DESC) AS BIGINT) AS dr, "
    f"CAST(ntile(4) OVER (ORDER BY cnt DESC, cell ASC) AS BIGINT) AS nt FROM ("
    f"SELECT {_cell(5)} AS cell, count(*) AS cnt FROM events GROUP BY 1)",
)
def tile_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global (unpartitioned) windows are intentional here — W6 is a GLOBAL
    # ranking, and the input is the L5 tile aggregate, bounded at 4^5 = 1024
    # rows by construction regardless of input scale (the single-partition
    # WindowExec warning is about this pre-bounded set, not the raw data)
    tiles = (
        events_points(spark, sf_dir)
        .groupBy(UF.latlon_to_cell("lat", "lon", 5).alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )
    return tiles.select(
        "cell",
        F.dense_rank().over(Window.orderBy(F.desc("cnt"))).cast("long").alias("dr"),
        F.ntile(4).over(Window.orderBy(F.desc("cnt"), F.asc("cell"))).cast("long").alias("nt"),
    )


@q(
    "tiles_intersect",
    f"SELECT DISTINCT {_cell(6)} AS cell FROM events WHERE event_id % 2 = 0 "
    f"INTERSECT SELECT DISTINCT {_cell(6)} AS cell FROM events WHERE event_id % 2 = 1",
)
def tiles_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).withColumn("cell", UF.latlon_to_cell("lat", "lon", 6))
    even = pts.where(F.col("event_id") % 2 == 0).select("cell").distinct()
    odd = pts.where(F.col("event_id") % 2 == 1).select("cell").distinct()
    return even.intersect(odd)


@q(
    "distinct_user_type",
    "SELECT DISTINCT user_id % 100 AS ub, event_type FROM events",
)
def distinct_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .select((F.col("user_id") % 100).alias("ub"), "event_type")
        .dropDuplicates()
    )


@q(
    "url_host_extract",
    "SELECT event_id, regexp_extract('https://site' || CAST(event_id % 50 AS VARCHAR) "
    "|| '.example/p/' || CAST(event_id AS VARCHAR) || '?q=1', '^https?://([^/]+)', 1) AS host "
    "FROM events",
)
def url_host_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: host extraction via native parse_url on synthesized urls."""
    ev = load(spark, sf_dir, "events").withColumn(
        "url",
        F.concat(
            F.lit("https://site"), (F.col("event_id") % 50).cast("string"),
            F.lit(".example/p/"), F.col("event_id").cast("string"), F.lit("?q=1"),
        ),
    )
    return ev.select("event_id", F.parse_url("url", F.lit("HOST")).alias("host"))


_MESSY_URL_SQL = (
    "concat(CASE WHEN event_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END, '://', "
    "CASE WHEN event_id % 4 = 0 THEN 'www.' ELSE '' END, "
    "'site', CAST(event_id % 50 AS VARCHAR), '.example', "
    "CASE WHEN event_id % 8 = 0 THEN ':443' ELSE '' END, "
    "'/p/', CAST(event_id % 100 AS VARCHAR), "
    "CASE WHEN event_id % 16 = 0 THEN '/' ELSE '' END, "
    "'?q=1', CASE WHEN event_id % 32 = 0 THEN '#frag' ELSE '' END)"
)


def _messy_url() -> F.Column:
    """Deterministically MESSY url per event: scheme case, www prefix,
    default port, trailing slash, and fragment all vary by event_id bits —
    the canonicalizer must collapse every variant."""
    i = F.col("event_id")
    return F.concat(
        F.when(i % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS")),
        F.lit("://"),
        F.when(i % 4 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"), (i % 50).cast("string"), F.lit(".example"),
        F.when(i % 8 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), (i % 100).cast("string"),
        F.when(i % 16 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?q=1"),
        F.when(i % 32 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


def _attach_url_canonical_oracle() -> None:
    from ult_spark.extract.url import canonical_url_sql

    canon = canonical_url_sql("url")
    ORACLES["url_canonical_dedup"] = (
        f"WITH u AS (SELECT event_id, {_MESSY_URL_SQL} AS url FROM events) "
        f"SELECT {canon} AS canon, count(*) AS cnt, "
        "count(DISTINCT url) AS variants FROM u GROUP BY 1"
    )


@q("url_canonical_dedup", None)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization as a dedup key (r4, extract/url.py): messy
    spellings (scheme case, www, default port, trailing slash, fragment)
    collapse to one canonical form; output proves the collapse (variants
    per canonical form > 1)."""
    from ult_spark.extract.url import canonical_url

    u = load(spark, sf_dir, "events").select("event_id", _messy_url().alias("url"))
    return (
        u.withColumn("canon", canonical_url("url"))
        .groupBy("canon")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("url").alias("variants"),
        )
    )


_attach_url_canonical_oracle()


_TRACKING_URL_SQL = (
    "concat('https://site', CAST(event_id % 50 AS VARCHAR), '.example/p/', "
    "CAST(event_id % 100 AS VARCHAR), "
    "CASE WHEN event_id % 7 = 0 THEN concat('?utm_source=a&q=', CAST(event_id % 10 AS VARCHAR)) "
    "WHEN event_id % 7 = 1 THEN concat('?q=', CAST(event_id % 10 AS VARCHAR), '&gclid=g1') "
    "WHEN event_id % 7 = 2 THEN '?ref=home' "
    "WHEN event_id % 7 = 3 THEN '?fbclid=x&utm_medium' "
    "ELSE concat('?q=', CAST(event_id % 10 AS VARCHAR)) END)"
)


def _tracking_url() -> F.Column:
    """Deterministic url per event whose QUERY STRING varies by tracking
    noise: the same resource crawled via a utm-tagged link, a gclid
    click-through, a bare ref, or clean — strip_tracking must collapse
    them (and drop the '?' entirely when nothing survives). The branch
    selector is i%7 — COPRIME with the i%100 path key, so every
    (host, path) group mixes raw spellings and `variants` > 1 proves the
    collapse (an i%4 selector is determined by i%100 and every group
    would hold a single spelling)."""
    i = F.col("event_id")
    k = (i % 10).cast("string")
    q = (
        F.when(i % 7 == 0, F.concat(F.lit("?utm_source=a&q="), k))
        .when(i % 7 == 1, F.concat(F.lit("?q="), k, F.lit("&gclid=g1")))
        .when(i % 7 == 2, F.lit("?ref=home"))
        .when(i % 7 == 3, F.lit("?fbclid=x&utm_medium"))
        .otherwise(F.concat(F.lit("?q="), k))
    )
    return F.concat(
        F.lit("https://site"), (i % 50).cast("string"),
        F.lit(".example/p/"), (i % 100).cast("string"), q,
    )


def _attach_url_tracking_oracle() -> None:
    from ult_spark.extract.url import canonical_url_sql

    canon = canonical_url_sql("url", strip_tracking=True)
    ORACLES["url_tracking_dedup"] = (
        f"WITH u AS (SELECT event_id, {_TRACKING_URL_SQL} AS url FROM events) "
        f"SELECT {canon} AS canon, count(*) AS cnt, "
        "count(DISTINCT url) AS variants FROM u GROUP BY 1"
    )


@q("url_tracking_dedup", None)
def url_tracking_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracking-param stripping as a dedup key (r5, extract/url.py —
    round-4 verdict #3): utm_*/gclid/fbclid/ref query parameters are
    dropped (opt-in), remaining params re-joined in order, '?' dropped
    when nothing survives; variants per canonical form prove the
    collapse."""
    from ult_spark.extract.url import canonical_url

    u = load(spark, sf_dir, "events").select("event_id", _tracking_url().alias("url"))
    return (
        u.withColumn("canon", canonical_url("url", strip_tracking=True))
        .groupBy("canon")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("url").alias("variants"),
        )
    )


_attach_url_tracking_oracle()


# ---- H3 structural interop (r5, round-4 verdict #4) -------------------
# A deterministic bit-layout-valid res-9 H3 id per event: base cell and
# digits 1-5 derive from event_id div 5 (so runs of 5 consecutive events
# share every ancestor through res 5 — the rollup GROUPS for real), while
# digits 6-9 derive from event_id (distinct children inside each group).
# Pentagon digit exclusions are not modeled (grid/h3interop.py docstring).

_H3_TOP = (1 << 59) | (9 << 52) | ((1 << 18) - 1)  # mode 1, res 9, low 7s


def _h3_synth() -> F.Column:
    i = F.col("event_id")
    g = F.floor(i / 5).cast("long")
    h = F.lit(_H3_TOP).cast("long").bitwiseOR(F.shiftleft(g % 122, 45))
    for r in range(1, 6):
        d = F.floor(g / F.lit(7 ** (r - 1))).cast("long") % 7
        h = h.bitwiseOR(F.shiftleft(d, (15 - r) * 3))
    for r in range(6, 10):
        d = F.floor(i / F.lit(7 ** (r - 6))).cast("long") % 7
        h = h.bitwiseOR(F.shiftleft(d, (15 - r) * 3))
    return h


def _h3_synth_sql() -> str:
    g = "CAST(floor(event_id / 5) AS BIGINT)"
    terms = [str(_H3_TOP), f"(({g} % 122) << 45)"]
    for r in range(1, 6):
        terms.append(
            f"((CAST(floor({g} / {7 ** (r - 1)}) AS BIGINT) % 7) "
            f"<< {(15 - r) * 3})"
        )
    for r in range(6, 10):
        terms.append(
            f"((CAST(floor(event_id / {7 ** (r - 6)}) AS BIGINT) % 7) "
            f"<< {(15 - r) * 3})"
        )
    return "(" + " | ".join(terms) + ")"


def _attach_h3_oracles() -> None:
    from ult_spark.grid.h3interop import (
        h3_is_valid_sql,
        h3_parent_sql,
        h3_resolution_sql,
        h3_to_hex_sql,
    )

    p5 = h3_parent_sql("h3", 5)
    ORACLES["h3_parent_rollup"] = (
        f"WITH f AS (SELECT event_id, {_h3_synth_sql()} AS h3 FROM events) "
        f"SELECT {h3_to_hex_sql(p5)} AS parent5, count(*) AS cnt, "
        "count(DISTINCT h3) AS kids, "
        f"CAST(sum(CASE WHEN {h3_is_valid_sql('h3')} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS valid_cnt "
        "FROM f GROUP BY 1"
    )
    cov = (
        f"(CASE WHEN event_id % 2 = 0 THEN {h3_parent_sql('h3', 3)} "
        f"ELSE {h3_parent_sql('h3', 5)} END)"
    )
    ORACLES["h3_ancestor_counts"] = (
        f"WITH f AS (SELECT event_id, {_h3_synth_sql()} AS h3 FROM events), "
        f"c AS (SELECT DISTINCT {cov} AS cov FROM f), "
        f"j AS (SELECT c.cov, f.event_id FROM f JOIN c "
        f"ON {h3_parent_sql('f.h3', 3)} = c.cov "
        f"UNION ALL SELECT c.cov, f.event_id FROM f JOIN c "
        f"ON {h3_parent_sql('f.h3', 5)} = c.cov) "
        f"SELECT {h3_to_hex_sql('cov')} AS cov_hex, "
        f"{h3_resolution_sql('cov')} AS cov_res, "
        "count(*) AS cnt, count(DISTINCT event_id) AS uniq FROM j GROUP BY 1, 2"
    )


@q("h3_parent_rollup", None)
def h3_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 interop slice 1 (r5): synthesized external res-9 H3 keys roll up
    to their res-5 parents with hex rendering and bit-layout validation —
    parse/resolve/validate, all native bit arithmetic
    (grid/h3interop.py, layout pinned to the public spec's documented
    example cells in tests/test_h3interop.py)."""
    from ult_spark.grid.h3interop import h3_is_valid, h3_parent, h3_to_hex

    f = load(spark, sf_dir, "events").select("event_id", _h3_synth().alias("h3"))
    return f.groupBy(h3_to_hex(h3_parent("h3", 5)).alias("parent5")).agg(
        F.count("*").alias("cnt"),
        F.countDistinct("h3").alias("kids"),
        F.sum(F.when(h3_is_valid("h3"), 1).otherwise(0)).alias("valid_cnt"),
    )


@q("h3_ancestor_counts", None)
def h3_ancestor_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 interop slice 2 (r5): mixed-resolution ancestor join — a res-3 +
    res-5 coverage set against res-9 cells via h3_ancestor_join's
    per-resolution EQUI-join decomposition (hash joins, never a BNLJ range
    join; grid/h3interop.py). Every fine cell matches its ancestor row at
    each covered resolution, exactly like the BETWEEN child-range
    formulation (equivalence tested in tests/test_h3interop.py)."""
    from ult_spark.grid.h3interop import (
        h3_ancestor_join,
        h3_parent,
        h3_resolution,
        h3_to_hex,
    )

    f = load(spark, sf_dir, "events").select("event_id", _h3_synth().alias("h3"))
    cov = (
        f.select(
            F.when(F.col("event_id") % 2 == 0, h3_parent("h3", 3))
            .otherwise(h3_parent("h3", 5))
            .alias("h3")
        )
        .distinct()
        .select(
            "h3",
            h3_to_hex("h3").alias("cov_hex"),
            h3_resolution("h3").alias("cov_res"),
        )
    )
    return (
        h3_ancestor_join(f, cov, "h3", "h3")
        .groupBy("cov_hex", "cov_res")
        .agg(F.count("*").alias("cnt"), F.countDistinct("event_id").alias("uniq"))
    )


_attach_h3_oracles()


# ---------------------------------------------------------------------------
# Corpus-curation ops (r5): Gopher-style repetition filters, PII scrub,
# segment-level dedup, train-test decontamination (ops/curation.py).


def _attach_curation_oracles() -> None:
    from ult_spark.ops import curation as C

    ORACLES["gopher_repetition"] = C.GOPHER_SQL
    ORACLES["pii_scrub_docs"] = C.pii_scrub_sql()
    ORACLES["segment_dedup_w8"] = C.segment_dedup_sql(8)
    ORACLES["decontam_5gram"] = C.decontaminate_sql()


@q("gopher_repetition", None)
def gopher_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.curation import gopher_repetition

    return gopher_repetition(load(spark, sf_dir, "documents"))


@q("pii_scrub_docs", None)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant deterministic doc_id-derived PII, then scrub it — the
    corpus itself is PII-free, so the plant step (mirrored in the
    oracle) is what exercises the redaction path."""
    from ult_spark.ops.curation import pii_scrub, planted_pii

    return pii_scrub(planted_pii(load(spark, sf_dir, "documents")))


@q("segment_dedup_w8", None)
def segment_dedup_w8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.curation import segment_dedup, token_window_segments

    return segment_dedup(token_window_segments(load(spark, sf_dir, "documents"), w=8))


@q("decontam_5gram", None)
def decontam_5gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.curation import decontaminate

    return decontaminate(load(spark, sf_dir, "documents"))


_attach_curation_oracles()


@q(
    "cell_centroids_l8",
    f"SELECT DISTINCT cell, (y + 0.5) / 256.0 * 180.0 - 90.0 AS clat, "
    f"(x + 0.5) / 256.0 * 360.0 - 180.0 AS clon FROM (SELECT {_cell(8)} AS cell, "
    f"CAST(greatest(0, least(CAST(floor((({UF.EVENT_LON_SQL}) + 180.0) / 360.0 * 256.0) AS BIGINT), 255)) AS DOUBLE) AS x, "
    f"CAST(greatest(0, least(CAST(floor((({UF.EVENT_LAT_SQL}) + 90.0) / 180.0 * 256.0) AS BIGINT), 255)) AS DOUBLE) AS y "
    f"FROM events)",
)
def cell_centroids_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).select(
        UF.latlon_to_cell("lat", "lon", 8).alias("cell")
    ).distinct()
    return pts.select(
        "cell",
        UF.cell_centroid_lat("cell", 8).alias("clat"),
        UF.cell_centroid_lon("cell", 8).alias("clon"),
    )


@q(
    "sessionize_users",
    "SELECT event_id, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM ("
    "SELECT event_id, user_id, ts, CASE WHEN lag(es) OVER "
    "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL "
    "OR es - lag(es) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) > 1800 "
    "THEN 1 ELSE 0 END AS new_s FROM "
    "(SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events))",
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.relational import sessionize

    return sessionize(
        load(spark, sf_dir, "events"), "user_id", "ts", 1800, tiebreak="event_id"
    ).select("event_id", "session_id")


# ---------------------------------------------------------------------------
# Multimodal assets (binary payload + typed metadata; decode stubbed,
# plumbing real — ops/multimodal.py)

@q("multimodal_meta_agg", None)
def multimodal_meta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.multimodal import synth_assets

    return (
        synth_assets(spark, sf_dir)
        .groupBy("kind")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.length("payload")).alias("payload_bytes"),
            F.sum("width").alias("width_sum"),
            F.sum("duration_ms").alias("dur_sum"),
        )
    )


@q("multimodal_features", None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.multimodal import extract_features, synth_assets

    return extract_features(synth_assets(spark, sf_dir), dim=4)


@q("video_frame_plan", None)
def video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ult_spark.ops.multimodal import frame_sample, synth_assets

    return frame_sample(synth_assets(spark, sf_dir), every_ms=60000)


@q("audio_chunk_plan", None)
def audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plan (r4 — the audio twin of video_frame_plan):
    overlapping metadata-only windows with exact per-chunk sample counts
    (ops/multimodal.py audio_chunks); decode stays the import-gated stub."""
    from ult_spark.ops.multimodal import audio_chunks, synth_assets

    return audio_chunks(synth_assets(spark, sf_dir), win_ms=60000, hop_ms=30000)


def _attach_multimodal_oracles() -> None:
    from ult_spark.ops.multimodal import ASSETS_SQL, audio_chunks_sql, features_sql

    ORACLES["audio_chunk_plan"] = audio_chunks_sql(win_ms=60000, hop_ms=30000)

    ORACLES["multimodal_meta_agg"] = (
        f"SELECT kind, count(*) AS cnt, CAST(sum(octet_length(payload)) AS BIGINT) AS payload_bytes, "
        f"CAST(sum(width) AS BIGINT) AS width_sum, CAST(sum(duration_ms) AS BIGINT) AS dur_sum "
        f"FROM ({ASSETS_SQL}) GROUP BY 1"
    )
    ORACLES["multimodal_features"] = features_sql(4)
    ORACLES["video_frame_plan"] = (
        f"SELECT asset_id, CAST(f AS BIGINT) AS frame_ms FROM ({ASSETS_SQL}), "
        # bound exceeds max possible duration_ms (600999); the f <= duration_ms - 1
        # predicate clamps per asset (ADVICE r1)
        "generate_series(0, 600999, 60000) g(f) WHERE kind = 'video' AND f <= duration_ms - 1"
    )


_attach_multimodal_oracles()


# C3 at scale: distributed compact of the distinct L8 event-cell set

@q("compact_event_cells", None)
def compact_event_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-level input → the fully-native chained-merge compact (r2);
    the applyInPandas anchor-group variant remains for mixed-level sets."""
    from ult_spark.ops.compact_df import compact_cells_native

    cells8 = events_points(spark, sf_dir).select(
        UF.latlon_to_cell("lat", "lon", 8).alias("cell")
    )
    return compact_cells_native(cells8, from_level=8, to_level=4)


def _attach_compact_oracle() -> None:
    from ult_spark.ops.compact_df import compact_sql

    ORACLES["compact_event_cells"] = compact_sql(
        f"SELECT {_cell(8)} AS cell FROM events", from_level=8, to_level=4
    )


_attach_compact_oracle()


# O2: range-partitioned sort by cell id ("range-partitioned shuffles keyed
# on cell id") — result set is partition-layout-independent; the layout
# itself is asserted in tests/test_layout.py

@q(
    "range_partitioned_tiles",
    f"SELECT cell, cnt FROM (SELECT {_cell(8)} AS cell, count(*) AS cnt "
    f"FROM events GROUP BY 1)",
)
def range_partitioned_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = (
        events_points(spark, sf_dir)
        .groupBy(UF.latlon_to_cell("lat", "lon", 8).alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )
    return tiles.repartitionByRange(16, "cell").sortWithinPartitions("cell")


# §2.8 map/json family: per-event props extraction + aggregate

@q(
    "props_json_agg",
    "SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) "
    "AS k_sum, count(*) AS cnt FROM events GROUP BY 1",
)
def props_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"), F.count("*").alias("cnt"))
    )


# §2.8 math family: native haversine (great-circle meters, floored — JVM vs
# libm sin/cos agree to the last ulp on this formula at these magnitudes)

@q(
    "haversine_to_origin",
    f"SELECT event_id, CAST(floor(2.0 * 6371008.8 * asin(sqrt("
    f"sin(radians(lat) / 2) * sin(radians(lat) / 2) + cos(radians(0.0)) * cos(radians(lat)) "
    f"* sin(radians(lon) / 2) * sin(radians(lon) / 2)))) AS BIGINT) AS dist_m "
    f"FROM (SELECT event_id, {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon FROM events)",
)
def haversine_to_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir)
    d = UF.haversine_m(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0))
    return pts.select("event_id", F.floor(d).cast("long").alias("dist_m"))


# embedding-cosine near-dup pairs (task brief): LSH-bucket prefilter + exact
# floored-cosine threshold

@q("embedding_near_dup", None)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs (a < b sharing any (band, bucket)), deduped
    BEFORE the vector join, then exact floored-cosine threshold. Round-1
    verdict #3: the single-signature bucket join was O(N²/256); the banded
    scheme bounds bucket width by 2^-R per band. Round-2 verdict #2: the
    bucket cap is now ENGAGED by default (ops.ann.DEFAULT_MAX_BUCKET), so
    the self-join is bounded by O(n_buckets × cap²) even on a degenerate
    identical-vector corpus; what the cap drops is surfaced by the
    ``near_dup_oversized`` companion query — run it alongside, never assume
    an empty report."""
    from ult_spark.ops.ann import near_dup_pairs

    return near_dup_pairs(load(spark, sf_dir, "embeddings"))


@q(
    "quadkey_l8",
    f"SELECT event_id, {UF.cell_sql(UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, 8)} AS cell, "
    f"{UF.quadkey_sql(UF.EVENT_LON_SQL, UF.EVENT_LAT_SQL, 8)} AS qk, "
    f"{UF.cell_sql(UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, 8)} AS back FROM events",
)
def quadkey_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadkey (Bing/TMS tile-id) interop (r4): cell → quadkey string →
    cell roundtrip in one query — the oracle recomputes the quadkey from
    the raw bit math and expects back == cell, so a decode bug hash-fails
    (ult_spark/functions cell_to_quadkey / quadkey_to_cell, all native)."""
    pts = events_points(spark, sf_dir)
    return (
        pts.select("event_id", UF.latlon_to_cell("lat", "lon", 8).alias("cell"))
        .withColumn("qk", UF.cell_to_quadkey("cell", 8))
        .withColumn("back", UF.quadkey_to_cell("qk", 8))
    )


@q("gapfill_hourly", None)
def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup per event type (r4, the TimescaleDB
    time_bucket_gapfill+locf shape): every hour in each type's own span
    present, missing hours as cnt 0 with last-observation-carried-forward
    (ops/relational.py time_bucket_gapfill)."""
    from ult_spark.ops.relational import time_bucket_gapfill

    return time_bucket_gapfill(load(spark, sf_dir, "events"))


def _attach_gapfill_oracle() -> None:
    from ult_spark.ops.relational import time_bucket_gapfill_sql

    ORACLES["gapfill_hourly"] = time_bucket_gapfill_sql()


_attach_gapfill_oracle()


_SAMPLE_FRACS = {"en": 0.5, "zh": 0.3, "fr": 0.1}


@q("sample_docs_strat", None)
def sample_docs_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sample (r4): per-language
    hash-threshold selection, NO rand() — identical rows on every run,
    engine, partitioning, or retry (ops/textops.py stratified_sample);
    absent strata keep 0 rows (explicit allowlist)."""
    from ult_spark.ops.textops import stratified_sample

    docs = load(spark, sf_dir, "documents")
    return stratified_sample(docs, _SAMPLE_FRACS).select("doc_id", "lang", "n_chars")


@q("split_counts", None)
def split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/test split audit (r4): hash-assigned split
    (disjoint + exhaustive by construction — leakage-free), counted per
    (split, lang) with char volume (ops/textops.py split_assign)."""
    from ult_spark.ops.textops import split_assign

    docs = split_assign(load(spark, sf_dir, "documents"), test_e4=1000)
    return docs.groupBy("split", "lang").agg(
        F.count("*").alias("cnt"),
        F.sum("n_chars").alias("chars"),
    )


@q(
    "sample_k_per_lang",
    "SELECT doc_id, lang, rk FROM ("
    "SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang "
    "ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT ASC, "
    "doc_id ASC) AS BIGINT) AS rk FROM documents) WHERE rk <= 5",
)
def sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE deterministic sampling (r4, the complement of the
    fractional stratified_sample): exactly k docs per language, chosen by
    hash order — a rerun, a reshard, or another engine picks the SAME k
    docs, unlike reservoir sampling."""
    from ult_spark.ops.textops import _h56

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        _h56(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .select("doc_id", "lang", "rk")
    )


def _attach_sampling_oracles() -> None:
    from ult_spark.ops.textops import split_counts_sql, stratified_sample_sql

    ORACLES["sample_docs_strat"] = stratified_sample_sql(_SAMPLE_FRACS)
    ORACLES["split_counts"] = split_counts_sql(1000)


_attach_sampling_oracles()


@q("near_dup_oversized", None)
def near_dup_oversized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surfacing half of the capped near-dup plan: (band, bucket, n)
    groups WIDER than the default cap — exactly what embedding_near_dup's
    prune dropped. Empty on a healthy corpus; non-empty means near-dup
    recall inside those buckets was truncated (see the degenerate-corpus
    test in tests/test_skew.py)."""
    from ult_spark.ops.ann import DEFAULT_MAX_BUCKET, lsh_bands, oversized_buckets

    return oversized_buckets(
        lsh_bands(load(spark, sf_dir, "embeddings")), DEFAULT_MAX_BUCKET
    )


def _attach_near_dup_bucket_sql() -> None:
    from ult_spark.ops.ann import DEFAULT_MAX_BUCKET, lsh_bands_sql

    ORACLES["near_dup_oversized"] = (
        f"WITH b AS ({lsh_bands_sql()}) "
        "SELECT band, bucket, count(*) AS n FROM b GROUP BY 1, 2 "
        f"HAVING count(*) > {DEFAULT_MAX_BUCKET}"
    )
    ORACLES["embedding_near_dup"] = (
        f"WITH b0 AS ({lsh_bands_sql()}), "
        "b AS (SELECT vec_id, band, bucket FROM b0 QUALIFY "
        f"count(*) OVER (PARTITION BY band, bucket) <= {DEFAULT_MAX_BUCKET}), "
        "cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b FROM b l "
        "JOIN b r USING (band, bucket) WHERE l.vec_id < r.vec_id), "
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings) "
        "SELECT a, b, sim_e6 FROM (SELECT a, b, "
        "CAST(floor(list_sum(list_transform(list_zip(l.vec, r.vec), p -> p[1] * p[2])) / "
        "sqrt(list_sum(list_transform(l.vec, x -> x * x)) * list_sum(list_transform(r.vec, x -> x * x))) "
        "* 1000000) AS BIGINT) AS sim_e6 "
        "FROM cand JOIN v l ON l.vec_id = a JOIN v r ON r.vec_id = b) "
        "WHERE sim_e6 >= 200000"
    )


_attach_near_dup_bucket_sql()


# hypertable-style rollup: time bucket × multi-resolution cell pyramid in
# one pass (explode of (level, ancestor) structs — ops/tiles.py pattern)

@q(
    "spacetime_rollup",
    " UNION ALL ".join(
        f"SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start, {lvl} AS level, "
        f"{_cell(lvl)} AS cell, count(*) AS cnt FROM events GROUP BY 1, 3"
        for lvl in (8, 6)
    ),
)
def spacetime_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir).select(
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_start"),
        UF.latlon_to_cell("lat", "lon", 8).alias("cell"),
    )
    lc = F.explode(
        F.array(
            F.struct(F.lit(8).alias("level"), F.col("cell").alias("cell")),
            F.struct(F.lit(6).alias("level"), UF.cell_parent("cell", 6).alias("cell")),
        )
    ).alias("_lc")
    return (
        pts.select("day_start", lc)
        .groupBy("day_start", F.col("_lc.level").alias("level"), F.col("_lc.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


# A4: full cube with grouping_id over (event_type, lang-of-tile proxy)

@q(
    "cube_type_bucket",
    "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(ub, -1) AS ub, count(*) AS cnt, "
    "CAST(grouping(event_type, ub) AS BIGINT) AS gid FROM "
    "(SELECT event_type, user_id % 10 AS ub FROM events) GROUP BY CUBE(event_type, ub)",
)
def cube_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("ub")
    )
    return (
        ev.cube("event_type", "ub")
        .agg(F.count("*").alias("cnt"), F.grouping_id().cast("long").alias("gid"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce("ub", F.lit(-1)).alias("ub"),
            "cnt",
            "gid",
        )
    )


# A4 completion: explicit GROUPING SETS (rollup and cube are the other two
# registered shapes) — custom set list ((event_type), (ub), ())

@q(
    "grouping_sets_type_bucket",
    "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(ub, -1) AS ub, count(*) AS cnt, "
    "CAST(grouping(event_type) AS BIGINT) AS g_t, CAST(grouping(ub) AS BIGINT) AS g_b "
    "FROM (SELECT event_type, user_id % 10 AS ub FROM events) "
    "GROUP BY GROUPING SETS ((event_type), (ub), ())",
)
def grouping_sets_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("ub")
    ).createOrReplaceTempView("_gs_events")
    return spark.sql(
        "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(ub, -1) AS ub, "
        "count(*) AS cnt, CAST(grouping(event_type) AS BIGINT) AS g_t, "
        "CAST(grouping(ub) AS BIGINT) AS g_b "
        "FROM _gs_events GROUP BY GROUPING SETS ((event_type), (ub), ())"
    )


# A5 approx twin: HLL++ distinct users per tile. No cross-engine oracle —
# DuckDB's approx sketch differs by design — so this is registered
# rows-only; tests/test_skew.py bounds its error against the exact query.

@q("approx_users_per_tile_l6", None)
def approx_users_per_tile_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_points(spark, sf_dir)
        .groupBy(UF.latlon_to_cell("lat", "lon", 6).alias("cell"))
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
    )


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


# ---------------------------------------------------------------------------
# Training-batch assembly (r5: ops/packing.py) — sequence packing and
# temperature-balanced domain resampling.


def _attach_packing_oracles() -> None:
    from ult_spark.ops import packing as P

    ORACLES["pack_sequences_b256"] = P.pack_sequences_sql()
    ORACLES["domain_balance_sqrt"] = P.domain_balance_sql()


@q("pack_sequences_b256", None)
def pack_sequences_b256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing accounting at budget=256,
    shards=8 (pinned) — per packed sequence: contributing docs, docs that
    fit whole, and token fill."""
    from ult_spark.ops.packing import pack_sequences

    return pack_sequences(load(spark, sf_dir, "documents"))


@q("domain_balance_sqrt", None)
def domain_balance_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature source rebalancing with deterministic
    hash-threshold realization (no rand(); sqrt is IEEE-exact in both
    engines, so the per-domain rate quantizes identically)."""
    from ult_spark.ops.packing import domain_balance

    return domain_balance(load(spark, sf_dir, "documents"))


_attach_packing_oracles()


# ---------------------------------------------------------------------------
# Session trajectories + snapshot diff (r5: ops/relational.py).


def _attach_trip_oracles() -> None:
    from ult_spark.ops.relational import session_trips_sql

    ORACLES["session_trips_30m"] = session_trips_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL
    )


@q("session_trips_30m", None)
def session_trips_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session trajectory stats (events sessionized at a 30-minute
    gap): event count, duration, great-circle path length with per-leg
    integer-meter floors (order-free sums; sin/cos parity precedent:
    haversine_to_origin)."""
    from ult_spark.ops.relational import session_trips

    return session_trips(events_points(spark, sf_dir))


_attach_trip_oracles()


@q(
    "session_window_counts_b",
    # Exact-microsecond gap rule (F.session_window compares raw timestamps,
    # NOT floored seconds — an exact 1800.000000s gap merges, 1800.000001
    # splits); only the OUTPUT seconds are floored, matching Spark's
    # unix_timestamp truncation. epoch_us keeps the comparison integer-exact
    # (epoch() doubles lose the last microsecond bit at 2024 epochs).
    "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
    "d AS (SELECT user_id, us, "
    "CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us ASC) IS NULL "
    "OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us ASC) > 1800000000 "
    "THEN 1 ELSE 0 END AS new_s FROM e), "
    "s AS (SELECT user_id, us, sum(new_s) OVER (PARTITION BY user_id ORDER BY us ASC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM d) "
    "SELECT user_id, CAST(min(us) // 1000000 AS BIGINT) AS sess_start, "
    "CAST(max(us) // 1000000 + 1800 AS BIGINT) AS sess_end, "
    "CAST(count(*) AS BIGINT) AS n_events "
    "FROM s GROUP BY user_id, sid",
)
def session_window_counts_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH twin of the streaming session-window composition (r6, verdict
    #7): the exact F.session_window program streaming/session_window_counts
    runs (same merge-adjacent gap semantics, same watermark call — a no-op
    on batch input), driven through the DuckDB oracle so the exact-gap
    boundary is certified cross-engine, not just stream≡batch."""
    from ult_spark.streaming import session_window_counts

    return session_window_counts(
        load(spark, sf_dir, "events").select("user_id", "ts"), gap="30 minutes"
    )


_SNAPDIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 7 != 0
), new AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS price_c
  FROM orders WHERE o_orderkey % 5 != 0
)
SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       old.price_c AS old_price_c, new.price_c AS new_price_c
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.price_c != new.price_c
"""


@q("snapshot_diff_orders", _SNAPDIFF_SQL)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff between two deterministic snapshots of orders
    (ops/relational.py snapshot_diff): old = keys % 7 != 0, new =
    keys % 5 != 0 with a one-cent perturbation on keys % 11 == 0 —
    exercises added / removed / changed classification in one full-outer
    hash join."""
    from ult_spark.ops.relational import snapshot_diff

    orders = load(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", cents("o_totalprice").alias("price_c")
    )
    new = orders.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        (
            cents("o_totalprice")
            + F.when(F.col("o_orderkey") % 11 == 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("price_c"),
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["price_c"])


@q("decontam_fuzzy", None)
def decontam_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy train-test decontamination (ops/curation.py): MinHash-banded
    train ⋈ bench candidates + exact shingle-Jaccard verify at the pinned
    0.2 threshold — catches lightly-edited benchmark rewordings the exact
    5-gram check (decontam_5gram) misses."""
    from ult_spark.ops.curation import decontaminate_fuzzy

    return decontaminate_fuzzy(load(spark, sf_dir, "documents"))


def _attach_fuzzy_oracle() -> None:
    from ult_spark.ops.curation import decontaminate_fuzzy_sql

    ORACLES["decontam_fuzzy"] = decontaminate_fuzzy_sql()


_attach_fuzzy_oracle()


@q("ring_simplify_stats", None)
def ring_simplify_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sweep Visvalingam-style vertex decimation (ops/simplify.py)
    over a deterministic dense synthetic ring layer (the driver's admin
    layer is 4-6 uniform vertices — nothing to decimate): per ring, kept
    vertex count and floor-quantized shoelace area before/after."""
    from ult_spark.ops.simplify import rings_df, simplify_stats, synth_rings

    return simplify_stats(rings_df(spark, synth_rings()))


def _attach_simplify_oracle() -> None:
    from ult_spark.ops.simplify import simplify_stats_sql, synth_rings

    ORACLES["ring_simplify_stats"] = simplify_stats_sql(synth_rings())


_attach_simplify_oracle()


_CELL_PATH_SQL = f"""
WITH pts AS (
  SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         {_cell(6)} AS cell
  FROM events
), marked AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_s
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
), moves AS (
  SELECT user_id, session_id, es, event_id, CAST(cell AS VARCHAR) AS c,
         CASE WHEN lag(cell) OVER w2 IS NULL OR cell != lag(cell) OVER w2
              THEN 1 ELSE 0 END AS nw
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_cells,
       string_agg(c, '-' ORDER BY es ASC, event_id ASC) AS path
FROM moves WHERE nw = 1 GROUP BY user_id, session_id
"""


@q("session_cell_path", _CELL_PATH_SQL)
def session_cell_path_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length-compressed per-session cell trajectory at L6
    (ops/relational.py session_cell_path): ordered distinct-consecutive
    cells joined into a '-' path string — total-order assembled (epoch,
    event_id, cell), so the string is partitioning/engine-invariant."""
    from ult_spark.ops.relational import session_cell_path

    pts = events_points(spark, sf_dir).withColumn(
        "cell", UF.latlon_to_cell("lat", "lon", 6)
    )
    return session_cell_path(pts)


@q("poly_contains", None)
def poly_contains_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Contains pair join (ops/polyjoin.py poly_contains_join): the
    admin layer vs a 0.5-scaled nested copy — vertex-parity containment
    minus proper-crossing pairs, all IEEE-exact sign tests (no quantized
    area equality)."""
    from ult_spark.geom.polyio import default_layer, scaled_layer
    from ult_spark.ops.polyjoin import poly_contains_join

    a = list(default_layer())
    return poly_contains_join(spark, a, scaled_layer(a, 0.5))


def _attach_contains_oracle() -> None:
    from ult_spark.geom.polyio import default_layer, scaled_layer
    from ult_spark.ops.polyjoin import poly_contains_sql

    a = list(default_layer())
    ORACLES["poly_contains"] = poly_contains_sql(a, scaled_layer(a, 0.5))


_attach_contains_oracle()


@q("gapfill_lerp", None)
def gapfill_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup with LINEAR interpolation (r5 — the
    TimescaleDB interpolate() companion to gapfill_hourly's locf):
    observed buckets exact, gaps on the e6-floored straight line between
    surrounding observations (ops/relational.py time_bucket_interpolate)."""
    from ult_spark.ops.relational import time_bucket_interpolate

    return time_bucket_interpolate(load(spark, sf_dir, "events"))


def _attach_lerp_oracle() -> None:
    from ult_spark.ops.relational import time_bucket_interpolate_sql

    ORACLES["gapfill_lerp"] = time_bucket_interpolate_sql()


_attach_lerp_oracle()


@q("raster_bilinear_events", None)
def raster_bilinear_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear raster sampling at event points (r5, ops/zonal.py
    raster_bilinear — the ST_Value(bilinear) shape): 4-corner explode +
    pixel equi-join + per-corner e6 floors before the integer sum;
    points outside the grid interior edge-extend (clamp, pinned)."""
    from ult_spark.geom.raster import synth_raster
    from ult_spark.ops.zonal import raster_bilinear

    return raster_bilinear(events_points(spark, sf_dir), synth_raster(spark))


def _attach_bilinear_oracle() -> None:
    from ult_spark.ops.zonal import raster_bilinear_sql

    ORACLES["raster_bilinear_events"] = raster_bilinear_sql(
        lat_sql=UF.EVENT_LAT_SQL, lon_sql=UF.EVENT_LON_SQL
    )


_attach_bilinear_oracle()


# ---------------------------------------------------------------------------
# Mobility / product-analytics compositions (r5): OD matrix + retention.

_OD_SQL = f"""
WITH pts AS (
  SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         {_cell(4)} AS cell
  FROM events
), marked AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_s
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
), od AS (
  SELECT DISTINCT user_id, session_id,
         first_value(cell) OVER w2 AS o,
         last_value(cell) OVER w2 AS d
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o, d, CAST(count(*) AS BIGINT) AS trips,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM od GROUP BY o, d
"""


@q("od_matrix_l4", _OD_SQL)
def od_matrix_l4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination matrix at L4 (r5): per session, the first and
    last visited cell; per (o, d), trip and distinct-user counts — the
    standard mobility-flow product over the sessionize kernel. One
    user-keyed sort feeds sessionization and both frame extremes."""
    from ult_spark.ops.relational import sessionize

    pts = events_points(spark, sf_dir).withColumn(
        "cell", UF.latlon_to_cell("lat", "lon", 4)
    )
    s = sessionize(pts, "user_id", "ts", 1800, tiebreak="event_id")
    w2 = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    od = s.select(
        "user_id",
        "session_id",
        F.first("cell").over(w2).alias("o"),
        F.last("cell").over(w2).alias("d"),
    ).distinct()
    return od.groupBy("o", "d").agg(
        F.count(F.lit(1)).cast("long").alias("trips"),
        F.countDistinct("user_id").cast("long").alias("users"),
    )


_RETENTION_SQL = """
WITH acts AS (
  SELECT DISTINCT user_id,
         CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT) AS day
  FROM events
), cohorts AS (
  SELECT user_id, min(day) AS cohort_day FROM acts GROUP BY user_id
)
SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
       CAST(count(*) AS BIGINT) AS users
FROM acts a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY c.cohort_day, a.day - c.cohort_day
"""


@q("user_retention_daily", _RETENTION_SQL)
def user_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle (r5): users bucketed by first-active day,
    distinct active users per (cohort_day, day_offset) — integer day
    buckets, two aggregations, one broadcast-able cohort join."""
    ev = load(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp(F.col("ts")) / F.lit(86400)).cast("long")
    acts = ev.select("user_id", day.alias("day")).distinct()
    cohorts = acts.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        acts.join(cohorts, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )


_ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
), counts AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), totals AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_distinct
  FROM counts GROUP BY 1
)
SELECT c.doc_id, t.n AS n_tok, t.n_distinct,
       CAST(sum(CAST(floor(-(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
           * ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
           * 1000000000.0::DOUBLE) AS BIGINT)) AS BIGINT) AS entropy_e9
FROM counts c JOIN totals t ON c.doc_id = t.doc_id
GROUP BY c.doc_id, t.n, t.n_distinct
"""


@q("token_entropy", _ENTROPY_SQL)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon entropy of the token distribution (r5 — the
    repetitiveness/spam signal complementing the Gopher n-gram rules):
    -Σ p·ln p with each term e9-floor-quantized BEFORE the integer sum
    (order-free; ln cross-engine parity precedent: the hash-green tfidf
    idf). Also emits token and distinct-token counts. One explode +
    two doc-keyed aggregations — scan-shaped at any corpus size."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    counts = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    p = F.col("c").cast("double") / F.col("n_tok").cast("double")
    term = F.floor(-p * F.log(p) * F.lit(1000000000.0)).cast("long")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id", "n_tok", "n_distinct")
        .agg(F.sum(term).cast("long").alias("entropy_e9"))
        .select("doc_id", "n_tok", "n_distinct", "entropy_e9")
    )


# ---------------------------------------------------------------------------
# Trajectory cleaning + geofence dwell (r5).

_SPEED_SQL = f"""
WITH pts AS (
  SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon
  FROM events
), marked AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_s
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
), legs AS (
  SELECT user_id, session_id, es - lag(es) OVER w2 AS dt,
         lag(lat) OVER w2 AS plat, lag(lon) OVER w2 AS plon, lat, lon
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts ASC, event_id ASC)
), speeds AS (
  SELECT user_id, session_id,
         (CAST(floor(2.0 * 6371008.8 * asin(sqrt(
            sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2) +
            cos(radians(plat)) * cos(radians(lat)) *
            sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)))) AS BIGINT)
          * 1000) // dt AS speed_e3
  FROM legs WHERE plat IS NOT NULL AND dt > 0
)
SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_legs,
       CAST(max(speed_e3) AS BIGINT) AS max_speed_e3,
       CAST(sum(CASE WHEN speed_e3 > 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_teleport
FROM speeds GROUP BY user_id, session_id
"""


@q("session_speed_stats", _SPEED_SQL)
def session_speed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session leg-speed stats (r5 — the GPS-cleaning signal): legs
    within a session (dt > 0), integer speed = (floored-leg-m × 1000)
    div dt — all-integer arithmetic after the leg floor, so exact on any
    engine — with max speed and a >50 m/s teleport-leg count (the
    implausible-jump flag a trajectory pipeline filters on)."""
    from ult_spark.ops.relational import sessionize

    s = sessionize(events_points(spark, sf_dir), "user_id", "ts", 1800, tiebreak="event_id")
    w2 = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    es = F.unix_timestamp(F.col("ts"))
    dt = es - F.lag(es).over(w2)
    leg = F.floor(
        UF.haversine_m(F.lag("lat").over(w2), F.lag("lon").over(w2), F.col("lat"), F.col("lon"))
    ).cast("long")
    legs = s.select(
        "user_id", "session_id", dt.alias("dt"), leg.alias("leg")
    ).where(F.col("leg").isNotNull() & (F.col("dt") > 0))
    speed = F.expr("(leg * 1000) div dt")
    return (
        legs.select("user_id", "session_id", speed.alias("speed_e3"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_legs"),
            F.max("speed_e3").cast("long").alias("max_speed_e3"),
            F.sum((F.col("speed_e3") > 50000).cast("long")).cast("long").alias("n_teleport"),
        )
    )


def _dwell_oracle() -> str:
    from ult_spark.geom.polyio import default_layer, edges_values_sql

    edges = edges_values_sql(list(default_layer()))
    return f"""
WITH pts AS (
  SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         {UF.EVENT_LAT_SQL} AS py, {UF.EVENT_LON_SQL} AS px
  FROM events
), hits AS (
  SELECT event_id, poly_id FROM pts, {edges}
  GROUP BY event_id, poly_id
  HAVING sum(CASE WHEN (ey1 > py) != (ey2 > py)
             AND px < (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1
             THEN 1 ELSE 0 END) % 2 = 1
), pairs AS (
  SELECT user_id, lag(event_id) OVER w AS prev_id, event_id AS cur_id,
         es - lag(es) OVER w AS dt
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT p.user_id, h1.poly_id, CAST(sum(p.dt) AS BIGINT) AS dwell_s,
       CAST(count(*) AS BIGINT) AS n_legs
FROM pairs p
JOIN hits h1 ON p.prev_id = h1.event_id
JOIN hits h2 ON p.cur_id = h2.event_id AND h1.poly_id = h2.poly_id
WHERE p.prev_id IS NOT NULL AND p.dt <= 86400
GROUP BY p.user_id, h1.poly_id
"""


@q("dwell_time_by_poly", _dwell_oracle())
def dwell_time_by_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence dwell time (r5): per (user, polygon), the summed time of
    overall-consecutive event pairs with BOTH endpoints inside the
    polygon and the gap within one day (86,400 s pinned — the driver
    events are temporally sparse, so a session-scale cap would leave
    almost no qualifying pairs; a longer gap means the user was away). Uses the exact PIP hit set
    (the hash-green pip_join kernel); the pair→hits joins are event-id
    equi-joins, so the plan is two hash joins + one aggregation at any
    scale."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.pip import pip_join

    pts = events_points(spark, sf_dir)
    hits = pip_join(pts, list(default_layer())).select("event_id", "poly_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.unix_timestamp(F.col("ts"))
    pairs = pts.select(
        "user_id",
        F.lag("event_id").over(w).alias("prev_id"),
        F.col("event_id").alias("cur_id"),
        (es - F.lag(es).over(w)).alias("dt"),
    ).where(F.col("prev_id").isNotNull() & (F.col("dt") <= 86400))
    h1 = hits.select(F.col("event_id").alias("prev_id"), "poly_id")
    h2 = hits.select(F.col("event_id").alias("cur_id"), "poly_id")
    return (
        pairs.join(h1, "prev_id")
        .join(h2, ["cur_id", "poly_id"])
        .groupBy("user_id", "poly_id")
        .agg(
            F.sum("dt").cast("long").alias("dwell_s"),
            F.count(F.lit(1)).cast("long").alias("n_legs"),
        )
    )


_SINUOSITY_SQL = f"""
WITH pts AS (
  SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         {UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon
  FROM events
), marked AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_s
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
), legs AS (
  SELECT user_id, session_id,
         lag(lat) OVER w2 AS plat, lag(lon) OVER w2 AS plon, lat, lon,
         first_value(lat) OVER w3 AS olat, first_value(lon) OVER w3 AS olon,
         last_value(lat) OVER w3 AS dlat, last_value(lon) OVER w3 AS dlon
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts ASC, event_id ASC),
         w3 AS (PARTITION BY user_id, session_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
), per AS (
  SELECT user_id, session_id,
         CAST(coalesce(sum(CASE WHEN plat IS NULL THEN NULL ELSE
           CAST(floor(2.0 * 6371008.8 * asin(sqrt(
             sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2) +
             cos(radians(plat)) * cos(radians(lat)) *
             sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)))) AS BIGINT)
           END), 0) AS BIGINT) AS dist_m,
         CAST(floor(2.0 * 6371008.8 * asin(sqrt(
             sin(radians(any_value(dlat) - any_value(olat)) / 2) * sin(radians(any_value(dlat) - any_value(olat)) / 2) +
             cos(radians(any_value(olat))) * cos(radians(any_value(dlat))) *
             sin(radians(any_value(dlon) - any_value(olon)) / 2) * sin(radians(any_value(dlon) - any_value(olon)) / 2)))) AS BIGINT) AS od_m
  FROM legs GROUP BY user_id, session_id
)
SELECT user_id, session_id, dist_m, od_m,
       CAST(CASE WHEN od_m > 0 THEN (dist_m * 1000) // od_m ELSE NULL END AS BIGINT)
         AS sinuosity_e3
FROM per
"""


@q("session_sinuosity", _SINUOSITY_SQL)
def session_sinuosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session sinuosity (r5): path length over straight-line
    origin→destination distance, all-integer (dist_m × 1000) div od_m
    after per-leg and od floors (NULL for zero od — loops/stationary).
    The standard trajectory-tortuosity diagnostic."""
    from ult_spark.ops.relational import sessionize

    s = sessionize(events_points(spark, sf_dir), "user_id", "ts", 1800, tiebreak="event_id")
    w2 = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    w3 = w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    leg = F.floor(
        UF.haversine_m(F.lag("lat").over(w2), F.lag("lon").over(w2), F.col("lat"), F.col("lon"))
    ).cast("long")
    withod = s.select(
        "user_id", "session_id", leg.alias("_leg"),
        F.first("lat").over(w3).alias("olat"), F.first("lon").over(w3).alias("olon"),
        F.last("lat").over(w3).alias("dlat"), F.last("lon").over(w3).alias("dlon"),
    )
    per = withod.groupBy("user_id", "session_id").agg(
        F.coalesce(F.sum("_leg"), F.lit(0)).cast("long").alias("dist_m"),
        F.floor(
            UF.haversine_m(
                F.any_value("olat"), F.any_value("olon"),
                F.any_value("dlat"), F.any_value("dlon"),
            )
        ).cast("long").alias("od_m"),
    )
    return per.select(
        "user_id", "session_id", "dist_m", "od_m",
        F.when(F.col("od_m") > 0, F.expr("(dist_m * 1000) div od_m"))
        .cast("long").alias("sinuosity_e3"),
    )


def _funnel_oracle() -> str:
    from ult_spark.ops import curation as C
    from ult_spark.ops import packing as P

    h = "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':bal'), 1, 14))::BIGINT % 1000000"
    return (
        f"WITH g AS ({C.GOPHER_SQL}), "
        f"dec AS ({C.decontaminate_sql()}), "
        f"bal AS ({P.domain_balance_sql()}), "
        "dd AS (SELECT doc_id, CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) "
        "THEN 1 ELSE 0 END AS ded FROM documents), "
        f"base AS (SELECT doc_id, source, {h} AS kh FROM documents) "
        "SELECT b.source AS domain, CAST(count(*) AS BIGINT) AS n_total, "
        "CAST(sum(g.keep) AS BIGINT) AS n_rep, "
        "CAST(sum(g.keep * dd.ded) AS BIGINT) AS n_dedup, "
        "CAST(sum(g.keep * dd.ded * coalesce(1 - dec.contaminated, 0)) AS BIGINT) AS n_decontam, "
        "CAST(sum(g.keep * dd.ded * coalesce(1 - dec.contaminated, 0) "
        "* CASE WHEN b.kh < bal.keep_rate_e6 THEN 1 ELSE 0 END) AS BIGINT) AS n_balance "
        "FROM base b JOIN g USING (doc_id) JOIN dd USING (doc_id) "
        "LEFT JOIN dec USING (doc_id) JOIN bal ON b.source = bal.domain "
        "GROUP BY b.source"
    )


@q("curation_funnel", None)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-curation funnel (r5 showcase): per source,
    document survival through the pipeline's stages IN ORDER —
    Gopher repetition keep → exact-dup keeper (min-id of the md5 group) →
    exact 5-gram decontamination (benchmark-split docs leave the corpus
    here: they are eval data) → α=0.5 temperature balancing threshold.
    Each stage is the SAME pinned kernel as its standalone query, so the
    funnel certifies the filters compose. Scale: the stages are
    independent doc-keyed columns joined once — no stage rescans
    another's output."""
    from ult_spark.ops.curation import decontaminate, gopher_repetition
    from ult_spark.ops.packing import domain_balance
    from ult_spark.ops.textops import _h56

    docs = load(spark, sf_dir, "documents")
    rep = gopher_repetition(docs).select("doc_id", F.col("keep").alias("rep"))
    wmd5 = Window.partitionBy(F.md5("text"))
    dd = docs.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(wmd5)).cast("int").alias("ded"),
    )
    dec = decontaminate(docs).select("doc_id", "contaminated")
    bal = domain_balance(docs).select(
        F.col("domain").alias("source"), "keep_rate_e6"
    )
    kh = _h56(F.concat(F.col("doc_id").cast("string"), F.lit(":bal"))) % 1_000_000
    base = docs.select("doc_id", "source", kh.alias("kh"))
    j = (
        base.join(rep, "doc_id")
        .join(dd, "doc_id")
        .join(dec, "doc_id", "left")
        .join(F.broadcast(bal), "source")
    )
    clean = F.col("rep") * F.col("ded") * F.coalesce(
        F.lit(1) - F.col("contaminated"), F.lit(0)
    )
    return j.groupBy(F.col("source").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("rep").cast("long").alias("n_rep"),
        F.sum(F.col("rep") * F.col("ded")).cast("long").alias("n_dedup"),
        F.sum(clean).cast("long").alias("n_decontam"),
        F.sum(
            clean * (F.col("kh") < F.col("keep_rate_e6")).cast("int")
        ).cast("long").alias("n_balance"),
    )


def _attach_funnel_oracle() -> None:
    ORACLES["curation_funnel"] = _funnel_oracle()


_attach_funnel_oracle()


ASOF_KEYED_VERSIONS = [
    (k, 10 * k + i, d)
    for k in (0, 1, 2)
    for i, d in ((1, "1992-01-01"), (2, "1994-06-15"), (3, "1996-09-01"))
]

_ASOF_KEYED_SQL = (
    "WITH v(k, version_id, vts) AS (VALUES "
    + ", ".join(
        f"({k}, {vid}, TIMESTAMP '{d} 00:00:00')" for k, vid, d in ASOF_KEYED_VERSIONS
    )
    + "), l AS (SELECT o_orderkey % 3 AS k, o_orderkey, "
    "CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders), "
    "u AS (SELECT k, ts, 1 AS is_left, o_orderkey, NULL AS version_id FROM l "
    "UNION ALL SELECT k, vts, 0, NULL, version_id FROM v), "
    # version_id tiebreak (ADVICE r5): equal-(k, ts) versions carry the MAX
    # id — same total order as the operator's window (nulls group together:
    # only version rows have ids, so null placement cannot reorder them)
    "c AS (SELECT *, last_value(version_id IGNORE NULLS) OVER "
    "(PARTITION BY k ORDER BY ts ASC, is_left ASC, version_id ASC NULLS FIRST "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vcur FROM u) "
    "SELECT o_orderkey, CAST(vcur AS BIGINT) AS version_id FROM c WHERE is_left = 1"
)


@q("asof_orders_keyed", _ASOF_KEYED_SQL)
def asof_orders_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed as-of at scale (r5, ops/relational.py asof_join_keyed): the
    union-marker window form — versions FIRST at equal ts (inclusive
    rule), one shuffle keyed by the join key, no theta join, no
    broadcast. The standalone broadcast form (asof_orders_version) stays
    the small-dim fast path; this is the shape for a version table too
    big to broadcast."""
    from ult_spark.ops.relational import asof_join_keyed

    versions = spark.createDataFrame(
        [(k, vid, f"{d} 00:00:00") for k, vid, d in ASOF_KEYED_VERSIONS],
        "k long, version_id long, vts string",
    ).select("k", "version_id", F.to_timestamp("vts").alias("vts"))
    orders = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 3).alias("k"), "o_orderkey", "o_orderdate"
    )
    return asof_join_keyed(
        orders, versions, "k", "o_orderdate", "vts", "version_id"
    ).select("o_orderkey", F.col("version_id").cast("long").alias("version_id"))


def _compacted_cells():
    """Compacted polygon-index cells (ids + levels) — the anchored twin's
    input shape (same cells whose ranges _compacted_ranges derives)."""
    from ult_spark.geom.polyio import default_layer
    from ult_spark.grid import cells as C, compact as CZ
    from ult_spark.grid.polyfill import polyfill

    rows, levels = [], set()
    for p in default_layer():
        packed = CZ.compact(polyfill(p, 6))
        lv = C.cell_level(packed)
        rows.extend(
            (int(c), p.poly_id) for c in packed.tolist()
        )
        levels.update(int(x) for x in lv.tolist())
    return rows, sorted(levels)


@q("cell_range_join_anchored", None)
def cell_range_join_anchored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 at scale (ops/relational.py cell_range_join_anchored): the
    descendant-range join as an ancestor-anchored hash EQUI-join — each
    point explodes to its ancestors at the index's compacted levels and
    equi-joins the cell ids (level-encoding ids make that exactly
    containment). Same result set and oracle as the BETWEEN-form
    cell_range_join; this is the shape for an unbroadcastable index."""
    from ult_spark.ops.relational import cell_range_join_anchored

    rows, levels = _compacted_cells()
    cells = spark.createDataFrame(rows, "cell long, poly_id long")
    pts = events_points(spark, sf_dir).select(
        "event_id", UF.latlon_to_cell("lat", "lon", 12).alias("cell")
    )
    return cell_range_join_anchored(pts, cells, levels).select("event_id", "poly_id")


def _attach_anchored_oracle() -> None:
    ORACLES["cell_range_join_anchored"] = ORACLES["cell_range_join"]


_attach_anchored_oracle()


# ---------------------------------------------------------------------------
# Round 6: ordered funnel, SCD-2 intervals, kernel-smoothed tiles,
# per-host quality stats, cluster-canonical retention (dup_keep_best and
# session_window_counts_b are registered beside their families above).

_FUNNEL_STEPS = ["view", "click", "purchase"]


@q("funnel_steps", None)
def funnel_steps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase (r6, ops/relational.py
    funnel_counts): users reaching each step at-or-after their earliest
    completion of the previous one; integer-microsecond boundary."""
    from ult_spark.ops.relational import funnel_counts

    return funnel_counts(load(spark, sf_dir, "events"), _FUNNEL_STEPS)


def _attach_funnel_oracle() -> None:
    from ult_spark.ops.relational import funnel_counts_sql

    ORACLES["funnel_steps"] = funnel_counts_sql(_FUNNEL_STEPS)


_attach_funnel_oracle()


@q(
    "scd2_orders_intervals",
    # same total order: (eff_from, orderkey) — equal-ts versions chain
    # deterministically; NULL eff_to = current version
    "SELECT o_custkey, o_orderkey, eff_from, "
    "lead(eff_from) OVER (PARTITION BY o_custkey "
    "ORDER BY eff_from ASC, o_orderkey ASC) AS eff_to FROM ("
    "SELECT o_custkey, o_orderkey, "
    "CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS eff_from "
    "FROM orders)",
)
def scd2_orders_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 validity intervals (r6, ops/relational.py scd2_intervals):
    each order becomes the customer's effective version until the next
    one — ONE window keyed by customer, no join; the interval table that
    turns point-in-time lookups into a BETWEEN."""
    from ult_spark.ops.relational import scd2_intervals

    versions = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("timestamp").alias("vts")
    )
    return scd2_intervals(versions, "o_custkey", "vts", "o_orderkey").select(
        "o_custkey", "o_orderkey",
        F.col("eff_from").cast("long").alias("eff_from"),
        F.col("eff_to").cast("long").alias("eff_to"),
    )


@q("kernel_smooth_l6", None)
def kernel_smooth_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binomial kernel-density smoothing over the L6 tile grid (r6,
    ops/tiles.py kernel_smooth): the weighted focal generalization —
    integer 1-2-1 stencil weights keep the sum engine-exact; x wraps
    (dx-capped), y clamps."""
    from ult_spark.ops.tiles import kernel_smooth

    return kernel_smooth(events_points(spark, sf_dir), level=6, k=1)


def _attach_kernel_oracle() -> None:
    from ult_spark.ops.tiles import kernel_smooth_sql

    ORACLES["kernel_smooth_l6"] = kernel_smooth_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6, k=1
    )


_attach_kernel_oracle()


@q(
    "host_quality_stats",
    # domain-level curation stats: the aggregation a corpus pipeline runs
    # before domain filtering/reweighting — host synthesized from doc_id
    # exactly as the hash-green url family does from event_id
    "SELECT host, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_char) AS BIGINT) AS sum_char, "
    "CAST(sum(n_tok) AS BIGINT) AS sum_tok, "
    "CAST(sum(stop_ratio_e4) AS BIGINT) AS sum_stop_e4 FROM ("
    "SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host, "
    "CAST(length(text) AS BIGINT) AS n_char, CAST(n_tok AS BIGINT) AS n_tok, "
    "CAST(stop * 10000 // n_tok AS BIGINT) AS stop_ratio_e4 FROM ("
    "SELECT doc_id, text, len(toks) AS n_tok, "
    "len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS stop FROM ("
    "SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') "
    "AS toks FROM documents))) GROUP BY host",
)
def host_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host quality aggregation (r6): the domain-level stats a corpus
    pipeline computes before domain filtering/reweighting — quality_score
    (pinned e4 integers) rolled up by host. One groupBy keyed by host
    (partial aggs make popular domains a non-issue)."""
    from ult_spark.ops.textops import quality_score

    docs = load(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("site"), (F.col("doc_id") % 20).cast("string"), F.lit(".example")
    )
    return (
        quality_score(docs)
        .join(docs.select("doc_id", host.alias("host")), "doc_id")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_char").cast("long").alias("sum_char"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.sum("stop_ratio_e4").cast("long").alias("sum_stop_e4"),
        )
    )


@q("cell_dbscan_l6", None)
def cell_dbscan_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (r6, ops/spatial_cluster.py): DBSCAN with
    eps = one L6 cell, min_pts = 4 — dense cells merged across the
    8-neighborhood into hotspot clusters via the shared pointer-jumping
    CC core; oracle = TRUE WITH RECURSIVE fixpoint."""
    from ult_spark.ops.spatial_cluster import cell_dbscan

    return cell_dbscan(events_points(spark, sf_dir), level=6, min_pts=4)


def _attach_dbscan_oracle() -> None:
    from ult_spark.ops.spatial_cluster import cell_dbscan_sql

    ORACLES["cell_dbscan_l6"] = cell_dbscan_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6, min_pts=4
    )


_attach_dbscan_oracle()


@q("boilerplate_strip_w2", None)
def boilerplate_strip_w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level frequent-segment boilerplate removal (r6,
    ops/curation.py host_boilerplate — the CCNet-shaped cleanup): w=2
    token windows, segments in >= 3 distinct docs of one host stripped;
    clean_h56 certifies the stripped bytes cross-engine."""
    from ult_spark.ops.curation import host_boilerplate

    host = F.concat(
        F.lit("site"), (F.col("doc_id") % 20).cast("string"), F.lit(".example")
    )
    return host_boilerplate(load(spark, sf_dir, "documents"), host, w=2, min_docs=3)


def _attach_boilerplate_oracle() -> None:
    from ult_spark.ops.curation import host_boilerplate_sql

    ORACLES["boilerplate_strip_w2"] = host_boilerplate_sql(
        "'site' || CAST(doc_id % 20 AS VARCHAR) || '.example'", w=2, min_docs=3
    )


_attach_boilerplate_oracle()


@q("pagerank_hosts_3it", None)
def pagerank_hosts_3it(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the host link graph, 3 damped power
    iterations in all-integer e9 arithmetic (r6, ops/graph.py). Edges
    derive deterministically from documents: src = site(doc_id % 20),
    dst = site(h56(doc_id) % 20), weight = doc count — both engines
    build the identical graph."""
    from ult_spark.ops.graph import pagerank
    from ult_spark.ops.textops import _h56

    docs = load(spark, sf_dir, "documents")
    site = lambda c: F.concat(F.lit("site"), c.cast("string"))  # noqa: E731
    edges = (
        docs.select(
            site(F.col("doc_id") % 20).alias("src"),
            site(_h56(F.col("doc_id").cast("string")) % 20).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return pagerank(edges, iters=3)


def _attach_pagerank_oracle() -> None:
    from ult_spark.ops.graph import pagerank_sql

    h56 = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT"
    edges = (
        "SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM ("
        "SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) AS src, "
        f"'site' || CAST({h56} % 20 AS VARCHAR) AS dst "
        "FROM documents) GROUP BY 1, 2"
    )
    ORACLES["pagerank_hosts_3it"] = pagerank_sql(edges, iters=3)


_attach_pagerank_oracle()


@q("getis_ord_l6", None)
def getis_ord_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot z-scores over occupied L6 cells (r6,
    ops/spatialstats.py): exact-integer neighborhood sums (8-adjacent,
    wrap/clamp), one fixed float expression floored to e3. The classic
    hotspot-detection statistic a geospatial pipeline runs after tile
    aggregation."""
    from ult_spark.ops.spatialstats import getis_ord_gi

    return getis_ord_gi(events_points(spark, sf_dir), level=6)


@q("morans_i_l5", None)
def morans_i_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I spatial autocorrelation over occupied L5 cells
    (r6, ops/spatialstats.py): all ingredients exact integers (n*x - Σx
    residuals), one float division floored to e6; the oracle certifies
    every integer term alongside the statistic."""
    from ult_spark.ops.spatialstats import morans_i

    return morans_i(events_points(spark, sf_dir), level=5)


def _attach_spatialstats_oracles() -> None:
    from ult_spark.ops.spatialstats import getis_ord_gi_sql, morans_i_sql

    ORACLES["getis_ord_l6"] = getis_ord_gi_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6
    )
    ORACLES["morans_i_l5"] = morans_i_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5
    )


_attach_spatialstats_oracles()


@q("emerging_hotspots_l4", None)
def emerging_hotspots_l4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-hotspot analysis (r6, ops/spatialstats.py): Gi* per daily
    slice (each day its own occupied-cell universe + broadcast globals),
    then the per-cell Mann-Kendall trend S over the e3-floored z
    sequence — S is pure integer sign counting, so the whole space-time
    composite is exact cross-engine. The MK pair join is quadratic only
    in SLICES (30 days here; production bounds it with a trailing
    window), never in cells or points."""
    from ult_spark.ops.spatialstats import emerging_hotspots

    return emerging_hotspots(
        load(spark, sf_dir, "events").select(
            "ts", UF.event_lat().alias("lat"), UF.event_lon().alias("lon")
        ),
        level=4,
    )


@q("emerging_hotspots_bounded", None)
def emerging_hotspots_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window Mann-Kendall (r7): same per-slice Gi* composite
    but the pair join keeps only slice pairs ≤ 7 days apart, so per-cell
    pair count is slices·7 instead of slices² — cost stops growing with
    history length (the production emerging-hotspot form). Identically
    bounded in the oracle."""
    from ult_spark.ops.spatialstats import emerging_hotspots

    return emerging_hotspots(
        load(spark, sf_dir, "events").select(
            "ts", UF.event_lat().alias("lat"), UF.event_lon().alias("lon")
        ),
        level=4,
        max_lag=7,
    )


def _attach_emerging_oracle() -> None:
    from ult_spark.ops.spatialstats import emerging_hotspots_sql

    ORACLES["emerging_hotspots_l4"] = emerging_hotspots_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=4
    )
    ORACLES["emerging_hotspots_bounded"] = emerging_hotspots_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=4, max_lag=7
    )


_attach_emerging_oracle()


def _attach_pmi() -> None:
    from ult_spark.ops.textops import pmi_pairs, pmi_pairs_sql

    def pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
        """PMI term-pair co-occurrence over a capped vocabulary (r6,
        ops/textops.py pmi_pairs): distinct doc-term incidences, top-40
        terms by doc frequency (deterministic total-order cap via
        TakeOrderedAndProject + broadcast), within-doc pair join bounded
        by the cap; integer counts, one double division inside ln, e6
        floor (the tfidf ln-parity precedent)."""
        return pmi_pairs(load(spark, sf_dir, "documents"), top_v=40, min_pair=2)

    QUERIES["pmi_cooccurrence"] = pmi_cooccurrence
    ORACLES["pmi_cooccurrence"] = pmi_pairs_sql(top_v=40, min_pair=2)


_attach_pmi()


@q("local_moran_l5", None)
def local_moran_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Moran's I / LISA per occupied L5 cell (r6,
    ops/spatialstats.py local_moran): exact-integer residual products,
    one final division floored to e6, sign-derived HH/LL/HL/LH quadrant
    labels — the per-cell hotspot/outlier classification that
    complements the global statistic."""
    from ult_spark.ops.spatialstats import local_moran

    return local_moran(events_points(spark, sf_dir), level=5)


def _attach_local_moran_oracle() -> None:
    from ult_spark.ops.spatialstats import local_moran_sql

    ORACLES["local_moran_l5"] = local_moran_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5
    )


_attach_local_moran_oracle()


@q("hits_hosts_3it", None)
def hits_hosts_3it(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the same deterministic host link graph
    as pagerank_hosts_3it (r6, ops/graph.py hits): 3 rounds of the
    Kleinberg recurrence in all-integer e6 arithmetic with sum
    normalization by exact integer division — bit-identical across
    engines, unrolled-CTE oracle."""
    from ult_spark.ops.graph import hits
    from ult_spark.ops.textops import _h56

    docs = load(spark, sf_dir, "documents")
    site = lambda c: F.concat(F.lit("site"), c.cast("string"))  # noqa: E731
    edges = (
        docs.select(
            site(F.col("doc_id") % 20).alias("src"),
            site(_h56(F.col("doc_id").cast("string")) % 20).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return hits(edges, iters=3)


def _attach_hits_oracle() -> None:
    from ult_spark.ops.graph import hits_sql

    h56 = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT"
    edges = (
        "SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM ("
        "SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) AS src, "
        f"'site' || CAST({h56} % 20 AS VARCHAR) AS dst "
        "FROM documents) GROUP BY 1, 2"
    )
    ORACLES["hits_hosts_3it"] = hits_sql(edges, iters=3)


_attach_hits_oracle()


@q("overlap_near_dups", None)
def overlap_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dups by the overlap coefficient (r6,
    ops/textops.py overlap_pairs): |A∩B|/min(|A|,|B|) over distinct
    shingle sets, the statistic that catches truncation/quoting pairs
    Jaccard misses; same collapse→band→verify→expand pipeline shape as
    the hash-green minhash_lsh_pairs."""
    from ult_spark.ops.textops import overlap_pairs

    return overlap_pairs(load(spark, sf_dir, "documents"), threshold=0.5)


def _attach_overlap_oracle() -> None:
    from ult_spark.ops.textops import overlap_pairs_sql

    ORACLES["overlap_near_dups"] = overlap_pairs_sql(threshold=0.5)


_attach_overlap_oracle()


@q("quadrat_chi2_l5", None)
def quadrat_chi2_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat-count chi-square CSR statistic over the full L5 grid (r6,
    ops/spatialstats.py quadrat_chi2): empty cells enter via the closed
    form (M·Σobs² − n²)/n — one partial-agg groupBy, exact integer
    ingredients, single e6-floored division."""
    from ult_spark.ops.spatialstats import quadrat_chi2

    return quadrat_chi2(events_points(spark, sf_dir), level=5)


def _attach_quadrat_oracle() -> None:
    from ult_spark.ops.spatialstats import quadrat_chi2_sql

    ORACLES["quadrat_chi2_l5"] = quadrat_chi2_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5
    )


_attach_quadrat_oracle()


def _host_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic host link graph shared by the graph queries."""
    from ult_spark.ops.textops import _h56

    docs = load(spark, sf_dir, "documents")
    site = lambda c: F.concat(F.lit("site"), c.cast("string"))  # noqa: E731
    return (
        docs.select(
            site(F.col("doc_id") % 20).alias("src"),
            site(_h56(F.col("doc_id").cast("string")) % 20).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


_HOST_EDGES_SQL = (
    "SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM ("
    "SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) AS src, "
    "'site' || CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))"
    "::BIGINT % 20 AS VARCHAR) AS dst "
    "FROM documents) GROUP BY 1, 2"
)


@q("cocitation_hosts", None)
def cocitation_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation over the host link graph (r6, ops/graph.py
    cocitation): destination pairs sharing a source, with the classic
    weighted form Σ w_u·w_v — one self-join on the shared endpoint +
    one pair-keyed groupBy, all exact integers. r7: the per-shared-node
    top-k edge cap is enforced in-operator (window + filter before the
    self-join; identically mirrored in the oracle), bounding hub fanout
    at max_deg² — run cocitation_oversized_hosts for what was cut."""
    from ult_spark.ops.graph import cocitation

    return cocitation(_host_edges(spark, sf_dir), by="dst")


@q("cocitation_oversized_hosts", None)
def cocitation_oversized_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surfacing half of the capped co-citation plan (r7): source nodes
    whose out-fanout exceeds the cap, with the dropped edge count —
    empty on a healthy graph (the near_dup_oversized protocol)."""
    from ult_spark.ops.graph import cocitation_oversized

    return cocitation_oversized(_host_edges(spark, sf_dir), by="dst")


def _attach_cocitation_oracle() -> None:
    from ult_spark.ops.graph import cocitation_oversized_sql, cocitation_sql

    ORACLES["cocitation_hosts"] = cocitation_sql(_HOST_EDGES_SQL, by="dst")
    ORACLES["cocitation_oversized_hosts"] = cocitation_oversized_sql(
        _HOST_EDGES_SQL, by="dst"
    )


_attach_cocitation_oracle()


@q("degree_distribution", None)
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the undirected host graph (r7,
    ops/graph.py): the power-law sanity check — two partial-agg
    groupBys, exact integers."""
    from ult_spark.ops.graph import degree_distribution as dd

    return dd(_host_edges(spark, sf_dir))


@q("jaccard_host_links", None)
def jaccard_host_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-neighbor-set Jaccard similarity between host pairs (r7):
    common/degree ingredients exact, one floored float ratio; the
    cocitation per-shared-node cap applies to BOTH common and degrees
    so the statistic is a true Jaccard of the truncated sets."""
    from ult_spark.ops.graph import jaccard_links

    return jaccard_links(_host_edges(spark, sf_dir), by="dst")


@q("adamic_adar_links", None)
def adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link-prediction index over host pairs (r7): per-
    shared-neighbor term floor(1e6/ln(fanout)) floored BEFORE the pair
    sum (order-free integer sum; fanout ≥ 2 whenever shared, so ln > 0)."""
    from ult_spark.ops.graph import adamic_adar

    return adamic_adar(_host_edges(spark, sf_dir), by="dst")


@q("assortativity_hosts", None)
def assortativity_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the host graph (r7): all
    moments exact integers over the symmetric edge list, one floored
    ratio — do hubs link to hubs or to the tail?"""
    from ult_spark.ops.graph import assortativity

    return assortativity(_host_edges(spark, sf_dir))


@q("label_propagation_hosts", None)
def label_propagation_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation, 2 sweeps (r7): most
    frequent neighbor label, ties to min label — the pinned tie rule
    makes the unrolled oracle exact."""
    from ult_spark.ops.graph import label_propagation

    return label_propagation(_host_edges(spark, sf_dir), rounds=2)


def _attach_linkstats_oracles() -> None:
    from ult_spark.ops.graph import (
        adamic_adar_sql,
        assortativity_sql,
        degree_distribution_sql,
        jaccard_links_sql,
        label_propagation_sql,
    )

    ORACLES["degree_distribution"] = degree_distribution_sql(_HOST_EDGES_SQL)
    ORACLES["jaccard_host_links"] = jaccard_links_sql(_HOST_EDGES_SQL, by="dst")
    ORACLES["adamic_adar_links"] = adamic_adar_sql(_HOST_EDGES_SQL, by="dst")
    ORACLES["assortativity_hosts"] = assortativity_sql(_HOST_EDGES_SQL)
    ORACLES["label_propagation_hosts"] = label_propagation_sql(
        _HOST_EDGES_SQL, rounds=2
    )


_attach_linkstats_oracles()


@q("edge_triangle_support", None)
def edge_triangle_support_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge triangle support over the host graph (r7 cont.,
    ops/graph.py edge_triangle_support): the k-truss ingredient — an
    edge is in the k-truss iff support ≥ k−2. Degree-ordered triangle
    enumeration (arboricity-bounded wedges) + one explode(3) + one
    edge-keyed groupBy; zero-support edges kept via left join."""
    from ult_spark.ops.graph import edge_triangle_support

    return edge_triangle_support(_host_edges(spark, sf_dir))


@q("personalized_pagerank_hosts", None)
def personalized_pagerank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (random walk with restart, Jeh & Widom
    2003) from the deterministic min-id seed host, 3 integer e9 rounds
    (r7 cont., ops/graph.py personalized_pagerank): proximity-to-seed
    scores — the related-host feature. Seed reaches the plan as a
    broadcast 1-row min aggregate, never a collect."""
    from ult_spark.ops.graph import personalized_pagerank

    return personalized_pagerank(_host_edges(spark, sf_dir), iters=3)


@q("connected_components_hosts", None)
def connected_components_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label connected components of the undirected host graph (r7
    cont., ops/graph.py connected_components_graph): the dup-clusters
    pointer-jumping CC core re-exposed for link graphs; oracle is the
    TRUE WITH RECURSIVE fixpoint, so the driver certifies convergence
    itself, not just an unrolled bound."""
    from ult_spark.ops.graph import connected_components_graph

    return connected_components_graph(_host_edges(spark, sf_dir))


def _attach_graph_r7c_oracles() -> None:
    from ult_spark.ops.graph import (
        connected_components_graph_sql,
        edge_triangle_support_sql,
        personalized_pagerank_sql,
    )

    ORACLES["edge_triangle_support"] = edge_triangle_support_sql(_HOST_EDGES_SQL)
    ORACLES["personalized_pagerank_hosts"] = personalized_pagerank_sql(
        _HOST_EDGES_SQL, iters=3
    )
    ORACLES["connected_components_hosts"] = connected_components_graph_sql(
        _HOST_EDGES_SQL
    )


_attach_graph_r7c_oracles()


@q("semivariogram_l5", None)
def semivariogram_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram of the L5 occupied-cell count surface
    (r6, ops/spatialstats.py semivariogram): exact integer pair counts
    and squared-difference sums per Chebyshev lag 1..3, one e6-floored
    division per lag; one ring-offset explode + hash equi-join + one
    groupBy."""
    from ult_spark.ops.spatialstats import semivariogram

    return semivariogram(events_points(spark, sf_dir), level=5, max_h=3)


def _attach_semivariogram_oracle() -> None:
    from ult_spark.ops.spatialstats import semivariogram_sql

    ORACLES["semivariogram_l5"] = semivariogram_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5, max_h=3
    )


_attach_semivariogram_oracle()


@q("host_lang_divergence", None)
def host_lang_divergence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host language-mix KL divergence from the corpus mix (r6,
    ops/curation.py host_lang_divergence): the domain-level curation
    signal that flags mixed-language spam hosts; per-term e9 floors
    before the order-free integer sum (token_entropy precedent)."""
    from ult_spark.ops.curation import host_lang_divergence

    host = F.concat(
        F.lit("site"), (F.col("doc_id") % 20).cast("string"), F.lit(".example")
    )
    return host_lang_divergence(load(spark, sf_dir, "documents"), host)


def _attach_lang_div_oracle() -> None:
    from ult_spark.ops.curation import host_lang_divergence_sql

    ORACLES["host_lang_divergence"] = host_lang_divergence_sql(
        "'site' || CAST(doc_id % 20 AS VARCHAR) || '.example'"
    )


_attach_lang_div_oracle()


@q(
    "geohash_counts_p4",
    "SELECT " + UF.geohash_sql(UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, 4)
    + " AS gh, CAST(count(*) AS BIGINT) AS cnt, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS users "
    "FROM events GROUP BY 1",
)
def geohash_counts_p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash interop (r6, functions.geohash_encode): events bucketed by
    precision-4 geohash — the third external grid key (after quadkey and
    H3 structural) users bring; pure native bit math + base32 lookup, one
    partial-agg groupBy."""
    ev = events_points(spark, sf_dir)
    return ev.groupBy(UF.geohash_encode("lat", "lon", 4).alias("gh")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.countDistinct("user_id").cast("long").alias("users"),
    )


@q(
    "geohash_bridge_p4",
    # the ORACLE takes the DIRECT lat/lon->cell path at level 10; the Spark
    # side goes THROUGH the geohash string and back (encode -> base32 ->
    # parse -> cell), so a hash match certifies the whole string bridge
    "SELECT " + UF.cell_sql(UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, 10)
    + " AS cell, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1",
)
def geohash_bridge_p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash string round-trip bridge (r6, functions.geohash_to_cell):
    events encoded to precision-4 geohashes, parsed BACK to level-10 grid
    cells, aggregated — hash-compared against the direct encode path, so
    external geohash-keyed joins are certified exact."""
    ev = events_points(spark, sf_dir)
    gh = UF.geohash_encode("lat", "lon", 4)
    return ev.groupBy(UF.geohash_to_cell(gh, 4).alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


@q("source_js_divergence", None)
def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' vocabulary
    document-frequency distributions (r6, ops/textops.py
    source_token_js): the corpus-drift statistic a pipeline runs when
    comparing crawls/sources; per-term e9 floors before order-free
    integer sums, clamped integer halving."""
    from ult_spark.ops.textops import source_token_js

    return source_token_js(load(spark, sf_dir, "documents"), "src0", "src1")


def _attach_js_oracle() -> None:
    from ult_spark.ops.textops import source_token_js_sql

    ORACLES["source_js_divergence"] = source_token_js_sql("src0", "src1")


_attach_js_oracle()


@q("gearys_c_l5", None)
def gearys_c_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Geary's C spatial autocorrelation over occupied L5 cells
    (r6, ops/spatialstats.py): the local-difference complement to
    Moran's I — with n-scaled residuals the n² factors cancel, so
    every ingredient (n, W, Σ(uᵢ−uⱼ)², Σu²) is an exact integer and the
    statistic is one float division floored to e6."""
    from ult_spark.ops.spatialstats import gearys_c

    return gearys_c(events_points(spark, sf_dir), level=5)


def _attach_geary_oracle() -> None:
    from ult_spark.ops.spatialstats import gearys_c_sql

    ORACLES["gearys_c_l5"] = gearys_c_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5
    )


_attach_geary_oracle()


@q("ripley_k_l5", None)
def ripley_k_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K point-pattern function over the L5 grid (r6,
    ops/spatialstats.py): cumulative ordered pair counts by Chebyshev
    cell distance 0..3 — the classic multi-scale clustering/dispersion
    statistic. All counts exact integers; the pair join is
    occupied-cells x 48 literal offsets (never points x points)."""
    from ult_spark.ops.spatialstats import ripley_k

    return ripley_k(events_points(spark, sf_dir), level=5, max_r=3)


def _attach_ripley_oracle() -> None:
    from ult_spark.ops.spatialstats import ripley_k_sql

    ORACLES["ripley_k_l5"] = ripley_k_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5, max_r=3
    )


_attach_ripley_oracle()


@q("host_mirror_pairs", None)
def host_mirror_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection (r6, ops/textops.py host_mirror_pairs —
    Bharat & Broder 1999 shape): host pairs sharing many exact-content
    md5 fingerprints, with non-discriminative fingerprints (> max_hosts
    hosts) dropped first so the pair join is capped, never quadratic in
    hosts sharing a template. The corpus has no cross-host exact dups,
    so a deterministic literal mirror plant (same values in both
    engines) exercises the path — the pii_scrub precedent."""
    from ult_spark.ops.textops import host_mirror_pairs, planted_mirror_docs

    return host_mirror_pairs(planted_mirror_docs(load(spark, sf_dir, "documents")))


def _attach_mirror_oracle() -> None:
    from ult_spark.ops.textops import host_mirror_pairs_sql

    ORACLES["host_mirror_pairs"] = host_mirror_pairs_sql()


_attach_mirror_oracle()


def _policy_rules() -> list[tuple[str, int, int]]:
    """Deterministic literal policy table (fed verbatim to BOTH engines):
    per host a root allow rule, a /private/ deny rule, and for even
    hosts a deeper /private/pub/ re-allow — so longest-match decides."""
    rules = []
    for h in range(20):
        base = f"https://site{h}.example/"
        rules.append((base, h, 1))
        rules.append((base + "private/", 100 + h, 0))
        if h % 2 == 0:
            rules.append((base + "private/pub/", 200 + h, 1))
    return rules


@q("url_policy_counts", None)
def url_policy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match URL policy (r6, extract/url.py
    prefix_policy_match — the robots/path-rule primitive): every event
    URL matched against a 50-rule literal policy table, most specific
    rule wins, URL counts per (rule_id, allow). The match is one
    broadcast hash equi-join on length-exploded prefixes — never
    URL x rules."""
    from ult_spark.extract.url import prefix_policy_match

    ev = load(spark, sf_dir, "events").select("event_id")
    v = F.col("event_id") % 4
    url = F.concat(
        F.lit("https://site"),
        (F.col("event_id") % 20).cast("string"),
        F.lit(".example/"),
        F.when(v == 1, "private/x")
        .when(v == 2, "private/pub/y")
        .when(v == 3, "a/b")
        .otherwise(""),
    )
    urls = ev.select("event_id", url.alias("url"))
    rules = spark.createDataFrame(
        _policy_rules(), "prefix string, rule_id long, allow long"
    )
    return prefix_policy_match(urls, rules).groupBy("rule_id", "allow").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls")
    )


def _attach_policy_oracle() -> None:
    vals = ", ".join(f"('{p}', {rid}, {al})" for p, rid, al in _policy_rules())
    ORACLES["url_policy_counts"] = (
        "WITH u AS (SELECT event_id, 'https://site' || "
        "CAST(event_id % 20 AS VARCHAR) || '.example/' || "
        "CASE event_id % 4 WHEN 1 THEN 'private/x' "
        "WHEN 2 THEN 'private/pub/y' WHEN 3 THEN 'a/b' ELSE '' END AS url "
        "FROM events), "
        f"r(prefix, rule_id, allow) AS (VALUES {vals}), "
        "cand AS (SELECT u.event_id, r.rule_id, r.allow, "
        "length(r.prefix) AS rl FROM u JOIN r "
        "ON substr(u.url, 1, length(r.prefix)) = r.prefix), "
        "best AS (SELECT event_id, rule_id, allow FROM "
        "(SELECT *, row_number() OVER (PARTITION BY event_id "
        "ORDER BY rl DESC, rule_id) AS rn FROM cand) WHERE rn = 1) "
        "SELECT CAST(coalesce(b.rule_id, -1) AS BIGINT) AS rule_id, "
        "CAST(coalesce(b.allow, 1) AS BIGINT) AS allow, "
        "CAST(count(*) AS BIGINT) AS n_urls "
        "FROM u LEFT JOIN best b USING (event_id) GROUP BY 1, 2"
    )


_attach_policy_oracle()


@q("nn_gfunction_l5", None)
def nn_gfunction_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor G function over occupied L5 cells (r6,
    ops/spatialstats.py nn_gfunction): the empirical CDF of
    nearest-occupied-neighbor Chebyshev distances — the event-to-event
    companion of Ripley's K; exact integer bins + one floored division
    per row."""
    from ult_spark.ops.spatialstats import nn_gfunction

    return nn_gfunction(events_points(spark, sf_dir), level=5, max_r=3)


def _attach_gfunction_oracle() -> None:
    from ult_spark.ops.spatialstats import nn_gfunction_sql

    ORACLES["nn_gfunction_l5"] = nn_gfunction_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5, max_r=3
    )


_attach_gfunction_oracle()


@q("k_core_hosts", None)
def k_core_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel of the host link graph (r6, ops/graph.py k_core):
    3 peel rounds at k=4 over the weight>=3 undirected simple graph —
    removals cascade (20 -> 14 -> 12 -> 11 hosts at sf0.01), isolating
    the densely interlinked community; rounds unrolled identically in
    the oracle."""
    from ult_spark.ops.graph import k_core

    return k_core(_host_edges(spark, sf_dir), k=4, rounds=3, min_w=3)


@q("k_core_fixpoint_hosts", None)
def k_core_fixpoint_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-fixpoint k-core (r7, ops/graph.py k_core_fixpoint): peel
    until stable — localCheckpoint-per-round + stats barrier + the
    observe()-folded edge-count fixpoint test. The oracle unrolls 24
    peel rounds (cascades at sf0.01 settle in 3-4; 24 is far past any
    plausible depth for this graph), so the driver hash-match certifies
    fixpoint ≡ unrolled-24 — the cascade-equivalence pin the r6 verdict
    asked for, on driver data."""
    from ult_spark.ops.graph import k_core_fixpoint

    return k_core_fixpoint(_host_edges(spark, sf_dir), k=4, min_w=3)


def _attach_kcore_oracle() -> None:
    from ult_spark.ops.graph import k_core_sql

    ORACLES["k_core_hosts"] = k_core_sql(_HOST_EDGES_SQL, k=4, rounds=3, min_w=3)
    ORACLES["k_core_fixpoint_hosts"] = k_core_sql(
        _HOST_EDGES_SQL, k=4, rounds=24, min_w=3
    )


_attach_kcore_oracle()


@q("host_triangles", None)
def host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient per host (r6,
    ops/graph.py triangles): ordered-triple enumeration via two hash
    equi-joins on the id-oriented edge list (each triangle counted
    once), exploded to corners for the per-node count; cc_e6 floors
    2·tri/(deg·(deg−1)). Weight floor 3 keeps the graph sparse enough
    to be non-trivial (same threshold as k_core_hosts)."""
    from ult_spark.ops.graph import triangles

    return triangles(_host_edges(spark, sf_dir), min_w=3)


def _attach_triangles_oracle() -> None:
    from ult_spark.ops.graph import triangles_sql

    ORACLES["host_triangles"] = triangles_sql(_HOST_EDGES_SQL, min_w=3)


_attach_triangles_oracle()


@q(
    "user_rog",
    # the same exact-integer moments in ANSI SQL; e3 integer degree units
    "WITH m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
    "CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2 "
    "FROM (SELECT user_id, "
    "(event_id * 2654435761) % 360000 - 180000 AS x, "
    "(user_id * 40503 + event_id) % 180000 - 90000 AS y FROM events) "
    "GROUP BY 1) "
    "SELECT user_id, n, "
    "n * (sx2 + sy2) - (sx * sx + sy * sy) AS rog2_num, "
    "CAST(floor(sqrt(CAST(n * (sx2 + sy2) - (sx * sx + sy * sy) AS DOUBLE)) "
    "/ CAST(n AS DOUBLE)) AS BIGINT) AS rog_e3 FROM m",
)
def user_rog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius of gyration per user (r6; the Gonzalez/Hidalgo/Barabasi
    2008 mobility statistic): RMS planar distance of a user's events
    from their centroid. The event grid is e3-quantized by construction
    (FIXTURES.md §A), so every moment is an EXACT integer in e3 degree
    units: ``RoG² = (n·Σ(x²+y²) − (Σx)² − (Σy)²) / n²`` — one sqrt +
    one division at the end (both IEEE correctly-rounded), floored.
    r7: moments via :func:`rog_from_points` (per-user min-anchor
    pre-centering — see its docstring for the overflow-bound math)."""
    ev = load(spark, sf_dir, "events")
    x = ((F.col("event_id") * F.lit(2654435761)) % 360000 - 180000).cast("long")
    y = ((F.col("user_id") * F.lit(40503) + F.col("event_id")) % 180000 - 90000).cast("long")
    return rog_from_points(ev.select("user_id", x.alias("x"), y.alias("y")))


def rog_from_points(pts: DataFrame) -> DataFrame:
    """Exact-integer radius-of-gyration moments over (user_id, x, y).

    r7 hardening (r6 verdict "What's wrong #2"): coordinates are
    PRE-CENTERED at each user's integer (min x, min y) anchor before
    the moments. ``n·Σx² − (Σx)²`` is exactly translation-invariant
    over the integers, so the outputs (and the unanchored oracle) are
    bit-identical — the driver hash-match certifies the invariance —
    but the overflow bound moves from the GLOBAL coordinate range to
    the PER-USER SPREAD: ``n²·spread² < 2^63`` ⇒ n < 3.0e9/spread_e3,
    e.g. ~3e6 events for a 1°-spread user and ~3e8 for a ~1 km-spread
    user (the raw form capped at ~8,000 for EVERY user regardless of
    locality, since raw coords always span ±1.8e5). A truly
    globe-spanning user keeps the old cliff — inherent to the integer
    ``rog2_num = n²·RoG²`` output definition, not the computation —
    and Spark 4 ANSI mode raises loudly there instead of wrapping.

    Scale: anchors are a partial-agg groupBy whose tiny per-user
    output broadcast-joins back onto the points, then one partial-agg
    moments groupBy — two column-pruned scans, zero full-row
    shuffles, vs the single-shuffle window alternative that would
    forfeit map-side combine."""
    anchors = pts.groupBy("user_id").agg(
        F.min("x").alias("ax"), F.min("y").alias("ay")
    )
    cx = F.col("x") - F.col("ax")
    cy = F.col("y") - F.col("ay")
    m = (
        pts.join(F.broadcast(anchors), "user_id")
        .select("user_id", cx.alias("x"), cy.alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
        )
    )
    num = (
        F.col("n") * (F.col("sx2") + F.col("sy2"))
        - (F.col("sx") * F.col("sx") + F.col("sy") * F.col("sy"))
    ).cast("long")
    return m.select(
        "user_id",
        "n",
        num.alias("rog2_num"),
        F.floor(
            F.sqrt(num.cast("double")) / F.col("n").cast("double")
        ).cast("long").alias("rog_e3"),
    )


@q(
    "user_visit_entropy",
    "WITH vis AS (SELECT user_id, " + _cell(8) + " AS cell, "
    "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
    "tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n, "
    "CAST(count(*) AS BIGINT) AS n_cells FROM vis GROUP BY 1), "
    "t AS (SELECT v.user_id, "
    "CAST(floor(1000000000.0::DOUBLE * (CAST(v.c AS DOUBLE) / CAST(tot.n AS DOUBLE)) "
    "* ln(CAST(tot.n AS DOUBLE) / CAST(v.c AS DOUBLE))) AS BIGINT) AS term "
    "FROM vis v JOIN tot USING (user_id)) "
    "SELECT tot.user_id, tot.n, tot.n_cells, "
    "CAST(sum(t.term) AS BIGINT) AS entropy_e9 "
    "FROM t JOIN tot USING (user_id) GROUP BY 1, 2, 3",
)
def user_visit_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit-location entropy per user (r6; the Song/Qu/Blumm/Barabási
    2010 predictability statistic): Shannon entropy of the user's
    visited-L8-cell distribution. ``p_i = c_i/n`` with exact integer
    counts, so each ``ln`` argument ``n/c_i`` is an exact integer ratio
    (the PMI bound argument) — per-term e9 floors BEFORE the order-free
    integer sum (the token_entropy precedent). Scale: two partial-agg
    groupBys + one user-keyed join, nothing quadratic."""
    ev = events_points(spark, sf_dir)
    vis = (
        ev.groupBy("user_id", UF.latlon_to_cell("lat", "lon", 8).alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = vis.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    term = F.floor(
        F.lit(1000000000.0)
        * (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
    ).cast("long")
    return (
        vis.join(tot, "user_id")
        .select("user_id", term.alias("_t"))
        .groupBy("user_id")
        .agg(F.sum("_t").cast("long").alias("entropy_e9"))
        .join(tot, "user_id")
        .select("user_id", "n", "n_cells", "entropy_e9")
    )


# ---------------------------------------------------------------------------
# r7: hourly time-series decomposition + anomaly scoring


@q(
    "stl_decompose_hourly",
    # floor(epoch) to integer seconds FIRST (the emerging-hotspots rule),
    # then integer hour buckets; every float is floored at a pinned point
    "WITH hourly AS (SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) "
    "AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "tr AS (SELECT hr, cnt, CAST(floor(1000.0::DOUBLE * "
    "CAST(sum(cnt) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)) AS BIGINT) "
    "AS trend_e3 FROM hourly "
    "WINDOW w AS (ORDER BY hr ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)), "
    "dt AS (SELECT hr, cnt, trend_e3, 1000 * cnt - trend_e3 AS dt_e3, "
    "hr % 24 AS hod FROM tr), "
    "s AS (SELECT hr, cnt, trend_e3, dt_e3, CAST(floor("
    "CAST(sum(dt_e3) OVER (PARTITION BY hod) AS DOUBLE) / "
    "CAST(count(*) OVER (PARTITION BY hod) AS DOUBLE)) AS BIGINT) AS seasonal_e3 "
    "FROM dt) "
    "SELECT hr, cnt, trend_e3, seasonal_e3, "
    "CAST(dt_e3 - seasonal_e3 AS BIGINT) AS resid_e3 FROM s",
)
def stl_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style decomposition of the hourly event-count series (r7):
    trend = ±12-hour centered moving average (e3-floored from exact
    integer sums), seasonal = per-hour-of-day mean of the detrended
    series (floored), residual = remainder — additive, so
    1000·cnt ≡ trend + seasonal + resid by construction. Global windows
    are over the HOURLY AGGREGATE (bounded by elapsed hours, ~720/month,
    regardless of event volume — the tile_rank_ntile justification)."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("hr").rowsBetween(-12, 12)
    trend = F.floor(
        F.lit(1000.0) * F.sum("cnt").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    ).cast("long")
    dt = hourly.select(
        "hr", "cnt", trend.alias("trend_e3"),
        (F.lit(1000) * F.col("cnt") - trend).alias("dt_e3"),
        (F.col("hr") % 24).alias("hod"),
    )
    wh = Window.partitionBy("hod")
    seasonal = F.floor(
        F.sum("dt_e3").over(wh).cast("double")
        / F.count(F.lit(1)).over(wh).cast("double")
    ).cast("long")
    return dt.select(
        "hr", "cnt", "trend_e3", seasonal.alias("seasonal_e3"),
        (F.col("dt_e3") - seasonal).cast("long").alias("resid_e3"),
    )


@q(
    "hourly_anomalies",
    "WITH hourly AS (SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) "
    "AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "h2 AS (SELECT hr, cnt, hr % 24 AS hod FROM hourly), "
    "st AS (SELECT hod, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt * cnt) AS BIGINT) AS s2 "
    "FROM h2 GROUP BY 1), "
    "z AS (SELECT h2.hr, h2.cnt, st.n, "
    "CASE WHEN st.n * st.s2 - st.s * st.s > 0 THEN "
    "CAST(floor(1000.0::DOUBLE * CAST(st.n * h2.cnt - st.s AS DOUBLE) / "
    "sqrt(CAST(st.n * st.s2 - st.s * st.s AS DOUBLE))) AS BIGINT) "
    "ELSE NULL END AS z_e3 FROM h2 JOIN st USING (hod)) "
    "SELECT hr, cnt, n, z_e3 FROM z WHERE abs(z_e3) >= 2000",
)
def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day-seasonal anomaly detection (r7): z-score of each
    hour's event count against its hour-of-day population
    (z = (n·x − Σx)/√(n·Σx² − (Σx)²) — exact integer ingredients, one
    floored float, the Gi* discipline); emits hours with |z| ≥ 2. NULL
    variance (constant hod series) never flags."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("hod", F.col("hr") % 24)
    )
    st = hourly.groupBy("hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    den = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    z_e3 = F.when(
        den > 0,
        F.floor(
            F.lit(1000.0)
            * (F.col("n") * F.col("cnt") - F.col("s")).cast("double")
            / F.sqrt(den.cast("double"))
        ),
    ).cast("long")
    return (
        hourly.join(st, "hod")
        .select("hr", "cnt", "n", z_e3.alias("z_e3"))
        .where(F.abs(F.col("z_e3")) >= 2000)
    )


# ---------------------------------------------------------------------------
# r7: corpus IR statistics


@q(
    "idf_top_terms",
    "WITH tok AS (SELECT DISTINCT doc_id, unnest(list_filter("
    "string_split(text, ' '), x -> x != '')) AS token FROM documents), "
    "df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1), "
    "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents) "
    "SELECT token, df, CAST(floor(1000000.0::DOUBLE * "
    "ln(CAST(n.n AS DOUBLE) / CAST(df AS DOUBLE))) AS BIGINT) AS idf_e6 "
    "FROM df CROSS JOIN n ORDER BY df DESC, token ASC LIMIT 50",
)
def idf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 document-frequency terms with e6-floored IDF (r7): one
    distinct-explode + groupBy; N rides as a broadcast one-row agg;
    total order (df DESC, token ASC) before the LIMIT."""
    from ult_spark.ops.textops import tokens_col

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("token")
    ).distinct()
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n1 = F.broadcast(docs.agg(F.count(F.lit(1)).cast("long").alias("_n")))
    idf = F.floor(
        F.lit(1000000.0)
        * F.log(F.col("_n").cast("double") / F.col("df").cast("double"))
    ).cast("long")
    return (
        dfreq.crossJoin(n1)
        .select("token", "df", idf.alias("idf_e6"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(50)
    )


@q("minwise_host_sim", None)
def minwise_host_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-wise host similarity (r7): each host's token set sketched as
    16 independent min-hashes (h56 of token + pinned seed suffix —
    engine-exact md5 arithmetic); pairwise similarity = matching slots
    × 625 (e4), emitted for pairs sharing ≥ 1 slot (a 0-match pair has
    estimated similarity 0 — not a result). The sketch is ONE groupBy
    with 16 min aggregates over the exploded tokens; CANDIDATE pairs
    come from a (slot index, value) equi-self-join of the exploded
    signatures — exactly 1-slot LSH banding, so the join produces only
    colliding pairs instead of |hosts|²/2 (the all-pairs crossJoin this
    replaced was a BroadcastNestedLoop — fine for 20 sites, wrong at a
    web-scale host universe)."""
    from ult_spark.ops.textops import _h56, tokens_col

    docs = fanout(load(spark, sf_dir, "documents"))
    site = F.concat(F.lit("site"), (F.col("doc_id") % 20).cast("string"))
    # r8 perf: min over a multiset == min over its support set, so dedupe
    # (host, token) BEFORE the 16-lane md5 work — the corpus has ~2.7M
    # token occurrences but only hundreds of distinct (host, token) pairs,
    # and the distinct's map-side partial aggregation collapses almost all
    # of the shuffle (guide §2.3 "aggregate before you shuffle"). The 16
    # md5 evaluations drop from per-occurrence to per-distinct-pair.
    tok = docs.select(
        site.alias("host"), F.explode(tokens_col("text")).alias("t")
    ).distinct()
    sig = tok.groupBy("host").agg(
        *[
            F.min(_h56(F.concat(F.col("t"), F.lit(f"#{i}"))))
            .alias(f"m{i}")
            for i in range(16)
        ]
    )
    # sig is consumed by three plan branches (slot explode + both pair
    # sides); localCheckpoint the |hosts|-row signature table so the
    # token scan runs once, not three times (guide §3.3 materialise
    # shared intermediates; CLAUDE.md crossJoin-branch lesson)
    sig = sig.localCheckpoint()
    slots = sig.select(
        "host",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("i"), F.col(f"m{i}").alias("v"))
                for i in range(16)
            ])
        ).alias("s"),
    ).select("host", F.col("s.i").alias("i"), F.col("s.v").alias("v"))
    cand = (
        slots.alias("l")
        .join(slots.alias("r"), ["i", "v"])
        .where(F.col("l.host") < F.col("r.host"))
        .select(F.col("l.host").alias("u"), F.col("r.host").alias("v"))
        .distinct()
    )
    l = sig.select(F.col("host").alias("u"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(16)])
    r = sig.select(F.col("host").alias("v"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(16)])
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("long") for i in range(16)
    )
    return (
        cand.join(l, "u").join(r, "v")
        .select("u", "v", matches.alias("matches"),
                (matches * F.lit(625)).cast("long").alias("sim_e4"))
    )


def _attach_minwise_oracle() -> None:
    mins = ", ".join(
        "CAST(min(('0x' || substr(md5(t || '#" + str(i) + "'), 1, 14))::BIGINT) "
        f"AS BIGINT) AS m{i}"
        for i in range(16)
    )
    match = " + ".join(f"CAST(l.m{i} = r.m{i} AS BIGINT)" for i in range(16))
    # the all-pairs form filtered to matches >= 1 is value-identical to
    # the Spark side's 1-slot-band candidate join (a pair collides on
    # some slot iff it has >= 1 matching slot)
    ORACLES["minwise_host_sim"] = (
        "WITH tok AS (SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) AS host, "
        "unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t "
        "FROM documents), "
        f"sig AS (SELECT host, {mins} FROM tok GROUP BY 1) "
        f"SELECT u, v, matches, CAST(matches * 625 AS BIGINT) AS sim_e4 FROM ("
        f"SELECT l.host AS u, r.host AS v, CAST({match} AS BIGINT) AS matches "
        "FROM sig l JOIN sig r ON l.host < r.host) WHERE matches >= 1"
    )


_attach_minwise_oracle()


@q(
    "shingle_profile_sizes",
    "WITH pc AS (SELECT d.doc_id, CAST(count(s.shingle) AS BIGINT) AS n_shingles "
    "FROM documents d LEFT JOIN (SELECT doc_id, shingle FROM ("
    "SELECT doc_id, unnest([array_to_string(toks[i : i + 2], ' ') "
    "for i in generate_series(1, greatest(len(toks) - 2, 0))]) AS shingle "
    "FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') "
    "AS toks FROM documents)) WHERE len(string_split(shingle, ' ')) = 3 "
    "GROUP BY doc_id, shingle) s ON s.doc_id = d.doc_id GROUP BY 1) "
    "SELECT n_shingles, CAST(count(*) AS BIGINT) AS n_docs FROM pc GROUP BY 1",
)
def shingle_profile_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-doc DISTINCT 3-token-shingle set sizes (r7)
    — the dedup capacity profile (shingle-set size drives MinHash cost
    and LSH bucket shape). Docs too short to shingle land in the 0
    bucket via the left join."""
    from ult_spark.ops.textops import shingles

    docs = load(spark, sf_dir, "documents")
    per_doc = (
        shingles(docs).distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(F.coalesce("n_shingles", F.lit(0).cast("long")).alias("n_shingles"))
        .groupBy("n_shingles")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@q(
    "dbscan_noise_ratio",
    f"WITH c AS (SELECT {_cell(6)} AS cell, CAST(count(*) AS BIGINT) AS cnt "
    "FROM events GROUP BY 1) "
    "SELECT CAST(sum(cnt) AS BIGINT) AS total, "
    "CAST(coalesce(sum(cnt) FILTER (cnt < 4), 0) AS BIGINT) AS noise, "
    "CAST(count(*) FILTER (cnt >= 4) AS BIGINT) AS dense_cells, "
    "CASE WHEN coalesce(sum(cnt), 0) > 0 THEN "
    "CAST(floor(1000000.0::DOUBLE * CAST(coalesce(sum(cnt) FILTER (cnt < 4), 0) "
    "AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)) AS BIGINT) ELSE NULL END "
    "AS noise_ratio_e6 FROM c",
)
def dbscan_noise_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN noise summary (r7): share of events in sub-dense L6
    cells under the cell_dbscan_l6 parameters — the one-row data-quality
    gauge a clustering run reports next to its clusters. One partial-agg
    groupBy + one global agg."""
    cells = (
        events_points(spark, sf_dir)
        .groupBy(UF.latlon_to_cell("lat", "lon", 6).alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    noise = F.coalesce(
        F.sum(F.when(F.col("cnt") < 4, F.col("cnt"))), F.lit(0)
    ).cast("long")
    total = F.sum("cnt").cast("long")
    return cells.agg(
        total.alias("total"),
        noise.alias("noise"),
        F.count(F.when(F.col("cnt") >= 4, F.lit(1))).cast("long").alias("dense_cells"),
        F.when(
            F.coalesce(total, F.lit(0)) > 0,
            F.floor(
                F.lit(1000000.0) * noise.cast("double") / total.cast("double")
            ),
        ).cast("long").alias("noise_ratio_e6"),
    )


@q(
    "graph_summary_hosts",
    "WITH e AS MATERIALIZED (" + _HOST_EDGES_SQL + "), "
    "d AS (SELECT src, dst FROM e WHERE src <> dst), "
    "n AS (SELECT CAST(count(*) AS BIGINT) AS nodes FROM "
    "(SELECT src AS x FROM d UNION SELECT dst FROM d)), "
    "m AS (SELECT CAST(count(*) AS BIGINT) AS arcs FROM d), "
    "r AS (SELECT CAST(count(*) AS BIGINT) AS recip FROM d a "
    "JOIN d b ON b.src = a.dst AND b.dst = a.src) "
    "SELECT n.nodes, m.arcs, r.recip, "
    "CASE WHEN m.arcs > 0 THEN "
    "CAST(floor(1000000.0::DOUBLE * CAST(r.recip AS DOUBLE) "
    "/ CAST(m.arcs AS DOUBLE)) AS BIGINT) ELSE NULL END AS reciprocity_e6, "
    "CASE WHEN n.nodes > 1 THEN "
    "CAST(floor(1000000.0::DOUBLE * CAST(m.arcs AS DOUBLE) "
    "/ CAST(n.nodes * (n.nodes - 1) AS DOUBLE)) AS BIGINT) ELSE NULL END AS density_e6 "
    "FROM n, m, r",
)
def graph_summary_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row host-graph summary (r7): node/arc counts, reciprocity
    (share of arcs whose reverse arc exists — the directed-web-graph
    health statistic) and directed density, both e6-floored from exact
    integer counts. Reciprocity is ONE self-equi-join on the reversed
    key pair; everything else is partial aggs."""
    d = (
        _host_edges(spark, sf_dir)
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    nodes = (
        d.select(F.col("src").alias("x"))
        .unionByName(d.select(F.col("dst").alias("x")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("nodes"))
    )
    arcs = d.agg(F.count(F.lit(1)).cast("long").alias("arcs"))
    recip = (
        d.join(
            d.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            ["src", "dst"],
        )
        .agg(F.count(F.lit(1)).cast("long").alias("recip"))
    )
    out = nodes.crossJoin(arcs).crossJoin(recip)
    return out.select(
        "nodes",
        "arcs",
        "recip",
        F.when(
            F.col("arcs") > 0,
            F.floor(
                F.lit(1000000.0) * F.col("recip").cast("double")
                / F.col("arcs").cast("double")
            ),
        ).cast("long").alias("reciprocity_e6"),
        F.when(
            F.col("nodes") > 1,
            F.floor(
                F.lit(1000000.0) * F.col("arcs").cast("double")
                / (F.col("nodes") * (F.col("nodes") - 1)).cast("double")
            ),
        ).cast("long").alias("density_e6"),
    )


@q(
    "event_burstiness",
    "WITH daily AS (SELECT event_type, "
    "CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT) AS day, "
    "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt * cnt) AS BIGINT) AS s2 "
    "FROM daily GROUP BY 1) "
    "SELECT event_type, n, s, "
    "CASE WHEN s > 0 THEN CAST(floor(1000000.0::DOUBLE * "
    "CAST(n * s2 - s * s AS DOUBLE) / CAST(n * s AS DOUBLE)) AS BIGINT) "
    "ELSE NULL END AS fano_e6 "
    "FROM m",
)
def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event burstiness (r7): the Fano factor σ²/μ of the
    type's daily counts, e6-floored — ≈1e6 for Poisson-like steady
    arrivals, ≫1e6 for bursty dumps (the ingest-health signal a
    pipeline reports per stream). Population variance over days the
    type appeared: F = (n·Σx² − (Σx)²)/(n·Σx) — exact integer
    ingredients (the Gi* discipline), two partial-agg groupBys."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    fano = F.when(
        F.col("s") > 0,
        F.floor(
            F.lit(1000000.0)
            * (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast("double")
            / (F.col("n") * F.col("s")).cast("double")
        ),
    ).cast("long")
    return m.select("event_type", "n", "s", fano.alias("fano_e6"))


@q("join_counts_l5", None)
def join_counts_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary join-count statistics over the L5 occupied-cell surface
    (r7, ops/spatialstats.py join_counts): Black = count above the
    global mean via the exact n*cnt > sum(x) integer comparison; jbb /
    jww / jbw directed 8-adjacent pair counts plus the e6-floored
    randomization expectation for BB — the categorical complement of
    Moran's I. One partial agg + the literal offset equi-join."""
    from ult_spark.ops.spatialstats import join_counts

    return join_counts(events_points(spark, sf_dir), level=5)


@q("idw_fill_l6", None)
def idw_fill_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDW gap interpolation at L6 radius 2 (r7, ops/spatialstats.py
    idw_fill): power-2 inverse-distance estimates at empty cells within
    Chebyshev 2 of data, made exact-integer by the lcm-of-d2 weight
    lift (num/den BIGINT sums, one e3-floored division). Offset explode
    + left-anti against occupied + one groupBy — occupied-universe cost,
    never points2 and never the full grid."""
    from ult_spark.ops.spatialstats import idw_fill

    return idw_fill(events_points(spark, sf_dir), level=6, radius=2)


@q("std_ellipse_l8", None)
def std_ellipse_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse per event_type at L8 (r7,
    ops/spatialstats.py std_ellipse): exact n2-scaled central moments
    (per-group integer anchor pre-centering = the user_rog r7 overflow
    fix; translation-invariant so the unanchored oracle is
    bit-identical), closed-form eigenvalues in one shared IEEE double
    expression, e3-floored semi-axes + e6 orientation ingredient. Two
    tiny groupBys, broadcast anchors, nothing quadratic."""
    from ult_spark.ops.spatialstats import std_ellipse

    return std_ellipse(events_points(spark, sf_dir), level=8, key="event_type")


def _attach_spatialstats_r7d_oracles() -> None:
    from ult_spark.ops.spatialstats import (
        idw_fill_sql,
        join_counts_sql,
        std_ellipse_sql,
    )

    ORACLES["join_counts_l5"] = join_counts_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5
    )
    ORACLES["idw_fill_l6"] = idw_fill_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6, radius=2
    )
    ORACLES["std_ellipse_l8"] = std_ellipse_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=8, key="event_type"
    )


_attach_spatialstats_r7d_oracles()


@q("cross_k_l5", None)
def cross_k_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate cross-type Ripley's K at L5 between click and purchase
    events (r7, ops/spatialstats.py cross_k): ordered A-B pair counts
    by Chebyshev cell distance 0..3, cumulative, normalized by
    A*na*nb and e6-floored - the colocation statistic. A-cells x 48
    literal offsets equi-joined against B-cells; occupied-universe
    cost, never points2."""
    from ult_spark.ops.spatialstats import cross_k

    return cross_k(events_points(spark, sf_dir), level=5)


def _attach_cross_k_oracle() -> None:
    from ult_spark.ops.spatialstats import cross_k_sql

    ORACLES["cross_k_l5"] = cross_k_sql(UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5)


_attach_cross_k_oracle()


@q("knox_spacetime_l6", None)
def knox_spacetime_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction test at L6 / daily buckets (r7,
    ops/spatialstats.py knox_spacetime): ordered pair counts close in
    space (Chebyshev <= 1 cell), in time (adjacent day bucket), and in
    both, plus the e6-floored observed/expected ratio - the coordinated
    event-storm detector. Exact integers over the occupied
    cell/bucket/cell-bucket universes with literal-offset equi-joins;
    never points squared."""
    from ult_spark.ops.spatialstats import knox_spacetime

    return knox_spacetime(events_points(spark, sf_dir), level=6)


def _attach_knox_oracle() -> None:
    from ult_spark.ops.spatialstats import knox_spacetime_sql

    ORACLES["knox_spacetime_l6"] = knox_spacetime_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6
    )


_attach_knox_oracle()


@q("bm25_topk_docs", None)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for the query {spark, window, hash} (r7,
    ops/textops.py bm25_topk): Lucene-idf BM25 with k1=1.2 b=0.75
    cleared to the exact integer ratio 22*S*tf/(10*S*tf+3*S+9*len*N);
    per-(doc,term) e6 floors before the order-free per-doc sum; total
    (score DESC, doc_id) order before the LIMIT. One filtered
    explode-groupBy + broadcast df join + top-k window."""
    from ult_spark.ops.textops import bm25_topk

    return bm25_topk(
        load(spark, sf_dir, "documents"), ["spark", "window", "hash"], topk=20
    )


def _attach_bm25_oracle() -> None:
    from ult_spark.ops.textops import bm25_topk_sql

    ORACLES["bm25_topk_docs"] = bm25_topk_sql(["spark", "window", "hash"], topk=20)


_attach_bm25_oracle()


@q("zipf_slope_docs", None)
def zipf_slope_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope over the top-100 corpus terms (r7,
    ops/textops.py zipf_slope): e6-floored ln(rank)/ln(freq) pairs feed
    exact integer regression moments, one floored slope division -
    the corpus-health gauge (natural text reads ~ -1e6). One
    explode-groupBy + TakeOrdered top-k + one tiny agg."""
    from ult_spark.ops.textops import zipf_slope

    return zipf_slope(load(spark, sf_dir, "documents"), topk=100)


@q("ks_doclen_sources", None)
def ks_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance between src0 and src1 doc-length
    distributions (r7, ops/textops.py ks_doclen): d_num =
    max|cumA*nb - cumB*na| over the merged length grid is an exact
    integer, one final e6-floored division - the length-drift twin of
    source_js_divergence. Cost rides distinct lengths, never rows."""
    from ult_spark.ops.textops import ks_doclen

    return ks_doclen(load(spark, sf_dir, "documents"), a="src0", b="src1")


def _attach_corpus_stats_oracles() -> None:
    from ult_spark.ops.textops import ks_doclen_sql, zipf_slope_sql

    ORACLES["zipf_slope_docs"] = zipf_slope_sql(topk=100)
    ORACLES["ks_doclen_sources"] = ks_doclen_sql(a="src0", b="src1")


_attach_corpus_stats_oracles()


@q("spatial_theil_l6", None)
def spatial_theil_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil concentration index of the L6 event count surface over the
    full 4^6 cell universe (r7, ops/spatialstats.py spatial_theil):
    0 = uniform, ln(M) = single cell; per-cell e6 floors before the
    order-free BIGINT sum, one final floored division. Empty cells
    contribute exactly 0 (closed form), so one occupied-universe
    partial agg computes it."""
    from ult_spark.ops.spatialstats import spatial_theil

    return spatial_theil(events_points(spark, sf_dir), level=6)


def _attach_theil_oracle() -> None:
    from ult_spark.ops.spatialstats import spatial_theil_sql

    ORACLES["spatial_theil_l6"] = spatial_theil_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6
    )


_attach_theil_oracle()


@q("moran_correlogram_l5", None)
def moran_correlogram_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I correlogram at L5, Chebyshev rings 1..3 (r7,
    ops/spatialstats.py moran_correlogram): the distance-decay profile
    of spatial autocorrelation — one literal-offset explode carrying
    ring labels + one groupBy(r), so every lag comes from a single
    occupied-universe pass; exact integer u-products per ring, one
    floored e6 division each."""
    from ult_spark.ops.spatialstats import moran_correlogram

    return moran_correlogram(events_points(spark, sf_dir), level=5, max_r=3)


@q("general_g_l6", None)
def general_g_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord General G at L6 (r7, ops/spatialstats.py general_g):
    the global high/low-clustering companion to the per-cell Gi* —
    adjacent-pair Σx_i·x_j over the closed-form all-pairs denominator
    (Σx)²−Σx², both exact BIGINTs, one floored e9 division."""
    from ult_spark.ops.spatialstats import general_g

    return general_g(events_points(spark, sf_dir), level=6)


@q("spatial_gini_l6", None)
def spatial_gini_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the L6 count surface over the full 4^6 cell
    universe (r7, ops/spatialstats.py spatial_gini): rank-based
    concentration beside spatial_theil_l6 — empty cells enter as a
    closed-form rank shift, Σ rank·x is exact integer and
    tie-order-independent, one floored e6 division. The ranking window
    sorts the occupied universe (≤4096 rows), never points."""
    from ult_spark.ops.spatialstats import spatial_gini

    return spatial_gini(events_points(spark, sf_dir), level=6)


def _attach_spatialstats_r7e_oracles() -> None:
    from ult_spark.ops.spatialstats import (
        general_g_sql,
        moran_correlogram_sql,
        spatial_gini_sql,
    )

    ORACLES["moran_correlogram_l5"] = moran_correlogram_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=5, max_r=3
    )
    ORACLES["general_g_l6"] = general_g_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6
    )
    ORACLES["spatial_gini_l6"] = spatial_gini_sql(
        UF.EVENT_LAT_SQL, UF.EVENT_LON_SQL, level=6
    )


_attach_spatialstats_r7e_oracles()


# ---------------------------------------------------------------------------
# r7 continuation: mobility — movement-direction rose + circadian entropy

_ROSE_CASE_SQL = (
    "CASE WHEN dx = 0 AND dy = 0 THEN -1 "
    "WHEN dx > 0 AND dy >= 0 AND dy < dx THEN 0 "
    "WHEN dx > 0 AND dy > 0 AND dy >= dx THEN 1 "
    "WHEN dx <= 0 AND dy > 0 AND -dx < dy THEN 2 "
    "WHEN dx < 0 AND dy > 0 AND -dx >= dy THEN 3 "
    "WHEN dx < 0 AND dy <= 0 AND -dy < -dx THEN 4 "
    "WHEN dx < 0 AND dy < 0 AND -dx <= -dy THEN 5 "
    "WHEN dx >= 0 AND dy < 0 AND dx < -dy THEN 6 "
    "ELSE 7 END"
)


@q(
    "bearing_rose_8",
    "WITH ev AS (SELECT user_id, event_type, event_id, ts, "
    f"{UF.EVENT_LAT_SQL} AS lat, {UF.EVENT_LON_SQL} AS lon FROM events), "
    "mv AS (SELECT event_type, "
    "lat - lag(lat) OVER w AS dy, lon - lag(lon) OVER w AS dx "
    "FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
    f"SELECT event_type, CAST({_ROSE_CASE_SQL} AS BIGINT) AS octant, "
    "CAST(count(*) AS BIGINT) AS moves "
    "FROM mv WHERE dx IS NOT NULL GROUP BY 1, 2",
)
def bearing_rose_8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-sector movement-direction rose per event type (r7): each
    consecutive per-user displacement (ordered by ts, event_id — a
    total order) is classified into one of 8 compass octants
    [45k°, 45(k+1)°) by PURE sign/magnitude comparisons on the planar
    (dlon, dlat) vector — no trig anywhere, so the histogram is exact
    integers cross-engine (boundary rays belong to the upper sector,
    pinned in the shared CASE; zero displacement is its own -1 bucket).
    The directional-bias diagnostic for trajectory corpora. One lag
    window per user + one partial-agg groupBy, nothing quadratic."""
    ev = events_points(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mv = (
        ev.select(
            "event_type",
            (F.col("lat") - F.lag("lat").over(w)).alias("dy"),
            (F.col("lon") - F.lag("lon").over(w)).alias("dx"),
        )
        .where(F.col("dx").isNotNull())
    )
    dx, dy = F.col("dx"), F.col("dy")
    octant = (
        F.when((dx == 0) & (dy == 0), -1)
        .when((dx > 0) & (dy >= 0) & (dy < dx), 0)
        .when((dx > 0) & (dy > 0) & (dy >= dx), 1)
        .when((dx <= 0) & (dy > 0) & (-dx < dy), 2)
        .when((dx < 0) & (dy > 0) & (-dx >= dy), 3)
        .when((dx < 0) & (dy <= 0) & (-dy < -dx), 4)
        .when((dx < 0) & (dy < 0) & (-dx <= -dy), 5)
        .when((dx >= 0) & (dy < 0) & (dx < -dy), 6)
        .otherwise(7)
        .cast("long")
    )
    return mv.groupBy("event_type", octant.alias("octant")).agg(
        F.count(F.lit(1)).cast("long").alias("moves")
    )


@q(
    "user_circadian_entropy",
    "WITH hrs AS (SELECT user_id, "
    "CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) AS BIGINT) % 24 AS hod, "
    "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
    "tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n, "
    "CAST(count(*) AS BIGINT) AS n_hours FROM hrs GROUP BY 1), "
    "t AS (SELECT h.user_id, "
    "CAST(floor(1000000000.0::DOUBLE * (CAST(h.c AS DOUBLE) / CAST(tot.n AS DOUBLE)) "
    "* ln(CAST(tot.n AS DOUBLE) / CAST(h.c AS DOUBLE))) AS BIGINT) AS term "
    "FROM hrs h JOIN tot USING (user_id)) "
    "SELECT tot.user_id, tot.n, tot.n_hours, "
    "CAST(sum(t.term) AS BIGINT) AS entropy_e9 "
    "FROM t JOIN tot USING (user_id) GROUP BY 1, 2, 3",
)
def user_circadian_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circadian (hour-of-day) entropy per user (r7): the temporal twin
    of user_visit_entropy — Shannon entropy of the user's 24-bucket
    hour-of-day distribution; 0 = always the same hour (bot-like
    regularity), ln(24) = uniform around the clock. Same exact-integer
    shape: p = c/n with integer counts, per-term e9 floors of
    ln(n/c)·p BEFORE the order-free BIGINT sum. Two partial-agg
    groupBys + one user-keyed join, nothing quadratic."""
    hrs = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            (
                F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long") % 24
            ).alias("hod"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = hrs.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    term = F.floor(
        F.lit(1000000000.0)
        * (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
    ).cast("long")
    return (
        hrs.join(tot, "user_id")
        .select("user_id", term.alias("_t"))
        .groupBy("user_id")
        .agg(F.sum("_t").cast("long").alias("entropy_e9"))
        .join(tot, "user_id")
        .select("user_id", "n", "n_hours", "entropy_e9")
    )


@q("psi_doclen_sources", None)
def psi_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between src0 and src1 doc-length
    distributions, bin width 32 tokens (r7, ops/textops.py psi_doclen):
    the binned production drift monitor beside the KS sup-norm test —
    union bin grid + add-one smoothing so the statistic is
    deterministic with no epsilon knob; per-bin e9 floors of exact
    integer-ratio terms before the order-free sum. Cost rides distinct
    bins, never rows."""
    from ult_spark.ops.textops import psi_doclen

    return psi_doclen(load(spark, sf_dir, "documents"), a="src0", b="src1", bin_w=32)


def _attach_psi_oracle() -> None:
    from ult_spark.ops.textops import psi_doclen_sql

    ORACLES["psi_doclen_sources"] = psi_doclen_sql(a="src0", b="src1", bin_w=32)


_attach_psi_oracle()


# ---------------------------------------------------------------------------
# r7 continuation: k-truss + community-quality modularity


@q("ktruss_hosts", None)
def ktruss_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round 4-truss peel of the host link graph (r7, ops/graph.py
    ktruss): cascading edge-density core — support recomputed per round
    via the degree-ordered triangle kernel, edges below support k−2
    dropped (sf0.01 cascade: 48→17→6 edges). The companion to k-core's
    degree peel; unrolled identically in the MATERIALIZED oracle."""
    from ult_spark.ops.graph import ktruss

    return ktruss(_host_edges(spark, sf_dir), k=4, rounds=2, min_w=3)


@q("ktruss_fixpoint_hosts", None)
def ktruss_fixpoint_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-fixpoint 4-truss (r7, ops/graph.py ktruss_fixpoint): peel
    until no edge drops, localCheckpoint + stats barrier + observe()
    per round (the k_core_fixpoint discipline). Oracle = the unrolled
    peel at a depth safely past convergence (extra rounds are no-ops
    on a stable subgraph, the k_core_fixpoint_hosts protocol)."""
    from ult_spark.ops.graph import ktruss_fixpoint

    return ktruss_fixpoint(_host_edges(spark, sf_dir), k=4, min_w=3)


@q("lp_modularity_hosts", None)
def lp_modularity_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the 2-round label-propagation communities
    over the host graph (r7, ops/graph.py lp_modularity): the
    community-quality certificate — exact BIGINT numerator
    4m·E_in − Σd_c², one floored e6 division. Composes the LP oracle
    CTE chain with two label-keyed joins; nothing beyond LP's cost."""
    from ult_spark.ops.graph import lp_modularity

    return lp_modularity(_host_edges(spark, sf_dir), rounds=2)


def _attach_graph_r7e_oracles() -> None:
    from ult_spark.ops.graph import ktruss_sql, lp_modularity_sql

    ORACLES["ktruss_hosts"] = ktruss_sql(_HOST_EDGES_SQL, k=4, rounds=2, min_w=3)
    ORACLES["ktruss_fixpoint_hosts"] = ktruss_sql(
        _HOST_EDGES_SQL, k=4, rounds=6, min_w=3
    )
    ORACLES["lp_modularity_hosts"] = lp_modularity_sql(_HOST_EDGES_SQL, rounds=2)


_attach_graph_r7e_oracles()


# ---------------------------------------------------------------------------
# r7 final wave: rich club, LM cross-entropy quality, hourly ACF


@q("rich_club_hosts", None)
def rich_club_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient per degree threshold over the host graph
    (r7, ops/graph.py rich_club): do the hubs wire to each other? ONE
    graph pass — E_k and N_k are suffix counts of the min-degree and
    degree histograms; the per-k fan-out is a non-equi join over
    post-aggregation rows (≤ |distinct degrees|² pairs), never the
    edge list."""
    from ult_spark.ops.graph import rich_club

    return rich_club(_host_edges(spark, sf_dir))


def _attach_rich_club_oracle() -> None:
    from ult_spark.ops.graph import rich_club_sql

    ORACLES["rich_club_hosts"] = rich_club_sql(_HOST_EDGES_SQL)


_attach_rich_club_oracle()


@q("lm_cross_entropy_docs", None)
def lm_cross_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy vs the corpus unigram LM (r7,
    ops/textops.py lm_cross_entropy): the CCNet-style perplexity
    quality score — rare-token-heavy docs (gibberish/OCR noise) rank
    high. Per-term e9 floors before the order-free per-doc sum, final
    INTEGER division by doc length; the tfidf_top_terms shuffle
    budget."""
    from ult_spark.ops.textops import lm_cross_entropy

    return lm_cross_entropy(load(spark, sf_dir, "documents"))


def _attach_lm_ce_oracle() -> None:
    from ult_spark.ops.textops import LM_CROSS_ENTROPY_SQL

    ORACLES["lm_cross_entropy_docs"] = LM_CROSS_ENTROPY_SQL


_attach_lm_ce_oracle()


@q(
    "acf_hourly",
    "WITH hourly AS (SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) "
    "AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "sp AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hourly), "
    "grid AS (SELECT unnest(generate_series(lo, hi)) AS hr FROM sp), "
    "x AS (SELECT g.hr, CAST(coalesce(h.cnt, 0) AS BIGINT) AS cnt "
    "FROM grid g LEFT JOIN hourly h USING (hr)), "
    "gg AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s, "
    "CAST(sum(cnt * cnt) AS BIGINT) AS s2 FROM x), "
    "u AS (SELECT hr, n * cnt - s AS u FROM x CROSS JOIN gg), "
    "lags AS (SELECT unnest(generate_series(1, 24)) AS lag), "
    "num AS (SELECT l.lag, CAST(sum(a.u * b.u) AS BIGINT) AS num "
    "FROM lags l CROSS JOIN u a JOIN u b ON b.hr = a.hr + l.lag GROUP BY 1) "
    "SELECT num.lag, gg.n - num.lag AS n_pairs, num.num, "
    "CASE WHEN gg.n * gg.n * gg.s2 - gg.n * gg.s * gg.s > 0 THEN "
    "CAST(floor(1000000.0::DOUBLE * CAST(num.num AS DOUBLE) / "
    "CAST(gg.n * gg.n * gg.s2 - gg.n * gg.s * gg.s AS DOUBLE)) AS BIGINT) "
    "ELSE NULL END AS acf_e6 FROM num CROSS JOIN gg",
)
def acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event-count series at lags
    1..24 (r7): the periodicity detector beside stl_decompose_hourly —
    a daily cycle shows as the lag-24 peak, bursts as fast decay. Series
    is the gap-filled complete hour grid (missing hours count 0, so
    lagged alignment is positional arithmetic, not a window over
    occupied rows). Standard biased estimator r_L = Σ u_t·u_{t+L} / Σu²
    with the integer lift u_t = n·x_t − Σx; the denominator is the
    closed form n²·Σx² − n·(Σx)² from the SAME one-row agg, so num and
    den are exact BIGINTs, one e6 floor per lag. All post-first-groupBy
    stages are bounded by elapsed hours × 25, data-size-independent
    (the stl justification); the hourly aggregate is re-derived per
    plan branch — localCheckpoint it first at production scale.
    Integer bound: n³·max_cnt² < 2⁶³ (holds through ~10⁴ hours at
    ~3·10⁴ events/hour; aggregate to days beyond)."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    sp = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = sp.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
    x = (
        grid.join(hourly, "hr", "left")
        .select("hr", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )
    gg = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    u = x.crossJoin(F.broadcast(gg)).select(
        "hr", (F.col("n") * F.col("cnt") - F.col("s")).alias("u"), "n", "s", "s2"
    )
    lagged = u.select(
        "hr", "u", F.explode(F.array(*[F.lit(i) for i in range(1, 25)])).alias("lag")
    )
    num = (
        lagged.join(
            u.select((F.col("hr")).alias("hr2"), F.col("u").alias("u2")),
            F.col("hr2") == F.col("hr") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("u") * F.col("u2")).cast("long").alias("num"))
    )
    den = (
        F.col("n") * F.col("n") * F.col("s2") - F.col("n") * F.col("s") * F.col("s")
    )
    acf = F.floor(
        F.lit(1000000.0) * F.col("num").cast("double") / den.cast("double")
    ).cast("long")
    return (
        num.crossJoin(F.broadcast(gg))
        .select(
            F.col("lag").cast("long").alias("lag"),
            (F.col("n") - F.col("lag")).cast("long").alias("n_pairs"),
            "num",
            F.when(den > 0, acf).alias("acf_e6"),
        )
    )


@q("countmin_user_est", None)
def countmin_user_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch audit over event users (r7, ops/sketch.py): the
    4×64 sketch's estimate vs the exact count for the exact top-20
    users — est ≥ exact by construction (collisions only add); the
    overcount column is the collision pressure at this width. The
    sketch shuffle carries ≤ d·w rows per map partition regardless of
    input size; both engines build the IDENTICAL md5-lane sketch, so
    the oracle certifies counter values."""
    from ult_spark.ops.sketch import countmin_estimates

    return countmin_estimates(load(spark, sf_dir, "events"), key="user_id", top=20)


def _attach_countmin_oracle() -> None:
    from ult_spark.ops.sketch import countmin_estimates_sql

    ORACLES["countmin_user_est"] = countmin_estimates_sql(
        "events", "user_id", top=20
    )


_attach_countmin_oracle()


@q(
    "cusum_hourly",
    "WITH hourly AS (SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) "
    "AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "gg AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s "
    "FROM hourly), "
    "cu AS (SELECT hr, CAST(sum(n * cnt - s) OVER (ORDER BY hr "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum, n "
    "FROM hourly CROSS JOIN gg) "
    "SELECT hr, cusum, n FROM cu ORDER BY abs(cusum) DESC, hr ASC LIMIT 1",
)
def cusum_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint locator on the hourly event-count series (r7):
    S_t = Σ_{i≤t} (n·x_i − Σx) — the integer-lifted cumulative
    deviation from the series mean; the hour maximizing |S_t| is the
    classic single-changepoint estimate (Page 1954 / binary
    segmentation's first cut) — where did the ingest rate shift? Exact
    BIGINTs end to end, total order (|S| DESC, hr ASC) before the
    LIMIT. The prefix-sum window and the argmax sort run over the
    HOURLY AGGREGATE (bounded by elapsed hours — the stl
    justification); occupied hours only (a gap is a missing sample,
    not a zero)."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    gg = hourly.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
    cu = hourly.crossJoin(F.broadcast(gg)).select(
        "hr",
        F.sum(F.col("n") * F.col("cnt") - F.col("s")).over(w).cast("long").alias("cusum"),
        "n",
    )
    return cu.orderBy(F.abs(F.col("cusum")).desc(), F.col("hr").asc()).limit(1)


@q("hll_users_pinned", None)
def hll_users_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HyperLogLog distinct-user estimate CERTIFIED
    against the exact count (r7, ops/sketch.py hll_estimate): pinned
    md5-lane registers, exact BIGINT harmonic fold s49 = Σ2^(49−M_j),
    one shared double division + the standard linear-counting
    small-range branch — the DuckDB oracle reproduces the register
    fold bit-for-bit, closing the gap the opaque built-in
    approx_count_distinct (rows-only) leaves open."""
    from ult_spark.ops.sketch import hll_estimate

    return hll_estimate(load(spark, sf_dir, "events"), key="user_id")


def _attach_hll_pinned_oracle() -> None:
    from ult_spark.ops.sketch import hll_estimate_sql

    ORACLES["hll_users_pinned"] = hll_estimate_sql("events", "user_id")


_attach_hll_pinned_oracle()


@q(
    "event_type_transitions",
    "WITH seq AS (SELECT user_id, event_type, "
    "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
    "FROM events), "
    "tr AS (SELECT prev AS src_type, event_type AS dst_type, "
    "CAST(count(*) AS BIGINT) AS n FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2), "
    "tot AS (SELECT src_type, CAST(sum(n) AS BIGINT) AS tot FROM tr GROUP BY 1) "
    "SELECT tr.src_type, tr.dst_type, tr.n, "
    "CAST(floor(1000000.0::DOUBLE * CAST(tr.n AS DOUBLE) / CAST(tot.tot AS DOUBLE)) "
    "AS BIGINT) AS p_e6 FROM tr JOIN tot USING (src_type)",
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types (r7):
    consecutive per-user (prev → next) pairs under the pinned total
    order (ts, event_id), counted and row-normalized to e6 transition
    probabilities — the behavioral-flow fingerprint (which action
    follows which?). One lag window per user + two partial-agg
    groupBys + one broadcast-able row-total join; integer counts,
    one floored float per cell."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    tr = seq.groupBy(
        F.col("prev").alias("src_type"), F.col("event_type").alias("dst_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = tr.groupBy("src_type").agg(F.sum("n").cast("long").alias("tot"))
    p_e6 = F.floor(
        F.lit(1000000.0) * F.col("n").cast("double") / F.col("tot").cast("double")
    ).cast("long")
    return tr.join(tot, "src_type").select(
        "src_type", "dst_type", "n", p_e6.alias("p_e6")
    )


# ---------------------------------------------------------------------------
# r7: TPC-H-shaped pricing analytics over the so-far-unused
# lineitem/part/supplier tables — the relational-warehouse slice.
# Float discipline (CLAUDE.md r3): revenue terms are quantized
# ROW-LOCALLY with textually identical IEEE expressions in both engines
# (DuckDB literals pinned ::DOUBLE against its DECIMAL typing), then
# summed as exact BIGINTs — no cross-partition float fold anywhere.


def _rev_e4():
    return F.floor(
        F.lit(10000.0) * F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("long")


_REV_E4_SQL = (
    "CAST(floor(10000.0::DOUBLE * l_extendedprice * "
    "(1.0::DOUBLE - l_discount)) AS BIGINT)"
)


@q(
    "lineitem_pricing_summary",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
    "CAST(sum(CAST(floor(100.0::DOUBLE * l_extendedprice) AS BIGINT)) AS BIGINT) "
    "AS sum_base_e2, "
    f"CAST(sum({_REV_E4_SQL}) AS BIGINT) AS sum_disc_e4, "
    "CAST(sum(CAST(floor(1000000.0::DOUBLE * l_extendedprice * "
    "(1.0::DOUBLE - l_discount) * (1.0::DOUBLE + l_tax)) AS BIGINT)) AS BIGINT) "
    "AS sum_charge_e6, "
    "CAST(count(*) AS BIGINT) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' GROUP BY 1, 2",
)
def lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (r7): per (returnflag,
    linestatus) quantities, base/discounted/charged revenue and order
    counts over shipped lineitems — THE scan-heavy warehouse
    aggregate. One partial-agg groupBy over a pushed-down timestamp
    filter (2 grouping values → partial aggs collapse map-side;
    perfectly scalable). Quantity is integral by spec (cast exact);
    revenue per-row e2/e4/e6 floors before the BIGINT sums — integer
    bound: charge_e6 ≤ 1e11/row, safe through ~10⁷ rows/group at e6;
    drop to e2 scaling at extreme scale."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    charge_e6 = F.floor(
        F.lit(1000000.0)
        * F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    ).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        F.sum(F.floor(F.lit(100.0) * F.col("l_extendedprice")).cast("long"))
        .cast("long")
        .alias("sum_base_e2"),
        F.sum(_rev_e4()).cast("long").alias("sum_disc_e4"),
        F.sum(charge_e6).cast("long").alias("sum_charge_e6"),
        F.count(F.lit(1)).cast("long").alias("count_order"),
    )


@q(
    "top_unshipped_orders",
    "SELECT o_orderkey, "
    "CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch, "
    f"CAST(sum({_REV_E4_SQL}) AS BIGINT) AS rev_e4 "
    "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' "
    "AND o.o_orderdate < TIMESTAMP '1997-01-01' "
    "AND l.l_shipdate > TIMESTAMP '1997-01-01' "
    "GROUP BY 1, 2 ORDER BY rev_e4 DESC, o_orderkey ASC LIMIT 10",
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority top-10 (r7): revenue of
    BUILDING-segment orders placed before a date whose items shipped
    after it. The dimension side (filtered customers) broadcasts;
    the orders⋈lineitem join is key-partitioned; total order
    (rev DESC, orderkey ASC) before the LIMIT. Order date emitted as
    floored epoch seconds (cross-engine-stable, the warc_ts rule)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "o_orderkey",
            F.floor(F.unix_timestamp("o_orderdate")).cast("long").alias("order_epoch"),
        )
        .agg(F.sum(_rev_e4()).cast("long").alias("rev_e4"))
        .orderBy(F.desc("rev_e4"), F.asc("o_orderkey"))
        .limit(10)
    )


@q(
    "revenue_by_nation",
    f"SELECT n.n_name, CAST(sum({_REV_E4_SQL}) AS BIGINT) AS rev_e4 "
    "FROM lineitem l "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "AND s.s_nationkey = c.c_nationkey "
    "JOIN nation n ON n.n_nationkey = s.s_nationkey "
    "JOIN region r ON r.r_regionkey = n.n_regionkey "
    "WHERE r.r_name = 'ASIA' "
    "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o.o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier revenue (r7): per-nation revenue
    where the customer and the lineitem's supplier share the nation,
    scoped to one region and one order year — the classic snowflake
    join. supplier/nation/region broadcast EXPLICITLY (tiny dims);
    customer⋈orders⋈lineitem shuffle on their keys with AQE; the
    region filter prunes the broadcast before it ships."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        s.join(n, s["s_nationkey"] == n["n_nationkey"]).join(
            r, n["n_regionkey"] == r["r_regionkey"]
        )
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            dims,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_rev_e4()).cast("long").alias("rev_e4"))
    )


@q(
    "promo_revenue_share",
    f"WITH j AS (SELECT {_REV_E4_SQL} AS rev_e4, p.p_type "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    "WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' "
    "AND l.l_shipdate < TIMESTAMP '1996-04-01') "
    "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) "
    "AS BIGINT) AS promo_e4, CAST(sum(rev_e4) AS BIGINT) AS total_e4, "
    "CAST(floor(1000000.0::DOUBLE * "
    "CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS DOUBLE) / "
    "CAST(sum(rev_e4) AS DOUBLE)) AS BIGINT) AS share_e6 FROM j",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo revenue share (r7): fraction of one
    month's revenue from PROMO-type parts — conditional sum over a
    broadcast part join, one e6-floored ratio of two exact BIGINTs
    (one row out; a month of a 100 TB fact table is the partition-
    pruning showcase — the shipdate filter reaches the scan)."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).select(
        _rev_e4().alias("rev_e4"), "p_type"
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(F.lit(0)))
    total = F.sum("rev_e4")
    return j.agg(
        promo.cast("long").alias("promo_e4"),
        total.cast("long").alias("total_e4"),
        F.floor(
            F.lit(1000000.0) * promo.cast("double") / total.cast("double")
        ).cast("long").alias("share_e6"),
    )


@q("bloom_purchasers_audit", None)
def bloom_purchasers_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit (r7, ops/sketch.py bloom_audit):
    a 1024-bit / 3-lane filter over the distinct users with a
    purchase in the id-sampled cohort (the driver corpus is uniform —
    every user has every event type, so a bare type predicate is
    degenerate, the r5 skew lesson; the cohort keeps a real
    non-member population to measure false positives against),
    probed with every distinct user — n_false_neg = 0 is the Bloom
    theorem the row asserts; fp_e6 is the measured false-positive
    rate at this sizing. The filter broadcasts as its ≤ m-row set-bit
    list; both engines build the identical md5-lane bitmap, so the
    oracle certifies the data structure itself. Completes the sketch
    trilogy (count-min / HLL / Bloom) — the production seen-set
    pre-filter for resume and dedup at 100 TB."""
    from ult_spark.ops.sketch import bloom_audit

    return bloom_audit(
        load(spark, sf_dir, "events"),
        key="user_id",
        member_pred=(F.col("event_type") == "purchase")
        & (F.col("user_id") % 5 == 0),
    )


def _attach_bloom_oracle() -> None:
    from ult_spark.ops.sketch import bloom_audit_sql

    ORACLES["bloom_purchasers_audit"] = bloom_audit_sql(
        "events", "user_id", "event_type = 'purchase' AND user_id % 5 = 0"
    )


_attach_bloom_oracle()


@q(
    "quantile_bins_doclen",
    "WITH lens AS (SELECT n_chars AS dl, CAST(count(*) AS BIGINT) AS c "
    "FROM documents GROUP BY 1), "
    "nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lens), "
    "qs AS (SELECT unnest([50, 90, 99]) AS q), "
    "tq AS (SELECT q, (q * n + 99) // 100 AS t, n FROM qs CROSS JOIN nn), "
    "cum AS (SELECT dl, c, CAST(sum(c) OVER (ORDER BY dl "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm FROM lens), "
    "ex AS (SELECT tq.q, CAST(min(cum.dl) AS BIGINT) AS exact "
    "FROM tq JOIN cum ON cum.cm >= tq.t GROUP BY 1), "
    "hist AS (SELECT dl // 64 AS bin, CAST(sum(c) AS BIGINT) AS bc FROM lens "
    "GROUP BY 1), "
    "hcum AS (SELECT bin, bc, CAST(sum(bc) OVER (ORDER BY bin "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm FROM hist), "
    "es AS (SELECT tq.q, tq.n, tq.t, "
    "CAST(h.bin * 64 + ((tq.t - (h.cm - h.bc) - 1) * 64) // h.bc AS BIGINT) AS est "
    "FROM tq JOIN hcum h ON h.cm >= tq.t AND h.cm - h.bc < tq.t) "
    "SELECT es.q, es.n, es.t, ex.exact, es.est, "
    "CAST(es.est - ex.exact AS BIGINT) AS err FROM es JOIN ex USING (q)",
)
def quantile_bins_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram percentile audit over doc lengths (r7): the
    pinned-internals analog of percentile_approx — p50/p90/p99
    estimated from a width-64 bin histogram with in-bin linear
    interpolation, side by side with the EXACT order statistic, err in
    characters. Both sides ride the distinct-length aggregate (bounded
    by the length domain, never rows — groupBy first, windows after,
    so no global sort of raw data at 100 TB); ranks, bins and the
    interpolation are exact integer arithmetic end to end (t =
    ceil(q·n/100) as (q·n+99) div 100; est = bin_lo +
    ((t−cum_before−1)·64) div bin_cnt)."""
    lens = (
        load(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").alias("dl"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nn = lens.agg(F.sum("c").cast("long").alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("q")
    )
    tq = qs.crossJoin(F.broadcast(nn)).select(
        "q", F.expr("(q * n + 99) div 100").cast("long").alias("t"), "n"
    )
    w = Window.orderBy("dl").rowsBetween(Window.unboundedPreceding, 0)
    cum = lens.select("dl", "c", F.sum("c").over(w).cast("long").alias("cm"))
    ex = (
        tq.join(cum, cum["cm"] >= tq["t"])
        .groupBy("q")
        .agg(F.min("dl").cast("long").alias("exact"))
    )
    hist = (
        lens.groupBy(F.expr("dl div 64").alias("bin"))
        .agg(F.sum("c").cast("long").alias("bc"))
    )
    hw = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    hcum = hist.select("bin", "bc", F.sum("bc").over(hw).cast("long").alias("cm"))
    es = tq.join(
        hcum, (hcum["cm"] >= tq["t"]) & ((hcum["cm"] - hcum["bc"]) < tq["t"])
    ).select(
        "q", "n", "t",
        F.expr("bin * 64 + ((t - (cm - bc) - 1) * 64) div bc")
        .cast("long")
        .alias("est"),
    )
    return es.join(ex, "q").select(
        "q", "n", "t", "exact", "est", (F.col("est") - F.col("exact")).alias("err")
    )


@q(
    "mad_hourly_anomalies",
    "WITH hourly AS (SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) "
    "AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hourly), "
    "vc AS (SELECT cnt AS v, CAST(count(*) AS BIGINT) AS c FROM hourly GROUP BY 1), "
    "vcum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm FROM vc), "
    "med AS (SELECT CAST(min(v) AS BIGINT) AS med FROM vcum CROSS JOIN nn "
    "WHERE cm >= (n + 1) // 2), "
    "dev AS (SELECT hr, cnt, abs(cnt - med) AS dv FROM hourly CROSS JOIN med), "
    "dc AS (SELECT dv AS v, CAST(count(*) AS BIGINT) AS c FROM dev GROUP BY 1), "
    "dcum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm FROM dc), "
    "mad AS (SELECT CAST(min(v) AS BIGINT) AS mad FROM dcum CROSS JOIN nn "
    "WHERE cm >= (n + 1) // 2) "
    "SELECT d.hr, d.cnt, m.med, ma.mad, CAST(d.dv AS BIGINT) AS dev "
    "FROM dev d CROSS JOIN med m CROSS JOIN mad ma "
    "WHERE ma.mad > 0 AND d.dv > 3 * ma.mad",
)
def mad_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust anomaly detection on the hourly series (r7):
    the breakdown-resistant twin of hourly_anomalies' z-score — a
    single storm hour inflates a mean/stddev threshold but moves the
    median and MAD not at all, so bursts can't mask themselves. Lower
    medians (rank ceil(n/2)) computed EXACTLY via the distinct-value
    cumulative trick (groupBy value first — the quantile_bins
    discipline; no global sort of raw rows), deviations and the
    3·MAD fence all exact BIGINTs, no floats anywhere. Flags hours
    with |x − med| > 3·MAD; the constant series (MAD 0) flags
    nothing by pinned convention."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    nn = hourly.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def _lower_median(vals, col):
        vc = vals.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        vcum = vc.select("v", F.sum("c").over(w).cast("long").alias("cm"))
        return (
            vcum.crossJoin(F.broadcast(nn))
            .where(F.col("cm") >= F.expr("(n + 1) div 2"))
            .agg(F.min("v").cast("long"))
        )

    med = _lower_median(hourly, "cnt").toDF("med")
    dev = hourly.crossJoin(F.broadcast(med)).select(
        "hr", "cnt", "med", F.abs(F.col("cnt") - F.col("med")).alias("dv")
    )
    mad = _lower_median(dev, "dv").toDF("mad")
    return (
        dev.crossJoin(F.broadcast(mad))
        .where((F.col("mad") > 0) & (F.col("dv") > 3 * F.col("mad")))
        .select("hr", "cnt", "med", "mad", F.col("dv").cast("long").alias("dev"))
    )


@q("transitivity_hosts", None)
def transitivity_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity of the host graph (r7, ops/graph.py
    transitivity): 3·triangles/wedges from the SAME degree frame and
    degree-ordered enumeration as the per-host cc — the one-number
    community-structure gauge beside lp_modularity's Q."""
    from ult_spark.ops.graph import transitivity

    return transitivity(_host_edges(spark, sf_dir))


def _attach_transitivity_oracle() -> None:
    from ult_spark.ops.graph import transitivity_sql

    ORACLES["transitivity_hosts"] = transitivity_sql(_HOST_EDGES_SQL)


_attach_transitivity_oracle()


@q(
    "customer_ltv_running",
    "SELECT o_custkey, o_orderkey, "
    "CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch, "
    "CAST(row_number() OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS idx, "
    "CAST(sum(CAST(floor(100.0::DOUBLE * o_totalprice) AS BIGINT)) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ltv_e2 "
    "FROM orders",
)
def customer_ltv_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running customer lifetime value (r7): per-customer cumulative
    order revenue under the pinned total order (o_orderdate,
    o_orderkey) with the order index — the retention-economics
    companion to user_retention_daily. One customer-keyed window over
    row-local e2-floored totals (exact BIGINT running sums); scales as
    a single hash-partitioned window, no joins."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.unix_timestamp("o_orderdate")).cast("long").alias("order_epoch"),
        F.row_number().over(w).cast("long").alias("idx"),
        F.sum(F.floor(F.lit(100.0) * F.col("o_totalprice")).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("ltv_e2"),
    )


@q(
    "brand_discount_stats",
    "SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items, "
    "CAST(sum(CAST(floor(10000.0::DOUBLE * l_extendedprice * "
    "(1.0::DOUBLE - l_discount)) AS BIGINT)) AS BIGINT) AS rev_e4, "
    "CAST(sum(CAST(floor(1000000.0::DOUBLE * l_discount) AS BIGINT)) "
    "// count(*) AS BIGINT) AS avg_disc_e6 "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey GROUP BY 1",
)
def brand_discount_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount pressure (r7): item counts, discounted
    revenue and the average granted discount per part brand — the
    merchandising health rollup. Broadcast part join into one
    partial-agg groupBy; discounts e6-floored per row then
    INTEGER-divided by the count (exact both engines)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(_rev_e4()).cast("long").alias("rev_e4"),
            F.expr(
                "CAST(sum(CAST(floor(1000000.0 * l_discount) AS BIGINT)) "
                "div count(*) AS BIGINT)"
            ).alias("avg_disc_e6"),
        )
    )


@q("harmonic_centrality_hosts", None)
def harmonic_centrality_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled harmonic centrality over the host graph (r7,
    ops/graph.py harmonic_centrality): Σ 1/d from 8 pinned md5-lowest
    seeds within a 3-hop horizon, every 1/d the exact integer
    1000000 div d — the distance-based centrality missing from the
    PageRank/HITS family (those measure link mass, this measures
    reach). Oracle = the unrolled MATERIALIZED BFS."""
    from ult_spark.ops.graph import harmonic_centrality

    return harmonic_centrality(_host_edges(spark, sf_dir))


def _attach_harmonic_oracle() -> None:
    from ult_spark.ops.graph import harmonic_centrality_sql

    ORACLES["harmonic_centrality_hosts"] = harmonic_centrality_sql(_HOST_EDGES_SQL)


_attach_harmonic_oracle()


@q(
    "cdc_merge_orders",
    "WITH base AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'), "
    "chg AS (SELECT *, CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op "
    "FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'), "
    "merged AS (SELECT o_orderstatus, o_totalprice FROM base "
    "WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg) "
    "UNION ALL SELECT o_orderstatus, o_totalprice FROM chg WHERE op = 'U') "
    "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt, "
    "CAST(sum(CAST(floor(100.0::DOUBLE * o_totalprice) AS BIGINT)) AS BIGINT) "
    "AS total_e2 FROM merged GROUP BY 1",
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO (upsert/delete) semantics certified by values (r7):
    a deterministic changeset (orders from 1999 on; every 11th key a
    delete, the rest upserts) applied to the pre-1999 base — matched
    keys take the change row or vanish, unmatched base rows survive —
    then rolled up per status so the driver hash certifies the merged
    CONTENT, not just counts. Plan: one left-anti join on the key +
    one union + one partial agg; at 100 TB the anti join shuffles on
    the primary key exactly like the lakehouse MERGE it models
    (complements snapshot_diff_orders/scd2_orders_intervals: diff,
    history, and now apply)."""
    o = load(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp")
    base = o.where(F.col("o_orderdate") < cut)
    chg = o.where(F.col("o_orderdate") >= cut).withColumn(
        "op", F.when(F.col("o_orderkey") % 11 == 0, F.lit("D")).otherwise(F.lit("U"))
    )
    merged = base.join(
        chg.select("o_orderkey"), "o_orderkey", "left_anti"
    ).select("o_orderstatus", "o_totalprice").unionByName(
        chg.where(F.col("op") == "U").select("o_orderstatus", "o_totalprice")
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.floor(F.lit(100.0) * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("total_e2"),
    )


@q(
    "tile_wow_movers",
    "WITH wk AS (SELECT " + _cell(6) + " AS cell, "
    "CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 604800) AS BIGINT) AS week, "
    "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "lg AS (SELECT cell, week, cnt, "
    "lag(cnt) OVER (PARTITION BY cell ORDER BY week) AS prev, "
    "lag(week) OVER (PARTITION BY cell ORDER BY week) AS pweek FROM wk) "
    "SELECT cell, week, cnt, prev, "
    "CAST(floor(1000000.0::DOUBLE * CAST(cnt - prev AS DOUBLE) / "
    "CAST(prev AS DOUBLE)) AS BIGINT) AS change_e6 "
    "FROM lg WHERE prev IS NOT NULL AND pweek = week - 1 "
    "AND abs(cnt - prev) * 5 >= prev",
)
def tile_wow_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week tile movers (r7): L6 cells whose weekly event
    count changed >= 20% vs the CONSECUTIVE previous week (gap weeks
    pinned out via the lagged-week check — a tile returning after a
    dark week is a reappearance, not a mover), with the e6 relative
    change. The growth/decay screen a tile-serving pipeline runs every
    week at 100 TB: one groupBy to the bounded (cell, week) grid, one
    cell-keyed lag window, the 20%% fence as exact integer arithmetic
    (|delta|*5 >= prev) so flagging never depends on the float."""
    wk = (
        events_points(spark, sf_dir)
        .groupBy(
            UF.latlon_to_cell("lat", "lon", 6).alias("cell"),
            F.floor(F.unix_timestamp("ts") / F.lit(604800)).cast("long").alias("week"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("cell").orderBy("week")
    lg = wk.select(
        "cell", "week", "cnt",
        F.lag("cnt").over(w).alias("prev"),
        F.lag("week").over(w).alias("pweek"),
    )
    change = F.floor(
        F.lit(1000000.0)
        * (F.col("cnt") - F.col("prev")).cast("double")
        / F.col("prev").cast("double")
    ).cast("long")
    return (
        lg.where(
            F.col("prev").isNotNull()
            & (F.col("pweek") == F.col("week") - 1)
            & (F.abs(F.col("cnt") - F.col("prev")) * 5 >= F.col("prev"))
        )
        .select("cell", "week", "cnt", "prev", change.alias("change_e6"))
    )


@q("ann_int8_recall", None)
def ann_int8_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding-quantization recall audit (r7, ops/ann.py
    ann_int8_recall): top-10 by per-vector symmetric int8 cosine
    (exact BIGINT dot/norms, one float rank expression) vs the exact
    float top-10 — the 4×-compression damage report. recall_e6 = 1e6
    means quantization cost nothing at k=10."""
    from ult_spark.ops.ann import ann_int8_recall

    return ann_int8_recall(load(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=10)


def _attach_int8_oracle() -> None:
    from ult_spark.ops.ann import ann_int8_recall_sql

    ORACLES["ann_int8_recall"] = ann_int8_recall_sql(ANN_QUERY_IDS, k=10)


_attach_int8_oracle()


@q(
    "hll_users_per_tile_l4",
    "WITH pts AS (SELECT " + _cell(4) + " AS cell, user_id FROM events), "
    "reg AS (SELECT cell, "
    "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT) % 256 AS j, "
    "CAST(max(49 - (CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))"
    "::BIGINT) // 256 = 0 THEN 0 ELSE length(bin((('0x' || "
    "substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT) // 256)) END)) "
    "AS BIGINT) AS m FROM pts GROUP BY 1, 2), "
    "tiles AS (SELECT DISTINCT cell FROM pts), "
    "grid AS (SELECT cell, unnest(generate_series(0, 255)) AS j FROM tiles), "
    "regs AS (SELECT g.cell, CAST(coalesce(r.m, 0) AS BIGINT) AS m "
    "FROM grid g LEFT JOIN reg r ON r.cell = g.cell AND r.j = g.j), "
    "fold AS (SELECT cell, CAST(sum(CAST(pow(2.0, 49 - m) AS BIGINT)) AS BIGINT) "
    "AS s49, CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero "
    "FROM regs GROUP BY 1), "
    "ex AS (SELECT cell, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact "
    "FROM pts GROUP BY 1) "
    "SELECT f.cell, ex.n_exact, f.v_zero, f.s49, "
    "CASE WHEN 2.6499581405668102e+19 / CAST(f.s49 AS DOUBLE) <= 640.0 "
    "AND f.v_zero > 0 THEN CAST(floor(256.0 * ln(256.0 / "
    "CAST(f.v_zero AS DOUBLE))) AS BIGINT) "
    "ELSE CAST(floor(2.6499581405668102e+19 / CAST(f.s49 AS DOUBLE)) AS BIGINT) "
    "END AS est FROM fold f JOIN ex USING (cell)",
)
def hll_users_per_tile_l4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile pinned HLL distinct-user estimates CERTIFIED tile by
    tile against the exact counts (r7): the grouped-aggregate shape of
    hll_users_pinned — registers keyed (tile, j), the full 256-register
    universe completed PER TILE (empty registers dominate sparse tiles
    and must not vanish), the same exact BIGINT harmonic lift and
    linear-counting branch. At 100 TB this is the shape that replaces
    countDistinct-per-tile: the shuffle carries ≤ 256 registers per
    tile instead of the user ids, and register maxes merge across
    executors/days by plain MAX (ops/sketch.py hll_partial docstring).
    The opaque-built-in twin approx_users_per_tile_l6 stays rows-only;
    this one the driver value-hashes."""
    from ult_spark.ops.sketch import HLL_M, HLL_NUM, _bitlen

    from ult_spark.ops.textops import _h56

    pts = events_points(spark, sf_dir).select(
        UF.latlon_to_cell("lat", "lon", 4).alias("cell"), "user_id"
    )
    h = _h56(F.col("user_id").cast("string"), 1)
    reg = (
        pts.select(
            "cell",
            F.pmod(h, F.lit(HLL_M)).alias("j"),
            (F.lit(49) - _bitlen(F.shiftright(h, 8))).alias("rank"),
        )
        .groupBy("cell", "j")
        .agg(F.max("rank").cast("long").alias("m"))
    )
    tiles = pts.select("cell").distinct()
    grid = tiles.select(
        "cell", F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("j")
    )
    regs = grid.join(reg, ["cell", "j"], "left").select(
        "cell", F.coalesce("m", F.lit(0)).cast("long").alias("m")
    )
    fold = regs.groupBy("cell").agg(
        F.sum(F.pow(F.lit(2.0), F.lit(49) - F.col("m")).cast("long"))
        .cast("long")
        .alias("s49"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias("v_zero"),
    )
    ex = pts.groupBy("cell").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    raw = F.lit(HLL_NUM) / F.col("s49").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("v_zero") > 0),
        F.floor(
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero").cast("double"))
        ),
    ).otherwise(F.floor(raw)).cast("long")
    return fold.join(ex, "cell").select(
        "cell", "n_exact", "v_zero", "s49", est.alias("est")
    )


@q(
    "bloom_semijoin_audit",
    "WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS key, "
    "max(CASE WHEN event_type = 'purchase' AND user_id % 5 = 0 THEN 1 ELSE 0 END) "
    "AS is_member FROM events GROUP BY 1), "
    "bits AS (SELECT DISTINCT bit FROM ("
    + " UNION ALL ".join(
        "SELECT (('0x' || substr(md5(key), {o}, 14))::BIGINT % 1024 + 1024) % 1024 "
        "AS bit FROM keys WHERE is_member = 1".format(o=2 * i + 1)
        for i in range(3)
    )
    + ")), "
    "probe AS (SELECT key, is_member, min(hit) AS positive FROM ("
    + " UNION ALL ".join(
        "SELECT key, is_member, CASE WHEN "
        "(('0x' || substr(md5(key), {o}, 14))::BIGINT % 1024 + 1024) % 1024 IN "
        "(SELECT bit FROM bits) THEN 1 ELSE 0 END AS hit FROM keys".format(o=2 * i + 1)
        for i in range(3)
    )
    + ") GROUP BY 1, 2), "
    "ev AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events) "
    "SELECT CAST(sum(CASE WHEN p.is_member = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_exact_semi, "
    "CAST(sum(CASE WHEN p.positive = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass, "
    "CAST(sum(CASE WHEN p.positive = 1 AND p.is_member = 0 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_extra FROM ev JOIN probe p USING (key)",
)
def bloom_semijoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom filter APPLIED as a semi-join pre-filter (r7): count
    event rows surviving the broadcast bloom membership test vs the
    exact left-semi join on the same member set — n_bloom_pass ≥
    n_exact_semi always (no false negatives: the filter never loses a
    row the join would keep, which is WHY it is safe as a pre-filter),
    and n_extra is the wasted downstream work false positives cost at
    this sizing. At 100 TB this pattern replaces shuffling the full
    probe side: the ≤ m-row bit list broadcasts, the big side filters
    in place, and only survivors reach the real join (Spark's own
    runtime-filter feature, here with pinned auditable internals)."""
    from ult_spark.ops.sketch import BLOOM_K, BLOOM_M, _lane

    ev = load(spark, sf_dir, "events")
    keys = ev.groupBy(F.col("user_id").cast("string").alias("key")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("user_id") % 5 == 0), 1
            ).otherwise(0)
        ).alias("is_member")
    )
    lanes = F.explode(
        F.array(*[_lane(F.col("key"), i, BLOOM_M) for i in range(BLOOM_K)])
    ).alias("bit")
    bits = keys.where(F.col("is_member") == 1).select(lanes).distinct()
    probe = (
        keys.select("key", "is_member", lanes)
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left")
        .groupBy("key", "is_member")
        .agg(F.min(F.coalesce("hit", F.lit(0))).alias("positive"))
    )
    evk = ev.select(F.col("user_id").cast("string").alias("key"))
    return evk.join(probe, "key").agg(
        F.sum(F.when(F.col("is_member") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_exact_semi"),
        F.sum(F.when(F.col("positive") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_pass"),
        F.sum(
            F.when((F.col("positive") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_extra"),
    )


@q("covisited_cells_l5", None)
def covisited_cells_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell co-visitation graph (r7): the bipartite user→cell graph
    projected onto cells through the SAME capped cocitation kernel as
    the host link analysis (ops/graph.py cocitation, by='dst') —
    pairs of L5 cells visited by a shared user, with the weighted
    Σ w_u·w_v form; the per-user fanout cap bounds the projection at
    max_deg² pairs per user, which is what makes bipartite projection
    survivable at web scale (an uncapped power user would emit
    |cells|² pairs). Spatial affinity for recommendation / anomaly
    pipelines."""
    from ult_spark.ops.graph import cocitation

    edges = (
        events_points(spark, sf_dir)
        .groupBy(
            F.col("user_id").alias("src"),
            UF.latlon_to_cell("lat", "lon", 5).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return cocitation(edges, by="dst")


_COVISIT_EDGES_SQL = (
    "SELECT user_id AS src, " + _cell(5) + " AS dst, "
    "CAST(count(*) AS BIGINT) AS w FROM events GROUP BY 1, 2"
)


def _attach_covisit_oracle() -> None:
    from ult_spark.ops.graph import cocitation_sql

    ORACLES["covisited_cells_l5"] = cocitation_sql(_COVISIT_EDGES_SQL, by="dst")


_attach_covisit_oracle()


@q(
    "source_quality_dashboard",
    "WITH d AS (SELECT source, n_chars, lang, md5(text) AS h FROM documents), "
    "dup AS (SELECT source, h, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2) "
    "SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(d.n_chars) AS BIGINT) AS total_chars, "
    "CAST(sum(d.n_chars) // count(*) AS BIGINT) AS mean_len, "
    "CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs, "
    "CAST(sum(CASE WHEN dup.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs, "
    "CAST(floor(1000000.0::DOUBLE * sum(CASE WHEN dup.c > 1 THEN 1 ELSE 0 END) "
    "/ count(*)) AS BIGINT) AS dup_e6 "
    "FROM d JOIN dup ON dup.source = d.source AND dup.h = d.h GROUP BY 1",
)
def source_quality_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health rollup (r7): the one-screen ingest
    dashboard — doc count, char volume, integer mean length, language
    diversity, and the exact-duplicate share WITHIN the source (md5
    groups > 1, the cheapest dup signal; near-dup rates live in the
    dedicated family). Two partial-agg groupBys + one hash join keyed
    (source, md5) — the md5 cardinality is the doc count, so nothing
    quadratic. Drift alarms (JS/KS/PSI) reference these as their
    denominators."""
    d = load(spark, sf_dir, "documents").select(
        "source", "n_chars", "lang", F.md5("text").alias("h")
    )
    dup = d.groupBy("source", "h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        d.join(dup, ["source", "h"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("CAST(sum(n_chars) div count(*) AS BIGINT)").alias("mean_len"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("dup_docs"),
            F.floor(
                F.lit(1000000.0)
                * F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).cast("long").alias("dup_e6"),
        )
    )


@q(
    "cell_visitor_entropy_l6",
    "WITH uc AS (SELECT " + _cell(6) + " AS cell, user_id, "
    "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
    "tot AS (SELECT cell, CAST(sum(c) AS BIGINT) AS n, "
    "CAST(count(*) AS BIGINT) AS n_users FROM uc GROUP BY 1) "
    "SELECT t.cell, t.n AS n_events, t.n_users, "
    "CAST(sum(CAST(floor(1000000000.0::DOUBLE * "
    "ln(CAST(t.n AS DOUBLE) / CAST(uc.c AS DOUBLE)) * CAST(uc.c AS DOUBLE) "
    "/ CAST(t.n AS DOUBLE)) AS BIGINT)) AS BIGINT) AS h_e9 "
    "FROM uc JOIN tot t USING (cell) GROUP BY 1, 2, 3",
)
def cell_visitor_entropy_l6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visitor-diversity entropy per L6 cell (r7): Shannon entropy of
    the cell's visiting-user distribution — the TRANSPOSE of
    user_visit_entropy (that one profiles a user across places, this
    one profiles a place across users): 0 = single-user territory
    (home/bot), high = shared public space — the
    tourist-spot/private-space classifier feeding anonymization and
    POI pipelines. Same exact-integer kernel: per-term e9 floors of
    ln(n/c)·c/n BEFORE the order-free sum, two partial-agg groupBys +
    one cell-keyed join."""
    uc = (
        events_points(spark, sf_dir)
        .groupBy(
            UF.latlon_to_cell("lat", "lon", 6).alias("cell"), "user_id"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = uc.groupBy("cell").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    term = F.floor(
        F.lit(1000000000.0)
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    ).cast("long")
    return (
        uc.join(tot, "cell")
        .groupBy("cell", F.col("n").alias("n_events"), "n_users")
        .agg(F.sum(term).cast("long").alias("h_e9"))
    )


@q(
    "len_stop_corr_sources",
    "WITH q AS (SELECT source, CAST(length(text) AS BIGINT) AS x, "
    "CAST(len(list_filter(list_filter(string_split(text, ' '), t -> t != ''), "
    "t -> t IN ('the', 'a', 'and', 'of'))) * 10000 // "
    "len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS y "
    "FROM documents WHERE len(list_filter(string_split(text, ' '), t -> t != '')) > 0), "
    "mo AS (SELECT source, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
    "CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy, "
    "CAST(sum(x * y) AS BIGINT) AS sxy FROM q GROUP BY 1) "
    "SELECT source, n, CASE WHEN (n * sxx - sx * sx) > 0 AND "
    "(n * syy - sy * sy) > 0 THEN "
    "CAST(floor(1000000.0::DOUBLE * CAST(n * sxy - sx * sy AS DOUBLE) / "
    "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))) "
    "AS BIGINT) ELSE NULL END AS r_e6 FROM mo",
)
def len_stop_corr_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between doc length and stopword ratio per
    source (r7): does longer content from this source read more
    natural-language-like? All five moments exact BIGINTs over the
    quality_score-pinned ingredients (char length; e4 stopword ratio
    by integer division), ONE floored float expression per source
    (the hourly_anomalies z discipline); NULL when either variance is
    0. A structural-vs-prose source classifier beside
    source_quality_dashboard."""
    from ult_spark.ops.textops import tokens_col

    toks = tokens_col("text")
    n_tok = F.size(toks).cast("long")
    stop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "and", "of"))
    ).cast("long")
    q_ = (
        load(spark, sf_dir, "documents")
        .where(n_tok > 0)
        .select(
            "source",
            F.length("text").cast("long").alias("x"),
            (stop * 10000 / n_tok).cast("long").alias("y"),
        )
    )
    mo = q_.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.floor(
        F.lit(1000000.0)
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.sqrt(vx.cast("double") * vy.cast("double"))
    ).cast("long")
    return mo.select(
        "source", "n", F.when((vx > 0) & (vy > 0), r).alias("r_e6")
    )


@q(
    "tile_decayed_hotness",
    "WITH ev AS (SELECT " + _cell(6) + " AS cell, "
    "CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) AS BIGINT) AS hr "
    "FROM events), "
    "mx AS (SELECT max(hr) AS now_hr FROM ev), "
    "sc AS (SELECT cell, CAST(count(*) AS BIGINT) AS cnt, "
    "CAST(sum(CASE WHEN (now_hr - hr) // 12 <= 40 THEN "
    "CAST(pow(2.0, 40 - (now_hr - hr) // 12) AS BIGINT) ELSE 0 END) AS BIGINT) "
    "AS score_s40 FROM ev CROSS JOIN mx GROUP BY 1) "
    "SELECT cell, cnt, score_s40 FROM sc "
    "ORDER BY score_s40 DESC, cell ASC LIMIT 50",
)
def tile_decayed_hotness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed tile hotness, top-50 (r7): each event
    contributes 2^(−age/12h) — a 12-hour half-life — lifted to the
    exact BIGINT 2^(40 − age div 12) (the HLL harmonic-lift trick:
    decay weights on a dyadic grid are INTEGERS after one shift, so
    the score is an order-free exact sum, no float accumulation drift
    between a backfill and an incremental update; contributions older
    than 40 half-lives are exactly 0). The recency-weighted ranking a
    tile-serving layer actually wants vs raw counts — compare the cnt
    column; total order before the LIMIT. One groupBy + a broadcast
    one-row max; the dyadic weights also make the score MERGEABLE
    across partial aggregations at a fixed reference hour."""
    ev = events_points(spark, sf_dir).select(
        UF.latlon_to_cell("lat", "lon", 6).alias("cell"),
        F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("hr"),
    )
    mx = ev.agg(F.max("hr").alias("now_hr"))
    age_hl = F.expr("(now_hr - hr) div 12")
    w = F.when(
        age_hl <= 40, F.pow(F.lit(2.0), F.lit(40) - age_hl).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(w).cast("long").alias("score_s40"),
        )
        .orderBy(F.desc("score_s40"), F.asc("cell"))
        .limit(50)
    )


@q("covisit_pagerank_l5", None)
def covisit_pagerank_l5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the DERIVED co-visitation graph (r7): the
    composability showcase — the bipartite projection
    (covisited_cells_l5) becomes the edge list of the integer
    PageRank, ranking cells by their centrality in shared-visitor
    space rather than raw volume (a transit hub co-visited with
    everything outranks a busy-but-isolated cell; compare
    tile_decayed_hotness). Symmetric pairs feed both directions with
    common-count weights; 2 damped integer rounds, unrolled
    MATERIALIZED in the oracle over the materialized projection."""
    from ult_spark.ops.graph import cocitation, pagerank

    edges = (
        events_points(spark, sf_dir)
        .groupBy(
            F.col("user_id").alias("src"),
            UF.latlon_to_cell("lat", "lon", 5).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    cc = cocitation(edges, by="dst")
    pr_edges = cc.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.col("common").alias("w")
    ).unionByName(
        cc.select(
            F.col("v").alias("src"), F.col("u").alias("dst"),
            F.col("common").alias("w"),
        )
    )
    return pagerank(pr_edges, iters=2)


def _attach_covisit_pr_oracle() -> None:
    from ult_spark.ops.graph import cocitation_sql, pagerank_sql

    proj = cocitation_sql(_COVISIT_EDGES_SQL, by="dst")
    edges_sql = (
        f"SELECT src, dst, w FROM (WITH cw AS MATERIALIZED ({proj}) "
        "SELECT u AS src, v AS dst, common AS w FROM cw "
        "UNION ALL SELECT v AS src, u AS dst, common AS w FROM cw)"
    )
    ORACLES["covisit_pagerank_l5"] = pagerank_sql(edges_sql, iters=2)


_attach_covisit_pr_oracle()


@q("dup_cluster_size_hist", None)
def dup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram (r7): (size, n_clusters) over
    the minhash connected components — the dedup CAPACITY report
    (size 1 = unique corpus mass; the tail says how much a keep-best
    pass reclaims, and a sudden large-cluster mode flags template
    spam or a crawler loop). Two partial-agg groupBys on top of
    dup_clusters' fixpoint CC; oracle = the recursive-fixpoint
    cluster SQL MATERIALIZED, then the same two rollups."""
    from ult_spark.ops.textops import dup_clusters

    cl = dup_clusters(load(spark, sf_dir, "documents"), threshold=0.2)
    sizes = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


def _attach_dup_hist_oracle() -> None:
    from ult_spark.ops.textops import dup_clusters_sql

    ORACLES["dup_cluster_size_hist"] = (
        f"WITH dc AS MATERIALIZED ({dup_clusters_sql(0.2)}), "
        "sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size "
        "FROM dc GROUP BY 1) "
        "SELECT size, CAST(count(*) AS BIGINT) AS n_clusters "
        "FROM sz GROUP BY 1"
    )


_attach_dup_hist_oracle()
