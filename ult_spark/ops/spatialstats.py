"""Spatial statistics over the cell grid — Getis-Ord Gi* hotspots and
global Moran's I autocorrelation.

Both run on the *occupied-cell universe* (cells holding >= 1 point —
pinned variant, documented: including the empty remainder of a global
grid would swamp the statistics with structural zeros) with binary
8-neighborhood weights (Chebyshev 1; x wraps across the antimeridian,
y clamps at the poles — the repo's standard focal neighborhood).

Cross-engine determinism: every aggregate is exact integer arithmetic
(the classic formulas are multiplied through by n so means never appear
as intermediate floats); the final statistic is a FIXED float expression
(sqrt / one division — IEEE correctly-rounded, so identical on identical
integer inputs, the haversine-chain precedent) floored to e3/e6.

- :func:`getis_ord_gi` — per-cell Gi* (self included):
  ``num_i = n*S_i − Σx*W_i`` (exact ints, S_i/W_i = neighborhood sum /
  size), ``z_i = num_i * sqrt(n−1) / sqrt(V * (n*W_i − W_i²))`` with
  ``V = n*Σx² − (Σx)²``. Emitted as ``z_e3 = floor(z * 1000)``; NULL
  when the denominator is 0 (constant field, or a neighborhood covering
  the whole universe — fixture-scale cases), guarded by a short-circuit
  CASE in both engines (Spark 4 ANSI errors on /0).
- :func:`morans_i` — global Moran's I with ``u_i = n*x_i − Σx``:
  ``I = n * Σ_{ij adj} u_i u_j / (W * Σu²)`` over DIRECTED adjacent
  pairs (W counts them), emitted ``i_e6`` plus the exact integer
  ingredients so the oracle certifies every term.

Scale shape: one full-data partial-agg groupBy (points→cells); the
neighbor join is the same literal 8-offset explode + hash equi-join as
cell_dbscan (keyed, never theta); global scalars ride along as
broadcast one-row aggregates, never collected literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.ops.buffer import _offsets


def occupied_cells(
    points: DataFrame, level: int, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """(cell, cnt) for every occupied cell."""
    return (
        points.select(UF.latlon_to_cell(lat, lon, level).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def directed_neighbors(cells: DataFrame, level: int) -> DataFrame:
    """(cell, nbr) DIRECTED pairs of 8-adjacent occupied cells (both
    orientations; no self pair). Same wrap/clamp rules as cell_dbscan."""
    n = 1 << level
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _offsets(level, 1)
            if (dx, dy) != (0, 0)
        ]
    )
    nbr = (
        cells.select("cell")
        .withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            "cell",
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)), F.col("_ny"), level
            ).alias("nbr"),
        )
    )
    return nbr.join(cells.select(F.col("cell").alias("nbr")), "nbr").select(
        "cell", "nbr"
    )


def _globals(cells: DataFrame) -> DataFrame:
    """Broadcast one-row frame of the exact global integers."""
    return F.broadcast(
        cells.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cnt").cast("long").alias("sx"),
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sx2"),
        )
    )


def getis_ord_gi(
    points: DataFrame, level: int = 6, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Per-occupied-cell Gi* hotspot z-score (e3-floored)."""
    cells = occupied_cells(points, level, lat, lon)
    pairs = directed_neighbors(cells, level)
    # neighborhood aggregate INCLUDING self: union the self pair in
    hood = (
        pairs.unionByName(cells.select("cell", F.col("cell").alias("nbr")))
        .join(cells.select(F.col("cell").alias("nbr"), F.col("cnt").alias("_nc")), "nbr")
        .groupBy("cell")
        .agg(
            F.sum("_nc").cast("long").alias("s_i"),
            F.count(F.lit(1)).cast("long").alias("w_i"),
        )
    )
    num = (F.col("n") * F.col("s_i") - F.col("sx") * F.col("w_i")).cast("long")
    v = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("long")
    nw = (F.col("n") * F.col("w_i") - F.col("w_i") * F.col("w_i")).cast("long")
    den2 = (v * nw).cast("double")
    z = (
        F.col("_num").cast("double")
        * F.sqrt((F.col("n") - 1).cast("double"))
        * F.lit(1000.0)
        / F.sqrt(F.col("_den2"))
    )
    return (
        cells.join(hood, "cell")
        .crossJoin(_globals(cells))
        .withColumn("_num", num)
        .withColumn("_den2", den2)
        .select(
            "cell",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("s_i"),
            F.col("w_i"),
            F.when(F.col("_den2") > 0, F.floor(z)).cast("long").alias("z_e3"),
        )
    )


def morans_i(
    points: DataFrame, level: int = 5, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Global Moran's I over the occupied-cell universe: one row of the
    exact integer ingredients (n, w, num, sum_u2) plus i_e6."""
    cells = occupied_cells(points, level, lat, lon)
    g = _globals(cells)
    u = cells.crossJoin(g).select(
        "cell", (F.col("n") * F.col("cnt") - F.col("sx")).cast("long").alias("u")
    )
    pairs = directed_neighbors(cells, level)
    prod = (
        pairs.join(u.withColumnRenamed("cell", "_c").withColumnRenamed("u", "_ui"),
                   F.col("cell") == F.col("_c"))
        .join(u.withColumnRenamed("cell", "_d").withColumnRenamed("u", "_uj"),
              F.col("nbr") == F.col("_d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.sum(F.col("_ui") * F.col("_uj")).cast("long").alias("num"),
        )
    )
    su2 = u.agg(F.sum(F.col("u") * F.col("u")).cast("long").alias("sum_u2"))
    i_e6 = F.floor(
        F.lit(1000000.0)
        * F.col("n").cast("double")
        * F.col("num").cast("double")
        / (F.col("w").cast("double") * F.col("sum_u2").cast("double"))
    ).cast("long")
    return (
        prod.crossJoin(F.broadcast(su2))
        .crossJoin(g)
        .select(
            "n", "w", "num", "sum_u2",
            F.when((F.col("w") > 0) & (F.col("sum_u2") > 0), i_e6).alias("i_e6"),
        )
    )


def _sql_cells(lat_sql: str, lon_sql: str, level: int, table: str) -> str:
    return (
        f"pts AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table}), "
        "occ AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt "
        "FROM pts GROUP BY 1, 2), "
        f"cells AS (SELECT {UF.xy_cell_sql('x', 'y', level)} AS cell, "
        "x, y, cnt FROM occ), "
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(cnt) AS BIGINT) AS sx, "
        "CAST(sum(cnt * cnt) AS BIGINT) AS sx2 FROM cells)"
    )


def _sql_edges(level: int) -> str:
    n = 1 << level
    offs = ", ".join(
        f"({dx}, {dy})" for dx, dy in _offsets(level, 1) if (dx, dy) != (0, 0)
    )
    return (
        f"offs(dx, dy) AS (VALUES {offs}), "
        "e AS (SELECT a.cell AS cell, b.cell AS nbr, b.cnt AS ncnt "
        "FROM cells a, offs o, cells b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy)"
    )


def getis_ord_gi_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"{_sql_edges(level)}, "
        "hood AS (SELECT cell, CAST(sum(ncnt) AS BIGINT) AS s_i, "
        "CAST(count(*) AS BIGINT) AS w_i FROM ("
        "SELECT cell, ncnt FROM e "
        "UNION ALL SELECT cell, cnt AS ncnt FROM cells) GROUP BY 1) "
        "SELECT c.cell, c.cnt, h.s_i, h.w_i, "
        "CASE WHEN CAST((g.n * g.sx2 - g.sx * g.sx) * "
        "(g.n * h.w_i - h.w_i * h.w_i) AS DOUBLE) > 0 THEN "
        "CAST(floor(CAST(g.n * h.s_i - g.sx * h.w_i AS DOUBLE) "
        "* sqrt(CAST(g.n - 1 AS DOUBLE)) * 1000.0 "
        "/ sqrt(CAST((g.n * g.sx2 - g.sx * g.sx) * "
        "(g.n * h.w_i - h.w_i * h.w_i) AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS z_e3 "
        "FROM cells c JOIN hood h ON h.cell = c.cell CROSS JOIN g"
    )


def morans_i_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"{_sql_edges(level)}, "
        "u AS (SELECT c.cell, CAST(g.n * c.cnt - g.sx AS BIGINT) AS u "
        "FROM cells c CROSS JOIN g), "
        "prod AS (SELECT CAST(count(*) AS BIGINT) AS w, "
        "CAST(sum(ui.u * uj.u) AS BIGINT) AS num "
        "FROM e JOIN u ui ON ui.cell = e.cell JOIN u uj ON uj.cell = e.nbr), "
        "su AS (SELECT CAST(sum(u * u) AS BIGINT) AS sum_u2 FROM u) "
        "SELECT g.n, p.w, p.num, su.sum_u2, "
        "CASE WHEN p.w > 0 AND su.sum_u2 > 0 THEN "
        "CAST(floor(1000000.0 * CAST(g.n AS DOUBLE) * CAST(p.num AS DOUBLE) "
        "/ (CAST(p.w AS DOUBLE) * CAST(su.sum_u2 AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS i_e6 "
        "FROM prod p CROSS JOIN su CROSS JOIN g"
    )
