"""Spatial statistics over the cell grid — Getis-Ord Gi* hotspots,
global Moran's I autocorrelation, and emerging-hotspot trends.

All run on the *occupied-cell universe* (cells holding >= 1 point —
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
- :func:`emerging_hotspots` — the space-time composite: Gi* per time
  slice (each slice its own universe + globals), then the Mann-Kendall
  trend statistic per cell over its non-null z_e3 sequence:
  ``S = Σ_{t1<t2} sign(z_{t2} − z_{t1})`` — PURE INTEGER (sign
  comparisons of already-floored e3 ints), so the composite is exact
  cross-engine end to end. Emits (cell, n_slices, mk_s, trend).

Scale shape: one full-data partial-agg groupBy (points→cells); the
neighbor join is the same literal 8-offset explode + hash equi-join as
cell_dbscan (keyed, never theta); global scalars ride along as
broadcast one-row (or one-row-per-slice) aggregates, never collected
literals. Mann-Kendall's per-cell pair join is quadratic in SLICES
(never in cells or points) — production runs bound it with a trailing
time window, exactly like the classic emerging-hotspot tooling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ult_spark import functions as UF
from ult_spark.ops.buffer import _offsets


def occupied_cells(
    points: DataFrame,
    level: int,
    lat: str = "lat",
    lon: str = "lon",
    keys: list[str] | None = None,
) -> DataFrame:
    """(*keys, cell, cnt) for every occupied cell (per key group)."""
    return (
        points.select(
            *(keys or []), UF.latlon_to_cell(lat, lon, level).alias("cell")
        )
        .groupBy(*(keys or []), "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def directed_neighbors(
    cells: DataFrame, level: int, keys: list[str] | None = None
) -> DataFrame:
    """(*keys, cell, nbr) DIRECTED pairs of 8-adjacent occupied cells
    (both orientations; no self pair), within each key group. Same
    wrap/clamp rules as cell_dbscan."""
    keys = keys or []
    n = 1 << level
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _offsets(level, 1)
            if (dx, dy) != (0, 0)
        ]
    )
    nbr = (
        cells.select(*keys, "cell")
        .withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            *keys,
            "cell",
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)), F.col("_ny"), level
            ).alias("nbr"),
        )
    )
    return nbr.join(
        cells.select(*keys, F.col("cell").alias("nbr")), [*keys, "nbr"]
    ).select(*keys, "cell", "nbr")


def _globals(cells: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Broadcast frame of the exact global integers (one row per key group)."""
    return F.broadcast(
        cells.groupBy(*(keys or [])).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cnt").cast("long").alias("sx"),
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sx2"),
        )
    )


def _gi_core(cells: DataFrame, level: int, keys: list[str]) -> DataFrame:
    """(*keys, cell, cnt, s_i, w_i, z_e3) per occupied cell."""
    pairs = directed_neighbors(cells, level, keys)
    # neighborhood aggregate INCLUDING self: union the self pair in
    hood = (
        pairs.unionByName(cells.select(*keys, "cell", F.col("cell").alias("nbr")))
        .join(
            cells.select(
                *keys, F.col("cell").alias("nbr"), F.col("cnt").alias("_nc")
            ),
            [*keys, "nbr"],
        )
        .groupBy(*keys, "cell")
        .agg(
            F.sum("_nc").cast("long").alias("s_i"),
            F.count(F.lit(1)).cast("long").alias("w_i"),
        )
    )
    g = _globals(cells, keys)
    joined = cells.join(hood, [*keys, "cell"])
    joined = joined.crossJoin(g) if not keys else joined.join(g, keys)
    num = (F.col("n") * F.col("s_i") - F.col("sx") * F.col("w_i")).cast("long")
    v = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("long")
    nw = (F.col("n") * F.col("w_i") - F.col("w_i") * F.col("w_i")).cast("long")
    z = (
        F.col("_num").cast("double")
        * F.sqrt((F.col("n") - 1).cast("double"))
        * F.lit(1000.0)
        / F.sqrt(F.col("_den2"))
    )
    return (
        joined.withColumn("_num", num)
        .withColumn("_den2", (v * nw).cast("double"))
        .select(
            *keys,
            "cell",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("s_i"),
            F.col("w_i"),
            F.when(F.col("_den2") > 0, F.floor(z)).cast("long").alias("z_e3"),
        )
    )


def getis_ord_gi(
    points: DataFrame, level: int = 6, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Per-occupied-cell Gi* hotspot z-score (e3-floored)."""
    return _gi_core(occupied_cells(points, level, lat, lon), level, [])


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


def gearys_c(
    points: DataFrame, level: int = 5, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Global Geary's C over the occupied-cell universe: one row of the
    exact integer ingredients (n, w, num, sum_u2) plus c_e6.

    With ``u_i = n·x_i − Σx``: ``x_i − x_j = (u_i − u_j)/n`` and
    ``x_i − x̄ = u_i/n``, so the n² factors cancel and
    ``C = (n−1)·Σ_{ij adj}(u_i − u_j)² / (2W·Σu²)`` — every term an
    exact integer over the same DIRECTED pairs as :func:`morans_i`,
    ONE final float division floored to e6. C≈1 means no spatial
    autocorrelation, <1 positive (clustering), >1 negative — the
    complementary local-difference statistic to Moran's covariance
    form. Integer range: (u_i−u_j)² ≤ (2n·max_cnt)², double the
    documented Moran bound — same coarse-level guidance at scale."""
    cells = occupied_cells(points, level, lat, lon)
    g = _globals(cells)
    u = cells.crossJoin(g).select(
        "cell", (F.col("n") * F.col("cnt") - F.col("sx")).cast("long").alias("u")
    )
    pairs = directed_neighbors(cells, level)
    d = F.col("_ui") - F.col("_uj")
    prod = (
        pairs.join(u.withColumnRenamed("cell", "_c").withColumnRenamed("u", "_ui"),
                   F.col("cell") == F.col("_c"))
        .join(u.withColumnRenamed("cell", "_d").withColumnRenamed("u", "_uj"),
              F.col("nbr") == F.col("_d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.sum(d * d).cast("long").alias("num"),
        )
    )
    su2 = u.agg(F.sum(F.col("u") * F.col("u")).cast("long").alias("sum_u2"))
    c_e6 = F.floor(
        F.lit(1000000.0)
        * (F.col("n") - 1).cast("double")
        * F.col("num").cast("double")
        / (F.lit(2.0) * F.col("w").cast("double") * F.col("sum_u2").cast("double"))
    ).cast("long")
    return (
        prod.crossJoin(F.broadcast(su2))
        .crossJoin(g)
        .select(
            "n", "w", "num", "sum_u2",
            F.when((F.col("w") > 0) & (F.col("sum_u2") > 0), c_e6).alias("c_e6"),
        )
    )


def local_moran(
    points: DataFrame, level: int = 5, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Local Moran's I (LISA) per occupied cell: with ``u_i = n·x_i − Σx``
    the classic ``I_i = (x_i − x̄)/m2 · Σ_j w_ij (x_j − x̄)`` reduces to
    ``I_i = n · u_i · Σ_{j∈nbr} u_j / Σu²`` — every term an exact integer,
    ONE final division, floored to e6. Emits the integer ingredients
    (cnt, u, su_nbr, n_nbr) plus i_e6 (NULL for cells with no occupied
    neighbor or a constant field) and the quadrant label (HH/LL/HL/LH —
    the hotspot/outlier classification) derived from the SIGNS of the
    exact integers, so the label is unconditionally cross-engine safe.

    Integer range: ``n·u_i·Σu_j`` stays below 2^63 while
    ``n²·max_cnt² « 2^63`` — u values are bounded by n·max_cnt; at
    planet scale run coarser levels or pre-aggregate (documented bound,
    same shape as the global statistic's Σu_i·u_j)."""
    cells = occupied_cells(points, level, lat, lon)
    g = _globals(cells)
    u = cells.crossJoin(g).select(
        "cell",
        F.col("cnt").cast("long").alias("cnt"),
        (F.col("n") * F.col("cnt") - F.col("sx")).cast("long").alias("u"),
    )
    pairs = directed_neighbors(cells, level)
    nbr_u = (
        pairs.join(
            u.select(F.col("cell").alias("nbr"), F.col("u").alias("_uj")), "nbr"
        )
        .groupBy("cell")
        .agg(
            F.sum("_uj").cast("long").alias("su_nbr"),
            F.count(F.lit(1)).cast("long").alias("n_nbr"),
        )
    )
    su2 = F.broadcast(u.agg(F.sum(F.col("u") * F.col("u")).cast("long").alias("su2")))
    i_e6 = F.floor(
        F.lit(1000000.0)
        * (F.col("n") * F.col("u") * F.col("su_nbr")).cast("double")
        / F.col("su2").cast("double")
    ).cast("long")
    quad = (
        F.when((F.col("u") >= 0) & (F.col("su_nbr") >= 0), "HH")
        .when((F.col("u") < 0) & (F.col("su_nbr") < 0), "LL")
        .when(F.col("u") >= 0, "HL")
        .otherwise("LH")
    )
    return (
        u.join(nbr_u, "cell", "left")
        .crossJoin(g.select("n"))
        .crossJoin(su2)
        .select(
            "cell",
            "cnt",
            "u",
            F.coalesce("su_nbr", F.lit(0).cast("long")).alias("su_nbr"),
            F.coalesce("n_nbr", F.lit(0).cast("long")).alias("n_nbr"),
            F.when(
                F.col("su_nbr").isNotNull() & (F.col("su2") > 0), i_e6
            ).alias("i_e6"),
            F.when(F.col("su_nbr").isNotNull(), quad).alias("quad"),
        )
    )


def ripley_k(
    points: DataFrame,
    level: int = 5,
    max_r: int = 3,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Grid Ripley's K function: (r, pairs_r, pairs_cum, npts, k_e6) for
    Chebyshev cell distances r = 0..max_r — the cumulative second-moment
    point-pattern statistic (K above the CSR expectation ⇒ clustering at
    that scale, below ⇒ dispersion/inhibition).

    Grid form: pairs_r counts ORDERED point pairs whose cells are at
    Chebyshev distance exactly r (r=0 is the within-cell term
    Σ cnt·(cnt−1)); ``K̂(r) = A·pairs_cum/npts²`` with A = 4^level cell
    units, floored to e6. Every count is an exact integer; the one float
    expression is a fixed product chain + division (IEEE-identical
    cross-engine). Same wrap/clamp rules as the neighbor machinery.

    Scale: the pair join is occupied-cells × (2·max_r+1)² literal
    offsets — an equi-join keyed on the offset cell, never points ×
    points; the cumulative window runs over max_r+1 rows."""
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    cells = occupied_cells(points, level, lat, lon)
    tot = F.broadcast(cells.agg(F.sum("cnt").cast("long").alias("npts")))
    d0 = cells.agg(
        F.sum(F.col("cnt") * (F.col("cnt") - F.lit(1))).cast("long").alias("pairs")
    ).select(F.lit(0).alias("r"), "pairs")
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(max(abs(dx), abs(dy))).alias("d"),
            )
            for dx, dy in _offsets(level, max_r)
            if (dx, dy) != (0, 0)
        ]
    )
    cross = (
        cells.withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)), F.col("_ny"), level
            ).alias("nbr"),
            F.col("_o.d").alias("r"),
            F.col("cnt").alias("_ci"),
        )
        .join(cells.select(F.col("cell").alias("nbr"), F.col("cnt").alias("_cj")), "nbr")
        .groupBy("r")
        .agg(F.sum(F.col("_ci") * F.col("_cj")).cast("long").alias("pairs"))
    )
    per = (
        d0.unionByName(cross)
        .groupBy("r")
        .agg(F.sum("pairs").cast("long").alias("pairs_r"))
    )
    w = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        F.col("r").cast("long").alias("r"),
        "pairs_r",
        F.sum("pairs_r").over(w).cast("long").alias("pairs_cum"),
    )
    k_e6 = F.floor(
        F.lit(1000000.0)
        * F.lit(float(n * n))
        * F.col("pairs_cum").cast("double")
        / (F.col("npts").cast("double") * F.col("npts").cast("double"))
    ).cast("long")
    return cum.crossJoin(tot).select(
        "r",
        "pairs_r",
        "pairs_cum",
        "npts",
        F.when(F.col("npts") > 0, k_e6).alias("k_e6"),
    )


def nn_gfunction(
    points: DataFrame,
    level: int = 5,
    max_r: int = 3,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Nearest-neighbor G function over the occupied-cell universe:
    (d, cells_d, cum_cells, n_cells, g_e6) for d = 1..max_r — the
    empirical CDF of each occupied cell's Chebyshev distance to its
    nearest OTHER occupied cell (G rising faster than the CSR curve ⇒
    clustering; slower ⇒ dispersion/inhibition — the event-to-event
    companion of Ripley's K). Cells with no occupied neighbor within
    max_r contribute to n_cells but never to a bin, so G saturates
    below 1e6. All counts exact integers; g_e6 floors cum/n.

    Scale: one occupied-cells × (2·max_r+1)²−1 literal-offset explode,
    one hash equi-join, a per-cell min + per-d groupBy; the cumulative
    window runs over ≤ max_r rows."""
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    cells = occupied_cells(points, level, lat, lon)
    tot = F.broadcast(cells.agg(F.count(F.lit(1)).cast("long").alias("n_cells")))
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(max(abs(dx), abs(dy))).alias("d"),
            )
            for dx, dy in _offsets(level, max_r)
            if (dx, dy) != (0, 0)
        ]
    )
    nn = (
        cells.withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            "cell",
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)), F.col("_ny"), level
            ).alias("nbr"),
            F.col("_o.d").alias("d"),
        )
        .join(cells.select(F.col("cell").alias("nbr")), "nbr")
        .groupBy("cell")
        .agg(F.min("d").alias("d"))
    )
    per = nn.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cells_d"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        F.col("d").cast("long").alias("d"),
        "cells_d",
        F.sum("cells_d").over(w).cast("long").alias("cum_cells"),
    )
    g_e6 = F.floor(
        F.lit(1000000.0)
        * F.col("cum_cells").cast("double")
        / F.col("n_cells").cast("double")
    ).cast("long")
    return cum.crossJoin(tot).select(
        "d", "cells_d", "cum_cells", "n_cells",
        F.when(F.col("n_cells") > 0, g_e6).alias("g_e6"),
    )


def emerging_hotspots(
    points: DataFrame,
    level: int = 4,
    slice_sec: int = 86400,
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
    max_lag: int | None = None,
) -> DataFrame:
    """Per-cell Mann-Kendall trend over the per-slice Gi* z-scores:
    (cell, n_slices, mk_s, trend). n_slices counts the cell's slices
    with a defined z; mk_s sums sign(z_later − z_earlier) over all
    ordered slice pairs (0 when fewer than 2 defined slices); trend is
    the sign label. A cell absent from a slice contributes nothing for
    that slice (occupied-universe semantics per slice).

    ``max_lag`` (r7) bounds the pair join to slice pairs at most
    ``max_lag`` slices apart — the classic TRAILING-WINDOW Mann-Kendall
    every emerging-hotspot tool ships. Unbounded, per-cell pair count
    grows as slices²; bounded, it is slices·max_lag, so cost stops
    growing with history length. None keeps the full-history form."""
    sl = F.floor(F.unix_timestamp(F.col(ts)) / F.lit(slice_sec)).cast("long")
    pts = points.select(sl.alias("sl"), F.col(lat).alias("lat"),
                        F.col(lon).alias("lon"))
    z = _gi_core(
        occupied_cells(pts, level, keys=["sl"]), level, ["sl"]
    ).where(F.col("z_e3").isNotNull()).select("sl", "cell", "z_e3")
    a = z.select("cell", F.col("sl").alias("_s1"), F.col("z_e3").alias("_z1"))
    b = z.select("cell", F.col("sl").alias("_s2"), F.col("z_e3").alias("_z2"))
    sign: Column = (
        F.when(F.col("_z2") > F.col("_z1"), 1)
        .when(F.col("_z2") < F.col("_z1"), -1)
        .otherwise(0)
    )
    pair_pred = F.col("_s2") > F.col("_s1")
    if max_lag is not None:
        pair_pred = pair_pred & (F.col("_s2") - F.col("_s1") <= F.lit(max_lag))
    mk = (
        a.join(b, "cell")
        .where(pair_pred)
        .groupBy("cell")
        .agg(F.sum(sign).cast("long").alias("mk_s"))
    )
    per_cell = z.groupBy("cell").agg(F.count(F.lit(1)).cast("long").alias("n_slices"))
    out = per_cell.join(mk, "cell", "left").select(
        "cell",
        "n_slices",
        F.coalesce(F.col("mk_s"), F.lit(0).cast("long")).alias("mk_s"),
    )
    trend = (
        F.when(F.col("mk_s") > 0, F.lit("rising"))
        .when(F.col("mk_s") < 0, F.lit("falling"))
        .otherwise(F.lit("flat"))
    )
    return out.select("cell", "n_slices", "mk_s", trend.alias("trend"))


# ---------------------------------------------------------------------------
# DuckDB oracles (same pinned integer formulas in ANSI SQL)

def _sql_cells(
    lat_sql: str, lon_sql: str, level: int, table: str, sl_sql: str | None = None
) -> str:
    sl_sel = f"{sl_sql} AS sl, " if sl_sql else ""
    sl_key = "sl, " if sl_sql else ""
    return (
        f"pts AS (SELECT {sl_sel}{UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table}), "
        f"occ AS (SELECT {sl_key}x, y, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM pts GROUP BY {'1, 2, 3' if sl_sql else '1, 2'}), "
        f"cells AS (SELECT {sl_key}{UF.xy_cell_sql('x', 'y', level)} AS cell, "
        "x, y, cnt FROM occ), "
        f"g AS (SELECT {sl_key}CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(cnt) AS BIGINT) AS sx, "
        "CAST(sum(cnt * cnt) AS BIGINT) AS sx2 FROM cells"
        f"{' GROUP BY 1' if sl_sql else ''})"
    )


def _sql_edges(level: int, keyed: bool = False) -> str:
    n = 1 << level
    offs = ", ".join(
        f"({dx}, {dy})" for dx, dy in _offsets(level, 1) if (dx, dy) != (0, 0)
    )
    sl_sel = "a.sl AS sl, " if keyed else ""
    sl_on = " AND b.sl = a.sl" if keyed else ""
    return (
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"e AS (SELECT {sl_sel}a.cell AS cell, b.cell AS nbr, b.cnt AS ncnt "
        "FROM cells a, offs o, cells b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy{sl_on})"
    )


def _sql_gi_select(keyed: bool = False) -> str:
    """hood CTE + final Gi* select list (keyed: per-slice universe)."""
    sl_sel = "sl, " if keyed else ""
    sl_on = " AND h.sl = c.sl" if keyed else ""
    g_join = "JOIN g ON g.sl = c.sl" if keyed else "CROSS JOIN g"
    return (
        f"hood AS (SELECT {sl_sel}cell, CAST(sum(ncnt) AS BIGINT) AS s_i, "
        "CAST(count(*) AS BIGINT) AS w_i FROM ("
        f"SELECT {sl_sel}cell, ncnt FROM e "
        f"UNION ALL SELECT {sl_sel}cell, cnt AS ncnt FROM cells) "
        f"GROUP BY {'1, 2' if keyed else '1'}), "
        f"zt AS (SELECT {'c.sl AS sl, ' if keyed else ''}c.cell, c.cnt, "
        "h.s_i, h.w_i, "
        "CASE WHEN CAST((g.n * g.sx2 - g.sx * g.sx) * "
        "(g.n * h.w_i - h.w_i * h.w_i) AS DOUBLE) > 0 THEN "
        "CAST(floor(CAST(g.n * h.s_i - g.sx * h.w_i AS DOUBLE) "
        "* sqrt(CAST(g.n - 1 AS DOUBLE)) * 1000.0 "
        "/ sqrt(CAST((g.n * g.sx2 - g.sx * g.sx) * "
        "(g.n * h.w_i - h.w_i * h.w_i) AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS z_e3 "
        f"FROM cells c JOIN hood h ON h.cell = c.cell{sl_on} {g_join})"
    )


def getis_ord_gi_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"{_sql_edges(level)}, {_sql_gi_select()} "
        "SELECT cell, cnt, s_i, w_i, z_e3 FROM zt"
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


def gearys_c_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"{_sql_edges(level)}, "
        "u AS (SELECT c.cell, CAST(g.n * c.cnt - g.sx AS BIGINT) AS u "
        "FROM cells c CROSS JOIN g), "
        "prod AS (SELECT CAST(count(*) AS BIGINT) AS w, "
        "CAST(sum((ui.u - uj.u) * (ui.u - uj.u)) AS BIGINT) AS num "
        "FROM e JOIN u ui ON ui.cell = e.cell JOIN u uj ON uj.cell = e.nbr), "
        "su AS (SELECT CAST(sum(u * u) AS BIGINT) AS sum_u2 FROM u) "
        "SELECT g.n, p.w, p.num, su.sum_u2, "
        "CASE WHEN p.w > 0 AND su.sum_u2 > 0 THEN "
        "CAST(floor(1000000.0 * CAST(g.n - 1 AS DOUBLE) * CAST(p.num AS DOUBLE) "
        "/ (2.0 * CAST(p.w AS DOUBLE) * CAST(su.sum_u2 AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS c_e6 "
        "FROM prod p CROSS JOIN su CROSS JOIN g"
    )


def local_moran_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"{_sql_edges(level)}, "
        "u AS (SELECT c.cell, c.cnt, "
        "CAST(g.n * c.cnt - g.sx AS BIGINT) AS u FROM cells c CROSS JOIN g), "
        "nbru AS (SELECT e.cell, CAST(sum(uj.u) AS BIGINT) AS su_nbr, "
        "CAST(count(*) AS BIGINT) AS n_nbr "
        "FROM e JOIN u uj ON uj.cell = e.nbr GROUP BY 1), "
        "su AS (SELECT CAST(sum(u * u) AS BIGINT) AS su2 FROM u) "
        "SELECT u.cell, u.cnt, u.u, "
        "COALESCE(nbru.su_nbr, CAST(0 AS BIGINT)) AS su_nbr, "
        "COALESCE(nbru.n_nbr, CAST(0 AS BIGINT)) AS n_nbr, "
        "CASE WHEN nbru.su_nbr IS NOT NULL AND su.su2 > 0 THEN "
        "CAST(floor(1000000.0 * CAST(g.n * u.u * nbru.su_nbr AS DOUBLE) "
        "/ CAST(su.su2 AS DOUBLE)) AS BIGINT) ELSE NULL END AS i_e6, "
        "CASE WHEN nbru.su_nbr IS NULL THEN NULL "
        "WHEN u.u >= 0 AND nbru.su_nbr >= 0 THEN 'HH' "
        "WHEN u.u < 0 AND nbru.su_nbr < 0 THEN 'LL' "
        "WHEN u.u >= 0 THEN 'HL' ELSE 'LH' END AS quad "
        "FROM u LEFT JOIN nbru ON nbru.cell = u.cell "
        "CROSS JOIN g CROSS JOIN su"
    )


def ripley_k_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    max_r: int = 3,
    table: str = "events",
) -> str:
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    offs = ", ".join(
        f"({dx}, {dy}, {max(abs(dx), abs(dy))})"
        for dx, dy in _offsets(level, max_r)
        if (dx, dy) != (0, 0)
    )
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"offs(dx, dy, d) AS (VALUES {offs}), "
        "crs AS (SELECT o.d AS r, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS pairs "
        "FROM cells a, offs o, cells b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy "
        "GROUP BY 1), "
        "d0 AS (SELECT 0 AS r, "
        "CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS pairs FROM cells), "
        "per AS (SELECT r, CAST(sum(pairs) AS BIGINT) AS pairs_r FROM "
        "(SELECT * FROM d0 UNION ALL SELECT * FROM crs) GROUP BY 1), "
        "cum AS (SELECT CAST(r AS BIGINT) AS r, pairs_r, "
        "CAST(sum(pairs_r) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS pairs_cum FROM per), "
        "tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS npts FROM cells) "
        "SELECT c.r, c.pairs_r, c.pairs_cum, t.npts, "
        "CASE WHEN t.npts > 0 THEN "
        f"CAST(floor(1000000.0::DOUBLE * {float(n * n)}::DOUBLE "
        "* CAST(c.pairs_cum AS DOUBLE) "
        "/ (CAST(t.npts AS DOUBLE) * CAST(t.npts AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS k_e6 "
        "FROM cum c CROSS JOIN tot t"
    )


def nn_gfunction_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    max_r: int = 3,
    table: str = "events",
) -> str:
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    offs = ", ".join(
        f"({dx}, {dy}, {max(abs(dx), abs(dy))})"
        for dx, dy in _offsets(level, max_r)
        if (dx, dy) != (0, 0)
    )
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"offs(dx, dy, d) AS (VALUES {offs}), "
        "nn AS (SELECT a.cell, min(o.d) AS d FROM cells a, offs o, cells b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy "
        "GROUP BY 1), "
        "per AS (SELECT d, CAST(count(*) AS BIGINT) AS cells_d "
        "FROM nn GROUP BY 1), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells FROM cells), "
        "cum AS (SELECT CAST(d AS BIGINT) AS d, cells_d, "
        "CAST(sum(cells_d) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cells FROM per) "
        "SELECT c.d, c.cells_d, c.cum_cells, t.n_cells, "
        "CASE WHEN t.n_cells > 0 THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(c.cum_cells AS DOUBLE) "
        "/ CAST(t.n_cells AS DOUBLE)) AS BIGINT) ELSE NULL END AS g_e6 "
        "FROM cum c CROSS JOIN tot t"
    )


def emerging_hotspots_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    slice_sec: int = 86400,
    ts_sql: str = "ts",
    table: str = "events",
    max_lag: int | None = None,
) -> str:
    # the hash-green retention day-bucket pattern: floor(epoch) to integer
    # seconds FIRST (epoch() doubles can dip just under integral boundaries
    # at 2024 epochs), then floor-divide by the slice width
    sl = (
        f"CAST(floor(CAST(floor(epoch({ts_sql})) AS BIGINT) / {slice_sec}) "
        "AS BIGINT)"
    )
    lag = f" AND b.sl - a.sl <= {max_lag}" if max_lag is not None else ""
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table, sl_sql=sl)}, "
        f"{_sql_edges(level, keyed=True)}, {_sql_gi_select(keyed=True)}, "
        "z AS (SELECT sl, cell, z_e3 FROM zt WHERE z_e3 IS NOT NULL), "
        "mk AS (SELECT a.cell, CAST(sum(CASE WHEN b.z_e3 > a.z_e3 THEN 1 "
        "WHEN b.z_e3 < a.z_e3 THEN -1 ELSE 0 END) AS BIGINT) AS mk_s "
        f"FROM z a JOIN z b ON b.cell = a.cell AND b.sl > a.sl{lag} GROUP BY 1), "
        "pc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_slices "
        "FROM z GROUP BY 1) "
        "SELECT pc.cell, pc.n_slices, "
        "COALESCE(mk.mk_s, CAST(0 AS BIGINT)) AS mk_s, "
        "CASE WHEN COALESCE(mk.mk_s, 0) > 0 THEN 'rising' "
        "WHEN COALESCE(mk.mk_s, 0) < 0 THEN 'falling' ELSE 'flat' END AS trend "
        "FROM pc LEFT JOIN mk ON mk.cell = pc.cell"
    )


def quadrat_chi2(
    points: DataFrame, level: int = 5, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Quadrat-count chi-square test statistic for complete spatial
    randomness over the FULL level-``level`` grid (M = 4^level cells,
    empty cells included via the closed form — never materialized):

    ``X² = Σ_allcells (obs − n/M)²/(n/M)  ≡  (M·Σobs² − n²) / n``

    so one partial-agg groupBy over occupied cells yields every term as
    an exact integer; the single division is floored to e6. Emits the
    ingredients (m, occ, n, s2) so the oracle certifies each. Integer
    range: needs ``M·Σobs²`` and ``n²`` below 2^63 (n ≲ 3·10⁹ at L5) —
    beyond that, shard by a coarser parent cell and sum, or pre-scale
    (documented bound, the morans_i product shape)."""
    m = 1 << (2 * level)
    cells = occupied_cells(points, level, lat, lon)
    agg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("occ"),
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    chi2 = F.floor(
        (F.lit(m).cast("long") * F.col("s2") - F.col("n") * F.col("n")).cast("double")
        * F.lit(1000000.0)
        / F.col("n").cast("double")
    ).cast("long")
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        "occ",
        "n",
        "s2",
        F.when(F.col("n") > 0, chi2).alias("chi2_e6"),
    )


def quadrat_chi2_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    m = 1 << (2 * level)
    return (
        f"WITH pts AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table}), "
        "occ AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt "
        "FROM pts GROUP BY 1, 2), "
        "agg AS (SELECT CAST(count(*) AS BIGINT) AS occ, "
        "CAST(sum(cnt) AS BIGINT) AS n, "
        "CAST(sum(cnt * cnt) AS BIGINT) AS s2 FROM occ) "
        f"SELECT CAST({m} AS BIGINT) AS m, occ, n, s2, "
        "CASE WHEN n > 0 THEN "
        f"CAST(floor(CAST({m} * s2 - n * n AS DOUBLE) * 1000000.0 "
        "/ CAST(n AS DOUBLE)) AS BIGINT) ELSE NULL END AS chi2_e6 "
        "FROM agg"
    )


def semivariogram(
    points: DataFrame,
    level: int = 5,
    max_h: int = 3,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Empirical semivariogram of the occupied-cell count surface:
    one row per Chebyshev lag ``h = 1..max_h`` with the DIRECTED pair
    count ``n_pairs``, the exact integer ``ss = Σ (cnt_i − cnt_j)²``,
    and ``gamma_e6 = floor(10⁶·ss/(2·n_pairs))`` (directed double-counts
    cancel: ss_d/(2·n_d) ≡ ss_u/(2·n_u)). Occupied-universe semantics
    (pinned, documented — empty-cell pairs excluded). One explode of the
    4·max_h·(max_h+1) ring offsets (h rides in the struct) + the
    standard wrap/clamp hash equi-join + one groupBy h."""
    n = 1 << level
    assert 2 * max_h + 1 <= n, "rings would wrap onto themselves"
    cells = occupied_cells(points, level, lat, lon)
    offs = F.array(
        *[
            F.struct(F.lit(h).alias("h"), F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for h in range(1, max_h + 1)
            for dx in range(-h, h + 1)
            for dy in range(-h, h + 1)
            if max(abs(dx), abs(dy)) == h
        ]
    )
    pairs = (
        cells.withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            F.col("_o.h").alias("h"),
            F.col("cnt").alias("_ci"),
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)), F.col("_ny"), level
            ).alias("nbr"),
        )
        .join(cells.select(F.col("cell").alias("nbr"), F.col("cnt").alias("_cj")), "nbr")
    )
    d = (F.col("_ci") - F.col("_cj")).cast("long")
    agg = pairs.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(d * d).cast("long").alias("ss"),
    )
    gamma = F.floor(
        F.col("ss").cast("double") * F.lit(1000000.0)
        / (F.lit(2.0) * F.col("n_pairs").cast("double"))
    ).cast("long")
    return agg.select(
        F.col("h").cast("long").alias("h"), "n_pairs", "ss",
        F.when(F.col("n_pairs") > 0, gamma).alias("gamma_e6"),
    )


def semivariogram_sql(
    lat_sql: str, lon_sql: str, level: int, max_h: int = 3, table: str = "events"
) -> str:
    n = 1 << level
    offs = ", ".join(
        f"({h}, {dx}, {dy})"
        for h in range(1, max_h + 1)
        for dx in range(-h, h + 1)
        for dy in range(-h, h + 1)
        if max(abs(dx), abs(dy)) == h
    )
    return (
        f"WITH pts AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table}), "
        "occ AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt "
        "FROM pts GROUP BY 1, 2), "
        f"offs(h, dx, dy) AS (VALUES {offs}), "
        "pr AS (SELECT o.h AS h, a.cnt AS ci, b.cnt AS cj "
        "FROM occ a, offs o, occ b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy) "
        "SELECT CAST(h AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n_pairs, "
        "CAST(sum((ci - cj) * (ci - cj)) AS BIGINT) AS ss, "
        "CASE WHEN count(*) > 0 THEN CAST(floor(CAST(sum((ci - cj) * (ci - cj)) "
        "AS DOUBLE) * 1000000.0 / (2.0 * CAST(count(*) AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS gamma_e6 "
        "FROM pr GROUP BY 1"
    )


def join_counts(
    points: DataFrame, level: int = 5, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Binary join-count statistics (Cliff & Ord 1981) over the
    occupied-cell universe: classify every occupied cell Black when its
    count exceeds the global mean (``n·cnt > Σx`` — the exact-integer
    mean comparison, no float mean ever materialized) and count the
    DIRECTED 8-adjacent pairs by colour: ``jbb`` (Black-Black), ``jww``
    (White-White) and ``jbw = w − jbb − jww`` (mixed). Emits the exact
    integer ingredients (n, nb, w, jbb, jww, jbw) plus ``ebb_e6`` — the
    expected directed BB count under non-free (randomization) sampling
    ``W·nb·(nb−1)/(n·(n−1))`` floored to e6, so observed-vs-expected
    clustering is read directly off the row. jbb ≫ ebb means the
    hot cells themselves are spatially clustered — the categorical
    complement of Moran's I.

    Cross-engine: every count is an exact integer over the same
    directed-pair universe as :func:`morans_i`; ebb's one float division
    has exact integer operands (``w·nb·(nb−1) ≤ 8·n³`` < 2^63 for any
    level ≤ 9 universe). Scale: one points→cells partial agg, the
    literal 8-offset explode equi-join, three broadcast one-row aggs —
    never points², never cells²."""
    cells = occupied_cells(points, level, lat, lon)
    g = _globals(cells)
    lab = cells.crossJoin(g).select(
        "cell",
        F.when(F.col("n") * F.col("cnt") > F.col("sx"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("b"),
    )
    nb = F.broadcast(lab.agg(F.sum("b").cast("long").alias("nb")))
    pairs = directed_neighbors(cells, level)
    jc = (
        pairs.join(
            lab.select(F.col("cell").alias("_c"), F.col("b").alias("_bi")),
            F.col("cell") == F.col("_c"),
        )
        .join(
            lab.select(F.col("cell").alias("_d"), F.col("b").alias("_bj")),
            F.col("nbr") == F.col("_d"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.coalesce(F.sum(F.col("_bi") * F.col("_bj")), F.lit(0))
            .cast("long")
            .alias("jbb"),
            F.coalesce(
                F.sum((F.lit(1) - F.col("_bi")) * (F.lit(1) - F.col("_bj"))),
                F.lit(0),
            )
            .cast("long")
            .alias("jww"),
        )
    )
    ebb = F.floor(
        F.lit(1000000.0)
        * (F.col("w") * F.col("nb") * (F.col("nb") - 1)).cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    ).cast("long")
    return (
        jc.crossJoin(nb)
        .crossJoin(g)
        .select(
            "n",
            "nb",
            "w",
            "jbb",
            "jww",
            (F.col("w") - F.col("jbb") - F.col("jww")).cast("long").alias("jbw"),
            F.when((F.col("n") > 1) & (F.col("w") > 0), ebb).alias("ebb_e6"),
        )
    )


def join_counts_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"{_sql_edges(level)}, "
        "lab AS (SELECT c.cell, CASE WHEN g.n * c.cnt > g.sx THEN 1 ELSE 0 END "
        "AS b FROM cells c CROSS JOIN g), "
        "nbt AS (SELECT CAST(sum(b) AS BIGINT) AS nb FROM lab), "
        "jc AS (SELECT CAST(count(*) AS BIGINT) AS w, "
        "CAST(coalesce(sum(bi.b * bj.b), 0) AS BIGINT) AS jbb, "
        "CAST(coalesce(sum((1 - bi.b) * (1 - bj.b)), 0) AS BIGINT) AS jww "
        "FROM e JOIN lab bi ON bi.cell = e.cell "
        "JOIN lab bj ON bj.cell = e.nbr) "
        "SELECT g.n, nbt.nb, jc.w, jc.jbb, jc.jww, "
        "jc.w - jc.jbb - jc.jww AS jbw, "
        "CASE WHEN g.n > 1 AND jc.w > 0 THEN "
        "CAST(floor(1000000.0 * CAST(jc.w * nbt.nb * (nbt.nb - 1) AS DOUBLE) "
        "/ CAST(g.n * (g.n - 1) AS DOUBLE)) AS BIGINT) ELSE NULL END AS ebb_e6 "
        "FROM jc CROSS JOIN nbt CROSS JOIN g"
    )


def idw_fill(
    points: DataFrame,
    level: int = 6,
    radius: int = 2,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Inverse-distance-weighted gap fill: estimate the count surface at
    every EMPTY cell within Chebyshev ``radius`` of at least one
    occupied cell (the interpolation ring a raster pipeline fills before
    rendering). Classic IDW with power 2 — ``est = Σ z_i/d_i² / Σ 1/d_i²``
    — made cross-engine-exact by multiplying through by
    ``L = lcm({d²})`` over the finite offset disk, so every weight
    ``L/d²`` is an exact integer (radius 2: d² ∈ {1,2,4,5,8}, L=40,
    weights {40,20,10,8,5}): ``num = Σ w·z`` and ``den = Σ w`` are exact
    integer sums (order-free), and ``est_e3 = floor(1000·num/den)`` is
    the single float division. Emits (cell, n_src, num, den, est_e3).

    Scale: occupied cells × the (2r+1)²−1 literal offsets (explode),
    one LEFT ANTI hash join against the occupied set (drop non-gaps),
    one partial-agg groupBy on the target cell — cost rides the occupied
    universe, never the raw points and never the full 4^level grid.
    Same wrap/clamp neighborhood rules as every grid op here."""
    n = 1 << level
    assert 2 * radius + 1 <= n, "rings would wrap onto themselves"
    import math

    disk = [
        (dx, dy, dx * dx + dy * dy)
        for dx, dy in _offsets(level, radius)
        if (dx, dy) != (0, 0)
    ]
    lcm = math.lcm(*sorted({d2 for _, _, d2 in disk}))
    cells = occupied_cells(points, level, lat, lon)
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(lcm // d2).alias("w"),
            )
            for dx, dy, d2 in disk
        ]
    )
    cand = (
        cells.withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)), F.col("_ny"), level
            ).alias("cell"),
            (F.col("_o.w").cast("long") * F.col("cnt")).alias("_wz"),
            F.col("_o.w").cast("long").alias("_w"),
        )
    )
    gaps = cand.join(cells.select("cell"), "cell", "left_anti")
    agg = gaps.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_src"),
        F.sum("_wz").cast("long").alias("num"),
        F.sum("_w").cast("long").alias("den"),
    )
    est = F.floor(
        F.lit(1000.0) * F.col("num").cast("double") / F.col("den").cast("double")
    ).cast("long")
    return agg.select("cell", "n_src", "num", "den", est.alias("est_e3"))


def idw_fill_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    radius: int = 2,
    table: str = "events",
) -> str:
    import math

    n = 1 << level
    disk = [
        (dx, dy, dx * dx + dy * dy)
        for dx, dy in _offsets(level, radius)
        if (dx, dy) != (0, 0)
    ]
    lcm = math.lcm(*sorted({d2 for _, _, d2 in disk}))
    offs = ", ".join(f"({dx}, {dy}, {lcm // d2})" for dx, dy, d2 in disk)
    return (
        f"WITH pts AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table}), "
        "occ AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt "
        "FROM pts GROUP BY 1, 2), "
        f"offs(dx, dy, w) AS (VALUES {offs}), "
        f"cand AS (SELECT (a.x + o.dx + {n}) % {n} AS tx, a.y + o.dy AS ty, "
        "o.w * a.cnt AS wz, CAST(o.w AS BIGINT) AS w FROM occ a, offs o "
        f"WHERE a.y + o.dy >= 0 AND a.y + o.dy < {n}), "
        "gaps AS (SELECT c.tx, c.ty, c.wz, c.w FROM cand c "
        "LEFT JOIN occ b ON b.x = c.tx AND b.y = c.ty WHERE b.x IS NULL) "
        f"SELECT {UF.xy_cell_sql('tx', 'ty', level)} AS cell, "
        "CAST(count(*) AS BIGINT) AS n_src, CAST(sum(wz) AS BIGINT) AS num, "
        "CAST(sum(w) AS BIGINT) AS den, "
        "CAST(floor(1000.0 * CAST(sum(wz) AS DOUBLE) / CAST(sum(w) AS DOUBLE)) "
        "AS BIGINT) AS est_e3 "
        "FROM gaps GROUP BY tx, ty"
    )


def std_ellipse(
    points: DataFrame,
    level: int = 8,
    key: str = "event_type",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Standard deviational ellipse (Lefever 1926 directional
    distribution) per ``key`` group over grid coordinates: the
    eigen-decomposition of the 2×2 coordinate covariance, emitted as
    exact-integer central moments scaled by n² — ``cxx = n·Σx² − (Σx)²``,
    ``cyy``, ``cxy = n·Σxy − Σx·Σy`` — plus the derived semi-axes
    ``a_e3/b_e3 = floor(1000·sqrt(λ₁₂)/n)`` (λ from the closed-form
    trace/discriminant eigenvalues; sqrt of exact-integer-derived
    doubles is IEEE correctly-rounded, one fixed expression per engine)
    and the orientation ingredient ``tan2t_e6 = floor(10⁶·2cxy/(cxx−cyy))``
    (NULL for a circular cloud). The how-elongated / which-way summary a
    mobility pipeline computes per category.

    Cross-engine: coordinates are PRE-CENTERED at each group's integer
    (min x, min y) anchor before the moments (the :func:`rog_from_points`
    r7 pattern); ``n·Σx² − (Σx)²`` and ``n·Σxy − Σx·Σy`` are exactly
    translation-invariant over the integers so the unanchored oracle is
    bit-identical — and the overflow bound moves from the global grid
    range to the per-group spread (``n²·spread² < 2^63``). PSD of the
    exact covariance guarantees λ₂ ≥ 0 up to the final rounding; both
    engines evaluate the identical double expression so the guard
    agrees. Scale: one tiny anchor groupBy broadcast back, one
    partial-agg moments groupBy — zero full-row shuffles, nothing
    quadratic."""
    pts = points.select(
        F.col(key).alias("k"),
        UF.grid_x(lon, level).alias("x"),
        UF.grid_y(lat, level).alias("y"),
    )
    anchors = pts.groupBy("k").agg(F.min("x").alias("ax"), F.min("y").alias("ay"))
    cx = (F.col("x") - F.col("ax")).cast("long")
    cy = (F.col("y") - F.col("ay")).cast("long")
    m = (
        pts.join(F.broadcast(anchors), "k")
        .select("k", cx.alias("x"), cy.alias("y"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    cxx = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("long")
    cyy = (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")).cast("long")
    cxy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long")
    c = m.select("k", "n", cxx.alias("cxx"), cyy.alias("cyy"), cxy.alias("cxy"))
    tr = (F.col("cxx") + F.col("cyy")).cast("double")
    # square in DOUBLE: (cxx-cyy)^2 in BIGINT overflows past ~3e9 spread
    # (n^2*spread^2 squared again); both engines run the identical IEEE
    # expression so cross-engine equality is preserved.
    dd = (F.col("cxx") - F.col("cyy")).cast("double")
    cd = F.col("cxy").cast("double")
    disc = F.sqrt(dd * dd + F.lit(4.0) * cd * cd)
    lam1 = (tr + disc) / F.lit(2.0)
    lam2 = (tr - disc) / F.lit(2.0)
    ax_ = F.floor(F.lit(1000.0) * F.sqrt(lam1) / F.col("n").cast("double")).cast("long")
    bx_ = F.floor(F.lit(1000.0) * F.sqrt(lam2) / F.col("n").cast("double")).cast("long")
    t2 = F.floor(
        F.lit(1000000.0)
        * (F.lit(2) * F.col("cxy")).cast("double")
        / (F.col("cxx") - F.col("cyy")).cast("double")
    ).cast("long")
    return c.select(
        F.col("k").alias(key),
        "n",
        "cxx",
        "cyy",
        "cxy",
        F.when(lam1 >= 0, ax_).alias("a_e3"),
        F.when(lam2 >= 0, bx_).alias("b_e3"),
        F.when(F.col("cxx") != F.col("cyy"), t2).alias("tan2t_e6"),
    )


def std_ellipse_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    key: str = "event_type",
    table: str = "events",
) -> str:
    return (
        f"WITH pts AS (SELECT {key} AS k, "
        f"{UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table}), "
        "m AS (SELECT k, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
        "CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2, "
        "CAST(sum(x * y) AS BIGINT) AS sxy FROM pts GROUP BY 1), "
        "c AS (SELECT k, n, n * sx2 - sx * sx AS cxx, "
        "n * sy2 - sy * sy AS cyy, n * sxy - sx * sy AS cxy FROM m), "
        "d AS (SELECT k, n, cxx, cyy, cxy, "
        "(CAST(cxx + cyy AS DOUBLE) + sqrt(CAST(cxx - cyy AS DOUBLE) "
        "* CAST(cxx - cyy AS DOUBLE) + 4.0::DOUBLE * CAST(cxy AS DOUBLE) "
        "* CAST(cxy AS DOUBLE))) / 2.0::DOUBLE AS lam1, "
        "(CAST(cxx + cyy AS DOUBLE) - sqrt(CAST(cxx - cyy AS DOUBLE) "
        "* CAST(cxx - cyy AS DOUBLE) + 4.0::DOUBLE * CAST(cxy AS DOUBLE) "
        "* CAST(cxy AS DOUBLE))) / 2.0::DOUBLE AS lam2 FROM c) "
        f"SELECT k AS {key}, n, cxx, cyy, cxy, "
        "CASE WHEN lam1 >= 0 THEN "
        "CAST(floor(1000.0::DOUBLE * sqrt(lam1) / CAST(n AS DOUBLE)) AS BIGINT) "
        "ELSE NULL END AS a_e3, "
        "CASE WHEN lam2 >= 0 THEN "
        "CAST(floor(1000.0::DOUBLE * sqrt(lam2) / CAST(n AS DOUBLE)) AS BIGINT) "
        "ELSE NULL END AS b_e3, "
        "CASE WHEN cxx <> cyy THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(2 * cxy AS DOUBLE) "
        "/ CAST(cxx - cyy AS DOUBLE)) AS BIGINT) ELSE NULL END AS tan2t_e6 "
        "FROM d"
    )


def cross_k(
    points: DataFrame,
    level: int = 5,
    a: str = "click",
    b: str = "purchase",
    max_r: int = 3,
    key: str = "event_type",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Bivariate (cross-type) Ripley's K: (r, pairs_r, pairs_cum, na,
    nb, k_e6) for Chebyshev cell distances r = 0..max_r between the
    ``a`` and ``b`` point patterns — the colocation statistic (K above
    the independence expectation means type-b points cluster AROUND
    type-a points at that scale, e.g. purchases around clicks).

    Grid form of :func:`ripley_k` with two marked sets: pairs_r counts
    ORDERED (i∈A, j∈B) point pairs whose cells are at Chebyshev
    distance exactly r (r=0 is the same-cell term Σ cntA·cntB — no
    self-pair correction, the types are disjoint);
    ``K̂_ab(r) = A·pairs_cum/(na·nb)`` with A = 4^level cell units,
    floored to e6. Exact integer counts; one fixed float expression.

    Scale: two filtered partial aggs + the A-cells × (2·max_r+1)²
    literal-offset equi-join against B-cells — cost rides the occupied
    universes, never points²; same wrap/clamp rules as every grid op."""
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    ca = occupied_cells(points.where(F.col(key) == a), level, lat, lon)
    cb = occupied_cells(points.where(F.col(key) == b), level, lat, lon)
    na = F.broadcast(ca.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("na")))
    nb = F.broadcast(cb.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("nb")))
    d0 = (
        ca.join(cb.select(F.col("cell"), F.col("cnt").alias("_cj")), "cell")
        .agg(
            F.coalesce(F.sum(F.col("cnt") * F.col("_cj")), F.lit(0))
            .cast("long")
            .alias("pairs")
        )
        .select(F.lit(0).alias("r"), "pairs")
    )
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(max(abs(dx), abs(dy))).alias("d"),
            )
            for dx, dy in _offsets(level, max_r)
            if (dx, dy) != (0, 0)
        ]
    )
    cross = (
        ca.withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)), F.col("_ny"), level
            ).alias("nbr"),
            F.col("_o.d").alias("r"),
            F.col("cnt").alias("_ci"),
        )
        .join(cb.select(F.col("cell").alias("nbr"), F.col("cnt").alias("_cj")), "nbr")
        .groupBy("r")
        .agg(F.sum(F.col("_ci") * F.col("_cj")).cast("long").alias("pairs"))
    )
    per = (
        d0.unionByName(cross)
        .groupBy("r")
        .agg(F.sum("pairs").cast("long").alias("pairs_r"))
    )
    w = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        F.col("r").cast("long").alias("r"),
        "pairs_r",
        F.sum("pairs_r").over(w).cast("long").alias("pairs_cum"),
    )
    k_e6 = F.floor(
        F.lit(1000000.0)
        * F.lit(float(n * n))
        * F.col("pairs_cum").cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    ).cast("long")
    return cum.crossJoin(na).crossJoin(nb).select(
        "r",
        "pairs_r",
        "pairs_cum",
        "na",
        "nb",
        F.when((F.col("na") > 0) & (F.col("nb") > 0), k_e6).alias("k_e6"),
    )


def cross_k_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    a: str = "click",
    b: str = "purchase",
    max_r: int = 3,
    key: str = "event_type",
    table: str = "events",
) -> str:
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    offs = ", ".join(
        f"({dx}, {dy}, {max(abs(dx), abs(dy))})"
        for dx, dy in _offsets(level, max_r)
        if (dx, dy) != (0, 0)
    )
    def _cells(side: str, val: str) -> str:
        return (
            f"pts_{side} AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
            f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table} "
            f"WHERE {key} = '{val}'), "
            f"c{side} AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt "
            f"FROM pts_{side} GROUP BY 1, 2)"
        )
    return (
        f"WITH {_cells('a', a)}, {_cells('b', b)}, "
        f"offs(dx, dy, d) AS (VALUES {offs}), "
        "d0 AS (SELECT 0 AS r, CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT) "
        "AS pairs FROM ca a JOIN cb b ON b.x = a.x AND b.y = a.y), "
        "crs AS (SELECT o.d AS r, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS pairs "
        "FROM ca a, offs o, cb b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy "
        "GROUP BY 1), "
        "per AS (SELECT r, CAST(sum(pairs) AS BIGINT) AS pairs_r FROM "
        "(SELECT * FROM d0 UNION ALL SELECT * FROM crs) GROUP BY 1), "
        "cum AS (SELECT CAST(r AS BIGINT) AS r, pairs_r, "
        "CAST(sum(pairs_r) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS pairs_cum FROM per), "
        "ta AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS na FROM ca), "
        "tb AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS nb FROM cb) "
        "SELECT c.r, c.pairs_r, c.pairs_cum, ta.na, tb.nb, "
        "CASE WHEN ta.na > 0 AND tb.nb > 0 THEN "
        f"CAST(floor(1000000.0::DOUBLE * {float(n * n)}::DOUBLE "
        "* CAST(c.pairs_cum AS DOUBLE) "
        "/ (CAST(ta.na AS DOUBLE) * CAST(tb.nb AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS k_e6 "
        "FROM cum c CROSS JOIN ta CROSS JOIN tb"
    )


def knox_spacetime(
    points: DataFrame,
    level: int = 6,
    bucket_s: int = 86400,
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Knox space-time interaction test (Knox 1964): one row
    (n, x_pairs, t_pairs, st_pairs, knox_e6) where x_pairs counts
    ORDERED point pairs close in space (Chebyshev cell distance <= 1 at
    ``level``), t_pairs pairs close in time (|bucket delta| <= 1 at
    ``bucket_s``-second buckets), st_pairs pairs close in BOTH, and
    ``knox_e6 = floor(1e6 * st * n * (n-1) / (x * t))`` - the
    observed/expected ratio under independence of the two margins
    (>1e6 means space-time clustering: outbreaks, coordinated bursts,
    event storms that are local in both dimensions).

    Every pair count is an exact integer over the occupied
    (cell)/(bucket)/(cell,bucket) universes: within-key ordered pairs
    cnt*(cnt-1) plus a literal-offset equi-join for cross-key pairs
    (8 spatial offsets / 2 time offsets / 26 space-time offsets).
    The one float expression multiplies exact-integer-valued doubles in
    a fixed order - cross-engine identical. Scale: cost rides the
    occupied universes, never points squared; same x-wrap / y-clamp
    neighborhood rules as every grid op here."""
    n_grid = 1 << level
    pts = points.select(
        UF.grid_x(lon, level).alias("x"),
        UF.grid_y(lat, level).alias("y"),
        F.floor(F.unix_timestamp(ts) / F.lit(bucket_s)).cast("long").alias("day"),
    )
    st = pts.groupBy("x", "y", "day").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cells = st.groupBy("x", "y").agg(F.sum("cnt").cast("long").alias("cnt"))
    days = st.groupBy("day").agg(F.sum("cnt").cast("long").alias("cnt"))

    def _within(df: DataFrame) -> Column:
        return F.coalesce(
            F.sum(F.col("cnt") * (F.col("cnt") - F.lit(1))), F.lit(0)
        ).cast("long")

    s_offs = [(dx, dy) for dx, dy in _offsets(level, 1) if (dx, dy) != (0, 0)]
    x_cross = (
        cells.withColumn(
            "_o", F.explode(F.array(*[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in s_offs
            ]))
        )
        .withColumn("_ny", F.col("y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n_grid))
        .select(
            F.pmod(F.col("x") + F.col("_o.dx"), F.lit(n_grid)).alias("_nx"),
            F.col("_ny"),
            F.col("cnt").alias("_ci"),
        )
        .join(
            cells.select(
                F.col("x").alias("_nx"), F.col("y").alias("_ny"),
                F.col("cnt").alias("_cj"),
            ),
            ["_nx", "_ny"],
        )
        .agg(F.coalesce(F.sum(F.col("_ci") * F.col("_cj")), F.lit(0))
             .cast("long").alias("c"))
    )
    t_cross = (
        days.select((F.col("day") + F.lit(1)).alias("_nd"),
                    F.col("cnt").alias("_ci"))
        .join(days.select(F.col("day").alias("_nd"),
                          F.col("cnt").alias("_cj")), "_nd")
        .agg(F.coalesce(F.sum(F.col("_ci") * F.col("_cj")), F.lit(0))
             .cast("long").alias("c"))
    )
    st_offs = [
        (dx, dy, dt)
        for dx, dy in _offsets(level, 1)
        for dt in (-1, 0, 1)
        if (dx, dy, dt) != (0, 0, 0)
    ]
    st_cross = (
        st.withColumn(
            "_o", F.explode(F.array(*[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                         F.lit(dt).alias("dt"))
                for dx, dy, dt in st_offs
            ]))
        )
        .withColumn("_ny", F.col("y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n_grid))
        .select(
            F.pmod(F.col("x") + F.col("_o.dx"), F.lit(n_grid)).alias("_nx"),
            F.col("_ny"),
            (F.col("day") + F.col("_o.dt")).alias("_nd"),
            F.col("cnt").alias("_ci"),
        )
        .join(
            st.select(
                F.col("x").alias("_nx"), F.col("y").alias("_ny"),
                F.col("day").alias("_nd"), F.col("cnt").alias("_cj"),
            ),
            ["_nx", "_ny", "_nd"],
        )
        .agg(F.coalesce(F.sum(F.col("_ci") * F.col("_cj")), F.lit(0))
             .cast("long").alias("c"))
    )
    tot = F.broadcast(
        cells.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n"))
    )
    xw = F.broadcast(cells.agg(_within(cells).alias("w")))
    tw = F.broadcast(days.agg(_within(days).alias("w")))
    stw = F.broadcast(st.agg(_within(st).alias("w")))
    # t_cross counts each unordered (+1) adjacency once per direction via
    # the day+1 self-join ONLY in the +1 direction; double it for ordered.
    out = (
        tot.crossJoin(F.broadcast(x_cross.select(F.col("c").alias("xc"))))
        .crossJoin(F.broadcast(t_cross.select(F.col("c").alias("tc"))))
        .crossJoin(F.broadcast(st_cross.select(F.col("c").alias("stc"))))
        .crossJoin(xw.select(F.col("w").alias("xw")))
        .crossJoin(tw.select(F.col("w").alias("tw")))
        .crossJoin(stw.select(F.col("w").alias("stw")))
        .select(
            "n",
            (F.col("xw") + F.col("xc")).cast("long").alias("x_pairs"),
            (F.col("tw") + F.lit(2) * F.col("tc")).cast("long").alias("t_pairs"),
            (F.col("stw") + F.col("stc")).cast("long").alias("st_pairs"),
        )
    )
    knox = F.floor(
        F.lit(1000000.0)
        * F.col("st_pairs").cast("double")
        * F.col("n").cast("double")
        * (F.col("n") - F.lit(1)).cast("double")
        / (F.col("x_pairs").cast("double") * F.col("t_pairs").cast("double"))
    ).cast("long")
    return out.select(
        "n", "x_pairs", "t_pairs", "st_pairs",
        F.when((F.col("x_pairs") > 0) & (F.col("t_pairs") > 0), knox)
        .alias("knox_e6"),
    )


def knox_spacetime_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    bucket_s: int = 86400,
    table: str = "events",
) -> str:
    n = 1 << level
    s_offs = ", ".join(
        f"({dx}, {dy})" for dx, dy in _offsets(level, 1) if (dx, dy) != (0, 0)
    )
    st_offs = ", ".join(
        f"({dx}, {dy}, {dt})"
        for dx, dy in _offsets(level, 1)
        for dt in (-1, 0, 1)
        if (dx, dy, dt) != (0, 0, 0)
    )
    return (
        f"WITH pts AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y, "
        f"CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / {bucket_s}) AS BIGINT) "
        f"AS day FROM {table}), "
        "st AS (SELECT x, y, day, CAST(count(*) AS BIGINT) AS cnt "
        "FROM pts GROUP BY 1, 2, 3), "
        "cells AS (SELECT x, y, CAST(sum(cnt) AS BIGINT) AS cnt "
        "FROM st GROUP BY 1, 2), "
        "days AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS cnt "
        "FROM st GROUP BY 1), "
        f"soffs(dx, dy) AS (VALUES {s_offs}), "
        f"stoffs(dx, dy, dt) AS (VALUES {st_offs}), "
        "xc AS (SELECT CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT) AS c "
        "FROM cells a, soffs o, cells b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy "
        f"AND a.y + o.dy >= 0 AND a.y + o.dy < {n}), "
        "tc AS (SELECT CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT) AS c "
        "FROM days a JOIN days b ON b.day = a.day + 1), "
        "stc AS (SELECT CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT) AS c "
        "FROM st a, stoffs o, st b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy "
        f"AND a.y + o.dy >= 0 AND a.y + o.dy < {n} "
        "AND b.day = a.day + o.dt), "
        "xw AS (SELECT CAST(coalesce(sum(cnt * (cnt - 1)), 0) AS BIGINT) AS w "
        "FROM cells), "
        "tw AS (SELECT CAST(coalesce(sum(cnt * (cnt - 1)), 0) AS BIGINT) AS w "
        "FROM days), "
        "stw AS (SELECT CAST(coalesce(sum(cnt * (cnt - 1)), 0) AS BIGINT) AS w "
        "FROM st), "
        "tot AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n FROM cells), "
        "o AS (SELECT tot.n, xw.w + xc.c AS x_pairs, "
        "tw.w + 2 * tc.c AS t_pairs, stw.w + stc.c AS st_pairs "
        "FROM tot CROSS JOIN xw CROSS JOIN xc CROSS JOIN tw CROSS JOIN tc "
        "CROSS JOIN stw CROSS JOIN stc) "
        "SELECT n, x_pairs, t_pairs, st_pairs, "
        "CASE WHEN x_pairs > 0 AND t_pairs > 0 THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(st_pairs AS DOUBLE) "
        "* CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) "
        "/ (CAST(x_pairs AS DOUBLE) * CAST(t_pairs AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS knox_e6 "
        "FROM o"
    )


def spatial_theil(
    points: DataFrame, level: int = 6, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Theil concentration index of the event count surface over the
    FULL 4^level cell universe: T = Σ_i (c_i/N)·ln(M·c_i/N) with M the
    universe size — 0 for a perfectly uniform spread, ln(M) for a single
    occupied cell; the regional-inequality gauge next to
    quadrat_chi2 (chi² asks "is it CSR?", Theil says HOW concentrated).
    Empty cells contribute exactly 0 (p·ln(Mp) → 0), so the sum runs
    over occupied cells only — the same closed-form-for-empties trick as
    quadrat_chi2.

    Cross-engine pinned form: per-cell z_i = floor(1e6·ln(M·c_i/N)·c_i)
    — the ln argument CAST(M·c_i AS DOUBLE)/CAST(N AS DOUBLE) is a ratio
    of exact integers, each term is floored BEFORE the order-free BIGINT
    sum, and theil_e6 = floor(Σz/N) is the single final division.
    Emits (n_cells, n_events, m_universe, theil_e6). Scale: one
    points→cells partial agg + one broadcast one-row total — cost rides
    the occupied universe."""
    m = 1 << (2 * level)
    cells = occupied_cells(points, level, lat, lon)
    tot = F.broadcast(
        cells.agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_events"),
        )
    )
    z = F.floor(
        F.lit(1000000.0)
        * F.log(
            (F.lit(m) * F.col("cnt")).cast("double")
            / F.col("n_events").cast("double")
        )
        * F.col("cnt").cast("double")
    ).cast("long")
    zs = (
        cells.crossJoin(tot)
        .agg(F.coalesce(F.sum(z), F.lit(0)).cast("long").alias("zsum"))
    )
    theil = F.floor(
        F.col("zsum").cast("double") / F.col("n_events").cast("double")
    ).cast("long")
    return zs.crossJoin(tot).select(
        "n_cells",
        "n_events",
        F.lit(m).cast("long").alias("m_universe"),
        F.when(F.col("n_events") > 0, theil).alias("theil_e6"),
    )


def spatial_theil_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    m = 1 << (2 * level)
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, "
        "CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_events FROM cells), "
        "zs AS (SELECT CAST(coalesce(sum(CAST(floor(1000000.0::DOUBLE "
        f"* ln(CAST({m} * c.cnt AS DOUBLE) / CAST(t.n_events AS DOUBLE)) "
        "* CAST(c.cnt AS DOUBLE)) AS BIGINT)), 0) AS BIGINT) AS zsum "
        "FROM cells c CROSS JOIN tot t) "
        f"SELECT t.n_cells, t.n_events, CAST({m} AS BIGINT) AS m_universe, "
        "CASE WHEN t.n_events > 0 THEN "
        "CAST(floor(CAST(z.zsum AS DOUBLE) / CAST(t.n_events AS DOUBLE)) "
        "AS BIGINT) ELSE NULL END AS theil_e6 "
        "FROM zs z CROSS JOIN tot t"
    )


# ---------------------------------------------------------------------------
# r7 continuation: Moran correlogram, global General G, spatial Gini


def moran_correlogram(
    points: DataFrame,
    level: int = 5,
    max_r: int = 3,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Moran's I correlogram: the global Moran statistic recomputed per
    Chebyshev ring distance r = 1..max_r over the occupied-cell
    universe — the classic distance-decay profile of spatial
    autocorrelation (I falls toward 0 as r grows on a clustered field;
    stays flat on a trend surface). Same integer u_i = n·x_i − Σx
    ingredients as :func:`morans_i`; pairs carry their ring label
    r = max(|dx|,|dy|) so ONE literal-offset explode + equi-join and
    ONE groupBy(r) produce every lag at once — cost is occupied-cells ×
    (2·max_r+1)², never points², and rings beyond the data simply
    emit no row (both engines). Emits (r, w, num, i_e6) per ring.
    """
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    cells = occupied_cells(points, level, lat, lon)
    g = _globals(cells)
    u = cells.crossJoin(g).select(
        "cell",
        (F.col("n") * F.col("cnt") - F.col("sx")).cast("long").alias("u"),
    )
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(max(abs(dx), abs(dy))).alias("r"),
            )
            for dx, dy in _offsets(level, max_r)
            if (dx, dy) != (0, 0)
        ]
    )
    pairs = (
        cells.select("cell")
        .withColumn("_x", UF.cell_x("cell", level))
        .withColumn("_y", UF.cell_y("cell", level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            "cell",
            F.col("_o.r").cast("long").alias("r"),
            UF.xy_to_cell(
                F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)),
                F.col("_ny"),
                level,
            ).alias("nbr"),
        )
        .join(cells.select(F.col("cell").alias("nbr")), "nbr")
    )
    prod = (
        pairs.join(
            u.select(F.col("cell"), F.col("u").alias("_ui")), "cell"
        )
        .join(
            u.select(F.col("cell").alias("nbr"), F.col("u").alias("_uj")),
            "nbr",
        )
        .groupBy("r")
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.sum(F.col("_ui") * F.col("_uj")).cast("long").alias("num"),
        )
    )
    su2 = F.broadcast(
        u.agg(F.sum(F.col("u") * F.col("u")).cast("long").alias("sum_u2"))
    )
    i_e6 = F.floor(
        F.lit(1000000.0)
        * F.col("n").cast("double")
        * F.col("num").cast("double")
        / (F.col("w").cast("double") * F.col("sum_u2").cast("double"))
    ).cast("long")
    return (
        prod.crossJoin(su2)
        .crossJoin(g)
        .select(
            "r",
            "w",
            "num",
            F.when((F.col("w") > 0) & (F.col("sum_u2") > 0), i_e6).alias("i_e6"),
        )
        .orderBy("r")
    )


def moran_correlogram_sql(
    lat_sql: str,
    lon_sql: str,
    level: int,
    max_r: int = 3,
    table: str = "events",
) -> str:
    n = 1 << level
    assert 2 * max_r + 1 <= n, "rings would wrap onto themselves"
    offs = ", ".join(
        f"({dx}, {dy}, {max(abs(dx), abs(dy))})"
        for dx, dy in _offsets(level, max_r)
        if (dx, dy) != (0, 0)
    )
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"offs(dx, dy, r) AS (VALUES {offs}), "
        "e AS (SELECT a.cell AS cell, b.cell AS nbr, CAST(o.r AS BIGINT) AS r "
        "FROM cells a, offs o, cells b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy), "
        "u AS (SELECT c.cell, CAST(g.n * c.cnt - g.sx AS BIGINT) AS u "
        "FROM cells c CROSS JOIN g), "
        "prod AS (SELECT e.r, CAST(count(*) AS BIGINT) AS w, "
        "CAST(sum(ui.u * uj.u) AS BIGINT) AS num "
        "FROM e JOIN u ui ON ui.cell = e.cell JOIN u uj ON uj.cell = e.nbr "
        "GROUP BY 1), "
        "su AS (SELECT CAST(sum(u * u) AS BIGINT) AS sum_u2 FROM u) "
        "SELECT p.r, p.w, p.num, "
        "CASE WHEN p.w > 0 AND su.sum_u2 > 0 THEN "
        "CAST(floor(1000000.0 * CAST(g.n AS DOUBLE) * CAST(p.num AS DOUBLE) "
        "/ (CAST(p.w AS DOUBLE) * CAST(su.sum_u2 AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS i_e6 "
        "FROM prod p CROSS JOIN su CROSS JOIN g ORDER BY p.r"
    )


def general_g(
    points: DataFrame, level: int = 6, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Getis-Ord General G — the GLOBAL high/low clustering statistic
    (the cnt·cnt companion to :func:`getis_ord_gi`'s per-cell z): with
    binary 8-neighborhood weights over the occupied-cell universe,
    ``G = Σ_{ij adj} x_i·x_j / Σ_{i≠j} x_i·x_j``. Numerator rides the
    same DIRECTED adjacent pairs as :func:`morans_i`; the denominator
    is the closed form ``(Σx)² − Σx²`` (every ordered pair i≠j) — both
    exact BIGINTs from one partial-agg groupBy + one 8-offset
    equi-join, ONE final floored float division (e9; G is a small
    positive fraction ≈ W/(n(n−1)) under CSR). Emits one row
    (n, w, num, den, g_e9); NULL when the universe has < 2 cells.
    Integer range: num ≤ W·max_cnt², den < (Σx)² — same coarse-level
    guidance as the Moran bound at extreme scale."""
    cells = occupied_cells(points, level, lat, lon)
    g = _globals(cells)
    pairs = directed_neighbors(cells, level)
    cv = cells.select("cell", "cnt")
    prod = (
        pairs.join(
            cv.select(F.col("cell"), F.col("cnt").alias("_ci")), "cell"
        )
        .join(
            cv.select(F.col("cell").alias("nbr"), F.col("cnt").alias("_cj")),
            "nbr",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.sum(F.col("_ci") * F.col("_cj")).cast("long").alias("num"),
        )
    )
    den = (F.col("sx") * F.col("sx") - F.col("sx2")).cast("long")
    g_e9 = F.floor(
        F.lit(1000000000.0)
        * F.col("num").cast("double")
        / F.col("den").cast("double")
    ).cast("long")
    return (
        prod.crossJoin(g)
        .withColumn("den", den)
        .select(
            "n",
            "w",
            "num",
            "den",
            F.when(F.col("den") > 0, g_e9).alias("g_e9"),
        )
    )


def general_g_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        f"{_sql_edges(level)}, "
        "prod AS (SELECT CAST(count(*) AS BIGINT) AS w, "
        "CAST(sum(ci.cnt * e.ncnt) AS BIGINT) AS num "
        "FROM e JOIN cells ci ON ci.cell = e.cell) "
        "SELECT g.n, p.w, p.num, "
        "CAST(g.sx * g.sx - g.sx2 AS BIGINT) AS den, "
        "CASE WHEN g.sx * g.sx - g.sx2 > 0 THEN "
        "CAST(floor(1000000000.0 * CAST(p.num AS DOUBLE) "
        "/ CAST(g.sx * g.sx - g.sx2 AS DOUBLE)) AS BIGINT) "
        "ELSE NULL END AS g_e9 "
        "FROM prod p CROSS JOIN g"
    )


def spatial_gini(
    points: DataFrame, level: int = 6, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Gini coefficient of the event-count surface over the FULL
    4^level cell universe — the rank-based concentration gauge beside
    :func:`spatial_theil` (Theil is log-based and top-sensitive, Gini
    is rank-based and middle-sensitive; production corpus-geography
    dashboards report both). With cells sorted ascending by count,
    ``G = (2·Σ rank_i·x_i − (M+1)·Σx) / (M·Σx)``; the M − n_occ empty
    cells hold ranks 1..M−n_occ and contribute 0, so occupied cell k
    (rank r_k among occupied, ascending) has universe rank
    M − n_occ + r_k — the sum is EXACT integers end to end and
    tie-order-independent (tied counts occupy consecutive ranks whose
    total is fixed), ONE final floored e6 division. The ranking window
    is a global sort of the OCCUPIED universe (≤ 4^level rows,
    data-size-independent — the stl_decompose_hourly justification).
    Emits (n_cells, n_events, m_universe, gini_e6). Integer bound:
    2·Σ rank·x ≤ 2·M·Σx must fit BIGINT — M·Σx < 2⁶² holds through
    level 6 (M=4096) at 10¹⁵ events."""
    m = 1 << (2 * level)
    cells = occupied_cells(points, level, lat, lon)
    tot = F.broadcast(
        cells.agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_events"),
        )
    )
    w = Window.orderBy(F.col("cnt").asc(), F.col("cell").asc())
    ranked = cells.withColumn("_r", F.row_number().over(w).cast("long"))
    s = ranked.crossJoin(tot).agg(
        F.coalesce(
            F.sum(
                (F.lit(m) - F.col("n_cells") + F.col("_r")) * F.col("cnt")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("s")
    )
    gini = F.floor(
        F.lit(1000000.0)
        * (
            F.lit(2.0) * F.col("s").cast("double")
            - F.lit(float(m + 1)) * F.col("n_events").cast("double")
        )
        / (F.lit(float(m)) * F.col("n_events").cast("double"))
    ).cast("long")
    return s.crossJoin(tot).select(
        "n_cells",
        "n_events",
        F.lit(m).cast("long").alias("m_universe"),
        F.when(F.col("n_events") > 0, gini).alias("gini_e6"),
    )


def spatial_gini_sql(
    lat_sql: str, lon_sql: str, level: int, table: str = "events"
) -> str:
    m = 1 << (2 * level)
    return (
        f"WITH {_sql_cells(lat_sql, lon_sql, level, table)}, "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, "
        "CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_events FROM cells), "
        "rk AS (SELECT cnt, CAST(row_number() OVER "
        "(ORDER BY cnt ASC, cell ASC) AS BIGINT) AS r FROM cells), "
        "s AS (SELECT CAST(coalesce(sum("
        f"({m} - t.n_cells + rk.r) * rk.cnt), 0) AS BIGINT) AS s "
        "FROM rk CROSS JOIN tot t) "
        f"SELECT t.n_cells, t.n_events, CAST({m} AS BIGINT) AS m_universe, "
        "CASE WHEN t.n_events > 0 THEN "
        "CAST(floor(1000000.0 * (2.0 * CAST(s.s AS DOUBLE) "
        f"- {float(m + 1)} * CAST(t.n_events AS DOUBLE)) "
        f"/ ({float(m)} * CAST(t.n_events AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS gini_e6 "
        "FROM s CROSS JOIN tot t"
    )
