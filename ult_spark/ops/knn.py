"""kNN join via cell-ring expansion + distance (theta) join (SURVEY §2.4 J3/J9).

Spec: BASELINE.json north_star "kNN via cell-ring expansion".

Design — everything stays native (whole-stage codegen), no UDFs:

1. Candidate generation: for search radius ``r`` grid cells, each query row
   explodes a *literal* array of (dx, dy) offsets, adds them to its native
   grid coordinates (x WRAPS modulo 2^L across the antimeridian, y clamps at
   the poles), and re-encodes the neighbor cell with the native Morton
   pipeline. This is `grid_disk` expressed as relational algebra — Catalyst
   sees a Generate + Project, no Python.
2. Equi-join candidates ⋈ data on the neighbor cell (broadcast the smaller
   side; data side is shuffle-partitioned by cell otherwise).
3. Exact refine under a pluggable metric (all IEEE-reproducible in DuckDB):
   - ``sq_deg``      squared planar degrees (legacy; lon does not wrap)
   - ``sq_deg_wrap`` squared planar degrees with wrapped Δlon
   - ``haversine_m`` great-circle meters (wrap-correct by construction)
   then `row_number` over (qid ORDER BY dist, id) ≤ k.
4. Completeness: a point outside disk(r) is separated by ≥ r cells in
   (wrapped) x or in y, which lower-bounds its distance (see `_round_bound`).
   A query is complete iff it has k hits and the k-th distance is STRICTLY
   below that bound (ties keep the query pending one more round — a point
   exactly on the bound circle could otherwise be missed). Unsatisfied
   queries fall to the next round (4x radius), then the exact fallback.

Round-2 rewrite (round-1 verdict #2): the whole search is ONE LAZY PLAN —
no driver loop, no driver-side rows. Candidates are generated ONCE for the
outer disk (4× the density-sized start radius) tagged with their ring
distance, so the inner round's ranking and completeness flags are just
additional window expressions over the SAME shuffle (the inner rank is a
running count of inner-disk rows in distance order). Per query: if the
inner disk completes (k hits strictly inside its bound), its top-k is
emitted with inner ranks; else if the outer disk completes, outer ranks;
else the query falls to an exact broadcast fallback over the data, pruned
at runtime by AQE's empty-relation propagation when no straggler remains.
`start_radius=None` sizes the inner radius from a density estimate (one
count() of the data — the only driver scalar, skippable by passing
start_radius).

At scale: the keyed search costs ONE scan of the data (broadcast join on
cell ids, zero data-side shuffle) + one candidate shuffle keyed by query id
— the outer disk inflates that shuffle ~16x over the minimum, which buys
never needing a second scan when the inner radius falls short. Without AQE
the plan is still exact — an empty fallback just costs its scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ult_spark import functions as UF

METRICS = ("sq_deg", "sq_deg_wrap", "haversine_m")


def _neighbor_cells(
    df: DataFrame, lat: str, lon: str, level: int, radius: int,
    with_cheb: bool = False,
) -> DataFrame:
    """Explode each row into its grid-disk(radius) neighbor cells at ``level``
    as column ``_ncell`` — fully native (literal offset array + Generate).
    x wraps modulo 2^L (antimeridian); y clamps (rows off-grid dropped).
    ``with_cheb``: also emit ``_cheb`` = max(|dx|, |dy|) (which ring of the
    disk the cell sits on — lets one explode serve several radii)."""
    n = 1 << level
    # cap so the wrapped x offsets cannot alias (2r+1 <= n) — beyond that the
    # disk already spans every longitude column
    rx = min(radius, (n - 1) // 2)
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(max(abs(dx), abs(dy))).alias("cheb"),
            )
            for dx in range(-rx, rx + 1)
            for dy in range(-radius, radius + 1)
        ]
    )
    out = (
        df.withColumn("_qx", UF.grid_x(lon, level))
        .withColumn("_qy", UF.grid_y(lat, level))
        .withColumn("_o", F.explode(offsets))
        .withColumn("_nx", F.pmod(F.col("_qx") + F.col("_o.dx"), F.lit(n)))
        .withColumn("_ny", F.col("_qy") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn("_ncell", UF.xy_to_cell(F.col("_nx"), F.col("_ny"), level))
    )
    if with_cheb:
        out = out.withColumn("_cheb", F.col("_o.cheb"))
    return out.drop("_qx", "_qy", "_o", "_nx", "_ny")


def _dist_col(metric: str, qlat, qlon, dlat, dlon) -> Column:
    if metric == "sq_deg":
        return UF.sq_euclid_deg(qlat, qlon, dlat, dlon)
    if metric == "sq_deg_wrap":
        dla = qlat - dlat
        dabs = F.abs(qlon - dlon)
        dlo = F.least(dabs, F.lit(360.0) - dabs)
        return dla * dla + dlo * dlo
    if metric == "haversine_m":
        return UF.haversine_m(qlat, qlon, dlat, dlon)
    raise ValueError(f"unknown metric {metric!r} (one of {METRICS})")


def _round_bound(metric: str, level: int, radius: int, qlat: Column) -> Column:
    n = 1 << level
    rx = min(radius, (n - 1) // 2)  # keep in sync with _neighbor_cells
    x_full = 2 * rx + 1 >= n  # disk spans every longitude column → no
    # point can be outside the disk in x; only the y bound constrains
    return _round_bound_xy(metric, level, radius, rx, x_full, qlat)


def _round_bound_xy(
    metric: str, level: int, radius: int, rx: int, x_full: bool, qlat: Column
) -> Column:
    """Lower bound (as a Column, comparable to the metric value) on the
    distance of any point OUTSIDE disk(radius) from the query.

    A point outside disk(r) is ≥ r cells away in wrapped-x or in y, i.e.
    separated by ≥ r*cell_w degrees of (wrapped) longitude or ≥ r*cell_h
    degrees of latitude, where cell_h = 180/2^L and cell_w = 360/2^L.

    - planar metrics: min(r*cell_h, r*cell_w) = r*cell_h degrees in either
      axis; bound = (r*cell_h)² (squared, matching the metric).
    - haversine: dist ≥ R·Δφ_rad for a latitude separation, and
      dist ≥ 2R·asin(cos(φmax)·sin(Δλ_rad/2)) for a longitude separation,
      where φmax bounds BOTH endpoint latitudes: the candidate is within
      disk(r) rows vertically, so |φ_pt − φ_q| ≤ (r+1)·cell_h. cos clamps
      at 0 (near-pole queries never satisfy the lon bound and fall through
      to the brute fallback). The bound is the min of the two — per-query,
      since it depends on qlat.
    """
    cell_h = 180.0 / (1 << level)
    cell_w = 360.0 / (1 << level)
    if metric in ("sq_deg", "sq_deg_wrap"):
        b = radius * cell_h if x_full else min(radius * cell_h, rx * cell_w)
        return F.lit(b * b)
    bound_y = F.lit(UF.EARTH_RADIUS_M) * F.radians(F.lit(radius * cell_h))
    if x_full:
        return bound_y
    # NO upper clamp on phimax: when |qlat| + (r+1)·cell_h reaches/passes
    # 90°, cos goes to ~0/negative and greatest(·, 0) zeroes the lon bound,
    # so near-pole queries can only complete via bound_y or the fallback.
    # (A previous 89.999° clamp OVERSTATED the bound by cos(89.999)≈1.7e-5
    # and could mark a pole query done while a closer cross-longitude
    # neighbor sat outside the disk — round-2 self-review finding #1.)
    phimax = F.abs(qlat) + F.lit((radius + 1) * cell_h)
    lam = F.radians(F.lit(min(rx * cell_w, 180.0)))
    bound_x = (
        F.lit(2.0 * UF.EARTH_RADIUS_M)
        * F.asin(F.greatest(F.cos(F.radians(phimax)), F.lit(0.0)) * F.sin(lam / 2.0))
    )
    return F.least(bound_y, bound_x)


def _auto_radius(n_data: int, level: int, k: int) -> int:
    """Density-sized start radius: expected candidates in disk(r) ≈ 4k under
    a uniform-density estimate, so the common case finishes in one round."""
    if n_data <= 0:
        return 1
    cells_total = float(4 ** level)
    want = 4.0 * k
    r = math.ceil((math.sqrt(want * cells_total / n_data) - 1.0) / 2.0)
    return max(1, min(r, 8))


def knn_join(
    queries: DataFrame,
    data: DataFrame,
    k: int,
    level: int = 7,
    start_radius: int | None = None,
    max_radius: int | None = None,
    qid: str = "qid",
    did: str = "id",
    qlat: str = "qlat",
    qlon: str = "qlon",
    dlat: str = "lat",
    dlon: str = "lon",
    metric: str = "sq_deg",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact k nearest ``data`` rows per ``queries`` row under ``metric``.

    Ties broken by ``did`` ascending. Returns (qid, did, <dist>, rk) where
    <dist> is ``sq_dist`` for the planar metrics and ``dist_m`` (meters,
    double) for ``haversine_m``. ``start_radius=None`` sizes the first round
    from the data count (one scan).
    """
    dist_name = "dist_m" if metric == "haversine_m" else "sq_dist"
    if max_radius is None:
        max_radius = 8  # beyond this the literal offset array gets silly —
        # stragglers (queries in empty regions) take the broadcast fallback
    if start_radius is None:
        start_radius = _auto_radius(data.count(), level, k)
    data_cells = data.select(
        F.col(did), F.col(dlat), F.col(dlon),
        UF.latlon_to_cell(dlat, dlon, level).alias("_dcell"),
    )
    dist = _dist_col(metric, F.col(qlat), F.col(qlon), F.col(dlat), F.col(dlon))
    w = Window.partitionBy(qid).orderBy(F.asc(dist_name), F.asc(did))
    wq = Window.partitionBy(qid)
    out_cols = (qid, did, dist_name)

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_queries else df

    # BOTH radii share ONE candidate pass: candidates are generated for the
    # outer disk tagged with their ring distance (_cheb), so the inner
    # round's ranking/completeness are window expressions over the same
    # shuffle (idx1 = running count of inner-disk rows in distance order).
    # One data scan total for the keyed rounds — the staged two-round
    # variant re-scanned the data when round 2 activated — and the exact
    # broadcast fallback remains for stragglers, pruned by AQE when none.
    r1 = start_radius
    r2 = 4 * start_radius if 4 * start_radius <= max_radius else r1
    queries_ = queries.select(qid, qlat, qlon)
    cand = _neighbor_cells(queries_, qlat, qlon, level, r2, with_cheb=True)
    joined = (
        _b(cand)
        .join(data_cells, cand["_ncell"] == data_cells["_dcell"], "inner")
        .withColumn(dist_name, dist)
    )
    in1 = (F.col("_cheb") <= r1).cast("int")
    scored = (
        joined
        .withColumn("_idx2", F.row_number().over(w))
        .withColumn(
            "_idx1",
            F.sum(in1).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .withColumn("_in1", in1 == 1)
    )
    b1 = _round_bound(metric, level, r1, F.col(qlat))
    b2 = _round_bound(metric, level, r2, F.col(qlat))
    flagged = (
        scored
        .withColumn("_n1", F.sum(in1).over(wq))
        .withColumn("_n2", F.count(F.lit(1)).over(wq))
        .withColumn(
            "_kth1",
            F.max(F.when(F.col("_in1") & (F.col("_idx1") <= k), F.col(dist_name))).over(wq),
        )
        .withColumn(
            "_kth2", F.max(F.when(F.col("_idx2") <= k, F.col(dist_name))).over(wq)
        )
        .withColumn("_done1", (F.col("_n1") >= k) & (F.col("_kth1") < b1))
        .withColumn("_done2", (F.col("_n2") >= k) & (F.col("_kth2") < b2))
    )
    keep = (F.col("_done1") & F.col("_in1") & (F.col("_idx1") <= k)) | (
        ~F.col("_done1") & F.col("_done2") & (F.col("_idx2") <= k)
    )
    rows = flagged.where(keep).select(
        *out_cols,
        F.when(F.col("_done1"), F.col("_idx1")).otherwise(F.col("_idx2"))
        .cast("long")
        .alias("rk"),
    )
    done_ids = flagged.where(F.col("_done1") | F.col("_done2")).select(qid).distinct()
    pending = queries_.join(_b(done_ids), qid, "left_anti")
    # exact fallback: broadcast the (few) unsatisfied queries across the
    # data once — data side streams through a single stage, no shuffle
    brute = (
        _b(pending).crossJoin(data_cells)
        .withColumn(dist_name, dist)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(*out_cols, F.col("rk").cast("long").alias("rk"))
    )
    return rows.unionByName(brute)


def distance_join(
    left: DataFrame,
    right: DataFrame,
    radius_deg: float,
    level: int = 6,
    lid: str = "lid",
    rid: str = "rid",
    llat: str = "llat",
    llon: str = "llon",
    rlat: str = "rlat",
    rlon: str = "rlon",
) -> DataFrame:
    """All (left, right) pairs within ``radius_deg`` planar degrees (J9).

    Cell-prefilter equi-join + exact refine — never a raw cross join.
    """
    cell_h = 180.0 / (1 << level)
    r_cells = max(1, math.ceil(radius_deg / cell_h) + 1)
    cand = _neighbor_cells(left.select(lid, llat, llon), llat, llon, level, r_cells)
    rcells = right.select(
        F.col(rid), F.col(rlat), F.col(rlon),
        UF.latlon_to_cell(rlat, rlon, level).alias("_rcell"),
    )
    sq = UF.sq_euclid_deg(F.col(llat), F.col(llon), F.col(rlat), F.col(rlon))
    return (
        cand.join(rcells, cand["_ncell"] == rcells["_rcell"], "inner")
        .where(sq <= F.lit(radius_deg * radius_deg))
        .select(lid, rid, sq.alias("sq_dist"))
    )


def distance_join_m(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    level: int = 6,
    lid: str = "lid",
    rid: str = "rid",
    llat: str = "llat",
    llon: str = "llon",
    rlat: str = "rlat",
    rlon: str = "rlon",
) -> DataFrame:
    """All (left, right) pairs within ``radius_m`` great-circle METERS (J9
    geodesic variant; wrap-correct across the antimeridian AND the poles).

    Candidate cells use a LATITUDE-AWARE x-radius: ``radius_m`` spans more
    longitude columns near the poles (a near-pole pair is within radius at
    ANY longitude), so each row filters the literal offset array to its own
    bound ``Δλ ≤ 2·asin(sin(r/2R) / cos(φmax))`` with ``φmax`` = the
    partner's worst-case |lat| (``min(|llat| + r_lat_deg, 90)``), from
    ``cos φ1 cos φ2 ≥ cos² φmax`` in the haversine. The array's dx range
    covers each wrapped column AT MOST ONCE (exactly n columns when a polar
    row needs full wrap — no duplicate pairs). Refine is exact haversine
    ≤ radius_m.
    """
    cell_h = 180.0 / (1 << level)
    cell_w = 360.0 / (1 << level)
    deg_m = UF.EARTH_RADIUS_M * math.pi / 180.0  # meters per degree latitude
    r_lat_deg = radius_m / deg_m
    ry = max(1, math.ceil(r_lat_deg / cell_h) + 1)
    n = 1 << level

    sin_half = math.sin(radius_m / (2.0 * UF.EARTH_RADIUS_M))
    # the literal dx range must cover the widest per-row need, which is the
    # FULL wrap (a near-pole row is within radius at any longitude), so the
    # array always spans every wrapped column exactly once:
    # [-(n//2), (n+1)//2). Per-row pruning below keeps the EXPLODED volume
    # proportional to each row's own bound; only the literal array (constant
    # folded, never shuffled) carries the worst case.
    dx_lo, dx_hi = -(n // 2), (n + 1) // 2 - 1
    phimax = F.least(F.abs(F.col(llat)) + F.lit(r_lat_deg), F.lit(90.0))
    dlam_deg = F.degrees(
        2.0 * F.asin(F.least(F.lit(1.0), F.lit(sin_half) / F.cos(F.radians(phimax))))
    )
    rx_row = F.ceil(dlam_deg / F.lit(cell_w)) + F.lit(1)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(dx_lo, dx_hi + 1)
            for dy in range(-ry, ry + 1)
        ]
    )
    cand = (
        left.select(lid, llat, llon)
        .withColumn("_rx", rx_row)
        .withColumn("_qx", UF.grid_x(llon, level))
        .withColumn("_qy", UF.grid_y(llat, level))
        # filter BEFORE explode: only rows that actually need the wide
        # x-range (near-pole) generate it; the explode volume per row is
        # its own bound, not the worst case
        .withColumn(
            "_o",
            F.explode(F.filter(offsets, lambda o: F.abs(o["dx"]) <= F.col("_rx"))),
        )
        .withColumn("_nx", F.pmod(F.col("_qx") + F.col("_o.dx"), F.lit(n)))
        .withColumn("_ny", F.col("_qy") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn("_ncell", UF.xy_to_cell(F.col("_nx"), F.col("_ny"), level))
        .drop("_rx", "_qx", "_qy", "_o", "_nx", "_ny")
    )
    rcells = right.select(
        F.col(rid), F.col(rlat), F.col(rlon),
        UF.latlon_to_cell(rlat, rlon, level).alias("_rcell"),
    )
    d = UF.haversine_m(F.col(llat), F.col(llon), F.col(rlat), F.col(rlon))
    return (
        cand.join(rcells, cand["_ncell"] == rcells["_rcell"], "inner")
        .where(d <= F.lit(radius_m))
        .select(lid, rid, d.alias("dist_m"))
    )
