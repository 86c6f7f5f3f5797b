"""kNN join via cell-ring expansion + distance (theta) join (SURVEY §2.4 J3/J9).

Spec: BASELINE.json north_star "kNN via cell-ring expansion".

Design — everything stays native (whole-stage codegen), no UDFs:

1. Candidate generation: for search radius ``r`` grid cells, each query row
   explodes a *literal* array of (dx, dy) offsets, adds them to its native
   grid coordinates, filters off-grid values (no antimeridian wrap in v0),
   and re-encodes the neighbor cell with the native Morton pipeline. This is
   `grid_disk` expressed as relational algebra — Catalyst sees a Generate +
   Project, no Python.
2. Equi-join candidates ⋈ data on the neighbor cell (broadcast the smaller
   side; data side is shuffle-partitioned by cell otherwise).
3. Exact refine: squared planar degree distance (IEEE-exact ⇒ DuckDB oracle
   agrees bit-for-bit), `row_number` over (qid ORDER BY dist, id) ≤ k.
4. Completeness: a point outside disk(r) is ≥ r*cell_height degrees away
   (query sits anywhere inside its own cell ⇒ worst case loses one cell).
   Queries whose k-th candidate distance exceeds that bound (or that found
   < k candidates) re-run with doubled radius; satisfied queries exit.

At scale: each round is one shuffle-join over the data keyed by cell id;
rounds are O(log max_radius) and the re-scan touches only unsatisfied
queries. Start radius should be sized from expected point density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.grid.cells import MAX_LEVEL


def _neighbor_cells(df: DataFrame, lat: str, lon: str, level: int, radius: int) -> DataFrame:
    """Explode each row into its grid-disk(radius) neighbor cells at ``level``
    as column ``_ncell`` — fully native (literal offset array + Generate)."""
    n = 1 << level
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
        ]
    )
    out = (
        df.withColumn("_qx", UF.grid_x(lon, level))
        .withColumn("_qy", UF.grid_y(lat, level))
        .withColumn("_o", F.explode(offsets))
        .withColumn("_nx", F.col("_qx") + F.col("_o.dx"))
        .withColumn("_ny", F.col("_qy") + F.col("_o.dy"))
        .where((F.col("_nx") >= 0) & (F.col("_nx") < n) & (F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn("_ncell", UF.xy_to_cell(F.col("_nx"), F.col("_ny"), level))
    )
    return out.drop("_qx", "_qy", "_o", "_nx", "_ny")


def knn_join(
    queries: DataFrame,
    data: DataFrame,
    k: int,
    level: int = 7,
    start_radius: int = 2,
    max_radius: int | None = None,
    qid: str = "qid",
    did: str = "id",
    qlat: str = "qlat",
    qlon: str = "qlon",
    dlat: str = "lat",
    dlon: str = "lon",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact k nearest ``data`` rows per ``queries`` row.

    Metric: squared planar degree distance (deterministic across engines);
    ties broken by ``did`` ascending. Returns (qid, id, sq_dist, rk).
    """
    cell_h = 180.0 / (1 << level)  # completeness bound uses the smaller side
    if max_radius is None:
        max_radius = 8  # beyond this the literal offset array gets silly —
        # stragglers (queries in empty regions) take the broadcast fallback
    data_cells = data.select(
        F.col(did), F.col(dlat), F.col(dlon),
        UF.latlon_to_cell(dlat, dlon, level).alias("_dcell"),
    )
    sq = UF.sq_euclid_deg(F.col(qlat), F.col(qlon), F.col(dlat), F.col(dlon))
    w = Window.partitionBy(qid).orderBy(F.asc("sq_dist"), F.asc(did))

    def topk_of(joined: DataFrame) -> DataFrame:
        return (
            joined.withColumn("sq_dist", sq)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(qid, did, "sq_dist", F.col("rk").cast("long").alias("rk"))
        )

    # Driver loop cost control: per-round completion is decided from the
    # COLLECTED per-query stats (one tiny row per pending query), so each
    # round runs ONE distributed job; done-query filtering uses isin() for
    # small query sets (no extra joins), distributed semi/anti joins beyond.
    pending = queries.select(qid, qlat, qlon)
    empty = queries.sparkSession.createDataFrame(
        [], f"{qid} long, {did} long, sq_dist double, rk long"
    )
    results: DataFrame | None = None
    radius = start_radius
    while radius <= max_radius:
        if not pending.take(1):
            return results if results is not None else empty
        cand = _neighbor_cells(pending, qlat, qlon, level, radius)
        cand = F.broadcast(cand) if broadcast_queries else cand
        topk = topk_of(cand.join(data_cells, cand["_ncell"] == data_cells["_dcell"], "inner"))
        bound = float(radius) * cell_h
        # a query is complete iff it has k hits and the kth is within the bound
        per_q = topk.groupBy(qid).agg(F.count("*").alias("_n"), F.max("sq_dist").alias("_kth"))
        stats = per_q.collect()  # one tiny row per pending query with hits
        done_ids = [r[qid] for r in stats if r["_n"] == k and r["_kth"] ** 0.5 <= bound]
        if done_ids:
            if len(done_ids) <= 100_000:
                done_rows = topk.where(F.col(qid).isin(done_ids))
                pending = pending.where(~F.col(qid).isin(done_ids))
            else:  # huge query sets: stay fully distributed
                done_q = per_q.where((F.col("_n") == k) & (F.sqrt("_kth") <= F.lit(bound))).select(qid)
                done_rows = topk.join(F.broadcast(done_q), qid, "left_semi")
                pending = pending.join(F.broadcast(done_q), qid, "left_anti")
            results = done_rows if results is None else results.unionByName(done_rows)
        radius *= 2
    if pending.take(1):
        # exact fallback: broadcast the (few) unsatisfied queries across the
        # data once — data side streams through a single stage, no shuffle
        brute = topk_of(F.broadcast(pending).crossJoin(data_cells))
        results = brute if results is None else results.unionByName(brute)
    return results


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
    import math

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
