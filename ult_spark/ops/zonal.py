"""Raster↔vector operators (SURVEY §2.5 A7/A8).

A7 zonal statistics: raster pixels → PIP-join pixel centers against zone
polygons → groupBy(zone) native aggregates. The pixel side reuses the exact
two-stage PIP join, so zonal stats inherit its broadcast-index pruning.

A8 rasterize: per-tile aggregates → (row, col, value) grid rows at a level,
using the native cell→(x, y) de-interleave — the inverse of the encode.

At 100 TB the raster side is just another big table keyed by cell; both
directions are one shuffle (the groupBy), with pruning/refine scan-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.geom.polyio import PackedPolygon
from ult_spark.geom.raster import GeoRef, PINNED_GEOREF, pixel_center_cols
from ult_spark.ops.pip import DEFAULT_INDEX_LEVEL, pip_join


def zonal_stats(
    raster: DataFrame,
    polys: list[PackedPolygon],
    ref: GeoRef = PINNED_GEOREF,
    value: str = "value",
) -> DataFrame:
    """Per-polygon count/sum/min/max/mean over pixel values.

    Sum/mean go through the e4 integer representation so results are exact
    under any parallelism (and match the DuckDB oracle bit-for-bit).
    """
    lat, lon = pixel_center_cols(ref)
    px = raster.select(
        F.col(value),
        F.floor(F.col(value) * 10000).cast("long").alias("_v_e4"),
        lat.alias("lat"),
        lon.alias("lon"),
    )
    joined = pip_join(px, polys)
    return joined.groupBy("poly_id").agg(
        F.count("*").alias("cnt"),
        F.sum("_v_e4").alias("sum_e4"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
        (F.sum("_v_e4") / F.count("*") / F.lit(10000.0)).alias("vmean"),
    )


def rasterize(
    tiles: DataFrame,
    level: int,
    cell: str = "cell",
    value: str = "cnt",
) -> DataFrame:
    """Tile aggregates → grid rows (x, y, value) at ``level`` (native)."""
    return tiles.select(
        UF.cell_x(cell, level).alias("x"),
        UF.cell_y(cell, level).alias("y"),
        F.col(value).alias("value"),
    )


def zonal_weighted(
    raster: DataFrame,
    polys: list[PackedPolygon],
    ref: GeoRef = PINNED_GEOREF,
    value: str = "value",
) -> DataFrame:
    """AREA-WEIGHTED zonal statistics (the overlay follow-up to
    :func:`zonal_stats`, which assigns each pixel whole to the polygon
    containing its center): every pixel contributes to every polygon in
    proportion to the EXACT intersection area of its 1-pixel rectangle
    with the polygon — boundary pixels are split instead of misassigned.

    Mechanism: pixel rectangles become 4-edge packed arrays built NATIVELY
    from (row, col); polygons arrive as the same oriented-edge arrays the
    intersection-area operator uses; candidates come from a CELL-COVER
    HASH equi-join (round-3 verdict #3 — the bbox broadcast theta join
    evaluated every pixel against every polygon, O(pixels × zones)): each
    pixel keys on its center's grid cell, each polygon on its polyfill
    cover DILATED by one cell (ops/buffer.dilate_cells). Validity: with
    pixel size ≤ the index cell height, a pixel rect that (closed-)touches
    a polygon has its center at most half a cell from a cover cell, so the
    k=1 dilation is a superset of every bbox-overlapping pair; the ORIGINAL
    open bbox predicate then runs as a row-local residual filter on the
    candidates, so the final pair set — and the DuckDB oracle, which keeps
    the bbox candidate formulation — is unchanged bit-for-bit. The
    per-pair area is ops/polyarea.py's Green's-theorem clipped-edge
    Column — fully row-local, no UDF, no extra shuffle before the final
    groupBy.

    Outputs per polygon (exact integers, order-free):
      area_e6  = Σ area(pixel ∩ poly) × 1e6   (the polygon's raster-covered area)
      wsum_e10 = Σ floor(value·1e4) × area_e6  (area-weighted value sum;
                 divide by 1e10·cell_deg² for the mean-weighted value)

    Boundary-only kernel (the scale plan): a pixel whose rect's closed
    bbox overlaps NO polygon edge bbox is entirely inside or outside, so
    the expensive clipping kernel runs only for boundary pixels — far
    pixels take a center-parity test and, when inside, the bit-identical
    closed form of the kernel's interior value (the rect's own Green
    integral: floor(dy·x1·1e6) per vertical edge; horizontal edges are
    exact zeros). Degenerate coincidences always land in the kernel branch
    because bbox-overlap is a superset of intersects/touches. Measured
    ~4× fewer kernel pairs on the pinned layer.
    """
    from ult_spark.ops.buffer import buffer_cells
    from ult_spark.ops.polyarea import _arrays_df

    spark = raster.sparkSession
    index_level = _zonal_index_level(ref)
    px = _pixel_rects(raster, ref, value, index_level)
    ea = _arrays_df(spark, polys, "a_id", "a")
    cover = buffer_cells(spark, polys, level=index_level, k=1).select(
        F.col("cell").alias("_ccell"), F.col("poly_id").alias("a_id")
    )
    bbox = spark.createDataFrame(
        [(p.poly_id, *p.bbox()) for p in polys],
        "a_id long, ymin double, ymax double, xmin double, xmax double",
    )
    # distinct (cell, poly) cover rows × one center cell per pixel ⇒ each
    # (pixel, polygon) candidate pair appears exactly once
    pa = cover.join(ea, "a_id").join(bbox, "a_id")
    return _zonal_weighted_core(px, pa, bcast=True)


def zonal_weighted_df(
    raster: DataFrame,
    layer_df: DataFrame,
    ref: GeoRef = PINNED_GEOREF,
    value: str = "value",
) -> DataFrame:
    """Distributed-layer twin of :func:`zonal_weighted` (the last overlay op
    without one): the zone layer arrives as a packed-ring DataFrame; the
    cover comes from cluster-side polyfill (ops/pip.build_cell_index_df)
    dilated by the SAME ops/buffer.dilate_cells stage, oriented arrays from
    ops/polyarea.build_oriented_arrays_df, bboxes natively from the ring
    arrays (array_min/array_max) — and the candidate join is a SHUFFLE hash
    join on the cell key, so both the raster AND the zone layer scale with
    the cluster. Kernel and residual filter are shared ⇒ results are
    bit-identical to the driver-layer variant (tests assert it)."""
    from ult_spark.ops.buffer import dilate_cells
    from ult_spark.ops.pip import build_cell_index_df
    from ult_spark.ops.polyarea import build_oriented_arrays_df

    index_level = _zonal_index_level(ref)
    px = _pixel_rects(raster, ref, value, index_level)
    base = build_cell_index_df(layer_df, index_level).select(
        "poly_id", F.col("icell").alias("cell")
    )
    cover = dilate_cells(base, index_level, 1).select(
        F.col("cell").alias("_ccell"), F.col("poly_id").alias("a_id")
    )
    ea = build_oriented_arrays_df(layer_df, "a_id", "a")
    bbox = layer_df.select(
        F.col("poly_id").alias("a_id"),
        F.array_min("ys").alias("ymin"), F.array_max("ys").alias("ymax"),
        F.array_min("xs").alias("xmin"), F.array_max("xs").alias("xmax"),
    )
    pa = cover.join(ea, "a_id").join(bbox, "a_id")
    return _zonal_weighted_core(px, pa, bcast=False)


def _zonal_index_level(ref: GeoRef) -> int:
    """Finest level whose cell HEIGHT (180/2^L, the binding dimension)
    still covers one pixel — the k=1 dilation argument needs pixel ≤ cell."""
    import math

    return min(DEFAULT_INDEX_LEVEL, int(math.floor(math.log2(180.0 / float(ref.cell_deg)))))


def _pixel_rects(raster: DataFrame, ref: GeoRef, value: str, index_level: int) -> DataFrame:
    """Pixel rows with value, center-cell candidate key, scalar bounds, and
    the CCW 4-edge packed rectangle arrays — all native from (row, col)."""
    cell = float(ref.cell_deg)
    x0 = F.lit(ref.origin_lon) + F.col("col").cast("double") * F.lit(cell)
    x1 = x0 + F.lit(cell)
    y0 = F.lit(ref.origin_lat) + F.col("row").cast("double") * F.lit(cell)
    y1 = y0 + F.lit(cell)
    return raster.select(
        (F.col("row").cast("long") * ref.ncols + F.col("col")).alias("b_id"),
        F.floor(F.col(value) * 10000).cast("long").alias("_v_e4"),
        UF.latlon_to_cell(
            y0 + F.lit(cell / 2.0), x0 + F.lit(cell / 2.0), index_level
        ).alias("_ccell"),
        x0.alias("_x0"), x1.alias("_x1"), y0.alias("_y0"), y1.alias("_y1"),
        # CCW rectangle edges as packed arrays (orientation weight 1.0)
        F.array(x0, x1, x1, x0).alias("bx1"),
        F.array(y0, y0, y1, y1).alias("by1"),
        F.array(x1, x1, x0, x0).alias("bx2"),
        F.array(y0, y1, y1, y0).alias("by2"),
        F.array(*[F.lit(1.0)] * 4).alias("bo"),
    )


def _zonal_weighted_core(px: DataFrame, pa: DataFrame, bcast: bool) -> DataFrame:
    """Shared candidate-join + kernel body (see zonal_weighted's docstring).
    ``bcast`` broadcasts the polygon side for driver-scale layers; the
    distributed twin shuffle-joins on the cell key instead."""
    from ult_spark.ops.polyarea import _clipped_area_e6

    # residual OPEN bbox-overlap filter — row-local on candidate rows
    # only, but SEMANTICALLY load-bearing: exactly-TOUCHING pairs have
    # zero-area intersections whose half-weight terms quantize to −1 per
    # edge (floor(x) + floor(−x) = −1); the open predicate excludes them,
    # exactly as the oracle's candidate CTE does
    overlap = (
        (F.col("_x0") < F.col("xmax")) & (F.col("_x1") > F.col("xmin"))
        & (F.col("_y0") < F.col("ymax")) & (F.col("_y1") > F.col("ymin"))
    )
    kernel_area = _clipped_area_e6("a", "b") + _clipped_area_e6("b", "a")
    aidx = F.sequence(F.lit(0), F.size("ax1") - 1)
    touch = F.exists(
        aidx,
        lambda j: (
            (F.greatest(F.element_at("ax1", j + 1), F.element_at("ax2", j + 1)) >= F.col("_x0"))
            & (F.least(F.element_at("ax1", j + 1), F.element_at("ax2", j + 1)) <= F.col("_x1"))
            & (F.greatest(F.element_at("ay1", j + 1), F.element_at("ay2", j + 1)) >= F.col("_y0"))
            & (F.least(F.element_at("ay1", j + 1), F.element_at("ay2", j + 1)) <= F.col("_y1"))
        ),
    )
    cx = (F.col("_x0") + F.col("_x1")) / 2
    cy = (F.col("_y0") + F.col("_y1")) / 2

    def _hit(j):
        bx1 = F.element_at("ax1", j + 1)
        by1 = F.element_at("ay1", j + 1)
        bx2 = F.element_at("ax2", j + 1)
        by2 = F.element_at("ay2", j + 1)
        straddle = (by1 > cy) != (by2 > cy)
        xint = (bx2 - bx1) * (cy - by1) / (by2 - by1) + bx1
        return straddle & (cx < xint)

    center_in = F.size(F.filter(aidx, _hit)) % 2 == 1
    # bit-identical interior value: the kernel folds from 0.0 and the
    # horizontal edges contribute exact ±0.0, so interior area reduces to
    # the two vertical rect edges' floors
    interior = (
        F.floor((F.col("_y1") - F.col("_y0")) * F.col("_x1") * F.lit(1_000_000)).cast("long")
        + F.floor((F.col("_y0") - F.col("_y1")) * F.col("_x0") * F.lit(1_000_000)).cast("long")
    )
    area = (
        F.when(touch, kernel_area)
        .when(center_in, interior)
        .otherwise(F.lit(0).cast("long"))
    )
    return (
        px.join(F.broadcast(pa) if bcast else pa, "_ccell", "inner")
        .where(overlap)
        .withColumn("_area_e6", area)
        .groupBy(F.col("a_id").alias("poly_id"))
        .agg(
            F.sum("_area_e6").alias("area_e6"),
            F.sum(F.col("_v_e4") * F.col("_area_e6")).alias("wsum_e10"),
        )
    )


def zonal_weighted_sql(
    polys: list[PackedPolygon], ref: GeoRef = PINNED_GEOREF
) -> str:
    """DuckDB mirror of :func:`zonal_weighted` on the pinned raster —
    reuses the intersection-area direction CTEs with the pixel layer
    GENERATED instead of inlined."""
    from ult_spark.geom.raster import raster_sql
    from ult_spark.ops.polyarea import _arrays_values, _direction_ctes

    cell = float(ref.cell_deg)
    ea = _arrays_values(polys, "eav", "a_id", "a")
    bbox_rows = ",".join(
        f"({p.poly_id},{p.bbox()[0]!r},{p.bbox()[1]!r},{p.bbox()[2]!r},{p.bbox()[3]!r})"
        for p in polys
    )
    return (
        f"WITH ea AS (SELECT * FROM {ea}), "
        f"px0 AS ({raster_sql(ref)}), "
        "px AS (SELECT CAST(row AS BIGINT) * "
        f"{ref.ncols} + col AS b_id, CAST(floor(value * 10000) AS BIGINT) AS v_e4, "
        f"CAST({ref.origin_lon} AS DOUBLE) + CAST(col AS DOUBLE) * CAST({cell} AS DOUBLE) AS x0, "
        f"CAST({ref.origin_lat} AS DOUBLE) + CAST(row AS DOUBLE) * CAST({cell} AS DOUBLE) AS y0 "
        "FROM px0), "
        f"pxr AS (SELECT b_id, v_e4, x0, y0, x0 + CAST({cell} AS DOUBLE) AS x1, "
        f"y0 + CAST({cell} AS DOUBLE) AS y1 FROM px), "
        "eb AS (SELECT b_id, [x0, x1, x1, x0]::DOUBLE[] AS bx1, "
        "[y0, y0, y1, y1]::DOUBLE[] AS by1, [x1, x1, x0, x0]::DOUBLE[] AS bx2, "
        "[y0, y1, y1, y0]::DOUBLE[] AS by2, [1.0, 1.0, 1.0, 1.0]::DOUBLE[] AS bo FROM pxr), "
        f"bbox(a_id, ymin, ymax, xmin, xmax) AS (VALUES {bbox_rows}), "
        "cand0 AS (SELECT a_id, b_id, x0, x1, y0, y1 FROM pxr JOIN bbox ON "
        "x0 < xmax AND x1 > xmin AND y0 < ymax AND y1 > ymin), "
        # mirror of the Spark boundary-only branch: kernel pairs = any poly
        # edge bbox overlapping the closed pixel rect; far pairs take the
        # center-parity + closed-form interior value
        "candt AS (SELECT c.*, len([j for j in generate_series(1, len(ax1)) "
        "if greatest(ax1[j], ax2[j]) >= x0 AND least(ax1[j], ax2[j]) <= x1 "
        "AND greatest(ay1[j], ay2[j]) >= y0 AND least(ay1[j], ay2[j]) <= y1]) > 0 AS touch "
        "FROM cand0 c JOIN ea USING (a_id)), "
        "cand AS (SELECT a_id, b_id FROM candt WHERE touch), "
        "far AS (SELECT c.a_id, c.b_id, CASE WHEN "
        "len([j for j in generate_series(1, len(ax1)) "
        "if ((ay1[j] > (y0 + y1) / 2) != (ay2[j] > (y0 + y1) / 2)) "
        "AND (x0 + x1) / 2 < (ax2[j] - ax1[j]) * ((y0 + y1) / 2 - ay1[j]) / (ay2[j] - ay1[j]) + ax1[j]"
        "]) % 2 = 1 THEN "
        "CAST(floor((y1 - y0) * x1 * 1000000) AS BIGINT) + CAST(floor((y0 - y1) * x0 * 1000000) AS BIGINT) "
        "ELSE 0 END AS area_e6 "
        "FROM candt c JOIN ea USING (a_id) WHERE NOT touch), "
        + _direction_ctes("a", "a_id", "b_id", "ea", "eb", "a", "b")
        + ", "
        + _direction_ctes("b", "b_id", "a_id", "eb", "ea", "b", "a")
        + " SELECT a_id AS poly_id, CAST(sum(area_e6) AS BIGINT) AS area_e6, "
        "CAST(sum(v_e4 * area_e6) AS BIGINT) AS wsum_e10 FROM ("
        "SELECT c.a_id, c.b_id, coalesce(sa, 0) + coalesce(sb, 0) AS area_e6 "
        "FROM cand c LEFT JOIN apair USING (a_id, b_id) "
        "LEFT JOIN bpair USING (a_id, b_id) "
        "UNION ALL SELECT a_id, b_id, area_e6 FROM far) "
        "JOIN pxr USING (b_id) GROUP BY 1"
    )


def raster_bilinear(
    points: DataFrame,
    raster: DataFrame,
    ref: GeoRef = PINNED_GEOREF,
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    value: str = "value",
) -> DataFrame:
    """Bilinear raster sampling at point locations (r5 — completes the
    raster↔vector family: center-assigned zonal, area-weighted zonal, and
    now interpolated POINT sampling, the ST_Value(bilinear) shape).

    Pinned semantics: continuous pixel coordinates are
    ``f = (coord - origin)/cell - 0.5`` (pixel centers at half-integers);
    the base corner clamps to the grid interior (edge-extend for points
    outside), and the sample is the 4-corner weighted sum with each term
    FLOOR-QUANTIZED at e6 before the integer sum (order-free per
    CLAUDE.md — a float sum over a hash-aggregated group has no pinned
    order). Returns (id, val_e6).

    Scale shape: each point explodes to exactly 4 corner keys and
    equi-joins the raster on (row, col) — at production raster sizes this
    is a plain shuffle join keyed by pixel, then one point-keyed
    aggregation; no window, nothing quadratic.

    Sparse rasters (ADVICE r5): a corner pixel absent from ``raster`` does
    NOT silently bias the sample — the corner join is a LEFT join and any
    point with fewer than 4 matched corners returns ``val_e6 = NULL``
    (no renormalization: a weight-rescaled partial sample would be a
    different estimator than bilinear, silently). Every input point keeps
    its output row. Dense grids (the synthetic raster, any gapless tile)
    are unaffected.
    """
    fy = (F.col(lat) - F.lit(ref.origin_lat)) / F.lit(ref.cell_deg) - F.lit(0.5)
    fx = (F.col(lon) - F.lit(ref.origin_lon)) / F.lit(ref.cell_deg) - F.lit(0.5)
    r0 = F.least(
        F.greatest(F.floor(fy).cast("int"), F.lit(0)), F.lit(ref.nrows - 2)
    )
    c0 = F.least(
        F.greatest(F.floor(fx).cast("int"), F.lit(0)), F.lit(ref.ncols - 2)
    )
    wy = F.least(F.greatest(fy - r0, F.lit(0.0)), F.lit(1.0))
    wx = F.least(F.greatest(fx - c0, F.lit(0.0)), F.lit(1.0))
    corners = points.select(
        F.col(id_col).alias("_id"),
        r0.alias("_r0"),
        c0.alias("_c0"),
        wy.alias("_wy"),
        wx.alias("_wx"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("dr"), F.lit(0).alias("dc")),
                F.struct(F.lit(0).alias("dr"), F.lit(1).alias("dc")),
                F.struct(F.lit(1).alias("dr"), F.lit(0).alias("dc")),
                F.struct(F.lit(1).alias("dr"), F.lit(1).alias("dc")),
            )
        ).alias("_d"),
    ).select(
        "_id",
        (F.col("_r0") + F.col("_d.dr")).alias("row"),
        (F.col("_c0") + F.col("_d.dc")).alias("col"),
        (
            F.when(F.col("_d.dr") == 0, F.lit(1.0) - F.col("_wy")).otherwise(F.col("_wy"))
            * F.when(F.col("_d.dc") == 0, F.lit(1.0) - F.col("_wx")).otherwise(F.col("_wx"))
        ).alias("_w"),
    )
    return (
        corners.join(raster.select("row", "col", value), ["row", "col"], "left")
        .groupBy("_id")
        .agg(
            F.sum(
                F.floor(F.col("_w") * F.col(value) * F.lit(1000000.0)).cast("long")
            )
            .cast("long")
            .alias("_s"),
            F.count(value).alias("_n"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_n") == 4, F.col("_s")).cast("long").alias("val_e6"),
        )
    )


def raster_bilinear_sql(
    ref: GeoRef = PINNED_GEOREF, lat_sql: str = "lat", lon_sql: str = "lon"
) -> str:
    """DuckDB mirror over the events view + the synthesized raster —
    identical continuous-coordinate structure, clamps, per-corner floors."""
    from ult_spark.geom.raster import raster_sql

    fy = f"(({lat_sql}) - {ref.origin_lat!r}::DOUBLE) / {ref.cell_deg!r}::DOUBLE - 0.5::DOUBLE"
    fx = f"(({lon_sql}) - {ref.origin_lon!r}::DOUBLE) / {ref.cell_deg!r}::DOUBLE - 0.5::DOUBLE"
    return (
        f"WITH raster AS ({raster_sql(ref)}), "
        f"pts AS (SELECT event_id, {fy} AS fy, {fx} AS fx FROM events), "
        "base AS (SELECT event_id, fy, fx, "
        f"least(greatest(CAST(floor(fy) AS INT), 0), {ref.nrows - 2}) AS r0, "
        f"least(greatest(CAST(floor(fx) AS INT), 0), {ref.ncols - 2}) AS c0 "
        "FROM pts), "
        "w AS (SELECT event_id, r0, c0, "
        "least(greatest(fy - r0, 0.0::DOUBLE), 1.0::DOUBLE) AS wy, "
        "least(greatest(fx - c0, 0.0::DOUBLE), 1.0::DOUBLE) AS wx "
        "FROM base), "
        "corners AS (SELECT event_id, r0 + d.dr AS row, c0 + d.dc AS col, "
        "(CASE WHEN d.dr = 0 THEN 1.0::DOUBLE - wy ELSE wy END) * "
        "(CASE WHEN d.dc = 0 THEN 1.0::DOUBLE - wx ELSE wx END) AS w "
        "FROM w CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) AS d(dr, dc)) "
        "SELECT c.event_id, CAST(sum(CAST(floor(c.w * r.value * 1000000.0::DOUBLE) "
        "AS BIGINT)) AS BIGINT) AS val_e6 "
        "FROM corners c JOIN raster r ON c.row = r.row AND c.col = r.col "
        "GROUP BY c.event_id"
    )
