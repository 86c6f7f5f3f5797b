"""Grid buffer — cell-approximated polygon buffering (overlay family,
alongside ops/polyjoin.py intersects and ops/polyarea.py area).

``buffer_cells(polys, level, k)`` returns the polygon's compacted cell
cover at ``level`` DILATED by a Chebyshev disk of ``k`` cells — the
grid-native buffer. For a metric buffer of radius ``r`` degrees pick
``k = ceil(r / cell_h)`` (conservative superset: every point within r of
the polygon lies in the returned cells; the approximation error is one
cell ring). This is the morphological-dilation formulation of buffering,
the standard raster/grid answer where exact offset geometry (Minkowski
sum with arc joins) is not needed.

Plan shape: the cover is built once (driver polyfill+compact for the
broadcast-scale layer — the same `_index_rows` the PIP join uses), the
dilation is a literal offset explode + re-encode (native, exactly the
focal_agg scatter with the same asymmetric wrap cap) and one distinct.
At parcel scale, swap the cover source for ops/pip.build_cell_index_df
(cluster-side polyfill) — the dilation stage is unchanged.

x wraps across the antimeridian (offsets capped to cover each wrapped
column at most once), y clamps at the poles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.geom.polyio import PackedPolygon
from ult_spark.ops.pip import DEFAULT_INDEX_LEVEL, _index_rows


def _offsets(level: int, k: int) -> list[tuple[int, int]]:
    n = 1 << level
    rlo, rhi = min(k, n // 2), min(k, (n - 1) // 2)
    return [(dx, dy) for dx in range(-rlo, rhi + 1) for dy in range(-k, k + 1)]


def dilate_cells(cells: DataFrame, level: int, k: int,
                 cell: str = "cell", keys: tuple[str, ...] = ("poly_id",)) -> DataFrame:
    """Dilate a cell set (at uniform ``level``) by a Chebyshev-``k`` disk —
    the generic morphological step shared by buffer and any coverage grow."""
    n = 1 << level
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _offsets(level, k)
        ]
    )
    return (
        cells
        .withColumn("_x", UF.cell_x(cell, level))
        .withColumn("_y", UF.cell_y(cell, level))
        .withColumn("_o", F.explode(offs))
        .withColumn("_nx", F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(
            *keys,
            UF.xy_to_cell(F.col("_nx"), F.col("_ny"), level).alias(cell),
        )
        .distinct()
    )


def buffer_cells(
    spark: SparkSession,
    polys: list[PackedPolygon],
    level: int = DEFAULT_INDEX_LEVEL,
    k: int = 1,
) -> DataFrame:
    """(poly_id, cell): each polygon's cover dilated by ``k`` cells."""
    base = spark.createDataFrame(
        [(int(p), int(c)) for c, p in _index_rows(polys, level)],
        "poly_id long, cell long",
    )
    return dilate_cells(base, level, k)


def buffer_cells_df(
    layer_df: DataFrame, level: int = DEFAULT_INDEX_LEVEL, k: int = 1
) -> DataFrame:
    """Distributed-layer twin of :func:`buffer_cells` (the module docstring's
    promised parcel-scale swap): cover from cluster-side polyfill
    (ops/pip.build_cell_index_df), then the IDENTICAL dilation stage —
    bit-identical results, nothing driver-side, nothing broadcast."""
    from ult_spark.ops.pip import build_cell_index_df

    base = build_cell_index_df(layer_df, level).select(
        "poly_id", F.col("icell").alias("cell")
    )
    return dilate_cells(base, level, k)


SIDES = (("N", 0, 1), ("E", 1, 0), ("S", 0, -1), ("W", -1, 0))


def coverage_boundary(
    cells: DataFrame, level: int, cell: str = "cell",
    keys: tuple[str, ...] = ("poly_id",),
) -> DataFrame:
    """Boundary sides of a cell coverage — the vectorize-inverse of
    polyfill: one row per (keys, cell, side) whose 4-neighbour in that
    direction is NOT in the same coverage (x wraps across the antimeridian;
    the grid's top/bottom rows count their poleward side as boundary).

    The morphological erosion complement: interior cells emit nothing, so
    the output is O(perimeter), ready for rendering or boundary-length
    stats. Fully native — explode 4 literal sides + one left_anti
    self-join keyed (keys, neighbour cell); no geometry code at all."""
    n = 1 << level
    sides = F.array(
        *[
            F.struct(F.lit(s).alias("side"), F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for s, dx, dy in SIDES
        ]
    )
    cand = (
        cells
        .withColumn("_x", UF.cell_x(cell, level))
        .withColumn("_y", UF.cell_y(cell, level))
        .withColumn("_s", F.explode(sides))
        .withColumn("_ny", F.col("_y") + F.col("_s.dy"))
        .withColumn(
            "_ncell",
            F.when(
                (F.col("_ny") >= 0) & (F.col("_ny") < n),
                UF.xy_to_cell(
                    F.pmod(F.col("_x") + F.col("_s.dx"), F.lit(n)), F.col("_ny"), level
                ),
            ),  # NULL neighbour = off-grid → always boundary
        )
        .select(*keys, F.col(cell), F.col("_s.side").alias("side"), "_ncell")
    )
    member = cells.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys], F.col(cell).alias("_ncell")
    )
    on = [cand["_ncell"] == member["_ncell"]] + [
        cand[k] == member[f"_k_{k}"] for k in keys
    ]
    joined = cand.join(member, on, "left_anti")
    return joined.select(*keys, cell, "side")


def coverage_boundary_sql(
    polys: list[PackedPolygon], level: int = DEFAULT_INDEX_LEVEL
) -> str:
    """DuckDB mirror over the same inlined covers: identical neighbour
    arithmetic + NOT EXISTS membership."""
    import numpy as np

    from ult_spark.grid.cells import cell_to_xy
    from ult_spark import functions as _UF

    n = 1 << level
    rows = []
    for c, p in _index_rows(polys, level):
        x, y, _ = cell_to_xy(np.asarray([c], dtype=np.int64))
        rows.append(f"({p},{int(c)},{int(x[0])},{int(y[0])})")
    sides = ",".join(f"('{s}',{dx},{dy})" for s, dx, dy in SIDES)
    ncell = _UF.xy_cell_sql(f"(x + dx + {n}) % {n}", "y + dy", level)
    return (
        f"WITH base(poly_id, cell, x, y) AS (VALUES {','.join(rows)}), "
        f"s(side, dx, dy) AS (VALUES {sides}), "
        "cand AS (SELECT poly_id, cell, side, "
        f"CASE WHEN y + dy >= 0 AND y + dy < {n} THEN CAST({ncell} AS BIGINT) END AS ncell "
        "FROM base, s) "
        "SELECT poly_id, cell, side FROM cand c WHERE ncell IS NULL OR NOT EXISTS ("
        "SELECT 1 FROM base b WHERE b.poly_id = c.poly_id AND b.cell = c.ncell)"
    )


def buffer_cells_sql(
    polys: list[PackedPolygon], level: int = DEFAULT_INDEX_LEVEL, k: int = 1
) -> str:
    """DuckDB mirror: the same base cover inlined as (poly_id, x, y) VALUES
    (decoded with the driver kernel — the exact inverse of the encode both
    engines share), same capped offsets, same Morton re-encode."""
    import numpy as np

    from ult_spark.grid.cells import cell_to_xy

    n = 1 << level
    rows = []
    for c, p in _index_rows(polys, level):
        x, y, lv = cell_to_xy(np.asarray([c], dtype=np.int64))
        assert int(lv[0]) == level
        rows.append(f"({p},{int(x[0])},{int(y[0])})")
    offs = ",".join(f"({dx},{dy})" for dx, dy in _offsets(level, k))
    cell = UF.xy_cell_sql(f"(x + dx + {n}) % {n}", "y + dy", level)
    return (
        f"WITH base(poly_id, x, y) AS (VALUES {','.join(rows)}), "
        f"o(dx, dy) AS (VALUES {offs}) "
        f"SELECT DISTINCT poly_id, CAST({cell} AS BIGINT) AS cell "
        f"FROM base, o WHERE y + dy >= 0 AND y + dy < {n}"
    )
