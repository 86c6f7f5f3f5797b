"""Grid-density clustering — DBSCAN over the cell grid (hotspot mining).

``cell_dbscan(points, level, min_pts)`` is the grid formulation of
DBSCAN (Ester et al. 1996) every tile engine ships as "hotspot/cluster
detection": cells holding ``>= min_pts`` points are *dense* (core);
dense cells that touch in the 8-neighborhood (Chebyshev distance 1 —
eps = one cell, x wraps across the antimeridian, y clamps at the poles)
merge into one cluster. Sub-dense cells are noise and drop out. Output
is one row per cluster: ``cluster_id`` (the component's smallest member
cell id — partition/engine invariant), ``n_cells``, ``n_events``,
``peak_cnt``.

Plan shape at 100 TB:

- the points→cell count is the ONLY full-data shuffle, and it is a
  partial-agg groupBy (map-side combine), so the shuffle carries one row
  per occupied cell, not per event;
- everything after runs on the dense-cell set (orders of magnitude
  smaller — bounded by 4^level regardless of input size);
- adjacency is a literal 8-offset explode of the dense set hash-joined
  back against itself on the neighbor cell id (equi-join; no theta join,
  no crossJoin, no distance predicate);
- components use the shared pointer-jumping CC core
  (:func:`ult_spark.ops.textops.connected_components`): log-diameter
  rounds, per-round localCheckpoint, observe()-folded fixpoint test.

The DuckDB oracle mirrors the density/adjacency rules and computes the
TRUE component fixpoint via WITH RECURSIVE (same validation discipline
as ``dup_clusters``), so the driver check also validates the engine's
round bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.ops.buffer import _offsets
from ult_spark.ops.textops import connected_components


def dense_cells(
    points: DataFrame, level: int, min_pts: int,
    lat: str = "lat", lon: str = "lon",
) -> DataFrame:
    """(cell, cnt) for cells holding at least ``min_pts`` points."""
    return (
        points.select(UF.latlon_to_cell(lat, lon, level).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_pts)
    )


def dense_adjacency(cells: DataFrame, level: int) -> DataFrame:
    """Undirected (a, b) edges (a < b) between 8-neighboring dense cells.

    x wraps (offsets capped so a wrapped column is covered at most once —
    shared :func:`ult_spark.ops.buffer._offsets` cap), y clamps: an
    out-of-range neighbor row is filtered before the join, so pole rows
    simply have fewer neighbors.
    """
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
    return (
        nbr.join(cells.select(F.col("cell").alias("nbr")), "nbr")
        .where(F.col("cell") < F.col("nbr"))
        .select(F.col("cell").alias("a"), F.col("nbr").alias("b"))
    )


def cell_dbscan(
    points: DataFrame, level: int = 6, min_pts: int = 4,
    lat: str = "lat", lon: str = "lon",
) -> DataFrame:
    """Grid DBSCAN: per-cluster (cluster_id, n_cells, n_events, peak_cnt)."""
    # the dense set is consumed 4× (labels init, both adjacency sides, the
    # final stats join) and is tiny (≤ 4^level rows) — persist it so the
    # full-data count agg runs ONCE, not per consumer
    cells = dense_cells(points, level, min_pts, lat, lon).persist()
    pairs = dense_adjacency(cells, level)
    # edge endpoints both come from `cells` by construction of the join;
    # jumps=2: a percolated grid (uniform data, low min_pts) has diameter
    # ~2^level, and each extra pointer jump per round is one tiny keyed
    # self-join that halves the driver-synchronized round count
    # max_rounds=64: percolated grids are PATH-shaped, where the min-label
    # frontier moves a few hops per round (12 rounds measured at sf0.01;
    # see connected_components docstring) — rounds are cheap (~1 s) now
    # that the stats barrier stops the per-round sizeInBytes compounding
    labels = connected_components(
        cells.select(F.col("cell").alias("doc_id")), pairs,
        assume_contained=True, jumps=2, max_rounds=64,
    )
    out = (
        labels.join(cells.withColumnRenamed("cell", "doc_id"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("cnt").cast("long").alias("n_events"),
            F.max("cnt").cast("long").alias("peak_cnt"),
        )
        # per-cluster stats are tiny; materialize them eagerly so the
        # persisted dense-cell blocks can be RELEASED before returning
        # (r6 ADVICE: long sessions — the 155-query oracle contract —
        # otherwise accumulate cached blocks across queries)
        .localCheckpoint()
    )
    cells.unpersist()
    return out


def cell_dbscan_sql(
    lat_sql: str, lon_sql: str, level: int, min_pts: int, table: str = "events"
) -> str:
    """DuckDB mirror: density + 8-adjacency + TRUE WITH RECURSIVE fixpoint."""
    n = 1 << level
    offs = ", ".join(
        f"({dx}, {dy})" for dx, dy in _offsets(level, 1) if (dx, dy) != (0, 0)
    )
    return (
        "WITH RECURSIVE pts AS ("
        f"SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y FROM {table}), "
        "dense AS (SELECT x, y, count(*) AS cnt FROM pts GROUP BY 1, 2 "
        f"HAVING count(*) >= {min_pts}), "
        f"cells AS (SELECT {UF.xy_cell_sql('x', 'y', level)} AS cell, "
        "x, y, cnt FROM dense), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        "e AS (SELECT a.cell AS a, b.cell AS b FROM cells a, offs o, cells b "
        f"WHERE b.x = (a.x + o.dx + {n}) % {n} AND b.y = a.y + o.dy), "
        "comp(cell, label) AS (SELECT cell, cell FROM cells "
        "UNION SELECT e.a, c.label FROM e JOIN comp c ON c.cell = e.b), "
        "labels AS (SELECT cell, min(label) AS cluster_id FROM comp GROUP BY 1) "
        "SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_cells, "
        "CAST(sum(c.cnt) AS BIGINT) AS n_events, "
        "CAST(max(c.cnt) AS BIGINT) AS peak_cnt "
        "FROM labels l JOIN cells c ON c.cell = l.cell GROUP BY 1"
    )
