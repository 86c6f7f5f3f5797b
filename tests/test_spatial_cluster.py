"""Grid-DBSCAN planted fixtures: density threshold, 8-adjacency merge,
antimeridian wrap, pole clamp (ops/spatial_cluster.py)."""

from __future__ import annotations

from ult_spark.ops.spatial_cluster import cell_dbscan, dense_adjacency, dense_cells

LEVEL = 4
N = 1 << LEVEL


def _center(x: int, y: int) -> tuple[float, float]:
    """(lat, lon) of the center of grid cell (x, y) at LEVEL."""
    return (-90.0 + (y + 0.5) * 180.0 / N, -180.0 + (x + 0.5) * 360.0 / N)


def _points(spark, cells: dict[tuple[int, int], int]):
    rows = []
    for (x, y), cnt in cells.items():
        la, lo = _center(x, y)
        rows += [(la, lo)] * cnt
    return spark.createDataFrame(rows, "lat double, lon double")


def test_min_pts_threshold(spark):
    pts = _points(spark, {(2, 2): 4, (5, 5): 3})
    dense = dense_cells(pts, LEVEL, 4).collect()
    assert len(dense) == 1 and dense[0]["cnt"] == 4


def test_two_blobs_and_noise(spark):
    # blob A: two adjacent dense cells (diagonal touch counts — Chebyshev 1)
    # blob B: one isolated dense cell far away; (9, 9) is sub-dense noise
    pts = _points(spark, {(2, 2): 5, (3, 3): 6, (10, 4): 4, (9, 9): 3})
    out = {r["cluster_id"]: r for r in cell_dbscan(pts, LEVEL, 4).collect()}
    assert len(out) == 2
    blobs = sorted((r["n_cells"], r["n_events"], r["peak_cnt"]) for r in out.values())
    assert blobs == [(1, 4, 4), (2, 11, 6)]


def test_antimeridian_wrap_merges(spark):
    # x = 0 and x = N-1 are neighbors across the date line (same y)
    pts = _points(spark, {(0, 7): 4, (N - 1, 7): 4})
    out = cell_dbscan(pts, LEVEL, 4).collect()
    assert len(out) == 1 and out[0]["n_cells"] == 2


def test_pole_rows_clamp_not_wrap(spark):
    # y = 0 and y = N-1 must NOT merge (y clamps); each is its own cluster
    pts = _points(spark, {(4, 0): 4, (4, N - 1): 4})
    out = cell_dbscan(pts, LEVEL, 4).collect()
    assert len(out) == 2


def test_adjacency_is_undirected_once(spark):
    pts = _points(spark, {(2, 2): 5, (3, 3): 6})
    cells = dense_cells(pts, LEVEL, 4)
    pairs = dense_adjacency(cells, LEVEL).collect()
    assert len(pairs) == 1 and pairs[0]["a"] < pairs[0]["b"]
