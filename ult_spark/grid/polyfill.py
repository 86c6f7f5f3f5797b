"""Polyfill — conservative covering cells of a polygon at a level (C7).

Used to build the compacted polygon index that stage-1 of the PIP join
broadcasts (BASELINE.json north_star: "broadcast of compacted polygon
indexes"). Overcoverage is harmless (stage-2 ray casting refines exactly);
undercoverage would drop join rows, so the test is conservative:

keep a candidate cell iff
  (a) its center is inside the polygon         (cell fully/mostly interior), or
  (b) any polygon vertex falls in its bbox     (polygon smaller than cell), or
  (c) any polygon edge intersects its bbox     (boundary crosses the cell).
"""

from __future__ import annotations

import numpy as np

from ult_spark.geom.pip import points_in_polygon
from ult_spark.geom.polyio import PackedPolygon

from . import cells


def _segment_intersects_bbox(
    x1, y1, x2, y2, bx0, by0, bx1, by1
) -> np.ndarray:
    """Vectorized segment-vs-axis-aligned-rect intersection.

    Shapes: edges (m,), boxes (n,) → (n, m) boolean. Uses the slab method
    (Liang–Barsky style parametric clipping) [public algorithm].
    """
    dx = (x2 - x1)[None, :]
    dy = (y2 - y1)[None, :]
    ox = x1[None, :]
    oy = y1[None, :]
    t0 = np.zeros((bx0.size, x1.size))
    t1 = np.ones_like(t0)
    ok = np.ones_like(t0, dtype=bool)
    for o, d, lo, hi in ((ox, dx, bx0[:, None], bx1[:, None]), (oy, dy, by0[:, None], by1[:, None])):
        para = d == 0
        # parallel & outside the slab → no hit
        ok &= ~(para & ((o < lo) | (o > hi)))
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = (lo - o) / d
            tb = (hi - o) / d
        tmin = np.where(para, 0.0, np.minimum(ta, tb))
        tmax = np.where(para, 1.0, np.maximum(ta, tb))
        t0 = np.maximum(t0, tmin)
        t1 = np.minimum(t1, tmax)
    return ok & (t0 <= t1)


def polyfill(poly: PackedPolygon, level: int) -> np.ndarray:
    """Sorted int64 cell ids at ``level`` conservatively covering ``poly``."""
    lat0, lat1, lon0, lon1 = poly.bbox()
    x0, y0 = cells.latlon_to_xy(np.asarray([lat0]), np.asarray([lon0]), level)
    x1_, y1_ = cells.latlon_to_xy(np.asarray([lat1]), np.asarray([lon1]), level)
    gx = np.arange(int(x0[0]), int(x1_[0]) + 1, dtype=np.uint64)
    gy = np.arange(int(y0[0]), int(y1_[0]) + 1, dtype=np.uint64)
    mx, my = np.meshgrid(gx, gy)
    cand = cells.xy_to_cell(mx.ravel(), my.ravel(), level)

    bla0, bla1, blo0, blo1 = cells.cell_bbox(cand)
    clat, clon = cells.cell_centroid(cand)

    keep = points_in_polygon(clat, clon, poly)  # (a) center inside
    # (b) any vertex inside the cell bbox
    vx, vy = poly.xs, poly.ys
    vin = (
        (vx[None, :] >= blo0[:, None]) & (vx[None, :] <= blo1[:, None])
        & (vy[None, :] >= bla0[:, None]) & (vy[None, :] <= bla1[:, None])
    ).any(axis=1)
    keep |= vin
    # (c) any edge intersects the cell bbox
    ex1, ey1, ex2, ey2 = poly.edges()
    hit = _segment_intersects_bbox(ex1, ey1, ex2, ey2, blo0, bla0, blo1, bla1)
    keep |= hit.any(axis=1)
    return np.sort(cand[keep])
