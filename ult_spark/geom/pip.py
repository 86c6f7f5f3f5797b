"""Vectorized point-in-polygon — even-odd ray casting on packed rings.

BASELINE.json north_star: "point-in-polygon joins ... ray-casting on
packed-ring Arrow arrays inside pandas/Arrow UDFs". The crossing test is the
classic even-odd rule evaluated with NumPy broadcasting over (points × edges);
holes need no special casing because crossings over hole rings flip parity.

Pinned edge rule (fixtures and the DuckDB oracle reproduce it exactly):

    crossing(e, p) = (ey1 > py) != (ey2 > py)
                     AND px < (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1

Every operation is IEEE-exact (+, -, *, /, comparisons), so Spark-side NumPy
and DuckDB SQL agree bit-for-bit — points exactly on boundaries get a
deterministic (if arbitrary) side.
"""

from __future__ import annotations

import numpy as np

from .polyio import PackedPolygon

# points × edges broadcast tiles are chunked to bound memory:
# 64Mi float64 cells ≈ 512 MB peak per batch
_MAX_TILE = 1 << 26


def points_in_polygon(lat: np.ndarray, lon: np.ndarray, poly: PackedPolygon) -> np.ndarray:
    """Boolean mask: which (lat, lon) points are inside ``poly``."""
    ex1, ey1, ex2, ey2 = poly.edges()
    return _crossings_odd(np.asarray(lat, np.float64), np.asarray(lon, np.float64),
                          ex1, ey1, ex2, ey2)


def _crossings_odd(py: np.ndarray, px: np.ndarray,
                   ex1: np.ndarray, ey1: np.ndarray,
                   ex2: np.ndarray, ey2: np.ndarray) -> np.ndarray:
    n, m = len(py), len(ex1)
    if n == 0 or m == 0:
        return np.zeros(n, dtype=bool)
    out = np.empty(n, dtype=bool)
    step = max(1, _MAX_TILE // max(m, 1))
    for s in range(0, n, step):
        e = min(n, s + step)
        cy = py[s:e, None]
        cx = px[s:e, None]
        straddle = (ey1[None, :] > cy) != (ey2[None, :] > cy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (ex2 - ex1)[None, :] * (cy - ey1[None, :]) / (ey2 - ey1)[None, :] + ex1[None, :]
        hit = straddle & (cx < xint)
        out[s:e] = (hit.sum(axis=1) & 1).astype(bool)
    return out


def point_in_polygon_naive(lat: float, lon: float, poly: PackedPolygon) -> bool:
    """Deliberately naive per-point oracle for property tests (SURVEY.md §5.2)."""
    inside = False
    for r in range(len(poly.ring_offsets) - 1):
        s, e = int(poly.ring_offsets[r]), int(poly.ring_offsets[r + 1])
        j = e - 1
        for i in range(s, e):
            x1, y1 = poly.xs[j], poly.ys[j]
            x2, y2 = poly.xs[i], poly.ys[i]
            if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                inside = not inside
            j = i
    return inside
