"""NumPy cell-id core — the engine's one custom scalar type.

An S2-style quadtree cell id packed into a positive int64 (SURVEY.md §1.2;
spec: BASELINE.json north_star "batched H3 encode at multiple resolutions,
hierarchical compact/uncompact"). Chosen over true H3 hexagons because the
quadtree is exact under compact/uncompact and a parent's descendants occupy a
contiguous id range, which makes range-partitioned shuffles keyed on cell id
spatially meaningful.

Pinned encoding (frozen — golden fixtures depend on every constant here):

- Levels ``L in [0, 29]``; ``MAX_LEVEL = 29``.
- ``x = clamp(floor((lon + 180)/360 * 2^L), 0, 2^L - 1)``
- ``y = clamp(floor((lat +  90)/180 * 2^L), 0, 2^L - 1)``  (plate carrée)
- ``m = morton(x, y)`` — x in even bits, y in odd bits (<= 58 bits).
- ``id = ((m << 1) | 1) << (2 * (29 - L))`` — lowest set bit is the level
  sentinel; ids are always positive in int64.
- ``level(id) = 29 - (ctz(id) >> 1)``
- descendant range of ``id``: ``[id - lsb + 1, id + lsb - 1]`` (contiguous).

Everything operates on whole uint64/int64 NumPy arrays — zero per-row Python
(BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row Python)").
No Spark imports here; :mod:`ult_spark.functions` wraps these for DataFrames.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29

_U = np.uint64  # brevity for scalar casts

# 2D Morton bit-spreading masks (classic magic numbers; public domain bit math)
_M0 = np.uint64(0x0000FFFF0000FFFF)
_M1 = np.uint64(0x00FF00FF00FF00FF)
_M2 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M3 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x5555555555555555)


def _spread(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at bit 2i."""
    v = v & np.uint64(0xFFFFFFFF)
    v = (v | (v << _U(16))) & _M0
    v = (v | (v << _U(8))) & _M1
    v = (v | (v << _U(4))) & _M2
    v = (v | (v << _U(2))) & _M3
    v = (v | (v << _U(1))) & _M4
    return v


def _unspread(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread` — gather even bits back down."""
    v = v & _M4
    v = (v | (v >> _U(1))) & _M3
    v = (v | (v >> _U(2))) & _M2
    v = (v | (v >> _U(4))) & _M1
    v = (v | (v >> _U(8))) & _M0
    v = (v | (v >> _U(16))) & np.uint64(0xFFFFFFFF)
    return v


def latlon_to_xy(lat: np.ndarray, lon: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Plate-carrée grid coordinates at ``level`` (uint64 arrays)."""
    n = np.int64(1) << np.int64(level)
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x.astype(np.uint64), y.astype(np.uint64)


def xy_to_cell(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Morton-interleave grid coords and attach the level sentinel → int64."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level {level} out of range [0, {MAX_LEVEL}]")
    m = _spread(np.asarray(x, dtype=np.uint64)) | (_spread(np.asarray(y, dtype=np.uint64)) << _U(1))
    cid = ((m << _U(1)) | _U(1)) << _U(2 * (MAX_LEVEL - level))
    return cid.astype(np.int64)


def latlon_to_cell(lat: np.ndarray, lon: np.ndarray, level: int) -> np.ndarray:
    """Encode lat/lon arrays to cell ids at ``level`` (int64 array)."""
    x, y = latlon_to_xy(lat, lon, level)
    return xy_to_cell(x, y, level)


def cell_lsb(cell: np.ndarray) -> np.ndarray:
    """Lowest set bit of each id (the level sentinel), as int64."""
    c = np.asarray(cell, dtype=np.int64)
    return c & -c


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level of each id: ``29 - ctz(id)/2``."""
    lsb = cell_lsb(cell).astype(np.uint64)
    # ctz via float64 exponent trick: lsb is an exact power of two < 2**60
    ctz = (np.log2(lsb.astype(np.float64)) + 0.5).astype(np.int64)
    return (MAX_LEVEL - (ctz >> 1)).astype(np.int32)


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ids → (x, y, level)."""
    c = np.asarray(cell, dtype=np.int64)
    lvl = cell_level(c)
    shift = (2 * (MAX_LEVEL - lvl.astype(np.int64)) + 1).astype(np.uint64)
    m = (c.astype(np.uint64) >> shift)
    x = _unspread(m)
    y = _unspread(m >> _U(1))
    return x, y, lvl


def cell_parent(cell: np.ndarray, parent_level: int | None = None) -> np.ndarray:
    """Parent id one level up, or the ancestor at ``parent_level``."""
    c = np.asarray(cell, dtype=np.int64)
    if parent_level is None:
        lsb = c & -c
        return (c & ~((lsb << 2) - 1)) | (lsb << 2)
    if not 0 <= parent_level <= MAX_LEVEL:
        raise ValueError(f"level {parent_level} out of range")
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - parent_level))
    return (c & ~((lsb << 1) - 1)) | lsb


def cell_children(cell: np.ndarray) -> np.ndarray:
    """The 4 children of each id → shape (n, 4) int64 array."""
    c = np.asarray(cell, dtype=np.int64)
    lsb = (c & -c) >> 2  # child sentinel = parent sentinel / 4
    if np.any(lsb == 0):
        raise ValueError("cell at MAX_LEVEL has no children")
    # parent = (8m + 4) * lsb_child; child_q = (8m + 2q + 1) * lsb_child
    offs = np.arange(4, dtype=np.int64)[None, :]
    return c[:, None] + lsb[:, None] * (2 * offs - 3)


def cell_range(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Contiguous descendant id range ``[lo, hi]`` (inclusive) of each id."""
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & -c
    return c - lsb + 1, c + lsb - 1


def grid_ring(cell: int, k: int) -> np.ndarray:
    """Cells at Chebyshev distance exactly ``k`` from ``cell`` (square ring).

    Longitude (x) WRAPS modulo 2^L across the antimeridian; latitude (y)
    clamps at the poles (cells off the grid in y are dropped). k=0 → the
    cell itself. Round-2 change: v0 clamped x too, silently losing Pacific
    cross-seam neighbors (round-1 verdict, missing #1).

    Wrap aliasing (pinned): when 2k+1 > 2^L the square ring wraps onto
    itself — results are deduped, and some returned cells then sit at
    wrapped Chebyshev distance < k (there IS no cell at distance k in x).
    Ring-annulus arithmetic on such coarse levels should use `grid_disk`
    set differences instead.
    """
    x, y, lvl = cell_to_xy(np.asarray([cell]))
    level = int(lvl[0])
    n = np.int64(1) << np.int64(level)
    cx, cy = np.int64(x[0]), np.int64(y[0])
    if k == 0:
        xs, ys = np.asarray([cx]), np.asarray([cy])
    else:
        t = np.arange(-k, k + 1, dtype=np.int64)
        top = np.stack([cx + t, np.full_like(t, cy + k)], axis=1)
        bot = np.stack([cx + t, np.full_like(t, cy - k)], axis=1)
        s = np.arange(-k + 1, k, dtype=np.int64)
        lef = np.stack([np.full_like(s, cx - k), cy + s], axis=1)
        rig = np.stack([np.full_like(s, cx + k), cy + s], axis=1)
        pts = np.concatenate([top, bot, lef, rig], axis=0)
        pts[:, 0] %= n  # antimeridian wrap
        keep = (pts[:, 1] >= 0) & (pts[:, 1] < n)
        pts = pts[keep]
        xs, ys = pts[:, 0], pts[:, 1]
    return np.unique(xy_to_cell(xs.astype(np.uint64), ys.astype(np.uint64), level))


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells with Chebyshev distance <= k (x wraps, y clamps)."""
    x, y, lvl = cell_to_xy(np.asarray([cell]))
    level = int(lvl[0])
    n = np.int64(1) << np.int64(level)
    cx, cy = np.int64(x[0]), np.int64(y[0])
    xs = np.arange(cx - k, cx + k + 1, dtype=np.int64) % n
    ys = np.arange(max(0, cy - k), min(int(n) - 1, cy + k) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return np.unique(xy_to_cell(gx.ravel().astype(np.uint64), gy.ravel().astype(np.uint64), level))


def cell_bbox(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lat_min, lat_max, lon_min, lon_max) of each cell, degrees."""
    x, y, lvl = cell_to_xy(cell)
    n = (np.int64(1) << lvl.astype(np.int64)).astype(np.float64)
    lon0 = x.astype(np.float64) / n * 360.0 - 180.0
    lat0 = y.astype(np.float64) / n * 180.0 - 90.0
    return lat0, lat0 + 180.0 / n, lon0, lon0 + 360.0 / n


def cell_centroid(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) center of each cell."""
    lat0, lat1, lon0, lon1 = cell_bbox(cell)
    return (lat0 + lat1) / 2.0, (lon0 + lon1) / 2.0
