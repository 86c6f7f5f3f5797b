"""Hypothesis property tests for the geometry core (SURVEY §5.1/5.2).

Pure NumPy — no Spark session needed, so these run in milliseconds and
explore the input space far beyond the fixed-seed tests.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ult_spark.geom.pip import point_in_polygon_naive, points_in_polygon
from ult_spark.geom.polyio import PackedPolygon
from ult_spark.grid import cells, compact

lat_s = st.floats(min_value=-90, max_value=90, allow_nan=False)
lon_s = st.floats(min_value=-180, max_value=180, allow_nan=False)
level_s = st.integers(min_value=0, max_value=29)


@given(lat_s, lon_s, level_s)
@settings(max_examples=300, deadline=None)
def test_encode_invariants(lat, lon, level):
    cid = cells.latlon_to_cell(np.array([lat]), np.array([lon]), level)
    assert cid[0] > 0
    assert cells.cell_level(cid)[0] == level
    la0, la1, lo0, lo1 = cells.cell_bbox(cid)
    assert la0[0] - 1e-9 <= lat <= la1[0] + 1e-9
    assert lo0[0] - 1e-9 <= lon <= lo1[0] + 1e-9
    if level > 0:
        parent = cells.cell_parent(cid)
        lo, hi = cells.cell_range(parent)
        assert lo[0] <= cid[0] <= hi[0]
        assert cells.latlon_to_cell(np.array([lat]), np.array([lon]), level - 1)[0] == parent[0]


def test_compact_collapses_complete_sibling_cover():
    """r7 regression (hypothesis find): four points exactly tiling one
    level-1 cell's child set — compact() must collapse the full sibling
    cover to the single parent, and the leaf cover is preserved."""
    base = cells.latlon_to_cell(
        np.array([-1.0, -1.0, -46.0, -46.0]),
        np.array([0.0, 90.0, 0.0, 90.0]), 2,
    )
    got = compact.compact(np.unique(base))
    assert len(got) == 1
    assert np.array_equal(
        compact.uncompact(got, 2), np.sort(np.unique(base))
    )


@given(st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=60), st.integers(2, 10))
@settings(max_examples=60, deadline=None)
def test_compact_uncompact_roundtrip(points, level):
    base = np.unique(
        cells.latlon_to_cell(
            np.array([p[0] for p in points]), np.array([p[1] for p in points]), level
        )
    )
    deeper = compact.uncompact(base, level + 2)
    # the true invariant is canonicalization, NOT identity: when `base`
    # itself contains 4 complete siblings (points that exactly tile one
    # coarser cell — hypothesis found (-1,0),(-1,90),(-46,0),(-46,90) at
    # level 2, whose cells are one level-1 parent's full child set),
    # compact() correctly collapses PAST `base`. So compare canonical
    # forms; identity holds iff base was already compact.
    assert np.array_equal(compact.compact(deeper), compact.compact(base))
    # compaction never changes the covered leaf set
    assert np.array_equal(compact.uncompact(compact.compact(deeper), level + 2), deeper)


@given(lat_s, lon_s, st.integers(min_value=1, max_value=8), st.integers(1, 4))
@settings(max_examples=200, deadline=None)
def test_ring_disk_wrap_invariants(lat, lon, level, k):
    """Antimeridian wrap (r2): every disk cell is within wrapped-Chebyshev k
    of the center; the disk is exactly the k-ring union; cross-seam columns
    appear when the center hugs the seam."""
    n = np.int64(1) << np.int64(level)
    cid = int(cells.latlon_to_cell(np.array([lat]), np.array([lon]), level)[0])
    cx, cy, _ = (int(a[0]) for a in cells.cell_to_xy(np.array([cid])))
    disk = cells.grid_disk(cid, k)
    xs, ys, _ = cells.cell_to_xy(disk)
    dx = np.abs(xs.astype(np.int64) - cx)
    dx = np.minimum(dx, n - dx)  # wrapped
    dy = np.abs(ys.astype(np.int64) - cy)
    assert int(np.max(np.maximum(dx, dy))) <= k
    # disk == union of rings 0..k (as sets)
    rings = np.concatenate([cells.grid_ring(cid, i) for i in range(k + 1)])
    assert np.array_equal(np.unique(rings), disk)
    # expected size: full x-span (wrapped, deduped) x clamped y-span
    x_span = min(int(n), 2 * k + 1)
    y_span = min(int(n) - 1, cy + k) - max(0, cy - k) + 1
    assert len(disk) == x_span * y_span


@st.composite
def polygon_s(draw):
    n = draw(st.integers(3, 12))
    cx = draw(st.floats(-150, 150))
    cy = draw(st.floats(-70, 70))
    # star-shaped polygon around (cx, cy): strictly simple, arbitrary shape
    angles = np.sort(np.array(draw(
        st.lists(st.floats(0, 2 * np.pi - 0.01), min_size=n, max_size=n, unique=True)
    )))
    radii = np.array(draw(st.lists(st.floats(0.1, 15), min_size=n, max_size=n)))
    xs = cx + radii * np.cos(angles)
    ys = cy + 0.5 * radii * np.sin(angles)
    return PackedPolygon(
        poly_id=0, name="h", level=0,
        ring_offsets=np.array([0, n], dtype=np.int32),
        xs=xs.astype(np.float64), ys=ys.astype(np.float64),
    )


@given(polygon_s(), st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=50))
@settings(max_examples=80, deadline=None)
def test_raycast_matches_naive(poly, pts):
    la = np.array([p[0] for p in pts])
    lo = np.array([p[1] for p in pts])
    fast = points_in_polygon(la, lo, poly)
    slow = np.array([point_in_polygon_naive(a, o, poly) for a, o in zip(la, lo)])
    assert np.array_equal(fast, slow)
