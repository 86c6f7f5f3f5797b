"""Polygon intersection area (ops/polyarea.py): exact values on known
geometries, hole/concave handling, and the pinned-layer query surface."""

from __future__ import annotations

import numpy as np
import pytest

from ult_spark.geom.polyio import PackedPolygon, default_layer, shifted_layer
from ult_spark.ops.polyarea import AREA_Q, poly_intersect_area


def _poly(pid, rings):
    offsets = [0]
    xs, ys = [], []
    for ring in rings:
        for x, y in ring:
            xs.append(float(x))
            ys.append(float(y))
        offsets.append(len(xs))
    return PackedPolygon(
        poly_id=pid, name=f"p{pid}", level=0,
        ring_offsets=np.asarray(offsets, dtype=np.int32),
        xs=np.asarray(xs, dtype=np.float64),
        ys=np.asarray(ys, dtype=np.float64),
    )


def _area(spark, a, b):
    out = poly_intersect_area(spark, a, b).collect()
    return {(r.a_id, r.b_id): r.area_e6 for r in out}


def test_overlapping_squares_exact(spark):
    sq = [(0, 0), (4, 0), (4, 4), (0, 4)]
    a = [_poly(0, [sq])]
    b = [_poly(10, [[(x + 2, y + 2) for x, y in sq]])]
    got = _area(spark, a, b)
    # overlap is the 2x2 square; per-edge floor can shave ≤ 8 µunits
    assert (0, 10) in got
    assert abs(got[(0, 10)] - 4 * AREA_Q) <= 8


def test_nested_square_full_containment(spark):
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    inner = [(3, 3), (5, 3), (5, 5), (3, 5)]
    got = _area(spark, [_poly(0, [outer])], [_poly(10, [inner])])
    assert abs(got[(0, 10)] - 4 * AREA_Q) <= 8


def test_m2_twin_matches_analytic_band_area(spark):
    """Geodesic sanity: a 10°-wide lon band between lat 40° and 50° has
    exact spherical area R²·Δλ_rad·(sin50° − sin40°) — the closed-form
    kernel must hit it to quantization error, and a same-shape equator
    band must come out bigger by the exact sin-difference ratio."""
    import math

    from ult_spark.ops.polyarea import EARTH_R_M, poly_intersect_area_m2

    def band(pid, lat0, lat1):
        return _poly(pid, [[(0, lat0), (10, lat0), (10, lat1), (0, lat1)]])

    got = {
        (r.a_id, r.b_id): r.area_m2
        for r in poly_intersect_area_m2(
            spark, [band(0, 40, 50), band(1, -5, 5)], [band(10, 40, 50), band(11, -5, 5)]
        ).collect()
    }
    rad = math.pi / 180.0
    exact_hi = EARTH_R_M**2 * (10 * rad) * (math.sin(50 * rad) - math.sin(40 * rad))
    exact_eq = EARTH_R_M**2 * (10 * rad) * (math.sin(5 * rad) - math.sin(-5 * rad))
    assert got[(0, 10)] == pytest.approx(exact_hi, rel=1e-9)
    assert got[(1, 11)] == pytest.approx(exact_eq, rel=1e-9)
    assert got[(1, 11)] > got[(0, 10)]  # equator band is physically larger


def test_union_area_m2_single_square(spark):
    """union_area_m2 on one square = the pairwise kernel's value for the
    square against itself (same line integral, weight 1 everywhere)."""
    import math

    from ult_spark.ops.polyarea import EARTH_R_M, union_area_m2

    sq = [_poly(0, [[(0, 40), (10, 40), (10, 50), (0, 50)]])]
    got = union_area_m2(spark, sq).collect()[0].area_m2
    rad = math.pi / 180.0
    exact = EARTH_R_M**2 * (10 * rad) * (math.sin(50 * rad) - math.sin(40 * rad))
    assert got == pytest.approx(exact, rel=1e-9)


def test_poly_props_known_square(spark):
    """ST_Area/Centroid/Perimeter/Envelope surface on a known square (with
    a hole): area subtracts the hole, centroid stays at the symmetric
    center, perimeter adds the hole ring, bbox is the outer ring."""
    import math

    from ult_spark.ops.polyarea import EARTH_R_M, poly_props

    sq = _poly(7, [
        [(10, 40), (20, 40), (20, 50), (10, 50)],
        [(14, 44), (16, 44), (16, 46), (14, 46)],  # 2x2 hole
    ])
    r = poly_props(spark, [sq]).collect()[0]
    assert abs(r.area_e6 - 96 * AREA_Q) <= 16
    # symmetric hole → centroid at (15, 45); e6 floors can shave 1 unit
    assert abs(r.cx_e6 - 15 * AREA_Q) <= 2 and abs(r.cy_e6 - 45 * AREA_Q) <= 2
    assert abs(r.perim_e6 - (40 + 8) * AREA_Q) <= 16
    assert (r.ymin_e6, r.ymax_e6, r.xmin_e6, r.xmax_e6) == (
        40 * AREA_Q, 50 * AREA_Q, 10 * AREA_Q, 20 * AREA_Q
    )
    # m² area: spherical band formula minus the hole's band
    rad = math.pi / 180.0
    outer = EARTH_R_M**2 * (10 * rad) * (math.sin(50 * rad) - math.sin(40 * rad))
    hole = EARTH_R_M**2 * (2 * rad) * (math.sin(46 * rad) - math.sin(44 * rad))
    assert r.area_m2 == pytest.approx(outer - hole, rel=1e-9)


def test_hole_subtracts(spark):
    # A = 10x10 square with a 2x2 hole; B covers A entirely → area 96
    a = [_poly(0, [
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(4, 4), (6, 4), (6, 6), (4, 6)],  # hole (wound same as outer —
        # orientation is normalized from ring depth, not winding)
    ])]
    b = [_poly(10, [[(-1, -1), (11, -1), (11, 11), (-1, 11)]])]
    got = _area(spark, a, b)
    assert abs(got[(0, 10)] - 96 * AREA_Q) <= 16


def test_disjoint_and_touching_emit_nothing(spark):
    sq = [(0, 0), (2, 0), (2, 2), (0, 2)]
    a = [_poly(0, [sq])]
    far = [_poly(10, [[(x + 5, y) for x, y in sq]])]
    touch = [_poly(11, [[(x + 2, y) for x, y in sq]])]  # shared edge only
    assert _area(spark, a, far) == {}
    assert _area(spark, a, touch) == {}


def test_identical_polygons_full_area(spark):
    # coincident boundaries: half-weight per direction sums to the full area
    sq = [(0, 0), (2, 0), (2, 2), (0, 2)]
    got = _area(spark, [_poly(0, [sq])], [_poly(10, [list(sq)])])
    assert abs(got[(0, 10)] - 4 * AREA_Q) <= 8


def test_concave_clip(spark):
    # L-shaped concave A ∩ square B: exact area 3 (unit grid)
    L = [(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)]
    B = [(0, 0), (2, 0), (2, 2), (0, 2)]
    got = _area(spark, [_poly(0, [L])], [_poly(10, [B])])
    assert abs(got[(0, 10)] - 3 * AREA_Q) <= 12


def test_union_area_known_values(spark):
    from ult_spark.ops.polyarea import union_area

    sq = [(0, 0), (4, 0), (4, 4), (0, 4)]

    def one(layers):
        return union_area(spark, layers).collect()[0].area_e6

    # disjoint squares: sum of areas
    b = _poly(1, [[(x + 10, y) for x, y in sq]])
    assert abs(one([_poly(0, [sq]), b]) - 32 * AREA_Q) <= 32
    # 2-overlap: 16 + 16 - 4
    c = _poly(1, [[(x + 2, y + 2) for x, y in sq]])
    assert abs(one([_poly(0, [sq]), c]) - 28 * AREA_Q) <= 32
    # nested: union = outer
    inner = _poly(1, [[(1, 1), (2, 1), (2, 2), (1, 2)]])
    assert abs(one([_poly(0, [sq]), inner]) - 16 * AREA_Q) <= 32
    # adjacent squares sharing an edge: 16 + 16 (shared boundary cancels)
    d = _poly(1, [[(x + 4, y) for x, y in sq]])
    assert abs(one([_poly(0, [sq]), d]) - 32 * AREA_Q) <= 32
    # duplicate polygons: union = one copy
    e = _poly(1, [list(sq)])
    assert abs(one([_poly(0, [sq]), e]) - 16 * AREA_Q) <= 32


def test_pinned_layer_pairs_match_grid_reference(spark):
    """Every intersecting pair of the query's two layers within 1% of an
    even-odd Monte-Carlo-grid reference (sanity beyond oracle parity)."""
    a = list(default_layer())
    b = shifted_layer(a, 2.0, 3.0)
    got = _area(spark, a, b)
    assert len(got) >= 20

    def inside(px, py, p):
        cnt = np.zeros(px.shape, dtype=int)
        for r in range(len(p.ring_offsets) - 1):
            s, e = p.ring_offsets[r], p.ring_offsets[r + 1]
            rx, ry = p.xs[s:e], p.ys[s:e]
            rx2, ry2 = np.roll(rx, -1), np.roll(ry, -1)
            for i in range(len(rx)):
                straddle = (ry[i] > py) != (ry2[i] > py)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (rx2[i] - rx[i]) * (py - ry[i]) / (ry2[i] - ry[i]) + rx[i]
                cnt += (straddle & (px < xint)).astype(int)
        return cnt % 2 == 1

    amap = {p.poly_id: p for p in a}
    bmap = {p.poly_id: p for p in b}
    for (ai, bi), e6 in got.items():
        pa, pb = amap[ai], bmap[bi]
        lo_x = max(pa.xs.min(), pb.xs.min())
        hi_x = min(pa.xs.max(), pb.xs.max())
        lo_y = max(pa.ys.min(), pb.ys.min())
        hi_y = min(pa.ys.max(), pb.ys.max())
        gx, gy = np.meshgrid(np.linspace(lo_x, hi_x, 250), np.linspace(lo_y, hi_y, 250))
        approx = (inside(gx, gy, pa) & inside(gx, gy, pb)).mean() * (hi_x - lo_x) * (hi_y - lo_y)
        assert e6 / AREA_Q == pytest.approx(approx, rel=0.05, abs=0.1), (ai, bi)


def test_poly_props_random_convex_vs_shoelace(spark):
    """poly_props vs an independent NumPy reference on 12 random convex
    polygons (angle-sorted points → simple by construction): area,
    centroid, perimeter, bbox all agree within quantization."""
    import math

    from ult_spark.ops.polyarea import EARTH_R_M, poly_props

    rng = np.random.default_rng(42)
    polys, refs = [], {}
    for pid in range(12):
        n = int(rng.integers(4, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(2, 8, n)
        cx0, cy0 = rng.uniform(-90, 90), rng.uniform(-50, 50)
        xs = cx0 + r * np.cos(ang)
        ys = cy0 + r * np.sin(ang)
        polys.append(_poly(pid, [list(zip(xs, ys))]))
        x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
        cross = xs * y2 - x2 * ys
        area = 0.5 * cross.sum()
        cx = ((xs + x2) * cross).sum() / (6 * area)
        cy = ((ys + y2) * cross).sum() / (6 * area)
        perim = np.sqrt((x2 - xs) ** 2 + (y2 - ys) ** 2).sum()
        rad = math.pi / 180.0
        # exact spherical area via the same integral, numerically:
        # ∮ λ cos(cφ) dφ with Simpson over each edge (fine steps)
        t = np.linspace(0, 1, 2001)
        m2 = 0.0
        for i in range(n):
            lam = xs[i] + t * (x2[i] - xs[i])
            phi = ys[i] + t * (y2[i] - ys[i])
            f = lam * np.cos(phi * rad) * (y2[i] - ys[i])
            m2 += float(((f[1:] + f[:-1]) / 2 * np.diff(t)).sum())
        m2 *= (EARTH_R_M * rad) ** 2
        refs[pid] = (area, cx, cy, perim, m2, ys.min(), ys.max(), xs.min(), xs.max())
    out = {r.poly_id: r for r in poly_props(spark, polys).collect()}
    for pid, (area, cx, cy, perim, m2, ymin, ymax, xmin, xmax) in refs.items():
        r = out[pid]
        n_e = len(polys[pid].xs)
        assert abs(r.area_e6 - area * AREA_Q) <= 2 * n_e, pid
        assert abs(r.cx_e6 / AREA_Q - cx) < 1e-4, pid
        assert abs(r.cy_e6 / AREA_Q - cy) < 1e-4, pid
        assert abs(r.perim_e6 - perim * AREA_Q) <= 2 * n_e, pid
        assert r.area_m2 == pytest.approx(m2, rel=1e-5), pid
        assert r.ymin_e6 == np.floor(ymin * AREA_Q) and r.xmax_e6 == np.floor(xmax * AREA_Q), pid
