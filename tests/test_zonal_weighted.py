"""Area-weighted zonal stats (ops/zonal.py zonal_weighted): exact values on
axis-aligned zones, hole subtraction, and agreement with a numpy even-odd
reference on concave zones."""

from __future__ import annotations

import numpy as np

from ult_spark.geom.polyio import default_layer
from ult_spark.geom.raster import PINNED_GEOREF, synth_raster
from ult_spark.ops.zonal import zonal_weighted


def _poly_area(p):
    """Even-odd exact area: |outer| - holes via per-ring shoelace with
    ring-depth sign (matches ops/polyarea.oriented_edges semantics)."""
    from ult_spark.ops.polyarea import _point_in_ring, _ring_sign

    rings = [
        (p.xs[p.ring_offsets[r] : p.ring_offsets[r + 1]],
         p.ys[p.ring_offsets[r] : p.ring_offsets[r + 1]])
        for r in range(len(p.ring_offsets) - 1)
    ]
    total = 0.0
    for r, (rx, ry) in enumerate(rings):
        depth = sum(
            _point_in_ring(float(rx[0]), float(ry[0]), ox, oy)
            for q2, (ox, oy) in enumerate(rings)
            if q2 != r
        )
        sign = (1 if depth % 2 == 0 else -1) * _ring_sign(rx, ry)
        total += sign * abs(
            0.5 * float(np.sum(rx * np.roll(ry, -1) - np.roll(rx, -1) * ry))
        )
    return total


def test_weighted_zonal_exact_on_pinned_layer(spark):
    ref = PINNED_GEOREF
    polys = list(default_layer())
    out = {
        r.poly_id: (r.area_e6, r.wsum_e10)
        for r in zonal_weighted(synth_raster(spark), polys, ref).collect()
    }
    # every polygon fully inside the raster extent must recover its exact
    # even-odd area (per-edge floor error ≤ n_edges per boundary pixel)
    ext = (ref.origin_lat, ref.origin_lat + ref.nrows * ref.cell_deg,
           ref.origin_lon, ref.origin_lon + ref.ncols * ref.cell_deg)
    checked = 0
    for p in polys:
        ymin, ymax, xmin, xmax = p.bbox()
        if not (ymin >= ext[0] and ymax <= ext[1] and xmin >= ext[2] and xmax <= ext[3]):
            continue
        exact = _poly_area(p)
        n_boundary = 4 * (int(xmax - xmin) + int(ymax - ymin) + 4)
        assert abs(out[p.poly_id][0] - exact * 1e6) <= 16 * n_boundary, (
            p.poly_id, out[p.poly_id][0], exact)
        checked += 1
    assert checked >= 10  # the pinned layer lives inside the raster extent


def test_weighted_equals_center_assign_on_aligned_boxes(spark):
    """Integer-coordinate box zones align exactly with the 1° pixel grid, so
    the weighted sum must equal the plain center-assignment zonal sum ×
    1e6, and the recovered area must be the exact box area."""
    ref = PINNED_GEOREF
    polys = [p for p in default_layer() if p.name.startswith("admin_")]
    # all admin boxes are integer-coordinate rectangles (fixture invariant)
    assert all(
        np.allclose(p.xs, np.round(p.xs)) and np.allclose(p.ys, np.round(p.ys))
        for p in polys
    )
    raster = synth_raster(spark)
    w = {
        r.poly_id: (r.area_e6, r.wsum_e10)
        for r in zonal_weighted(raster, polys, ref).collect()
    }
    from ult_spark.ops.zonal import zonal_stats

    c = {r.poly_id: r.sum_e4 for r in zonal_stats(raster, polys, ref).collect()}
    for p in polys:
        area = _poly_area(p)
        a_e6, wsum = w[p.poly_id]
        assert abs(a_e6 - area * 1e6) <= 64, (p.poly_id, a_e6, area)
        # boundary-coincident pixels can each lose 1 µunit of area to the
        # per-edge floors (½ + ½ sums), which shifts wsum by ≤ v_e4 per
        # boundary pixel (v_e4 < 1e7; perimeter pixels ≤ 2(w+h)+4)
        ymin, ymax, xmin, xmax = p.bbox()
        n_perim = int(2 * ((xmax - xmin) + (ymax - ymin)) + 4)
        tol = n_perim * 10_000_000
        assert abs(wsum - c[p.poly_id] * 1_000_000) <= tol, (
            p.poly_id, wsum, c[p.poly_id])
