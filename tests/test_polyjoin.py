"""Polygon-polygon intersects join vs NumPy brute force + pinned topologies."""

from __future__ import annotations

import numpy as np

from ult_spark.geom.pip import points_in_polygon
from ult_spark.geom.polyio import PackedPolygon, default_layer, shifted_layer
from ult_spark.ops.polyjoin import poly_intersect_join


def _square(pid: int, cx: float, cy: float, half: float) -> PackedPolygon:
    xs = np.array([cx - half, cx + half, cx + half, cx - half], dtype=np.float64)
    ys = np.array([cy - half, cy - half, cy + half, cy + half], dtype=np.float64)
    return PackedPolygon(pid, f"sq{pid}", 0, np.array([0, 4], dtype=np.int32), xs, ys)


def _brute_intersects(a: PackedPolygon, b: PackedPolygon) -> bool:
    ax1, ay1, ax2, ay2 = a.edges()
    bx1, by1, bx2, by2 = b.edges()
    # same pinned sign tests as the operator
    for i in range(len(ax1)):
        d1 = (bx2 - bx1) * (ay1[i] - by1) - (by2 - by1) * (ax1[i] - bx1)
        d2 = (bx2 - bx1) * (ay2[i] - by1) - (by2 - by1) * (ax2[i] - bx1)
        d3 = (ax2[i] - ax1[i]) * (by1 - ay1[i]) - (ay2[i] - ay1[i]) * (bx1 - ax1[i])
        d4 = (ax2[i] - ax1[i]) * (by2 - ay1[i]) - (ay2[i] - ay1[i]) * (bx2 - ax1[i])
        if np.any(((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))):
            return True
    if points_in_polygon(np.array([b.ys[0]]), np.array([b.xs[0]]), a)[0]:
        return True
    if points_in_polygon(np.array([a.ys[0]]), np.array([a.xs[0]]), b)[0]:
        return True
    return False


def test_poly_intersect_topologies(spark):
    base = _square(1, 0.0, 0.0, 10.0)
    overlap = _square(2, 8.0, 8.0, 10.0)
    nested = _square(3, 1.0, 1.0, 2.0)
    disjoint = _square(4, 50.0, 50.0, 5.0)
    got = {
        (r.a_id, r.b_id)
        for r in poly_intersect_join(spark, [base], [overlap, nested, disjoint]).collect()
    }
    assert got == {(1, 2), (1, 3)}  # overlap crosses; nested contained; disjoint absent


def test_poly_intersect_matches_bruteforce(spark):
    a = list(default_layer())
    b = shifted_layer(a, 2.0, 3.0)
    got = {(r.a_id, r.b_id) for r in poly_intersect_join(spark, a, b).collect()}
    exp = {
        (pa.poly_id, pb.poly_id)
        for pa in a
        for pb in b
        if _brute_intersects(pa, pb)
    }
    assert got == exp and len(got) > 0


def test_poly_intersect_df_matches_driver_path(spark):
    """Distributed-layer twin (cluster-side covers, shuffle joins) is
    result-identical to the driver-layer path."""
    from ult_spark.geom.polyio import to_dataframe
    from ult_spark.ops.polyjoin import poly_intersect_join_df

    a = list(default_layer())
    b = shifted_layer(a, 2.0, 3.0)
    got = {
        (r.a_id, r.b_id)
        for r in poly_intersect_join_df(
            to_dataframe(spark, a), to_dataframe(spark, b)
        ).collect()
    }
    exp = {(r.a_id, r.b_id) for r in poly_intersect_join(spark, a, b).collect()}
    assert got == exp and len(got) > 0


def test_poly_contains_topologies(spark):
    """r5 poly_contains_join: nested → contained; partial overlap (proper
    crossings) and disjoint → not; containment is directional."""
    from ult_spark.ops.polyjoin import poly_contains_join

    base = _square(1, 0.0, 0.0, 10.0)
    overlap = _square(2, 8.0, 8.0, 10.0)
    nested = _square(3, 1.0, 1.0, 2.0)
    disjoint = _square(4, 50.0, 50.0, 5.0)
    got = {
        (r.a_id, r.b_id)
        for r in poly_contains_join(
            spark, [base], [overlap, nested, disjoint]
        ).collect()
    }
    assert got == {(1, 3)}
    # directional: the small square does not contain the big one
    rev = {
        (r.a_id, r.b_id)
        for r in poly_contains_join(spark, [nested], [base]).collect()
    }
    assert rev == set()


def test_poly_contains_scaled_layer(spark):
    """The registered query's construction vs a NumPy brute replay of the
    pinned rule (vertex-0 parity AND no proper crossing). Note: NOT every
    polygon contains its scaled copy — two admin rings are not star-shaped
    about their vertex mean (ids 12/13: the 0.5 copy pokes outside), and
    the operator correctly excludes them. The df twin is result-identical."""
    from ult_spark.geom.polyio import scaled_layer, to_dataframe
    from ult_spark.ops.polyjoin import poly_contains_join, poly_contains_join_df

    a = list(default_layer())
    b = scaled_layer(a, 0.5)
    got = {(r.a_id, r.b_id) for r in poly_contains_join(spark, a, b).collect()}

    def brute_contains(pa, pb) -> bool:
        v_in = points_in_polygon(np.array([pb.ys[0]]), np.array([pb.xs[0]]), pa)[0]
        ax1, ay1, ax2, ay2 = pa.edges()
        bx1, by1, bx2, by2 = pb.edges()
        for i in range(len(ax1)):
            d1 = (bx2 - bx1) * (ay1[i] - by1) - (by2 - by1) * (ax1[i] - bx1)
            d2 = (bx2 - bx1) * (ay2[i] - by1) - (by2 - by1) * (ax2[i] - bx1)
            d3 = (ax2[i] - ax1[i]) * (by1 - ay1[i]) - (ay2[i] - ay1[i]) * (bx1 - ax1[i])
            d4 = (ax2[i] - ax1[i]) * (by2 - ay1[i]) - (ay2[i] - ay1[i]) * (bx2 - ax1[i])
            if np.any(((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))):
                return False
        return bool(v_in)

    exp = {
        (pa.poly_id, pb.poly_id)
        for pa in a
        for pb in b
        if brute_contains(pa, pb)
    }
    assert got == exp and len(got) >= 14  # 14 of 16 self-scaled pairs
    df_got = {
        (r.a_id, r.b_id)
        for r in poly_contains_join_df(
            to_dataframe(spark, a), to_dataframe(spark, b)
        ).collect()
    }
    assert df_got == got
