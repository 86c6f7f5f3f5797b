"""Spatial-statistics planted fixtures (ops/spatialstats.py): Getis-Ord
Gi* and global Moran's I verified against an independent pure-Python
integer recompute of the same pinned formulas, plus sign/NULL semantics
(hotspot positive, constant field NULL, checkerboard negative I)."""

import datetime as dt
import math

from ult_spark.ops.spatialstats import (
    emerging_hotspots,
    getis_ord_gi,
    local_moran,
    morans_i,
)

LEVEL = 4
N = 1 << LEVEL


def _center(x: int, y: int) -> tuple[float, float]:
    return (-90.0 + (y + 0.5) * 180.0 / N, -180.0 + (x + 0.5) * 360.0 / N)


def _points(spark, cells: dict[tuple[int, int], int]):
    rows = []
    for (x, y), cnt in cells.items():
        la, lo = _center(x, y)
        rows += [(la, lo)] * cnt
    return spark.createDataFrame(rows, "lat double, lon double")


def _adj(a: tuple[int, int], b: tuple[int, int]) -> bool:
    """Directed 8-adjacency with x wrap, y clamp (Chebyshev 1)."""
    dx = min((a[0] - b[0]) % N, (b[0] - a[0]) % N)
    dy = abs(a[1] - b[1])
    return (dx, dy) != (0, 0) and dx <= 1 and dy <= 1


def _py_gi(cells: dict[tuple[int, int], int]) -> dict[tuple[int, int], int | None]:
    """Independent integer recompute of z_e3 per occupied cell."""
    n, sx = len(cells), sum(cells.values())
    sx2 = sum(c * c for c in cells.values())
    v = n * sx2 - sx * sx
    out = {}
    for i in cells:
        hood = [j for j in cells if _adj(i, j)] + [i]
        s_i, w_i = sum(cells[j] for j in hood), len(hood)
        den2 = v * (n * w_i - w_i * w_i)
        if den2 <= 0:
            out[i] = None
        else:
            num = n * s_i - sx * w_i
            out[i] = math.floor(num * math.sqrt(n - 1) * 1000.0 / math.sqrt(den2))
    return out


def _py_moran(cells: dict[tuple[int, int], int]):
    """(n, w, num, sum_u2, i_e6) by the same exact-integer formulas."""
    n, sx = len(cells), sum(cells.values())
    u = {i: n * c - sx for i, c in cells.items()}
    pairs = [(i, j) for i in cells for j in cells if _adj(i, j)]
    w = len(pairs)
    num = sum(u[i] * u[j] for i, j in pairs)
    su2 = sum(x * x for x in u.values())
    i_e6 = (
        math.floor(1000000.0 * n * num / (w * su2)) if w > 0 and su2 > 0 else None
    )
    return n, w, num, su2, i_e6


def _xy(cell: int) -> tuple[int, int]:
    import numpy as np

    from ult_spark.grid.cells import cell_to_xy

    x, y, _ = cell_to_xy(np.array([cell], dtype=np.int64))
    return int(x[0]), int(y[0])


HOTSPOT = {
    (5, 5): 20, (4, 5): 8, (6, 5): 7, (5, 4): 6, (5, 6): 9,
    (1, 12): 1, (12, 2): 2, (9, 9): 1, (14, 14): 1, (2, 8): 1,
}


def test_gi_matches_python_recompute(spark):
    got = {
        _xy(r["cell"]): (r["cnt"], r["s_i"], r["w_i"], r["z_e3"])
        for r in getis_ord_gi(_points(spark, HOTSPOT), LEVEL).collect()
    }
    want = _py_gi(HOTSPOT)
    assert set(got) == set(want)
    for i, z in want.items():
        assert got[i][3] == z, (i, got[i], z)
    # the planted hotspot center is strongly positive, isolated cells negative
    assert got[(5, 5)][3] > 1000
    assert got[(14, 14)][3] < 0
    # neighborhood sums are the exact planted integers
    assert got[(5, 5)][1] == 20 + 8 + 7 + 6 + 9 and got[(5, 5)][2] == 5


def test_gi_constant_field_is_null(spark):
    # V = 0 → every z NULL, never a /0 error (Spark 4 ANSI)
    flat = {(2, 2): 3, (8, 8): 3, (12, 4): 3}
    rows = getis_ord_gi(_points(spark, flat), LEVEL).collect()
    assert len(rows) == 3 and all(r["z_e3"] is None for r in rows)


def test_moran_clustered_positive(spark):
    clustered = {
        (5, 5): 9, (6, 5): 8, (5, 6): 9, (6, 6): 8,
        (1, 12): 1, (12, 2): 1, (9, 10): 1, (14, 14): 2, (2, 9): 1, (10, 13): 1,
    }
    row = morans_i(_points(spark, clustered), LEVEL).collect()[0]
    n, w, num, su2, i_e6 = _py_moran(clustered)
    assert (row["n"], row["w"], row["num"], row["sum_u2"]) == (n, w, num, su2)
    assert row["i_e6"] == i_e6 and row["i_e6"] > 0


def test_moran_checkerboard_negative(spark):
    board = {(x, y): 9 if (x + y) % 2 == 0 else 1
             for x in range(4, 8) for y in range(4, 8)}
    row = morans_i(_points(spark, board), LEVEL).collect()[0]
    assert row == tuple(_py_moran(board))  # Row unpacks positionally
    assert row["i_e6"] < 0


def test_moran_no_adjacent_pairs_null(spark):
    sparse = {(1, 1): 5, (8, 8): 2, (14, 3): 7}
    row = morans_i(_points(spark, sparse), LEVEL).collect()[0]
    assert row["w"] == 0 and row["i_e6"] is None


def _py_lisa(cells: dict[tuple[int, int], int]):
    """cell -> (cnt, u, su_nbr, n_nbr, i_e6, quad) by the same formulas."""
    n, sx = len(cells), sum(cells.values())
    u = {i: n * c - sx for i, c in cells.items()}
    su2 = sum(x * x for x in u.values())
    out = {}
    for i in cells:
        nbrs = [j for j in cells if _adj(i, j)]
        if not nbrs:
            out[i] = (cells[i], u[i], 0, 0, None, None)
            continue
        su_nbr = sum(u[j] for j in nbrs)
        i_e6 = (
            math.floor(1000000.0 * (n * u[i] * su_nbr) / su2) if su2 > 0 else None
        )
        quad = (
            "HH" if u[i] >= 0 and su_nbr >= 0
            else "LL" if u[i] < 0 and su_nbr < 0
            else "HL" if u[i] >= 0 else "LH"
        )
        out[i] = (cells[i], u[i], su_nbr, len(nbrs), i_e6, quad)
    return out


def test_lisa_matches_python_recompute(spark):
    got = {
        _xy(r["cell"]): tuple(r)[1:]
        for r in local_moran(_points(spark, HOTSPOT), LEVEL).collect()
    }
    want = _py_lisa(HOTSPOT)
    assert got == want
    # hotspot core: high value in a high neighborhood
    assert got[(5, 5)][5] == "HH" and got[(5, 5)][4] > 0
    # low cell adjacent to nothing occupied: NULL statistic, 0 neighbors
    assert got[(14, 14)][3] == 0 and got[(14, 14)][4] is None


def test_lisa_outlier_quadrant(spark):
    # a 1-count cell ringed by heavy cells is a LOW-HIGH spatial outlier
    field = {
        (8, 8): 1, (7, 8): 9, (9, 8): 9, (8, 7): 9, (8, 9): 9,
        (1, 1): 2, (14, 2): 3, (2, 13): 2,
    }
    got = {
        _xy(r["cell"]): (r["quad"], r["i_e6"])
        for r in local_moran(_points(spark, field), LEVEL).collect()
    }
    assert got[(8, 8)][0] == "LH" and got[(8, 8)][1] < 0


def _py_emerging(slices: dict[int, dict[tuple[int, int], int]]):
    """(cell -> (n_slices, mk_s, trend)) by the same exact-integer path."""
    z: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for sl in sorted(slices):
        for i, v in _py_gi(slices[sl]).items():
            if v is not None:
                z.setdefault(i, []).append((sl, v))
    out = {}
    for i, seq in z.items():
        s = sum(
            (z2 > z1) - (z2 < z1)
            for a, (_, z1) in enumerate(seq)
            for _, z2 in (p for p in seq[a + 1:])
        )
        out[i] = (len(seq), s, "rising" if s > 0 else "falling" if s < 0 else "flat")
    return out


def _ts_points(spark, slices: dict[int, dict[tuple[int, int], int]]):
    rows = []
    for sl, cells in slices.items():
        when = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=sl * 86400 + 100)
        for (x, y), cnt in cells.items():
            la, lo = _center(x, y)
            rows += [(when, la, lo)] * cnt
    return spark.createDataFrame(rows, "ts timestamp, lat double, lon double")


def test_emerging_hotspot_trend(spark):
    base = {(1, 12): 1, (12, 2): 1, (9, 9): 2, (14, 14): 1, (2, 8): 1}
    slices = {
        19000: {**base, (5, 5): 4, (6, 5): 2},
        19001: {**base, (5, 5): 9, (6, 5): 4},
        19002: {**base, (5, 5): 20, (6, 5): 8},
    }
    got = {
        _xy(r["cell"]): (r["n_slices"], r["mk_s"], r["trend"])
        for r in emerging_hotspots(_ts_points(spark, slices), LEVEL).collect()
    }
    want = _py_emerging(slices)
    assert got == want
    assert got[(5, 5)] == (3, 3, "rising")
    # a constant background cell FALLS relative to the rising global mean
    assert got[(9, 9)] == (3, -3, "falling")


def test_emerging_single_slice_is_flat(spark):
    slices = {19000: {(5, 5): 6, (1, 1): 1, (10, 10): 2}}
    rows = emerging_hotspots(_ts_points(spark, slices), LEVEL).collect()
    assert all(r["n_slices"] == 1 and r["mk_s"] == 0 and r["trend"] == "flat"
               for r in rows)


def test_gi_antimeridian_wrap(spark):
    # x=0 and x=N-1 are neighbors: each cell's neighborhood includes the other
    pair = {(0, 7): 10, (N - 1, 7): 10, (8, 2): 1, (4, 12): 2}
    got = {
        _xy(r["cell"]): (r["s_i"], r["w_i"])
        for r in getis_ord_gi(_points(spark, pair), LEVEL).collect()
    }
    assert got[(0, 7)] == (20, 2) and got[(N - 1, 7)] == (20, 2)


def test_quadrat_closed_form_matches_naive(spark):
    from ult_spark.ops.spatialstats import quadrat_chi2

    field = {(2, 2): 7, (2, 3): 5, (9, 9): 1, (14, 1): 3}
    row = quadrat_chi2(_points(spark, field), LEVEL).collect()[0]
    m, n = (1 << LEVEL) ** 2, sum(field.values())
    s2 = sum(c * c for c in field.values())
    assert (row["m"], row["occ"], row["n"], row["s2"]) == (m, len(field), n, s2)
    assert row["chi2_e6"] == math.floor((m * s2 - n * n) * 1000000.0 / n)
    # closed form == the naive sum over ALL m cells including empties
    exp = n / m
    naive = sum((c - exp) ** 2 / exp for c in field.values())
    naive += (m - len(field)) * exp  # empty cells contribute exp each
    assert abs(row["chi2_e6"] / 1e6 - naive) < 1e-3


def _py_semivar(cells: dict[tuple[int, int], int], max_h: int):
    out = {}
    for h in range(1, max_h + 1):
        prs = [
            (cells[a], cells[b])
            for a in cells
            for b in cells
            if a != b
            and max(min((a[0] - b[0]) % N, (b[0] - a[0]) % N), abs(a[1] - b[1])) == h
            # ring membership must respect direction for x (dx in [-h, h])
        ]
        if prs:
            ss = sum((ci - cj) ** 2 for ci, cj in prs)
            out[h] = (len(prs), ss, math.floor(ss * 1000000.0 / (2.0 * len(prs))))
    return out


def test_semivariogram_matches_python(spark):
    from ult_spark.ops.spatialstats import semivariogram

    field = {
        (5, 5): 9, (6, 5): 7, (5, 6): 8, (7, 5): 3,
        (9, 9): 1, (2, 12): 2, (12, 2): 4,
    }
    got = {
        r["h"]: (r["n_pairs"], r["ss"], r["gamma_e6"])
        for r in semivariogram(_points(spark, field), LEVEL, max_h=3).collect()
    }
    assert got == _py_semivar(field, 3)
    # adjacent (lag-1) cells are similar, lag-2 less so: rising variogram
    assert got[1][2] < got[2][2]


def test_semivariogram_wrap_pair(spark):
    from ult_spark.ops.spatialstats import semivariogram

    field = {(0, 7): 5, (N - 1, 7): 2}
    got = {r["h"]: (r["n_pairs"], r["ss"]) for r in
           semivariogram(_points(spark, field), LEVEL, max_h=2).collect()}
    assert got == {1: (2, 18)}  # the antimeridian pair, both directions


def _py_geary(cells: dict[tuple[int, int], int]):
    """(n, w, num, sum_u2, c_e6) by the same exact-integer formulas."""
    n, sx = len(cells), sum(cells.values())
    u = {i: n * c - sx for i, c in cells.items()}
    pairs = [(i, j) for i in cells for j in cells if _adj(i, j)]
    w = len(pairs)
    num = sum((u[i] - u[j]) ** 2 for i, j in pairs)
    su2 = sum(x * x for x in u.values())
    c_e6 = (
        math.floor(1000000.0 * (n - 1) * num / (2.0 * w * su2))
        if w > 0 and su2 > 0
        else None
    )
    return n, w, num, su2, c_e6


def test_geary_clustered_below_one(spark):
    from ult_spark.ops.spatialstats import gearys_c

    clustered = {
        (5, 5): 9, (6, 5): 8, (5, 6): 9, (6, 6): 8,
        (1, 12): 1, (12, 2): 1, (9, 10): 1, (14, 14): 2, (2, 9): 1, (10, 13): 1,
    }
    row = gearys_c(_points(spark, clustered), LEVEL).collect()[0]
    n, w, num, su2, c_e6 = _py_geary(clustered)
    assert (row["n"], row["w"], row["num"], row["sum_u2"]) == (n, w, num, su2)
    # clustering: similar neighbors -> small squared differences -> C < 1
    assert row["c_e6"] == c_e6 and row["c_e6"] < 1000000


def test_geary_checkerboard_above_one(spark):
    from ult_spark.ops.spatialstats import gearys_c

    board = {(x, y): 9 if (x + y) % 2 == 0 else 1
             for x in range(4, 8) for y in range(4, 8)}
    row = gearys_c(_points(spark, board), LEVEL).collect()[0]
    assert row == tuple(_py_geary(board))
    assert row["c_e6"] > 1000000


def test_geary_no_adjacent_pairs_null(spark):
    from ult_spark.ops.spatialstats import gearys_c

    sparse = {(1, 1): 5, (8, 8): 2, (14, 3): 7}
    row = gearys_c(_points(spark, sparse), LEVEL).collect()[0]
    assert row["w"] == 0 and row["c_e6"] is None


def _py_ripley(cells: dict[tuple[int, int], int], max_r: int = 3):
    """r -> (pairs_r, pairs_cum, k_e6) by the same exact-integer formulas."""
    npts = sum(cells.values())
    per = {r: 0 for r in range(max_r + 1)}
    per[0] = sum(c * (c - 1) for c in cells.values())
    for a in cells:
        for b in cells:
            if a == b:
                continue
            dx = min((a[0] - b[0]) % N, (b[0] - a[0]) % N)
            dy = abs(a[1] - b[1])
            d = max(dx, dy)
            if 1 <= d <= max_r:
                per[d] += cells[a] * cells[b]
    out, cum = {}, 0
    for r in range(max_r + 1):
        cum += per[r]
        # r=0 always has a row (ungrouped agg); r>=1 only when pairs exist
        if r == 0 or per[r] > 0:
            out[r] = (
                per[r],
                cum,
                math.floor(1000000.0 * (N * N) * cum / (npts * npts)),
            )
    return out


def test_ripley_matches_python(spark):
    from ult_spark.ops.spatialstats import ripley_k

    got = {
        r["r"]: (r["pairs_r"], r["pairs_cum"], r["k_e6"])
        for r in ripley_k(_points(spark, HOTSPOT), LEVEL).collect()
    }
    want = _py_ripley(HOTSPOT)
    # Spark omits distance bins with no pairs; every emitted bin must match
    for r, v in got.items():
        assert want[r] == v, (r, v, want[r])
    # the clustered hotspot raises K above the CSR expectation at r=1:
    # E[K] under CSR is ~(2r+1)^2 cells = 9e6 at e6 scaling
    assert got[1][2] > 9 * 1000000


def test_ripley_single_cell_only_r0(spark):
    from ult_spark.ops.spatialstats import ripley_k

    rows = ripley_k(_points(spark, {(4, 4): 5}), LEVEL).collect()
    assert len(rows) == 1
    r0 = rows[0]
    assert r0["r"] == 0 and r0["pairs_r"] == 20 and r0["npts"] == 5


def _py_gfunction(cells: dict[tuple[int, int], int], max_r: int = 3):
    """d -> (cells_d, cum, g_e6) by the same exact-integer formulas."""
    n_cells = len(cells)
    dnn = {}
    for a in cells:
        best = None
        for b in cells:
            if a == b:
                continue
            dx = min((a[0] - b[0]) % N, (b[0] - a[0]) % N)
            dy = abs(a[1] - b[1])
            d = max(dx, dy)
            if d <= max_r and (best is None or d < best):
                best = d
        if best is not None:
            dnn[a] = best
    out, cum = {}, 0
    for d in sorted(set(dnn.values())):
        cd = sum(1 for v in dnn.values() if v == d)
        cum += cd
        out[d] = (cd, cum, math.floor(1000000.0 * cum / n_cells))
    return out


def test_gfunction_matches_python(spark):
    from ult_spark.ops.spatialstats import nn_gfunction

    got = {
        r["d"]: (r["cells_d"], r["cum_cells"], r["g_e6"])
        for r in nn_gfunction(_points(spark, HOTSPOT), LEVEL).collect()
    }
    assert got == _py_gfunction(HOTSPOT)
    # the 5-cell cross is mutually adjacent -> a d=1 bin always exists
    assert 1 in got and got[1][0] >= 5


def test_gfunction_isolated_cells_saturate_below_one(spark):
    from ult_spark.ops.spatialstats import nn_gfunction

    # two far cells + two adjacent ones: G caps at 2/4 within max_r=3
    # (isolated cells chosen clear of the x-wrap: (14,3) would be
    # Chebyshev 3 from (1,1) across the antimeridian)
    layout = {(1, 1): 3, (2, 1): 2, (8, 8): 1, (8, 13): 1}
    rows = nn_gfunction(_points(spark, layout), LEVEL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["d"], r["cells_d"], r["cum_cells"], r["n_cells"]) == (1, 2, 2, 4)
    assert r["g_e6"] == 500000


# ---------------------------------------------------------------------------
# r7: join counts / IDW fill / standard deviational ellipse


def test_join_counts_planted_cluster(spark):
    from ult_spark.ops.spatialstats import join_counts

    # one 2x2 block of 10s (all Black: mean 5.5) + 4 isolated 1s, none
    # adjacent to anything -> every directed pair is Black-Black.
    cells = {(2, 2): 10, (3, 2): 10, (2, 3): 10, (3, 3): 10,
             (8, 8): 1, (10, 10): 1, (12, 12): 1, (14, 5): 1}
    row = join_counts(_points(spark, cells), LEVEL).collect()[0]
    assert (row.n, row.nb) == (8, 4)
    assert (row.w, row.jbb, row.jww, row.jbw) == (12, 12, 0, 0)
    assert row.ebb_e6 == (1_000_000 * 12 * 4 * 3) // (8 * 7)


def test_idw_fill_single_source(spark):
    from ult_spark.ops.spatialstats import idw_fill

    rows = idw_fill(_points(spark, {(5, 5): 7}), LEVEL, radius=2).collect()
    # 24 empty cells in the Chebyshev-2 disk; a single source means the
    # IDW estimate is exactly the source value everywhere.
    assert len(rows) == 24
    assert all(r.n_src == 1 for r in rows)
    assert all(r.est_e3 == 7000 for r in rows)
    assert all(r.num == 7 * r.den for r in rows)


def _kpoints(spark, groups: dict[str, dict[tuple[int, int], int]], level=LEVEL):
    n = 1 << level
    rows = []
    for k, cells in groups.items():
        for (x, y), cnt in cells.items():
            la = -90.0 + (y + 0.5) * 180.0 / n
            lo = -180.0 + (x + 0.5) * 360.0 / n
            rows += [(k, la, lo)] * cnt
    return spark.createDataFrame(rows, "k string, lat double, lon double")


def test_std_ellipse_collinear_groups(spark):
    from ult_spark.ops.spatialstats import std_ellipse

    pts = _kpoints(spark, {
        "h": {(2, 5): 1, (4, 5): 1, (6, 5): 1},   # horizontal line
        "v": {(5, 2): 1, (5, 4): 1, (5, 6): 1},   # vertical line
    })
    out = {r.k: r for r in std_ellipse(pts, LEVEL, key="k").collect()}
    h, v = out["h"], out["v"]
    # cxx = 3*56 - 12^2 = 24 along the varying axis, 0 across it.
    assert (h.cxx, h.cyy, h.cxy) == (24, 0, 0)
    assert (v.cxx, v.cyy, v.cxy) == (0, 24, 0)
    import math
    want = math.floor(1000.0 * math.sqrt(24.0) / 3.0)
    assert h.a_e3 == want and v.a_e3 == want
    assert h.b_e3 == 0 and v.b_e3 == 0
    assert h.tan2t_e6 == 0 and v.tan2t_e6 == 0


def test_std_ellipse_wide_spread_no_overflow(spark):
    """The planted fixture that breaks BIGINT discriminant squaring:
    (cxx-cyy)^2 = 4.2e21 > 2^63 -- the double-squared form must survive
    (ANSI Spark would error loudly on the old integer form)."""
    from ult_spark.ops.spatialstats import std_ellipse

    pts = _kpoints(
        spark, {"w": {(0, 128): 1000, (255, 128): 1000}}, level=8
    )
    row = std_ellipse(pts, 8, key="k").collect()[0]
    # cxx = 2000*1000*255^2 - (1000*255)^2 = 255000^2 exactly
    assert row.cxx == 255000 ** 2 and row.cyy == 0 and row.cxy == 0
    assert row.a_e3 == 1000 * 255000 // 2000  # sqrt exact
    assert row.b_e3 == 0


def test_cross_k_planted_pairs(spark):
    from ult_spark.ops.spatialstats import cross_k

    pts = _kpoints(spark, {
        "A": {(5, 5): 2},
        "B": {(5, 5): 3, (7, 5): 1},
    })
    rows = {r.r: r for r in cross_k(pts, LEVEL, a="A", b="B", key="k").collect()}
    # same cell: 2*3 ordered cross pairs; distance 2: 2*1.
    assert (rows[0].pairs_r, rows[0].pairs_cum) == (6, 6)
    assert (rows[2].pairs_r, rows[2].pairs_cum) == (2, 8)
    assert rows[0].na == 2 and rows[0].nb == 4
    area = (1 << LEVEL) ** 2
    assert rows[0].k_e6 == (1_000_000 * area * 6) // (2 * 4)
    assert rows[2].k_e6 == (1_000_000 * area * 8) // (2 * 4)
    assert 1 not in rows and 3 not in rows  # only observed distances emit


def test_knox_planted_components(spark):
    from ult_spark.ops.spatialstats import knox_spacetime

    # day 0: 2 pts in (5,5) + 1 in adjacent (6,5); day 1: 1 pt in (5,5)
    pts = _ts_points(spark, {0: {(5, 5): 2, (6, 5): 1}, 1: {(5, 5): 1}})
    row = knox_spacetime(pts, LEVEL).collect()[0]
    assert row.n == 4
    # space: within (5,5) 3*2=6 + cross 3*1 both directions = 12
    assert row.x_pairs == 12
    # time: within day0 3*2=6 + cross 3*1 both directions = 12
    assert row.t_pairs == 12
    # both: within (5,5,d0) 2 + the three cross key pairs (4+4+2) = 12
    assert row.st_pairs == 12
    assert row.knox_e6 == (1_000_000 * 12 * 4 * 3) // (12 * 12)


def test_knox_separated_no_interaction(spark):
    from ult_spark.ops.spatialstats import knox_spacetime

    # space-close pairs exist only on far-apart days; time-close pairs
    # only between far-apart cells -> st_pairs counts just the
    # within-(cell,day) pairs of the day-0 cluster.
    pts = _ts_points(spark, {
        0: {(5, 5): 2},          # same cell, same day
        9: {(5, 5): 1},          # space-close to day-0, 9 days away
        1: {(12, 12): 1},        # time-close to day-0, far in space
    })
    row = knox_spacetime(pts, LEVEL).collect()[0]
    assert row.st_pairs == 2  # only the within-(5,5,day0) ordered pair
    assert row.x_pairs == 2 + 2 * 2  # within + (5,5)x3 pts pairs across days
    assert row.t_pairs == 2 + 2 * 2  # within day0 + day0<->day1 cross


def test_spatial_theil_single_cell_and_uniform(spark):
    from ult_spark.ops.spatialstats import spatial_theil
    import math

    m = (1 << LEVEL) ** 2
    one = spatial_theil(_points(spark, {(3, 3): 5}), LEVEL).collect()[0]
    z = math.floor(1e6 * math.log(m * 5 / 5) * 5.0)
    assert (one.n_cells, one.n_events, one.m_universe) == (1, 5, m)
    assert one.theil_e6 == math.floor(z / 5.0)  # ~= 1e6*ln(M)
    assert abs(one.theil_e6 - 1_000_000 * math.log(m)) < 2

    four = spatial_theil(
        _points(spark, {(1, 1): 2, (5, 5): 2, (9, 9): 2, (13, 13): 2}), LEVEL
    ).collect()[0]
    zc = math.floor(1e6 * math.log(m * 2 / 8) * 2.0)
    assert four.theil_e6 == math.floor(4 * zc / 8.0)
    # concentration strictly below the single-cell extreme
    assert 0 < four.theil_e6 < one.theil_e6
