"""Unit + property tests for the NumPy cell-id core (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pytest

from ult_spark.grid import cells, compact

RNG = np.random.default_rng(42)


def rand_latlon(n: int) -> tuple[np.ndarray, np.ndarray]:
    lat = RNG.uniform(-90, 90, n)
    lon = RNG.uniform(-180, 180, n)
    return lat, lon


@pytest.mark.parametrize("level", [0, 1, 5, 12, 20, 29])
def test_encode_decode_roundtrip(level):
    lat, lon = rand_latlon(5000)
    cid = cells.latlon_to_cell(lat, lon, level)
    assert np.all(cid > 0), "ids must be positive int64"
    x, y, lvl = cells.cell_to_xy(cid)
    assert np.all(lvl == level)
    ex, ey = cells.latlon_to_xy(lat, lon, level)
    assert np.array_equal(x, ex) and np.array_equal(y, ey)


@pytest.mark.parametrize("level", [1, 8, 15, 29])
def test_parent_contains_child(level):
    lat, lon = rand_latlon(2000)
    child = cells.latlon_to_cell(lat, lon, level)
    parent = cells.cell_parent(child)
    assert np.all(cells.cell_level(parent) == level - 1)
    lo, hi = cells.cell_range(parent)
    assert np.all((child >= lo) & (child <= hi))
    # ancestor-at-level agrees with iterated parent
    anc = cells.cell_parent(child, level - 1)
    assert np.array_equal(anc, parent)
    # encoding the same point at the parent level gives the parent
    direct = cells.latlon_to_cell(lat, lon, level - 1)
    assert np.array_equal(direct, parent)


def test_children_roundtrip():
    lat, lon = rand_latlon(1000)
    parent = cells.latlon_to_cell(lat, lon, 10)
    kids = cells.cell_children(parent)
    assert kids.shape == (1000, 4)
    assert np.all(cells.cell_level(kids.ravel()) == 11)
    back = cells.cell_parent(kids.ravel())
    assert np.array_equal(back, np.repeat(parent, 4))
    # children are exactly the parent's descendant range split in 4
    lo, hi = cells.cell_range(parent)
    klo, khi = cells.cell_range(kids.ravel())
    assert np.array_equal(np.sort(klo.reshape(-1, 4), axis=1)[:, 0], lo)
    assert np.array_equal(np.sort(khi.reshape(-1, 4), axis=1)[:, 3], hi)


def test_descendant_range_contiguous_and_disjoint():
    lat, lon = rand_latlon(500)
    c8 = np.unique(cells.latlon_to_cell(lat, lon, 8))
    lo, hi = cells.cell_range(c8)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    assert np.all(lo <= hi)
    assert np.all(lo[1:] > hi[:-1]), "sibling/cousin ranges must not overlap"
    # deep descendants fall inside the ancestor's range
    c12 = cells.latlon_to_cell(lat, lon, 12)
    anc = cells.cell_parent(c12, 8)
    alo, ahi = cells.cell_range(anc)
    assert np.all((c12 >= alo) & (c12 <= ahi))


def test_level_extremes_and_clamping():
    # poles / antimeridian clamp into the grid rather than overflowing
    lat = np.array([90.0, -90.0, 0.0, 89.9999])
    lon = np.array([180.0, -180.0, 0.0, 179.9999])
    for L in (0, 29):
        cid = cells.latlon_to_cell(lat, lon, L)
        assert np.all(cells.cell_level(cid) == L)
        la0, la1, lo0, lo1 = cells.cell_bbox(cid)
        assert np.all(la0 >= -90) and np.all(la1 <= 90.0000001)
        assert np.all(lo0 >= -180) and np.all(lo1 <= 180.0000001)


def test_ring_and_disk():
    cid = int(cells.latlon_to_cell(np.array([10.0]), np.array([20.0]), 10)[0])
    r0 = cells.grid_ring(cid, 0)
    assert r0.tolist() == [cid]
    for k in (1, 2, 5):
        ring = cells.grid_ring(cid, k)
        assert len(ring) == 8 * k  # interior cell, no clamping
        disk = cells.grid_disk(cid, k)
        assert len(disk) == (2 * k + 1) ** 2
        inner = cells.grid_disk(cid, k - 1)
        assert np.array_equal(np.sort(np.concatenate([inner, ring])), disk)
    # corner cell: y clamps at the pole, x wraps across the antimeridian
    corner = int(cells.xy_to_cell(np.array([0], dtype=np.uint64), np.array([0], dtype=np.uint64), 10)[0])
    ring1 = cells.grid_ring(corner, 1)
    assert len(ring1) == 5  # 3 above + 2 wrapped/side, bottom row off-grid
    assert len(cells.grid_disk(corner, 1)) == 6
    # the wrapped neighbor sits at x = 2^L - 1 (lon just below +180)
    xs = cells.cell_to_xy(ring1)[0]
    assert (1 << 10) - 1 in xs.tolist()


def test_bbox_centroid_consistency():
    lat, lon = rand_latlon(2000)
    cid = cells.latlon_to_cell(lat, lon, 12)
    la0, la1, lo0, lo1 = cells.cell_bbox(cid)
    assert np.all((lat >= la0 - 1e-9) & (lat <= la1 + 1e-9))
    assert np.all((lon >= lo0 - 1e-9) & (lon <= lo1 + 1e-9))
    clat, clon = cells.cell_centroid(cid)
    # re-encoding the centroid gives back the same cell
    assert np.array_equal(cells.latlon_to_cell(clat, clon, 12), cid)


def test_compact_uncompact_identity():
    lat, lon = rand_latlon(300)
    base = np.unique(cells.latlon_to_cell(lat, lon, 6))
    full = compact.uncompact(base, 9)  # complete sets of descendants
    assert compact.compact(full).tolist() == np.sort(base).tolist()
    # partial sets do NOT merge
    partial = full[:-1]
    got = compact.compact(partial)
    assert got.size > base.size  # at least one family stayed unmerged
    assert np.array_equal(compact.uncompact(got, 9), np.sort(partial))


def test_compact_mixed_levels():
    a = cells.latlon_to_cell(np.array([1.0]), np.array([1.0]), 4)
    kids = cells.cell_children(a).ravel()
    grandkids = cells.cell_children(kids[:1]).ravel()
    mixed = np.concatenate([kids[1:], grandkids])  # 3 kids + 4 grandkids == a
    assert compact.compact(mixed).tolist() == a.tolist()


def test_uncompact_rejects_deeper_input():
    c = cells.latlon_to_cell(np.array([1.0]), np.array([1.0]), 10)
    with pytest.raises(ValueError):
        compact.uncompact(c, 5)
