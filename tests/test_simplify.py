"""One-sweep Visvalingam decimation (ops/simplify.py) + session cell
paths (ops/relational.py): planted-geometry exactness; oracle parity runs
in tests/test_oracle_contract.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from ult_spark.ops.simplify import rings_df, simplify_stats, synth_rings


def test_simplify_drops_collinear_midpoints(spark):
    """A square with midpoints inserted on each edge: midpoints are exactly
    collinear (triangle area 0 → dropped); corners survive; the shoelace
    area is unchanged by removing collinear vertices."""
    xs = [0.0, 5.0, 10.0, 10.0, 10.0, 5.0, 0.0, 0.0]
    ys = [0.0, 0.0, 0.0, 5.0, 10.0, 10.0, 10.0, 5.0]
    out = simplify_stats(rings_df(spark, [(1, 0, xs, ys)]), eps_e12=1).collect()[0]
    assert out.n_orig == 8 and out.n_kept == 4
    # doubled area 200 deg² → e9-quantized
    assert out.area2_orig_e9 == out.area2_kept_e9 == 200 * 10**9


def test_simplify_anchor_always_kept(spark):
    """A fully-degenerate (all-collinear) ring keeps only the anchor."""
    xs = [0.0, 1.0, 2.0, 3.0]
    ys = [0.0, 1.0, 2.0, 3.0]
    out = simplify_stats(rings_df(spark, [(1, 0, xs, ys)]), eps_e12=1).collect()[0]
    assert out.n_kept == 1 and out.area2_kept_e9 == 0


def test_simplify_synth_rings_decimate(spark):
    """The synthetic dense layer: arc vertices drop, jittered ones stay,
    and the kept area remains within 15% of the original."""
    rows = synth_rings()
    for r in simplify_stats(rings_df(spark, rows)).collect():
        assert r.n_kept < r.n_orig  # something was decimated
        assert r.n_kept >= r.n_orig // 5  # jittered spikes survive
        assert abs(r.area2_kept_e9 - r.area2_orig_e9) < 0.15 * abs(r.area2_orig_e9)


def test_session_cell_path_planted(spark):
    """Transitions collapse consecutive repeats and order the path by
    event time: A A B A → path A-B-A (3 cells)."""
    from ult_spark.ops.relational import session_cell_path

    rows = [
        (1, 1, "2026-01-01 00:00:00", 100),
        (2, 1, "2026-01-01 00:05:00", 100),
        (3, 1, "2026-01-01 00:10:00", 200),
        (4, 1, "2026-01-01 00:15:00", 100),
        # second session (gap > 30 min), single cell
        (5, 1, "2026-01-01 01:00:00", 300),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, cell long"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.session_id: r for r in session_cell_path(df).collect()}
    assert got[1].n_cells == 3 and got[1].path == "100-200-100"
    assert got[2].n_cells == 1 and got[2].path == "300"


def test_raster_bilinear_planted(spark):
    """Known 2x2 neighborhood: the sample interpolates exactly; a corner
    point at a pixel center returns that pixel's value."""
    from ult_spark.geom.raster import GeoRef
    from ult_spark.ops.zonal import raster_bilinear

    ref = GeoRef(origin_lat=0.0, origin_lon=0.0, cell_deg=1.0, nrows=2, ncols=2)
    raster = spark.createDataFrame(
        [(0, 0, 10.0), (0, 1, 20.0), (1, 0, 30.0), (1, 1, 40.0)],
        "row int, col int, value double",
    )
    pts = spark.createDataFrame(
        [
            (1, 0.5, 0.5),   # pixel (0,0) center → 10
            (2, 1.0, 1.0),   # grid middle → mean 25
            (3, 0.5, 1.25),  # row 0, 3/4 toward col 1 → 10*(0.25)+20*(0.75)=17.5
            (4, -5.0, -5.0), # far outside → clamps to pixel (0,0) → 10
        ],
        "event_id long, lat double, lon double",
    )
    got = {r.event_id: r.val_e6 for r in raster_bilinear(pts, raster, ref).collect()}
    assert got[1] == 10_000_000
    assert got[2] == 25_000_000
    assert got[3] == 17_500_000
    assert got[4] == 10_000_000


def test_raster_bilinear_sparse_raster_emits_null(spark):
    """ADVICE r5: a missing corner pixel must NOT silently bias the sample
    — points whose 2x2 stencil touches a hole return val_e6 NULL (no
    renormalization), even when the missing corner's weight is 0, and
    every input point keeps its row."""
    from ult_spark.geom.raster import GeoRef
    from ult_spark.ops.zonal import raster_bilinear

    ref = GeoRef(origin_lat=0.0, origin_lon=0.0, cell_deg=1.0, nrows=4, ncols=4)
    # pixel (0,0) is a hole
    raster = spark.createDataFrame(
        [(r, c, float(10 * r + c)) for r in range(4) for c in range(4) if (r, c) != (0, 0)],
        "row int, col int, value double",
    )
    pts = spark.createDataFrame(
        [
            (1, 0.5, 0.5),  # stencil (0..1, 0..1): touches the hole → NULL
            (2, 0.5, 1.0),  # stencil (0..1, 0..1) with zero weight on the
                            # hole (wx puts 0 on col 0? no: fx=0.5 → c0=0,
                            # wx=0.5) — still touches → NULL
            (3, 2.0, 2.0),  # stencil (1..2, 1..2): away from hole → exact
        ],
        "event_id long, lat double, lon double",
    )
    got = {r.event_id: r.val_e6 for r in raster_bilinear(pts, raster, ref).collect()}
    assert len(got) == 3
    assert got[1] is None and got[2] is None
    # mean of pixels 11, 12, 21, 22 at wy=wx=0.5 → 16.5
    assert got[3] == 16_500_000
