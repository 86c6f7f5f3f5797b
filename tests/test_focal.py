"""Focal (neighborhood) aggregate — wrap-aliasing cap (round-2 ADVICE #1).

At level L with n = 2^L columns, a kernel with 2k+1 > n would reach the same
target column through multiple dx offsets via the pmod wrap and double-count
the source tile. focal_agg caps the dx span exactly like knn._neighbor_cells;
these tests pin the capped behavior against a pure-Python set-dedup model and
the DuckDB SQL mirror.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.ops.tiles import focal_agg, focal_agg_sql


def _expected(points_xy, level, k):
    """Set-dedup model: each source tile contributes ONCE per distinct
    wrapped target cell in its Chebyshev-k neighborhood."""
    n = 1 << level
    out: dict[tuple[int, int], int] = {}
    for x, y in points_xy:
        targets = set()
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                ty = y + dy
                if 0 <= ty < n:
                    targets.add(((x + dx) % n, ty))
        for t in targets:
            out[t] = out.get(t, 0) + 1
    return out


def _xy(spark, pts, level):
    return [
        (r.x, r.y)
        for r in pts.select(
            UF.grid_x("lon", level).alias("x"), UF.grid_y("lat", level).alias("y")
        ).collect()
    ]


def _cell_lookup(spark, level):
    n = 1 << level
    rows = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    return {
        (r.x, r.y): r.cell
        for r in rows.select(
            "x", "y", UF.xy_to_cell(F.col("x"), F.col("y"), level).alias("cell")
        ).collect()
    }


def test_focal_wrap_cap_no_double_count(spark):
    # level 1 → n=2 columns; k=1 means an uncapped dx span {-1,0,1} would
    # alias: the wrapped column is reached twice and the count doubles
    level, k = 1, 1
    pts = spark.createDataFrame(
        [(1, 10.0, -90.0), (2, 45.0, 90.0), (3, -45.0, 90.0)],
        "id long, lat double, lon double",
    )
    got = {
        r.cell: r.focal_cnt
        for r in focal_agg(pts, level=level, k=k).collect()
    }
    lut = _cell_lookup(spark, level)
    exp = {
        lut[t]: c for t, c in _expected(_xy(spark, pts, level), level, k).items()
    }
    assert got == exp
    # the aliasing symptom: no focal count may exceed the total point count
    assert max(got.values()) <= 3


def test_focal_sql_mirror_capped(spark):
    # the SQL mirror must apply the SAME cap — parity on the wrap-heavy grid
    level, k = 1, 2
    pts = spark.createDataFrame(
        [(i, float(10 * i - 40), float(70 * i - 150)) for i in range(5)],
        "id long, lat double, lon double",
    )
    got = (
        focal_agg(pts, level=level, k=k)
        .toPandas()
        .sort_values(["cell"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pts", pts.toPandas())
    exp = (
        con.execute(focal_agg_sql("lat", "lon", level, k, "pts"))
        .df()
        .sort_values(["cell"])
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(
        got.astype({"cell": "int64", "focal_cnt": "int64"}),
        exp.astype({"cell": "int64", "focal_cnt": "int64"}),
    )
    # and both match the set-dedup model
    lut = _cell_lookup(spark, level)
    model = {
        lut[t]: c
        for t, c in _expected(_xy(spark, pts, level), level, k).items()
    }
    assert {r.cell: r.focal_cnt for r in got.itertuples()} == model
