"""UDTF surface (SURVEY §2.10): bbox_cover table function vs the NumPy core."""

from __future__ import annotations

import numpy as np

from ult_spark.grid import cells as C


def test_bbox_cover_matches_numpy(spark):
    from ult_spark.ops.tablefuncs import register_table_functions

    register_table_functions(spark)
    for (la0, la1, lo0, lo1, lvl) in [
        (-3.0, 7.9, 10.0, 24.5, 6),
        (59.9, 60.1, -0.1, 0.1, 10),
        (-90.0, -89.0, -180.0, -179.0, 4),  # pole/seam corner clamps
    ]:
        got = sorted(
            r.cell
            for r in spark.sql(
                f"SELECT cell FROM bbox_cover({la0}, {la1}, {lo0}, {lo1}, {lvl})"
            ).collect()
        )
        y0 = C.latlon_to_xy(np.array([la0]), np.array([0.0]), lvl)[1][0]
        y1 = C.latlon_to_xy(np.array([la1]), np.array([0.0]), lvl)[1][0]
        x0 = C.latlon_to_xy(np.array([0.0]), np.array([lo0]), lvl)[0][0]
        x1 = C.latlon_to_xy(np.array([0.0]), np.array([lo1]), lvl)[0][0]
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        exp = sorted(
            C.xy_to_cell(xs.ravel().astype(np.uint64), ys.ravel().astype(np.uint64), lvl).tolist()
        )
        assert got == exp and len(got) > 0


def test_bbox_cover_lateral_join(spark):
    from ult_spark.ops.tablefuncs import register_table_functions

    register_table_functions(spark)
    spark.createDataFrame(
        [(1, -3.0, 7.9, 10.0, 24.5), (2, 40.0, 41.0, -75.0, -73.0)],
        "pid long, la0 double, la1 double, lo0 double, lo1 double",
    ).createOrReplaceTempView("boxes")
    df = spark.sql(
        "SELECT pid, cell FROM boxes, LATERAL bbox_cover(la0, la1, lo0, lo1, 6)"
    )
    pids = {r.pid for r in df.select("pid").distinct().collect()}
    assert pids == {1, 2} and df.count() > 2
