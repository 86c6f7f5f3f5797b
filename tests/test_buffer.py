"""Grid buffer (ops/buffer.py): dilation containment, ring growth, and the
wrapped-column cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from ult_spark.geom.polyio import default_layer
from ult_spark.ops.buffer import buffer_cells, dilate_cells
from ult_spark.ops.pip import build_cell_index


def test_buffer_contains_cover_and_grows_monotonically(spark):
    polys = list(default_layer())
    base = build_cell_index(spark, polys, 6).withColumnRenamed("icell", "cell")
    b1 = buffer_cells(spark, polys, level=6, k=1)
    b2 = buffer_cells(spark, polys, level=6, k=2)
    assert base.join(b1, ["poly_id", "cell"], "left_anti").count() == 0
    assert b1.join(b2, ["poly_id", "cell"], "left_anti").count() == 0
    n0, n1, n2 = base.count(), b1.count(), b2.count()
    assert n0 < n1 < n2


def test_coverage_boundary_counts(spark):
    """3x3 block at level 3: interior cell emits nothing, corner cells emit
    2 sides, edge cells 1 — total boundary sides = 12."""
    from ult_spark import functions as UF
    from ult_spark.ops.buffer import coverage_boundary

    cells = spark.createDataFrame(
        [(0, x, y) for x in (2, 3, 4) for y in (2, 3, 4)], "poly_id long, x long, y long"
    ).select("poly_id", UF.xy_to_cell(F.col("x"), F.col("y"), 3).alias("cell"))
    out = coverage_boundary(cells, level=3)
    rows = out.collect()
    assert len(rows) == 12
    # the interior cell (3, 3) emits nothing
    centre = spark.createDataFrame([(3, 3)], "x long, y long").select(
        UF.xy_to_cell(F.col("x"), F.col("y"), 3).alias("cell")
    ).collect()[0].cell
    assert all(r.cell != centre for r in rows)


def test_coverage_boundary_wrap_and_poles(spark):
    """A full level-1 row (both x columns at y=0): E/W neighbours wrap onto
    each other (no E/W boundary), the poleward side and the y=1 side are
    boundaries → 2 sides per cell."""
    from ult_spark import functions as UF
    from ult_spark.ops.buffer import coverage_boundary

    cells = spark.createDataFrame(
        [(0, x, 0) for x in (0, 1)], "poly_id long, x long, y long"
    ).select("poly_id", UF.xy_to_cell(F.col("x"), F.col("y"), 1).alias("cell"))
    rows = coverage_boundary(cells, level=1).collect()
    assert len(rows) == 4
    assert {r.side for r in rows} == {"N", "S"}


def test_dilate_wrap_covers_each_column_once(spark):
    """At level 1 (n=2 columns) a k=1 disk wraps: the dilation of one cell
    must cover all 4 grid cells exactly once — never duplicate rows."""
    from ult_spark import functions as UF

    one = spark.createDataFrame([(0,)], "poly_id long").select(
        "poly_id", UF.xy_to_cell(F.lit(0), F.lit(0), 1).alias("cell")
    )
    out = dilate_cells(one, level=1, k=1)
    rows = out.collect()
    assert len(rows) == 4  # whole 2x2 grid, each cell once
    assert len({r.cell for r in rows}) == 4
