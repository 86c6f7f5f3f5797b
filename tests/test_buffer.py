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
