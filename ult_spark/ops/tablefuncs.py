"""UDTF surface (SURVEY §2.10, optional sugar): bbox → covering-cells
table function, usable as a SQL LATERAL join.

The heavy polyfill path stays the native explode of precomputed covers
(ops/pip.py); this UDTF is the table-function ergonomics for ad-hoc SQL —
``SELECT ... FROM layer, LATERAL bbox_cover(lat0, lat1, lon0, lon1, 6)``.

SELF-CONTAINED: the Morton encode is inlined (plain int math, same pinned
encoding as grid/cells.py — keep in sync), no ult_spark imports inside the
class, so executors need no --py-files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="cell: bigint, x: bigint, y: bigint")
class BBoxCover:
    """All grid cells at ``level`` intersecting the closed bbox
    [lat0, lat1] x [lon0, lon1] (x clamped to the grid — no wrap; a bbox is
    an axis-aligned query, cross-seam callers issue two bboxes)."""

    MAX_LEVEL = 29

    @staticmethod
    def _spread(v: int) -> int:
        v &= 0xFFFFFFFF
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v

    def eval(self, lat0: float, lat1: float, lon0: float, lon1: float, level: int):
        import math

        # SQL numeric literals can arrive as Decimal — coerce (float math is
        # the pinned encoding's domain)
        lat0, lat1, lon0, lon1 = float(lat0), float(lat1), float(lon0), float(lon1)
        n = 1 << int(level)

        def gx(lon: float) -> int:
            return max(0, min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1))

        def gy(lat: float) -> int:
            return max(0, min(int(math.floor((lat + 90.0) / 180.0 * n)), n - 1))

        for y in range(gy(lat0), gy(lat1) + 1):
            sy = self._spread(y) << 1
            for x in range(gx(lon0), gx(lon1) + 1):
                m = self._spread(x) | sy
                cell = ((m << 1) | 1) << (2 * (self.MAX_LEVEL - level))
                yield cell, x, y


def register_table_functions(spark: SparkSession) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("bbox_cover", BBoxCover)
