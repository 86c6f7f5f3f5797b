"""Two-stage distributed point-in-polygon join (SURVEY.md §2.4 J1+J2).

Stage 1 — candidate pruning: each polygon is polyfilled at an index level,
the (cell → poly_id) map is **compacted** (SURVEY §2.3 C3), uncompacted back
to the index level, and **broadcast** (BASELINE.json: "broadcast of compacted
polygon indexes"). Points compute their index cell natively (zero Python) and
equi-join the broadcast map — a broadcast hash join, no shuffle of the big side.

Stage 2 — exact refine: a scalar Arrow-batched pandas UDF ray-casts each
candidate (lat, lon) against its candidate polygon's packed rings with NumPy
(BASELINE.json: "ray-casting on packed-ring Arrow arrays inside pandas/Arrow
UDFs"). Runs in the SAME stage as the join — the hot path is one Arrow-batch
pipeline per input split with no extra shuffle.

At 100 TB: the points side streams through scan→encode→join→refine in one
stage; the only shuffle in a PIP-aggregate pipeline is the final groupBy.
The broadcast index is small by construction (compacted cells ≤ a few 10k
rows for admin-level layers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ult_spark import functions as UF
from ult_spark.geom.polyio import PackedPolygon
from ult_spark.grid import cells as C
from ult_spark.grid import compact as CZ
from ult_spark.grid.polyfill import polyfill

DEFAULT_INDEX_LEVEL = 6


def build_cell_index(
    spark: SparkSession, polys: list[PackedPolygon], index_level: int = DEFAULT_INDEX_LEVEL
) -> DataFrame:
    """(icell, poly_id) candidate map at ``index_level`` — compact→uncompact
    keeps the broadcast payload minimal while the join stays a plain equi-join."""
    rows: list[tuple[int, int]] = []
    for p in polys:
        cov = polyfill(p, index_level)
        packed = CZ.compact(cov)
        expanded = CZ.uncompact(packed, index_level)
        rows.extend((int(c), p.poly_id) for c in expanded.tolist())
    return spark.createDataFrame(rows, "icell long, poly_id long")


def _refine_udf(polys: list[PackedPolygon]):
    """Scalar pandas UDF: exact ray-cast of candidate rows, vectorized per
    polygon group within each Arrow batch (no per-row Python).

    The closure is deliberately SELF-CONTAINED: it captures only plain NumPy
    arrays and uses no ult_spark imports, so cloudpickle ships it by value
    and executors need neither --py-files nor PYTHONPATH for this operator
    (the driver harness may run it from a session we didn't configure).
    Crossing rule pinned in ult_spark/geom/pip.py — keep in sync.
    """
    edges_by_id = {p.poly_id: p.edges() for p in polys}

    @F.pandas_udf(BooleanType())
    def pip_refine(lat: pd.Series, lon: pd.Series, poly_id: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        pid = poly_id.to_numpy(np.int64)
        out = np.zeros(len(la), dtype=bool)
        for p in np.unique(pid):
            mask = pid == p
            ex1, ey1, ex2, ey2 = edges_by_id[int(p)]
            cy = la[mask][:, None]
            cx = lo[mask][:, None]
            straddle = (ey1[None, :] > cy) != (ey2[None, :] > cy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (ex2 - ex1)[None, :] * (cy - ey1[None, :]) / (ey2 - ey1)[None, :] + ex1[None, :]
            out[mask] = ((straddle & (cx < xint)).sum(axis=1) & 1).astype(bool)
        return pd.Series(out)

    return pip_refine


def pip_join(
    points: DataFrame,
    polys: list[PackedPolygon],
    lat: str = "lat",
    lon: str = "lon",
    index_level: int = DEFAULT_INDEX_LEVEL,
    how: str = "inner",
) -> DataFrame:
    """points ⋈ polygons (point-in-polygon). Adds ``poly_id``.

    ``how='inner'`` keeps matched rows; ``'left_anti'`` returns points that
    fall in NO polygon (J8); ``'left'`` keeps all points with null poly_id.
    """
    spark = points.sparkSession
    index_df = build_cell_index(spark, polys, index_level)
    refine = _refine_udf(polys)

    cand = points.withColumn("_icell", UF.latlon_to_cell(lat, lon, index_level))
    matched = (
        cand.join(F.broadcast(index_df), cand["_icell"] == index_df["icell"], "inner")
        .where(refine(F.col(lat), F.col(lon), F.col("poly_id")))
        .drop("_icell", "icell")
    )
    if how == "inner":
        return matched
    if how == "left_anti":
        return points.join(matched.select(lat, lon).distinct(), [lat, lon], "left_anti")
    if how == "left":
        key = [c for c in points.columns]
        return points.join(matched.select(*key, "poly_id"), key, "left")
    raise ValueError(f"unsupported how={how!r}")
