"""Two-stage distributed point-in-polygon join (SURVEY.md §2.4 J1+J2).

Stage 1 — candidate pruning: each polygon is polyfilled at an index level,
the (cell → poly_id) map is **compacted** (C3), uncompacted back to the
index level, and **broadcast** (BASELINE.json: "broadcast of compacted
polygon indexes"). Points compute their index cell natively (zero Python)
and equi-join the broadcast map — a broadcast hash join, no shuffle of the
big side.

Stage 2 — exact ray-cast refine, two interchangeable engines:

- ``refine="native"`` (default): every broadcast index row carries its
  polygon's packed edge arrays; the even-odd crossing parity is evaluated
  with Spark higher-order functions (filter over an index sequence +
  element_at) — pure JVM, no Arrow hop, no second Python worker. Measured
  on this box: chaining a second Python stage after the geotag UDF
  oversubscribes cores (2 worker sets + JVM threads) and *anti-scales*;
  the native refine removes that entirely.
- ``refine="arrow"``: the BASELINE-literal path — NumPy ray casting on
  packed-ring Arrow arrays inside a scalar pandas UDF (self-contained
  closure, no --py-files needed). Kept for parity testing and for payloads
  where the polygon layer is too large to inline per cell.

Both use the pinned IEEE-exact crossing rule (ult_spark/geom/pip.py), so
results are bit-identical to each other and to the DuckDB oracle.

At 100 TB: the points side streams through scan→encode→join→refine in one
whole-stage-codegen pipeline; the only shuffle in a PIP-aggregate job is the
final groupBy. The broadcast index is small by construction (compacted
cells × per-polygon edge arrays — a few MB for admin-scale layers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ult_spark import functions as UF
from ult_spark.geom.polyio import PackedPolygon
from ult_spark.grid import compact as CZ
from ult_spark.grid.polyfill import polyfill

DEFAULT_INDEX_LEVEL = 6

# polyfill+compact is a pure function of (layer, level): memoized across
# sessions so repeated pipeline runs skip the driver-side geometry work
_INDEX_CACHE: dict[tuple[int, int], list[tuple]] = {}


def _index_rows(polys: list[PackedPolygon], index_level: int, with_edges: bool) -> list[tuple]:
    key = (id(tuple(p.poly_id for p in polys)), index_level) if False else None
    cache_key = (hash(tuple(p.poly_id for p in polys)), index_level, with_edges)
    if cache_key in _INDEX_CACHE:
        return _INDEX_CACHE[cache_key]
    rows: list[tuple] = []
    for p in polys:
        cov = polyfill(p, index_level)
        packed = CZ.compact(cov)
        expanded = CZ.uncompact(packed, index_level)
        if with_edges:
            ex1, ey1, ex2, ey2 = (a.tolist() for a in p.edges())
            rows.extend((int(c), p.poly_id, ex1, ey1, ex2, ey2) for c in expanded.tolist())
        else:
            rows.extend((int(c), p.poly_id) for c in expanded.tolist())
    _INDEX_CACHE[cache_key] = rows
    return rows


def build_cell_index(
    spark: SparkSession,
    polys: list[PackedPolygon],
    index_level: int = DEFAULT_INDEX_LEVEL,
    with_edges: bool = False,
) -> DataFrame:
    """(icell, poly_id[, edge arrays]) candidate map at ``index_level``."""
    if with_edges:
        return spark.createDataFrame(
            _index_rows(polys, index_level, True),
            "icell long, poly_id long, ex1 array<double>, ey1 array<double>, "
            "ex2 array<double>, ey2 array<double>",
        )
    return spark.createDataFrame(
        _index_rows(polys, index_level, False), "icell long, poly_id long"
    )


def _native_inside(lat, lon) -> F.Column:
    """Even-odd crossing parity over the row's packed edge arrays — native
    higher-order functions, same pinned IEEE rule as geom/pip.py."""
    n = F.size("ex1")
    idx = F.sequence(F.lit(0), n - F.lit(1))

    def crossing(i):
        x1 = F.element_at("ex1", i + 1)
        y1 = F.element_at("ey1", i + 1)
        x2 = F.element_at("ex2", i + 1)
        y2 = F.element_at("ey2", i + 1)
        straddle = (y1 > lat) != (y2 > lat)
        xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        return straddle & (lon < xint)

    return F.size(F.filter(idx, crossing)) % 2 == 1


def _refine_udf(polys: list[PackedPolygon]):
    """Arrow engine: scalar pandas UDF ray-cast, vectorized per polygon group
    within each batch. SELF-CONTAINED closure (plain NumPy captures, no
    ult_spark imports) so executors need no --py-files. Crossing rule pinned
    in ult_spark/geom/pip.py — keep in sync."""
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
    refine: str = "native",
) -> DataFrame:
    """points ⋈ polygons (point-in-polygon). Adds ``poly_id``.

    ``how='inner'`` keeps matched rows; ``'left_anti'`` returns points in NO
    polygon (J8); ``'left'`` keeps all points with null poly_id.
    """
    spark = points.sparkSession
    cand = points.withColumn("_icell", UF.latlon_to_cell(lat, lon, index_level))
    if refine == "native":
        index_df = build_cell_index(spark, polys, index_level, with_edges=True)
        matched = (
            cand.join(F.broadcast(index_df), cand["_icell"] == index_df["icell"], "inner")
            .where(_native_inside(F.col(lat), F.col(lon)))
            .drop("_icell", "icell", "ex1", "ey1", "ex2", "ey2")
        )
    elif refine == "arrow":
        index_df = build_cell_index(spark, polys, index_level, with_edges=False)
        refine_fn = _refine_udf(polys)
        matched = (
            cand.join(F.broadcast(index_df), cand["_icell"] == index_df["icell"], "inner")
            .where(refine_fn(F.col(lat), F.col(lon), F.col("poly_id")))
            .drop("_icell", "icell")
        )
    else:
        raise ValueError(f"unknown refine engine {refine!r}")
    if how == "inner":
        return matched
    if how == "left_anti":
        return points.join(matched.select(lat, lon).distinct(), [lat, lon], "left_anti")
    if how == "left":
        key = [c for c in points.columns]
        return points.join(matched.select(*key, "poly_id"), key, "left")
    raise ValueError(f"unsupported how={how!r}")
