"""Polygon layer I/O — GeoJSON-style rings → packed-ring Arrow arrays.

SURVEY.md §1.1.3 / BASELINE.json north_star: polygons are carried as
"packed-ring Arrow arrays": one row per polygon, all rings flattened into
parallel coordinate arrays with ``ring_offsets[i]`` = start of ring *i* and
a final offset = total vertex count. This is the standard Arrow-native
flattening of OGC Simple Features polygons [public].
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

POLY_SCHEMA = StructType([
    StructField("poly_id", LongType(), False),
    StructField("name", StringType(), False),
    StructField("level", IntegerType(), False),
    StructField("ring_offsets", ArrayType(IntegerType(), False), False),
    StructField("xs", ArrayType(DoubleType(), False), False),
    StructField("ys", ArrayType(DoubleType(), False), False),
])


@dataclass(frozen=True)
class PackedPolygon:
    """Driver/executor-side packed representation (NumPy views)."""

    poly_id: int
    name: str
    level: int
    ring_offsets: np.ndarray  # int32, len = n_rings + 1, last = n_vertices
    xs: np.ndarray  # float64 lon
    ys: np.ndarray  # float64 lat

    def edges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """All ring edges incl. each ring's closing edge → (x1, y1, x2, y2)."""
        x1s, y1s, x2s, y2s = [], [], [], []
        for r in range(len(self.ring_offsets) - 1):
            s, e = self.ring_offsets[r], self.ring_offsets[r + 1]
            rx, ry = self.xs[s:e], self.ys[s:e]
            x1s.append(rx)
            y1s.append(ry)
            x2s.append(np.roll(rx, -1))
            y2s.append(np.roll(ry, -1))
        return (np.concatenate(x1s), np.concatenate(y1s),
                np.concatenate(x2s), np.concatenate(y2s))

    def bbox(self) -> tuple[float, float, float, float]:
        """(lat_min, lat_max, lon_min, lon_max)."""
        return float(self.ys.min()), float(self.ys.max()), float(self.xs.min()), float(self.xs.max())


def loads_packed(text: str) -> list[PackedPolygon]:
    """Parse rings-JSON text into packed polygons."""
    raw = json.loads(text)
    out = []
    for p in raw:
        offsets = [0]
        xs: list[float] = []
        ys: list[float] = []
        for ring in p["rings"]:
            for lon, lat in ring:
                xs.append(float(lon))
                ys.append(float(lat))
            offsets.append(len(xs))
        out.append(
            PackedPolygon(
                poly_id=int(p["poly_id"]),
                name=str(p["name"]),
                level=int(p.get("level", 0)),
                ring_offsets=np.asarray(offsets, dtype=np.int32),
                xs=np.asarray(xs, dtype=np.float64),
                ys=np.asarray(ys, dtype=np.float64),
            )
        )
    return out


def to_dataframe(spark: SparkSession, polys: list[PackedPolygon]) -> DataFrame:
    """Packed polygons → Spark DataFrame with Array columns (S4)."""
    rows = [
        (p.poly_id, p.name, p.level, p.ring_offsets.tolist(), p.xs.tolist(), p.ys.tolist())
        for p in polys
    ]
    return spark.createDataFrame(rows, POLY_SCHEMA)


def load_polygons(spark: SparkSession, path: str) -> DataFrame:
    return to_dataframe(spark, load_packed(path))


DEFAULT_LAYER_PATH = str(Path(__file__).resolve().parent.parent / "data" / "polygons.json")


def load_packed(path: str) -> list[PackedPolygon]:
    """Parse a rings-JSON file into packed polygons."""
    with open(path) as f:
        return loads_packed(f.read())


@lru_cache(maxsize=4)
def default_layer(path: str = DEFAULT_LAYER_PATH) -> tuple[PackedPolygon, ...]:
    """The pinned 16-polygon admin layer (FIXTURES.md B2).

    Zip-safe: read via importlib.resources so spark-submit --py-files
    deployments (package inside ult_spark.zip) work; filesystem fallback
    for odd layouts."""
    if path == DEFAULT_LAYER_PATH:
        try:
            from importlib import resources

            text = resources.files("ult_spark").joinpath("data/polygons.json").read_text()
            return tuple(loads_packed(text))
        except Exception:
            pass
    return tuple(load_packed(path))


def shifted_layer(
    polys: list[PackedPolygon] | tuple[PackedPolygon, ...],
    dlat: float,
    dlon: float,
    id_offset: int = 100,
) -> list[PackedPolygon]:
    """Deterministic second layer for polygon-polygon operators: every
    polygon translated by (dlat, dlon) with ids offset."""
    return [
        PackedPolygon(
            poly_id=p.poly_id + id_offset,
            name=f"{p.name}_shift",
            level=p.level,
            ring_offsets=p.ring_offsets,
            xs=p.xs + dlon,
            ys=p.ys + dlat,
        )
        for p in polys
    ]


def scaled_layer(
    polys: list[PackedPolygon] | tuple[PackedPolygon, ...],
    factor: float = 0.5,
    id_offset: int = 200,
) -> list[PackedPolygon]:
    """Deterministic nested layer for containment operators: every polygon
    shrunk about its vertex mean by ``factor`` (ids offset). For the
    star-shaped-about-centroid rings of the driver layer a factor < 1
    keeps the copy strictly inside the original."""
    out = []
    for p in polys:
        cx, cy = float(p.xs.mean()), float(p.ys.mean())
        out.append(
            PackedPolygon(
                poly_id=p.poly_id + id_offset,
                name=f"{p.name}_scaled",
                level=p.level,
                ring_offsets=p.ring_offsets,
                xs=cx + (p.xs - cx) * factor,
                ys=cy + (p.ys - cy) * factor,
            )
        )
    return out


def edges_values_sql(polys: list[PackedPolygon]) -> str:
    """Inline all polygon edges as a DuckDB VALUES relation — used by the
    oracle SQL so PIP parity needs no extra table (SURVEY.md §5.5)."""
    rows = []
    for p in polys:
        x1, y1, x2, y2 = p.edges()
        for i in range(len(x1)):
            # float() so the literal stays valid SQL under NumPy 2.x, where
            # scalar repr becomes 'np.float64(...)' (ADVICE r1)
            rows.append(
                f"({p.poly_id},{float(x1[i])!r},{float(y1[i])!r},"
                f"{float(x2[i])!r},{float(y2[i])!r})"
            )
    return "(VALUES " + ",".join(rows) + ") AS edges(poly_id, ex1, ey1, ex2, ey2)"
