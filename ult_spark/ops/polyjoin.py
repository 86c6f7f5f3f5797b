"""Polygon–polygon intersects join (J-family; round-1 verdict "missing" #3).

Two-stage, same architecture as the PIP join (ops/pip.py): cell-cover
candidate pruning + exact refine, all relational (no UDFs).

Stage 1 — candidates: both layers are polyfilled + compacted + uncompacted
at an index level (reusing ops.pip._index_rows); pairs sharing a cover cell
are candidates (equi-join on the cell id, distinct pairs).

Stage 2 — exact refine (pinned rule, IEEE-exact so DuckDB mirrors it):

  intersects(A, B) :=  any proper edge crossing
                    OR A contains B's first vertex
                    OR B contains A's first vertex

- proper crossing: strict orientation sign tests — segments pq and rs cross
  iff sign(cross(s-r, p-r)) != sign(cross(s-r, q-r)) AND
      sign(cross(q-p, r-p)) != sign(cross(q-p, s-p)),
  where sign(x) is the predicate x > 0 (collinear touchings — cross = 0 —
  are NOT intersections; measure-zero, pinned).
- containment: even-odd crossing parity of one representative vertex, the
  same pinned ray-cast rule as geom/pip.py / ops/pip.py.

This covers every topology for simple polygons: overlapping boundaries
cross; nested polygons hit a containment test; disjoint polygons hit
neither. The refine is a (cand × edges_a × edges_b) relational join +
groupBy — the standard distributed shape; candidates are cell-pruned first,
so the edge-pair blowup is local to actually-nearby polygons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ult_spark.geom.polyio import PackedPolygon
from ult_spark.ops.pip import DEFAULT_INDEX_LEVEL, _index_rows


def _edge_rows(polys: list[PackedPolygon]) -> list[tuple]:
    rows = []
    for p in polys:
        x1, y1, x2, y2 = p.edges()
        rows.extend(
            (p.poly_id, float(x1[i]), float(y1[i]), float(x2[i]), float(y2[i]))
            for i in range(len(x1))
        )
    return rows


def _vertex_rows(polys: list[PackedPolygon]) -> list[tuple]:
    return [(p.poly_id, float(p.xs[0]), float(p.ys[0])) for p in polys]


def _cells_df(spark: SparkSession, polys, level, idc: str) -> DataFrame:
    rows = [(c, pid) for c, pid in _index_rows(polys, level)]
    return spark.createDataFrame(rows, f"cell long, {idc} long")


def poly_intersect_join(
    spark: SparkSession,
    layer_a: list[PackedPolygon],
    layer_b: list[PackedPolygon],
    index_level: int = DEFAULT_INDEX_LEVEL,
) -> DataFrame:
    """All (a_id, b_id) pairs whose polygons intersect (pinned rule above)."""
    return _refine(*_driver_inputs(spark, layer_a, layer_b, index_level))


def _driver_inputs(
    spark: SparkSession, layer_a, layer_b, index_level: int
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    ca = _cells_df(spark, layer_a, index_level, "a_id")
    cb = _cells_df(spark, layer_b, index_level, "b_id")
    cand = ca.join(cb, "cell").select("a_id", "b_id").distinct()

    ea = spark.createDataFrame(
        _edge_rows(layer_a), "a_id long, ax1 double, ay1 double, ax2 double, ay2 double"
    )
    eb = spark.createDataFrame(
        _edge_rows(layer_b), "b_id long, bx1 double, by1 double, bx2 double, by2 double"
    )
    va = spark.createDataFrame(_vertex_rows(layer_a), "a_id long, avx double, avy double")
    vb = spark.createDataFrame(_vertex_rows(layer_b), "b_id long, bvx double, bvy double")
    return cand, ea, eb, va, vb


def poly_contains_join(
    spark: SparkSession,
    layer_a: list[PackedPolygon],
    layer_b: list[PackedPolygon],
    index_level: int = DEFAULT_INDEX_LEVEL,
) -> DataFrame:
    """ST_Contains as a pair join: (a_id, b_id) where polygon A contains
    polygon B. Pinned rule for simple polygons, composed from the SAME
    IEEE-exact predicates as the intersects join (no quantized-area
    equality anywhere):

      contains(A, B) := A contains B's first vertex (even-odd parity)
                        AND no proper edge crossing between ∂A and ∂B

    With no proper crossings, a simple polygon is on one side of the
    other, so one strictly-interior vertex certifies full containment;
    boundary touching (collinear overlap — cross = 0) stays "contained",
    the same measure-zero pinning as the intersects rule.
    """
    cand, ea, eb, va, vb = _driver_inputs(spark, layer_a, layer_b, index_level)
    cross_pairs, cont_ab, _ = _refine_sets(cand, ea, eb, va, vb)
    return cont_ab.join(cross_pairs, ["a_id", "b_id"], "left_anti")


def _refine(
    cand: DataFrame, ea: DataFrame, eb: DataFrame, va: DataFrame, vb: DataFrame
) -> DataFrame:
    """Pinned exact refine shared by the driver-layer and DataFrame-layer
    variants: proper edge crossing ∪ vertex containment both ways."""
    cross_pairs, cont_ab, cont_ba = _refine_sets(cand, ea, eb, va, vb)
    return cross_pairs.unionByName(cont_ab).unionByName(cont_ba).distinct()


def _refine_sets(
    cand: DataFrame, ea: DataFrame, eb: DataFrame, va: DataFrame, vb: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three exact pair sets (proper crossings, A-contains-B-vertex,
    B-contains-A-vertex) — intersects unions them; containment differences
    them."""
    # proper edge crossing: orientation sign tests (0 counts as non-positive)
    d1 = (F.col("bx2") - F.col("bx1")) * (F.col("ay1") - F.col("by1")) - (
        F.col("by2") - F.col("by1")
    ) * (F.col("ax1") - F.col("bx1"))
    d2 = (F.col("bx2") - F.col("bx1")) * (F.col("ay2") - F.col("by1")) - (
        F.col("by2") - F.col("by1")
    ) * (F.col("ax2") - F.col("bx1"))
    d3 = (F.col("ax2") - F.col("ax1")) * (F.col("by1") - F.col("ay1")) - (
        F.col("ay2") - F.col("ay1")
    ) * (F.col("bx1") - F.col("ax1"))
    d4 = (F.col("ax2") - F.col("ax1")) * (F.col("by2") - F.col("ay1")) - (
        F.col("ay2") - F.col("ay1")
    ) * (F.col("bx2") - F.col("ax1"))
    crosses = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    cross_pairs = (
        cand.join(ea, "a_id").join(eb, "b_id")
        .groupBy("a_id", "b_id")
        .agg(F.max(crosses.cast("int")).alias("_hit"))
        .where(F.col("_hit") == 1)
        .select("a_id", "b_id")
    )

    def _contains(edges: DataFrame, eid: str, vjoin: DataFrame,
                  px: str, py: str, x1: str, y1: str, x2: str, y2: str) -> DataFrame:
        """Pairs where the `edges`-side polygon contains the other's vertex
        (even-odd parity, pinned crossing rule from geom/pip.py)."""
        straddle = (F.col(y1) > F.col(py)) != (F.col(y2) > F.col(py))
        xint = (F.col(x2) - F.col(x1)) * (F.col(py) - F.col(y1)) / (
            F.col(y2) - F.col(y1)
        ) + F.col(x1)
        hit = straddle & (F.col(px) < xint)
        return (
            cand.join(vjoin, vjoin.columns[0]).join(edges, eid)
            .groupBy("a_id", "b_id")
            .agg(F.sum(hit.cast("int")).alias("_c"))
            .where(F.col("_c") % 2 == 1)
            .select("a_id", "b_id")
        )

    cont_ab = _contains(ea, "a_id", vb, "bvx", "bvy", "ax1", "ay1", "ax2", "ay2")
    cont_ba = _contains(eb, "b_id", va, "avx", "avy", "bx1", "by1", "bx2", "by2")
    return cross_pairs, cont_ab, cont_ba


def poly_intersect_join_df(
    layer_a_df: DataFrame,
    layer_b_df: DataFrame,
    index_level: int = DEFAULT_INDEX_LEVEL,
) -> DataFrame:
    """Distributed-layer twin of :func:`poly_intersect_join`: both layers
    arrive as packed-ring DataFrames (geom/polyio.to_dataframe), covers are
    built IN the cluster (ops/pip.py build_cell_index_df — mapInPandas over
    shipped py-files + native uncompact), and every join is a shuffle join
    — parcel-scale layers never touch the driver. Refine is the same pinned
    sign-test/containment rule, evaluated per edge-pair row."""
    return _refine(*_df_inputs(layer_a_df, layer_b_df, index_level))


def poly_contains_join_df(
    layer_a_df: DataFrame,
    layer_b_df: DataFrame,
    index_level: int = DEFAULT_INDEX_LEVEL,
) -> DataFrame:
    """Distributed-layer twin of :func:`poly_contains_join` — the same
    vertex-parity \\ proper-crossing set difference over cluster-built
    covers and edge rows."""
    cand, ea, eb, va, vb = _df_inputs(layer_a_df, layer_b_df, index_level)
    cross_pairs, cont_ab, _ = _refine_sets(cand, ea, eb, va, vb)
    return cont_ab.join(cross_pairs, ["a_id", "b_id"], "left_anti")


def _df_inputs(
    layer_a_df: DataFrame,
    layer_b_df: DataFrame,
    index_level: int = DEFAULT_INDEX_LEVEL,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    from ult_spark.ops.pip import build_cell_index_df, build_edge_index_df

    ca = build_cell_index_df(layer_a_df, index_level).select(
        F.col("poly_id").alias("a_id"), F.col("icell").alias("cell")
    )
    cb = build_cell_index_df(layer_b_df, index_level).select(
        F.col("poly_id").alias("b_id"), F.col("icell").alias("cell")
    )
    cand = ca.join(cb, "cell").select("a_id", "b_id").distinct()
    ea_w = build_edge_index_df(layer_a_df)  # (poly_id, arrays)
    eb_w = build_edge_index_df(layer_b_df)
    # explode edge arrays into the row-per-edge shape the refine expects
    ea = ea_w.select(
        F.col("poly_id").alias("a_id"),
        F.explode(F.arrays_zip("ex1", "ey1", "ex2", "ey2")).alias("_e"),
    ).select(
        "a_id",
        F.col("_e.ex1").alias("ax1"), F.col("_e.ey1").alias("ay1"),
        F.col("_e.ex2").alias("ax2"), F.col("_e.ey2").alias("ay2"),
    )
    eb = eb_w.select(
        F.col("poly_id").alias("b_id"),
        F.explode(F.arrays_zip("ex1", "ey1", "ex2", "ey2")).alias("_e"),
    ).select(
        "b_id",
        F.col("_e.ex1").alias("bx1"), F.col("_e.ey1").alias("by1"),
        F.col("_e.ex2").alias("bx2"), F.col("_e.ey2").alias("by2"),
    )
    va = layer_a_df.select(
        F.col("poly_id").alias("a_id"),
        F.element_at("xs", 1).alias("avx"), F.element_at("ys", 1).alias("avy"),
    )
    vb = layer_b_df.select(
        F.col("poly_id").alias("b_id"),
        F.element_at("xs", 1).alias("bvx"), F.element_at("ys", 1).alias("bvy"),
    )
    return cand, ea, eb, va, vb


# ---------------------------------------------------------------------------
# DuckDB oracle mirror — same inputs inlined as VALUES, same relational plan


def _values(rows: list[tuple], alias: str, cols: str) -> str:
    body = ",".join("(" + ",".join(repr(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS {alias}({cols})"


def poly_intersect_sql(
    layer_a: list[PackedPolygon],
    layer_b: list[PackedPolygon],
    index_level: int = DEFAULT_INDEX_LEVEL,
) -> str:
    ca = _values([(int(c), int(p)) for c, p in _index_rows(layer_a, index_level)], "ca", "cell, a_id")
    cb = _values([(int(c), int(p)) for c, p in _index_rows(layer_b, index_level)], "cb", "cell, b_id")
    ea = _values(_edge_rows(layer_a), "ea", "a_id, ax1, ay1, ax2, ay2")
    eb = _values(_edge_rows(layer_b), "eb", "b_id, bx1, by1, bx2, by2")
    va = _values(_vertex_rows(layer_a), "va", "a_id, avx, avy")
    vb = _values(_vertex_rows(layer_b), "vb", "b_id, bvx, bvy")
    cross = (
        "((bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1) > 0) "
        "!= ((bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1) > 0) "
        "AND ((ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1) > 0) "
        "!= ((ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1) > 0)"
    )
    return (
        f"WITH cand AS (SELECT DISTINCT a_id, b_id FROM {ca} JOIN {cb} USING (cell)), "
        f"crossed AS (SELECT a_id, b_id FROM cand JOIN {ea} USING (a_id) JOIN {eb} USING (b_id) "
        f"GROUP BY 1, 2 HAVING max(CASE WHEN {cross} THEN 1 ELSE 0 END) = 1), "
        f"cont_ab AS (SELECT a_id, b_id FROM cand JOIN {vb} USING (b_id) JOIN {ea} USING (a_id) "
        "GROUP BY 1, 2 HAVING sum(CASE WHEN (ay1 > bvy) != (ay2 > bvy) "
        "AND bvx < (ax2 - ax1) * (bvy - ay1) / (ay2 - ay1) + ax1 THEN 1 ELSE 0 END) % 2 = 1), "
        f"cont_ba AS (SELECT a_id, b_id FROM cand JOIN {va} USING (a_id) JOIN {eb} USING (b_id) "
        "GROUP BY 1, 2 HAVING sum(CASE WHEN (by1 > avy) != (by2 > avy) "
        "AND avx < (bx2 - bx1) * (avy - by1) / (by2 - by1) + bx1 THEN 1 ELSE 0 END) % 2 = 1) "
        "SELECT DISTINCT a_id, b_id FROM ("
        "SELECT * FROM crossed UNION ALL SELECT * FROM cont_ab UNION ALL SELECT * FROM cont_ba)"
    )


def poly_contains_sql(
    layer_a: list[PackedPolygon],
    layer_b: list[PackedPolygon],
    index_level: int = DEFAULT_INDEX_LEVEL,
) -> str:
    """DuckDB mirror of :func:`poly_contains_join` — the cont_ab CTE minus
    the crossed CTE, identical sign-test fragments as poly_intersect_sql.

    Coordinate literals are cast ::DOUBLE: scaled-layer coordinates carry
    long mantissas, and DuckDB types bare decimal literals as DECIMAL
    whose exact products overflow DECIMAL(18) (CLAUDE.md r3 rule — the
    shifted-layer intersects oracle survives on short literals only)."""

    def _values_d(rows: list[tuple], alias: str, cols: str) -> str:
        body = ",".join(
            "("
            + ",".join(
                f"{v!r}::DOUBLE" if isinstance(v, float) else repr(v) for v in r
            )
            + ")"
            for r in rows
        )
        return f"(VALUES {body}) AS {alias}({cols})"

    ca = _values([(int(c), int(p)) for c, p in _index_rows(layer_a, index_level)], "ca", "cell, a_id")
    cb = _values([(int(c), int(p)) for c, p in _index_rows(layer_b, index_level)], "cb", "cell, b_id")
    ea = _values_d(_edge_rows(layer_a), "ea", "a_id, ax1, ay1, ax2, ay2")
    eb = _values_d(_edge_rows(layer_b), "eb", "b_id, bx1, by1, bx2, by2")
    vb = _values_d(_vertex_rows(layer_b), "vb", "b_id, bvx, bvy")
    cross = (
        "((bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1) > 0) "
        "!= ((bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1) > 0) "
        "AND ((ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1) > 0) "
        "!= ((ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1) > 0)"
    )
    return (
        f"WITH cand AS (SELECT DISTINCT a_id, b_id FROM {ca} JOIN {cb} USING (cell)), "
        f"crossed AS (SELECT a_id, b_id FROM cand JOIN {ea} USING (a_id) JOIN {eb} USING (b_id) "
        f"GROUP BY 1, 2 HAVING max(CASE WHEN {cross} THEN 1 ELSE 0 END) = 1), "
        f"cont_ab AS (SELECT a_id, b_id FROM cand JOIN {vb} USING (b_id) JOIN {ea} USING (a_id) "
        "GROUP BY 1, 2 HAVING sum(CASE WHEN (ay1 > bvy) != (ay2 > bvy) "
        "AND bvx < (ax2 - ax1) * (bvy - ay1) / (ay2 - ay1) + ax1 THEN 1 ELSE 0 END) % 2 = 1) "
        "SELECT a_id, b_id FROM cont_ab EXCEPT SELECT a_id, b_id FROM crossed"
    )
