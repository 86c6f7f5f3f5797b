"""Polygon vertex decimation (r5): one-sweep Visvalingam-style
simplification as a native HOF Column program with an exact DuckDB
oracle.

Pinned variant (documented): a SINGLE pass over each ring keeps vertex i
iff the doubled area of triangle (v[i-1], v[i], v[i+1]) — computed over
the ORIGINAL ring, neighbors cyclic — reaches ``eps``; vertex 1 is
always kept (anchor, so a ring never empties). True Visvalingam iterates
(re-computing areas after each removal); the one-sweep form is chosen
because it is embarrassingly row-local and deterministic in one pass —
the right shape for 10^9 parcels on a cluster — and the quality
difference only appears on long chains of consecutive sub-threshold
vertices (CLAUDE.md determinism rules: floor-quantize the per-vertex
area BEFORE the threshold compare, floor-quantize per shoelace edge
BEFORE the integer sum).

Everything is per-ring row-local: no joins, no shuffles, one projection
— at 100 TB this runs scan-speed inside whole-stage codegen.

The driver's 16-polygon admin layer is 4-6 uniform vertices per ring
(nothing to decimate), so the registered query runs on a deterministic
SYNTHETIC dense layer: jittered circles where un-jittered arc vertices
are near-collinear (small triangle area → dropped) and jittered ones are
kept. The generator emits plain float literals consumed by BOTH engines,
so cross-engine agreement is by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRI_Q = 1e12  # triangle-area quantizer (deg² → e12 integer)
AREA2_Q = 1e9  # shoelace-term quantizer (doubled-area e9 integer)
# pinned default: tri2 >= 0.5 deg² keeps. On the synthetic layer the
# per-vertex doubled areas are trimodal (0.143 pure arc / 1.40 spike
# neighbor / 3.28 spike), so 0.5 drops exactly the smooth-arc vertices.
EPS_E12 = 500_000_000_000


def synth_rings(n_polys: int = 8, n_vertices: int = 48) -> list[tuple]:
    """Deterministic dense rings: (poly_id, ring_idx, xs, ys) tuples.

    Circle of radius 8° on a center grid; every 5th vertex is pushed out
    by 1.5° (kept by the decimator), the rest lie on the smooth arc
    (near-collinear at 48 vertices → dropped). Integer-derived phases
    only — no RNG."""
    rows = []
    for p in range(n_polys):
        cx, cy = -120.0 + 30.0 * (p % 5), -40.0 + 28.0 * (p // 5)
        xs, ys = [], []
        for k in range(n_vertices):
            r = 8.0 + (1.5 if (k + p) % 5 == 0 else 0.0)
            a = 2.0 * math.pi * k / n_vertices
            xs.append(cx + r * math.cos(a))
            ys.append(cy + r * math.sin(a))
        rows.append((p, 0, xs, ys))
    return rows


def rings_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(
        rows, "poly_id long, ring_idx long, xs array<double>, ys array<double>"
    )


def rings_values(rows: list[tuple], name: str = "rings") -> str:
    """DuckDB VALUES literal of the same rings (floats via repr — exact
    round-trip; ::DOUBLE[] pinned per CLAUDE.md decimal-literal rule)."""
    vals = ", ".join(
        f"({pid}, {ridx}, {list(map(repr, xs))}::DOUBLE[], {list(map(repr, ys))}::DOUBLE[])".replace(
            "'", ""
        )
        for pid, ridx, xs, ys in rows
    )
    return f"(SELECT * FROM (VALUES {vals}) AS {name}(poly_id, ring_idx, xs, ys))"


def _tri2(i: Column, n: Column) -> Column:
    """Doubled triangle area at 1-based cyclic vertex i of (xs, ys)."""
    p = ((i - 2 + n) % n) + 1
    q = (i % n) + 1
    xi, yi = F.element_at("xs", i), F.element_at("ys", i)
    xp, yp = F.element_at("xs", p), F.element_at("ys", p)
    xq, yq = F.element_at("xs", q), F.element_at("ys", q)
    return F.abs((xi - xp) * (yq - yi) - (yi - yp) * (xq - xi))


def simplify_stats(rings: DataFrame, eps_e12: int = EPS_E12) -> DataFrame:
    """(poly_id, ring_idx, n_orig, n_kept, area2_orig_e9, area2_kept_e9)
    per ring — the decimation decision and both shoelace areas in one
    row-local projection."""
    n = F.size("xs")
    idx = F.sequence(F.lit(1), n)
    keep = F.filter(
        idx,
        lambda i: (i == 1)
        | (F.floor(_tri2(i, n) * F.lit(TRI_Q)).cast("long") >= F.lit(eps_e12)),
    )
    m = F.size(keep)

    def shoelace(seq: Column, size: Column) -> Column:
        js = F.sequence(F.lit(1), size)

        def term(j):
            a = F.element_at(seq, j)
            b = F.element_at(seq, (j % size) + 1)
            t = (
                F.element_at("xs", a) * F.element_at("ys", b)
                - F.element_at("xs", b) * F.element_at("ys", a)
            )
            return F.floor(t * F.lit(AREA2_Q)).cast("long")

        return F.aggregate(
            F.transform(js, term), F.lit(0).cast("long"), lambda acc, v: acc + v
        )

    return rings.select(
        "poly_id",
        "ring_idx",
        n.cast("long").alias("n_orig"),
        m.cast("long").alias("n_kept"),
        shoelace(idx, n).alias("area2_orig_e9"),
        shoelace(keep, m).alias("area2_kept_e9"),
    )


def simplify_stats_sql(rows: list[tuple], eps_e12: int = EPS_E12) -> str:
    """DuckDB mirror: identical cyclic-neighbor triangle test and
    floor-quantized shoelace folds over the same ring literals."""
    src = rings_values(rows)
    n = "len(xs)"
    tri = (
        "abs((xs[i] - xs[((i - 2 + {n}) % {n}) + 1]) * (ys[(i % {n}) + 1] - ys[i]) "
        "- (ys[i] - ys[((i - 2 + {n}) % {n}) + 1]) * (xs[(i % {n}) + 1] - xs[i]))"
    ).format(n=n)
    keep = (
        f"list_filter(generate_series(1, {n}), "
        f"i -> i = 1 OR CAST(floor({tri} * {TRI_Q!r}::DOUBLE) AS BIGINT) >= {eps_e12})"
    )

    def shoelace(a: str, b: str, size: str) -> str:
        """Fold of floor-quantized shoelace terms; ``a``/``b`` map the fold
        index j (and its cyclic successor) to 1-based vertex indexes."""
        term = (
            f"CAST(floor((xs[{a}] * ys[{b}] "
            f"- xs[{b}] * ys[{a}]) * {AREA2_Q!r}::DOUBLE) AS BIGINT)"
        )
        return (
            f"CAST(list_sum([{term} for j in generate_series(1, {size})]) AS BIGINT)"
        )

    return (
        f"WITH r AS (SELECT * FROM {src}), "
        f"k AS (SELECT poly_id, ring_idx, xs, ys, {keep} AS kp FROM r) "
        f"SELECT poly_id, ring_idx, CAST(len(xs) AS BIGINT) AS n_orig, "
        f"CAST(len(kp) AS BIGINT) AS n_kept, "
        f"{shoelace('j', f'(j % {n}) + 1', n)} AS area2_orig_e9, "
        f"{shoelace('kp[j]', 'kp[(j % len(kp)) + 1]', 'len(kp)')} AS area2_kept_e9 "
        "FROM k"
    )
