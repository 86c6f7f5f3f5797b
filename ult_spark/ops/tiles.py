"""Per-tile aggregation: plain, salted (hot-cell skew), and pyramid rollup.

Spec: BASELINE.json north_star — "DataFrame groupBy over cell ids with
explicit salting for hot-cell skew", "hierarchical compact/uncompact for
multi-resolution tile pyramids"; north_rule — "partitioning / shuffle / skew
handled explicitly".

Skew design: geotagged web corpora concentrate in a few megacity cells. A
single-stage groupBy hashes each cell to ONE reduce task, so a hot cell
serializes. The salted aggregate splits every row's key into (cell, salt)
with a **deterministic** salt (xxhash64 of a high-cardinality column — never
rand(), which would break fixture reproducibility), partially aggregates the
(cell, salt) pairs, then merges per cell. Stage 1 shrinks hot cells by the
salt fan-out before the second (tiny) shuffle. Catalyst's map-side partial
aggregation already bounds per-task state; the salt bounds *reduce-task*
skew, which partial agg cannot.

Pyramid design: quadtree parents re-aggregate children EXACTLY (4 complete
siblings ⇔ 1 parent), so each level is a groupBy over the previous level's
output — log₄ shrinking shuffles, never a rescan of the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ult_spark import functions as UF


def tile_agg(
    df: DataFrame,
    cell: str = "cell",
    value: Column | str | None = None,
    salt_by: Column | str | None = None,
    salt_buckets: int = 64,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """groupBy(cell) → cnt (+ sum_val when ``value`` given).

    ``salt_by``: high-cardinality deterministic column (e.g. url / event_id)
    enabling the two-stage skew-safe plan. Results are identical with or
    without salting at any parallelism — only the shuffle layout differs.

    ``extra_keys``: pass-through grouping columns (e.g. the runner's work
    ``unit``) — grouping by (extra..., cell) on a disjointly-partitioned
    input produces EXACTLY the union of the per-partition aggregates, which
    is what lets the resumable runner process every unit in one scan.
    """
    val = (F.col(value) if isinstance(value, str) else value) if value is not None else None
    keys = [*extra_keys, cell]
    if salt_by is None:
        aggs = [F.count("*").alias("cnt")]
        if val is not None:
            aggs.append(F.sum(val).alias("sum_val"))
        return df.groupBy(*keys).agg(*aggs)

    salt_src = F.col(salt_by) if isinstance(salt_by, str) else salt_by
    salt = F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)).alias("_salt")
    partial_aggs = [F.count("*").alias("_cnt")]
    if val is not None:
        partial_aggs.append(F.sum(val).alias("_sum"))
    stage1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(*partial_aggs)
    merge = [F.sum("_cnt").alias("cnt")]
    if val is not None:
        merge.append(F.sum("_sum").alias("sum_val"))
    return stage1.groupBy(*keys).agg(*merge)


def focal_agg(
    points: DataFrame,
    level: int,
    k: int = 1,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Focal (neighborhood) statistics: for every tile at ``level``, the
    count of points within its Chebyshev-``k`` neighbor disk — kernel
    smoothing over the tile grid (x wraps across the antimeridian, y clamps
    at the poles).

    Plan shape: aggregate FIRST (tiles, one shuffle), then scatter each tile
    count to its (2k+1)² neighbor targets (literal offset explode on the
    already-tiny tile set) and re-aggregate — never an explode of raw
    points. Cells whose whole neighborhood is empty don't appear (pinned).

    The dx span is capped so each wrapped column is reached AT MOST once
    (round-2 ADVICE #1): uncapped, 2k+1 > 2^level makes the same source tile
    reach one target column through multiple dx offsets and double-count.
    The capped span is asymmetric ``[-min(k, n//2), min(k, (n-1)//2)]`` —
    exactly ``min(2k+1, n)`` consecutive offsets, so a full wrap covers
    every column exactly once (same construction as knn.distance_join_m).
    """
    n = 1 << level
    rlo = min(k, n // 2)  # keep in sync with focal_agg_sql
    rhi = min(k, (n - 1) // 2)
    tiles = points.groupBy(
        UF.grid_x(lon, level).alias("_x"), UF.grid_y(lat, level).alias("_y")
    ).agg(F.count("*").alias("_c"))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-rlo, rhi + 1)
            for dy in range(-k, k + 1)
        ]
    )
    return (
        tiles.withColumn("_o", F.explode(offsets))
        .withColumn("_tx", F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)))
        .withColumn("_ty", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ty") >= 0) & (F.col("_ty") < n))
        .groupBy("_tx", "_ty")
        .agg(F.sum("_c").alias("focal_cnt"))
        .select(
            UF.xy_to_cell(F.col("_tx"), F.col("_ty"), level).alias("cell"),
            "focal_cnt",
        )
    )


def _binomial_weights(k: int) -> dict[tuple[int, int], int]:
    """Separable integer binomial kernel over a (2k+1)² neighborhood —
    row k of Pascal's triangle squared outer-product (k=1 → the classic
    1-2-1 / 2-4-2 / 1-2-1 smoothing stencil). Integer weights keep the
    weighted sum addition-order-free (CLAUDE.md), hence engine-exact."""
    row = [1]
    for _ in range(2 * k):
        row = [a + b for a, b in zip([0] + row, row + [0])]
    return {
        (dx, dy): row[dx + k] * row[dy + k]
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
    }


def kernel_smooth(
    points: DataFrame,
    level: int,
    k: int = 1,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Kernel-density smoothing over the tile grid (r6): the weighted
    generalization of :func:`focal_agg` — every tile's smoothed value is
    the binomial-weighted sum of its Chebyshev-``k`` neighborhood counts
    (a discrete Gaussian approximation, the standard heatmap kernel).

    Same geometry contract as focal_agg: x wraps across the antimeridian
    with the dx span capped so each wrapped column is reached at most
    once, y clamps at the poles (no wrap, mass at the edge is simply not
    scattered outside). The kernel weight belongs to the RELATIVE offset
    and the stencil is symmetric, so scatter (source → target) and gather
    (target ← source) are the same program — we scatter, keeping the plan
    aggregate-first: tile counts (one input-sized shuffle), then a
    (2k+1)²-way literal explode of the tiny tile set, then the weighted
    re-aggregate. Returns (cell, smooth) with integer smooth; empty
    neighborhoods don't appear (pinned, as focal_agg).
    """
    n = 1 << level
    rlo = min(k, n // 2)  # keep in sync with kernel_smooth_sql / focal_agg
    rhi = min(k, (n - 1) // 2)
    wts = _binomial_weights(k)
    tiles = points.groupBy(
        UF.grid_x(lon, level).alias("_x"), UF.grid_y(lat, level).alias("_y")
    ).agg(F.count("*").alias("_c"))
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                F.lit(wts[(dx, dy)]).alias("w"),
            )
            for dx in range(-rlo, rhi + 1)
            for dy in range(-k, k + 1)
        ]
    )
    return (
        tiles.withColumn("_o", F.explode(offsets))
        .withColumn("_tx", F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n)))
        .withColumn("_ty", F.col("_y") + F.col("_o.dy"))
        .where((F.col("_ty") >= 0) & (F.col("_ty") < n))
        .groupBy("_tx", "_ty")
        .agg(F.sum(F.col("_c") * F.col("_o.w")).cast("long").alias("smooth"))
        .select(
            UF.xy_to_cell(F.col("_tx"), F.col("_ty"), level).alias("cell"),
            "smooth",
        )
    )


def kernel_smooth_sql(
    lat_sql: str, lon_sql: str, level: int, k: int = 1, table: str = "events"
) -> str:
    """DuckDB mirror of :func:`kernel_smooth` (same grid arithmetic, same
    dx cap, same integer binomial weights)."""
    n = 1 << level
    rlo = min(k, n // 2)  # keep in sync with kernel_smooth
    rhi = min(k, (n - 1) // 2)
    wts = _binomial_weights(k)
    offs = ",".join(
        f"({dx},{dy},{wts[(dx, dy)]})"
        for dx in range(-rlo, rhi + 1)
        for dy in range(-k, k + 1)
    )
    return (
        f"WITH t AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y, count(*) AS c FROM {table} GROUP BY 1, 2), "
        f"o(dx, dy, w) AS (VALUES {offs}), "
        f"f AS (SELECT (x + dx + {n}) % {n} AS tx, y + dy AS ty, "
        f"CAST(sum(c * w) AS BIGINT) AS smooth "
        f"FROM t, o WHERE y + dy >= 0 AND y + dy < {n} GROUP BY 1, 2) "
        f"SELECT {UF.xy_cell_sql('tx', 'ty', level)} AS cell, smooth FROM f"
    )


def focal_agg_sql(lat_sql: str, lon_sql: str, level: int, k: int = 1, table: str = "events") -> str:
    """DuckDB mirror of :func:`focal_agg` (same grid arithmetic, same dx cap)."""
    n = 1 << level
    rlo = min(k, n // 2)  # keep in sync with focal_agg
    rhi = min(k, (n - 1) // 2)
    offs = ",".join(
        f"({dx},{dy})" for dx in range(-rlo, rhi + 1) for dy in range(-k, k + 1)
    )
    return (
        f"WITH t AS (SELECT {UF.grid_x_sql(lon_sql, level)} AS x, "
        f"{UF.grid_y_sql(lat_sql, level)} AS y, count(*) AS c FROM {table} GROUP BY 1, 2), "
        f"o(dx, dy) AS (VALUES {offs}), "
        f"f AS (SELECT (x + dx + {n}) % {n} AS tx, y + dy AS ty, CAST(sum(c) AS BIGINT) AS focal_cnt "
        f"FROM t, o WHERE y + dy >= 0 AND y + dy < {n} GROUP BY 1, 2) "
        f"SELECT {UF.xy_cell_sql('tx', 'ty', level)} AS cell, focal_cnt FROM f"
    )


def pyramid(
    tiles: DataFrame,
    levels: list[int],
    cell: str = "cell",
    sum_cols: tuple[str, ...] = ("cnt",),
    mode: str = "explode",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Roll finest-level tile aggregates up a resolution pyramid.

    ``tiles`` must be at ``levels[0]`` (finest). Returns all levels with a
    ``level`` column. Sums re-aggregate exactly (quadtree exactness, ints).

    ``mode='explode'`` (default): each tile row explodes into one
    (level, ancestor) struct per level and a SINGLE groupBy aggregates all
    levels — a linear plan. The union-of-groupBys alternative re-executes
    the whole upstream once per level (Spark does not reuse common subplans
    across union branches), which measured 2.5x slower end-to-end.

    ``mode='iterative'``: level-by-level re-aggregation — shuffles strictly
    shrinking volumes; right when ``tiles`` is already materialized (e.g.
    read back from a snapshot table).
    """
    finest = levels[0]
    if mode == "explode":
        lc = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lvl).alias("level"),
                        (F.col(cell) if lvl == finest else UF.cell_parent(cell, lvl)).alias("cell"),
                    )
                    for lvl in levels
                ]
            )
        ).alias("_lc")
        return (
            tiles.select(*extra_keys, lc, *sum_cols)
            .groupBy(
                *extra_keys,
                F.col("_lc.level").alias("level"),
                F.col("_lc.cell").alias(cell),
            )
            .agg(*[F.sum(c).alias(c) for c in sum_cols])
        )
    out = tiles.select(*extra_keys, F.lit(finest).alias("level"), F.col(cell), *sum_cols)
    cur = tiles
    for lvl in levels[1:]:
        cur = cur.groupBy(*extra_keys, UF.cell_parent(cell, lvl).alias(cell)).agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        )
        out = out.unionByName(
            cur.select(*extra_keys, F.lit(lvl).alias("level"), F.col(cell), *sum_cols)
        )
    return out
