"""Distributed hierarchical compact over a cell-set DataFrame (SURVEY §2.3
C3 at scale).

Partition-safe: sibling quads always share every ancestor, so grouping by
the ancestor at ``anchor_level`` puts all cells that could ever merge (down
to anchor_level) in one group; each group compacts locally with the NumPy
kernel inside ``applyInPandas``. Cells above the anchor level would need a
driver-side pass — callers pick an anchor at or below their coarsest target
(the default anchor 4 gives 256 independent groups globally).

The DuckDB oracle is the same algorithm unrolled level-by-level in SQL
(see :func:`compact_sql`): parent = (id - id % (4*lsb)) | (4*lsb) with
lsb = id & -id — pure integer arithmetic, no recursion needed because the
level count is finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ult_spark import functions as UF


def compact_cells(df: DataFrame, cell: str = "cell", anchor_level: int = 4) -> DataFrame:
    """Compact a set of (same- or mixed-level) cells to minimal mixed-level
    form, distributed by the anchor-level ancestor."""

    def compact_group(pdf):
        import numpy as np
        import pandas as _pd

        # NumPy compact kernel (self-contained copy of grid/compact.py logic;
        # keep in sync — pinned semantics)
        def level_of(c):
            lsb = (c & -c).astype(np.uint64)
            ctz = (np.log2(lsb.astype(np.float64)) + 0.5).astype(np.int64)
            return 29 - (ctz >> 1)

        def parent_of(c):
            lsb = c & -c
            return (c & ~((lsb << 2) - 1)) | (lsb << 2)

        cur = np.unique(pdf["cell"].to_numpy(np.int64))
        out = []
        while cur.size:
            lvl = level_of(cur)
            deepest = int(lvl.max())
            if deepest == 0:
                out.append(cur)
                break
            at = cur[lvl == deepest]
            rest = cur[lvl != deepest]
            parents = parent_of(at)
            uniq, counts = np.unique(parents, return_counts=True)
            complete = uniq[counts == 4]
            mask = np.isin(parents, complete)
            out.append(at[~mask])
            cur = np.unique(np.concatenate([rest, complete]))
        cells = np.sort(np.concatenate(out)) if out else np.empty(0, np.int64)
        return _pd.DataFrame({"cell": cells})

    anchored = df.select(F.col(cell).alias("cell")).withColumn(
        "_anchor", UF.cell_parent("cell", anchor_level)
    )
    return anchored.groupBy("_anchor").applyInPandas(compact_group, "cell long")


def compact_cells_native(
    df: DataFrame, cell: str = "cell", from_level: int = 8, to_level: int = 4
) -> DataFrame:
    """Fully-native compact for a UNIFORM-level cell set: the same unrolled
    level-by-level merge as :func:`compact_sql`, as chained Spark aggregates
    — zero Python stages (round-2: the applyInPandas variant pays Python
    worker serialization; keep it for MIXED-level inputs, use this when the
    input level is known).

    Shape (round-2 final): ONE explode of (level, ancestor) structs per
    distinct leaf + ONE groupBy counting present leaves per ancestor — an
    ancestor at level ℓ is COMPLETE iff its count is 4^(from_level-ℓ)
    (leaves are trivially complete). The compacted set is exactly the
    complete nodes whose PARENT is not complete (maximality), which is one
    anti-join of the complete table against itself keyed on the
    level-agnostic parent id. No driver loop, no persist, no per-level
    chain — the earlier chained-merge variant recomputed its upstream once
    per consumer branch (measured 3^levels blowup before caching).
    """
    leaves = df.select(F.col(cell).alias("cell")).distinct()
    anc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lvl).alias("lvl"),
                    (
                        F.col("cell")
                        if lvl == from_level
                        else UF.cell_parent("cell", lvl)
                    ).alias("acell"),
                )
                for lvl in range(to_level, from_level + 1)
            ]
        )
    ).alias("_a")
    complete = (
        leaves.select(anc)
        .groupBy(F.col("_a.lvl").alias("lvl"), F.col("_a.acell").alias("cell"))
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") == F.pow(F.lit(4.0), F.lit(from_level) - F.col("lvl")).cast("long"))
        .select("cell")
    )
    # level-agnostic parent id (sentinel arithmetic, same as compact_sql)
    lsb = F.col("cell").bitwiseAND(-F.col("cell"))
    parent = (F.col("cell") - F.col("cell") % (F.lit(4) * lsb)).bitwiseOR(F.lit(4) * lsb)
    return complete.withColumn("_p", parent).join(
        complete.select(F.col("cell").alias("_p")), "_p", "left_anti"
    ).select("cell")


def uncompact_cells_native(
    df: DataFrame, to_level: int, cell: str = "cell"
) -> DataFrame:
    """C4 at scale, fully native: each (mixed-level) cell expands to its
    descendants at ``to_level`` via ONE sequence+explode — descendants at a
    fixed level form an arithmetic id progression inside the contiguous
    range: first = c - lsb + lsbL, last = c + lsb - lsbL, step = 2·lsbL
    (lsb = the cell's sentinel, lsbL = the target level's). A cell already
    at ``to_level`` yields itself. Input cells deeper than ``to_level`` are
    invalid (same contract as grid/compact.uncompact).

    Other columns are preserved (each input row fans out to its leaves).
    """
    from ult_spark.grid.cells import MAX_LEVEL

    lsb_l = 1 << (2 * (MAX_LEVEL - to_level))
    c = F.col(cell)
    lsb = c.bitwiseAND(-c)
    seq = F.sequence(
        c - lsb + F.lit(lsb_l), c + lsb - F.lit(lsb_l), F.lit(2 * lsb_l)
    )
    others = [x for x in df.columns if x != cell]
    return df.select(*others, F.explode(seq).alias(cell))


def compact_sql(cells_sql: str, from_level: int, to_level: int = 4) -> str:
    """Unrolled compact in DuckDB SQL: one merge step per level.

    ``cells_sql`` must yield a column ``cell`` (distinct cells at
    ``from_level``). Each step merges complete sibling quads into parents;
    leftovers accumulate in ``keep{L}``.
    """
    steps = [f"c{from_level} AS (SELECT DISTINCT cell FROM ({cells_sql}))"]
    kept = []
    for lvl in range(from_level, to_level, -1):
        p = (
            f"(cell - (cell % (4 * (cell & -cell)))) | (4 * (cell & -cell))"
        )
        steps.append(
            f"p{lvl} AS (SELECT {p} AS parent, count(*) AS n FROM c{lvl} GROUP BY 1)"
        )
        steps.append(
            f"keep{lvl} AS (SELECT cell FROM c{lvl} WHERE {p} IN "
            f"(SELECT parent FROM p{lvl} WHERE n < 4))"
        )
        steps.append(
            f"c{lvl - 1} AS (SELECT parent AS cell FROM p{lvl} WHERE n = 4)"
        )
        kept.append(f"SELECT cell FROM keep{lvl}")
    kept.append(f"SELECT cell FROM c{to_level}")
    return "WITH " + ", ".join(steps) + " " + " UNION ALL ".join(kept)
