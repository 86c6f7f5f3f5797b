"""Hierarchical compact / uncompact of cell-id sets (SURVEY.md §2.3 C3/C4).

Quadtree compaction is exact: 4 complete siblings ⇔ 1 parent (unlike H3
hexagons, where containment is approximate). Used to build the compacted
polygon index that is broadcast to executors (BASELINE.json north_star:
"hierarchical compact/uncompact for multi-resolution tile pyramids",
"broadcast of compacted polygon indexes").

Driver-side NumPy implementations (the broadcast index is small by
construction); the distributed uncompact path is an ``explode`` of children
arrays in :mod:`ult_spark.ops.pip`.
"""

from __future__ import annotations

import numpy as np

from . import cells


def compact(cell_ids: np.ndarray) -> np.ndarray:
    """Replace every complete set of 4 siblings by their parent, to fixpoint.

    Input may mix levels; duplicates are removed. Output is sorted.
    """
    cur = np.unique(np.asarray(cell_ids, dtype=np.int64))
    out: list[np.ndarray] = []
    # process deepest level first: a merge at level L may complete a sibling
    # set at level L-1, so shallower levels must wait for promoted parents
    while cur.size:
        lvl = cells.cell_level(cur)
        deepest = int(lvl.max())
        if deepest == 0:
            out.append(cur)
            break
        at = cur[lvl == deepest]
        rest = cur[lvl != deepest]
        parents = cells.cell_parent(at)
        # a parent is complete iff all 4 of its children are present
        uniq, counts = np.unique(parents, return_counts=True)
        complete = uniq[counts == 4]
        mask = np.isin(parents, complete)
        out.append(at[~mask])
        cur = np.unique(np.concatenate([rest, complete]))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate([o for o in out if o.size] or [np.empty(0, dtype=np.int64)]))


def uncompact(cell_ids: np.ndarray, level: int) -> np.ndarray:
    """Expand every cell down to ``level`` (cells already at ``level`` pass
    through; cells deeper than ``level`` are an error)."""
    cur = np.asarray(cell_ids, dtype=np.int64)
    if cur.size == 0:
        return cur
    lvl = cells.cell_level(cur)
    if np.any(lvl > level):
        raise ValueError("uncompact target level is above some input cells")
    out = [cur[lvl == level]]
    todo = cur[lvl < level]
    while todo.size:
        kids = cells.cell_children(todo).ravel()
        klvl = cells.cell_level(kids)
        out.append(kids[klvl == level])
        todo = kids[klvl < level]
    return np.sort(np.concatenate(out))
