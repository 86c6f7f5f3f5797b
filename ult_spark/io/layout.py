"""Spatially-clustered table layout (r5): directory-partition a table by
a coarse cell ancestor so spatial range queries prune whole partitions at
PLANNING time.

Why this works: the engine's cell ids are Morton (Z-order) codes
(grid/cells.py), so the level-L ancestor of a cell is a contiguous-range
prefix — clustering by ``cell_parent(cell, L)`` IS Z-order clustering,
and any descendant-range predicate (``cell_range``) becomes a simple
BETWEEN on the partition column, which Spark's catalog turns into
directory-level partition pruning (zero I/O for non-matching partitions,
visible as ``PartitionFilters`` in the scan node and a reduced
``inputFiles()`` set — asserted in tests/test_layout.py).

At 100 TB this is the difference between "scan the world and filter" and
"read the one city you asked about": per-partition parquet row groups
additionally min/max-skip on the full-resolution ``cell`` column because
rows arrive sorted within each directory.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.grid import cells as C

DIR_LEVEL = 2  # pinned default: 16 directories world-wide; raise with data


def write_cell_partitioned(
    df: DataFrame, path: str, cell: str = "cell", dir_level: int = DIR_LEVEL
) -> None:
    """Write ``df`` directory-partitioned by the ``dir_level`` ancestor of
    ``cell``, rows sorted by full-resolution cell within each directory
    (parquet min/max stats then skip row groups inside a partition)."""
    (
        df.withColumn("cell_dir", UF.cell_parent(F.col(cell), dir_level))
        .repartition("cell_dir")
        .sortWithinPartitions(cell)
        .write.mode("overwrite")
        .partitionBy("cell_dir")
        .parquet(path)
    )


def descendant_predicates(
    ancestor_cell: int, cell: str = "cell", dir_level: int = DIR_LEVEL
):
    """(dir_pred, cell_pred) for reading only rows under ``ancestor_cell``
    from a cell-partitioned layout: one BETWEEN on the ``cell_dir``
    partition column prunes directories at planning time, and the same
    range on ``cell`` exact-filters inside surviving partitions.

    Directory predicate: an ancestor at a level <= ``dir_level`` covers
    whole directories, whose ids fall inside its descendant range; a
    DEEPER ancestor lives inside ONE directory whose id is OUTSIDE that
    range (a parent id never lies in a child's range), so the partition
    filter clamps to that single covering directory instead. Shared by
    :func:`read_descendants` and the snapshot catalog's descendant read
    (io/catalog.py read_table)."""
    a = np.array([ancestor_cell], dtype=np.int64)
    lo, hi = (int(x[0]) for x in C.cell_range(a))
    if int(C.cell_level(a)[0]) <= dir_level:
        dir_pred = F.col("cell_dir").between(lo, hi)
    else:
        dir_pred = F.col("cell_dir") == int(C.cell_parent(a, dir_level)[0])
    return dir_pred, F.col(cell).between(lo, hi)


def read_descendants(
    spark: SparkSession,
    path: str,
    ancestor_cell: int,
    cell: str = "cell",
    dir_level: int = DIR_LEVEL,
) -> DataFrame:
    """Read only the rows under ``ancestor_cell`` (any level <= the data's
    level); see :func:`descendant_predicates` for the pruning rule."""
    dir_pred, cell_pred = descendant_predicates(ancestor_cell, cell, dir_level)
    return spark.read.parquet(path).where(dir_pred).where(cell_pred)
