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


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    cell: str = "cell",
) -> dict:
    """Small-files compaction (r7): rewrite a directory of parquet
    files into ceil(total_bytes / target_bytes) outputs, re-sorted by
    ``cell`` when present so the rewrite RESTORES row-group min/max
    skipping that thousands of tiny append files destroy. The streaming
    micro-batch sinks and per-unit runners in this repo legitimately
    accumulate small files; at 100 TB an uncompacted table pays a
    NameNode/listing and task-per-file tax that dwarfs the data cost —
    the classic OPTIMIZE maintenance op (content-identical by
    construction: same rows, new layout; asserted in
    tests/test_layout.py with a round-trip count + value check).

    Sizing reads the FILE METADATA (input_file listing via the catalog,
    no data scan) and coalesce(n) avoids a shuffle when reducing file
    count — the common case; repartitionByRange(cell) is used instead
    when a sort column is given, paying one range shuffle to buy
    clustered output. Returns {files_in, files_out, bytes_in}."""
    df = spark.read.parquet(path)
    from py4j.protocol import Py4JJavaError  # noqa: F401  (import surface pinned)

    jsc = spark._jsparkSession.sessionState().newHadoopConf()
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(jsc)
    sizes = [
        (f.getPath().toString(), f.getLen())
        for f in fs.listStatus(p)
        if f.getPath().getName().endswith(".parquet")
    ]
    bytes_in = sum(s for _, s in sizes)
    n_out = max(1, -(-bytes_in // target_bytes))
    if cell in df.columns:
        out = df.repartitionByRange(n_out, F.col(cell)).sortWithinPartitions(cell)
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(out_path)
    files_out = len(
        [
            f
            for f in fs.listStatus(spark._jvm.org.apache.hadoop.fs.Path(out_path))
            if f.getPath().getName().endswith(".parquet")
        ]
    )
    return {"files_in": len(sizes), "files_out": files_out, "bytes_in": bytes_in}


def write_spacetime_partitioned(
    df: DataFrame,
    path: str,
    cell: str = "cell",
    ts: str = "ts",
    dir_level: int = DIR_LEVEL,
) -> None:
    """Two-dimensional directory layout (r7): partition by
    (cell ancestor, week) so a dashboard's canonical predicate —
    "this city, these weeks" — prunes in BOTH dimensions at planning
    time: surviving directories = matching-space × matching-time, the
    product of two independent pruning factors (a month over one metro
    on a year of world data touches ~1/12 × ~1/16 of the directories).
    Rows stay cell-sorted within each directory for row-group min/max
    skipping on the full-resolution cell, exactly as the 1-D layout."""
    (
        df.withColumn("cell_dir", UF.cell_parent(F.col(cell), dir_level))
        .withColumn(
            "week",
            F.floor(F.unix_timestamp(F.col(ts)) / F.lit(604800)).cast("long"),
        )
        .repartition("cell_dir", "week")
        .sortWithinPartitions(cell)
        .write.mode("overwrite")
        .partitionBy("cell_dir", "week")
        .parquet(path)
    )


def read_spacetime(
    spark: SparkSession,
    path: str,
    ancestor_cell: int,
    week_lo: int,
    week_hi: int,
    cell: str = "cell",
    dir_level: int = DIR_LEVEL,
) -> DataFrame:
    """Read only the rows under ``ancestor_cell`` within
    [week_lo, week_hi] — both predicates land as partition filters
    (planning-time directory pruning) plus the exact cell-range
    residual inside surviving files."""
    dir_pred, cell_pred = descendant_predicates(ancestor_cell, cell, dir_level)
    wk = F.col("week").between(week_lo, week_hi)
    return spark.read.parquet(path).where(dir_pred & wk & cell_pred)
