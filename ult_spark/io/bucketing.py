"""Bucketed table layout (r6): co-located joins and aggregations with NO
shuffle at read time — the second physical-layout primitive beside the
Z-order cell layout (io/layout.py).

Why this matters at 100 TB: a fact table joined repeatedly on the same
key (documents ⋈ dup-cluster labels, events ⋈ user dimensions, pages ⋈
domain stats) pays the full key shuffle on EVERY query when stored flat.
``bucketBy(N, key)`` pays that shuffle ONCE at write time: both sides
hash-partitioned into the same N buckets means the sort-merge join reads
bucket i against bucket i with zero Exchange in the plan, and
``sortBy(key)`` inside each bucket removes the per-task Sort too.
Aggregations keyed by the bucket column likewise skip their Exchange.

Spark specifics encoded here (and asserted in tests/test_bucketing.py):

- Bucketed writes must go through ``saveAsTable`` (the bucket metadata
  lives in the catalog, not in parquet footers) — plain ``.parquet(path)``
  silently drops the bucketing.
- Both join sides need the SAME bucket count (Spark can also coalesce
  compatible multiples, config-gated; we pin equality — the portable
  contract).
- AQE leaves bucketed scans alone (no coalescing of non-shuffle
  partitions), so the no-Exchange property survives adaptive planning.
- Output tasks = bucket count at read time: pick N ≈ the cluster's
  target parallelism for the table's size (BASELINE.md protocol scales
  2×cores for shuffles; same logic applies here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed by ``key`` into
    ``buckets`` files per partition, each bucket sorted by the key when
    ``sort`` (enables exchange-free AND sort-free merge joins).
    ``path`` makes it an external table at that location (the warehouse
    dir is a static config — unchangeable on a live session)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key — reads
    co-located buckets pairwise, no Exchange on either side (asserted:
    :func:`assert_colocated`)."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def assert_colocated(df: DataFrame) -> None:
    """Raise if ``df``'s physical plan shuffles — the guard a pipeline
    places after composing what it believes is a co-located bucket join
    (a silently degraded layout would re-shuffle 100 TB per query)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "plan contains an Exchange — bucket layouts are not co-located "
            "(bucket counts differ, bucketing disabled, or a non-key join):\n"
            + plan
        )
