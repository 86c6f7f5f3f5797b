"""Loaders for the driver's synthetic parquet tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table: ``spark.read.parquet(f"{sf_dir}/{name}.parquet")``."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fanout(df: DataFrame, factor: int = 2) -> DataFrame:
    """Scale-adaptive scan fan-out for CPU-bound pipelines (r8, guide §2.5
    "input skew … one huge unsplittable file" / §6 input split size).

    The driver's sf tables are single-row-group parquet files, so a scan
    yields ONE non-empty partition no matter how small
    ``spark.sql.files.maxPartitionBytes`` is — every downstream row-local
    stage (tokenize/explode/hash partial-agg) runs on one core until the
    first exchange. A round-robin ``repartition`` right after the scan
    spreads that work across the session's cores for the cost of one
    exchange of the (small) base rows.

    Scale-adaptive by construction: when the scan already has at least
    ``factor × defaultParallelism`` partitions (any real multi-file /
    multi-row-group input, i.e. every cluster-scale deployment), this is a
    no-op — the extra exchange is never paid where the scan itself
    parallelizes. Deliberately NOT applied inside :func:`load`: pure
    scan→aggregate queries are already fine (partial aggregation collapses
    on the scan task); only CPU-bound derivation pipelines opt in.
    """
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: never break a plan
        return df
    target = factor * df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if n < target else df


def duckdb_views(con, sf_dir: str) -> None:
    """Register the same tables as DuckDB views (mirrors the driver harness)."""
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
