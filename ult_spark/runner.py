"""Resumable batch runner (SURVEY §3 E1) — the spark-submit entry point.

Work is split into B deterministic **units** by ``pmod(xxhash64(url), B)``;
each unit runs the pages pipeline, writes its output as a snapshot, and
commits atomically. A killed job resumes by skipping committed units
(exactly-once outputs); per-partition lineage rows land in
``<out>/_lineage`` for every unit (BASELINE.json north_star).

Run: ``spark-submit --py-files ult_spark.zip -m ult_spark.runner <pages>
<out_table> [--buckets B] [--run-id R]`` — or call :func:`run_job`.
"""

from __future__ import annotations

import argparse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ult_spark.io import catalog, lineage as L


def run_job(
    spark: SparkSession,
    pages: DataFrame,
    out_table: str,
    buckets: int = 8,
    run_id: str | None = None,
    levels: tuple[int, ...] = (12, 10, 8),
    fail_after: int | None = None,
) -> list[str]:
    """Process all uncommitted units; returns the units committed this run.

    ``fail_after``: test hook — raise after committing that many units to
    simulate a mid-job crash (resume test, SURVEY §5.7).
    """
    from ult_spark.pipeline import pages_pipeline

    run_id = run_id or uuid.uuid4().hex[:12]
    done = catalog.committed_units(out_table)
    committed: list[str] = []
    for b in range(buckets):
        unit = f"b{b:04d}"
        if unit in done:
            continue
        part = pages.where(F.pmod(F.xxhash64("url"), F.lit(buckets)) == b)
        tiles = pages_pipeline(part, levels=levels)
        tiles_m, acc = L.instrumented(tiles)
        manifest = catalog.write_snapshot(tiles_m, out_table, unit, run_id)
        L.emit_lineage(
            spark, f"{out_table}/_lineage", run_id, unit,
            manifest.get("snapshot_id", 0), acc.value,
        )
        committed.append(unit)
        if fail_after is not None and len(committed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} units")
    return committed


def main() -> None:  # pragma: no cover — exercised via spark-submit
    ap = argparse.ArgumentParser()
    ap.add_argument("pages_path")
    ap.add_argument("out_table")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()
    from ult_spark.session import get_spark

    spark = get_spark(app_name="ult_runner")
    pages = spark.read.parquet(args.pages_path)
    units = run_job(spark, pages, args.out_table, args.buckets, args.run_id)
    print(f"committed {len(units)} units: {units}")


if __name__ == "__main__":
    main()
