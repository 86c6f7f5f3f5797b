"""Per-partition lineage + metrics (SURVEY §2.1 S8; BASELINE.json:
"per-partition lineage and metrics emitted to a lineage table").

Mechanism: a pass-through ``mapInPandas`` stage counts rows and wall time
per task partition into a dict **accumulator** (the Spark-native channel for
executor→driver side metrics); after the action, the driver appends one row
per partition to the lineage table. The instrumented stage is opt-in — the
bench hot path runs uninstrumented, the batch runner instruments its writes.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark import AccumulatorParam, TaskContext
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "run_id string, unit string, snapshot_id long, partition_id int, "
    "rows_out long, wall_ms long, status string, ts timestamp"
)


def instrumented(df: DataFrame, unit_col: str | None = None):
    """Returns (df', accumulator): df' is df with a pass-through metrics
    stage; after an action on df', the accumulator maps partition_id →
    (rows, wall_ms) — or (partition_id, unit) → (rows, wall_ms) when
    ``unit_col`` is given (the single-scan runner instruments ALL units in
    one job; batch wall time is apportioned to units by row share)."""

    class _DictSum(AccumulatorParam):
        # defined in function scope so cloudpickle ships the class by value
        # (workers must not need ult_spark importable)
        def zero(self, value):
            return {}

        def addInPlace(self, a, b):
            for k, (n, ms) in b.items():
                pn, pms = a.get(k, (0, 0))
                a[k] = (pn + n, pms + ms)
            return a

    acc = df.sparkSession.sparkContext.accumulator({}, _DictSum())
    schema = df.schema
    ucol = unit_col

    def count_rows(it):
        # self-contained closure: imports inside, so cloudpickle ships it by
        # value and executors need no ult_spark on PYTHONPATH (see ops/pip.py)
        import time as _time

        from pyspark import TaskContext as _TC

        ctx = _TC.get()
        pid = ctx.partitionId() if ctx is not None else -1
        t0 = _time.time()
        n = 0
        per_unit: dict = {}
        for pdf in it:
            n += len(pdf)
            if ucol is not None and len(pdf):
                for u, cnt in pdf[ucol].value_counts().items():
                    per_unit[u] = per_unit.get(u, 0) + int(cnt)
            yield pdf
        ms = int((_time.time() - t0) * 1000)
        if ucol is None:
            acc.add({pid: (n, ms)})
        elif n:
            acc.add(
                {(pid, u): (c, ms * c // n) for u, c in per_unit.items()}
            )

    return df.mapInPandas(count_rows, schema), acc


def emit_lineage(
    spark: SparkSession,
    lineage_table: str,
    run_id: str,
    unit: str,
    snapshot_id: int,
    metrics: dict[int, tuple[int, int]],
    status: str = "ok",
) -> None:
    """Append one lineage row per partition (parquet append — the lineage
    table is itself append-only)."""
    now = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())
    rows = [
        (run_id, unit, snapshot_id, int(pid), int(n), int(ms), status, now)
        for pid, (n, ms) in sorted(metrics.items())
    ]
    if not rows:
        rows = [(run_id, unit, snapshot_id, -1, 0, 0, status, now)]
    df = spark.createDataFrame(rows, LINEAGE_SCHEMA.replace("ts timestamp", "ts string"))
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.to_timestamp("ts"))
    Path(lineage_table).mkdir(parents=True, exist_ok=True)
    df.coalesce(1).write.mode("append").parquet(lineage_table)


def read_lineage(spark: SparkSession, lineage_table: str) -> DataFrame:
    return spark.read.parquet(lineage_table)
