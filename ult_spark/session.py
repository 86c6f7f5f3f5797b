"""SparkSession factory with the engine's pinned configs (SURVEY.md §4, §6)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "ult_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    Defaults follow BASELINE.md protocol: AQE on, Arrow on with large
    record batches (the encode/PIP stages are Arrow-batch pipelines),
    shuffle partitions scaled to 2x cores.
    """
    master = master or os.environ.get("ULT_SPARK_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if master.startswith("local[") and master != "local[*]":
        try:
            cores = int(master[len("local["):-1])
        except ValueError:
            pass
    shuffle = shuffle_partitions or int(os.environ.get("ULT_SHUFFLE_PARTITIONS", 2 * cores))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r8: 32 MB broadcast threshold (default 10 MB). The pair-verify
        # sides of the dedup/ANN kernels (per-doc hashed shingle sets,
        # per-vector norms) sit at 11-20 MB at bench scale and their
        # broadcast saves two shuffles of multi-million-row pair frames
        # (measured −3 s embedding_near_dup, −1 s minhash_lsh_pairs at
        # sf1.0). Scale-safe by construction: AQE decides from RUNTIME
        # sizes, so on a 100 TB corpus these sides exceed the threshold
        # and the joins stay shuffled exactly as before; 32 MB broadcasts
        # are well inside executor budgets. Env-overridable for clusters
        # that want the stock 10 MB.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("ULT_AUTOBCAST_THRESHOLD", "33554432"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("ULT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
