"""Build a k×-replicated copy of the driver testdata for scale-stress runs.

Usage: python scripts/make_scale_input.py <factor> <out_dir> [<src_sf_dir>]

Replicates ``documents`` and ``events`` ``factor`` times with id/user
offsets so the scaled corpus has ``factor``× DISTINCT keys (no artificial
exact-duplicate collapse that would let the dedup family skip its band
joins); each document copy gets a per-copy suffix token for the same
reason. All other tables are symlinked from the source dir unchanged —
the curation/packing family only reads documents/events.

This is BENCH tooling only (scale evidence for BENCH/BASELINE.md); the
correctness harness always runs on the driver's own parquet.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    factor = int(sys.argv[1])
    out_dir = Path(sys.argv[2])
    src = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import functions as F

    from ult_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)

    docs = spark.read.parquet(str(src / "documents.parquet"))
    n_docs = docs.count()
    ev = spark.read.parquet(str(src / "events.parquet"))
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1

    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_copy") * n_docs).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" c"), F.col("_copy")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.length(F.concat(F.lit(" c"), F.col("_copy")))).alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out_dir / "documents.parquet"))
    )
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("_copy") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_copy") * n_users).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out_dir / "events.parquet"))
    )
    spark.stop()

    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ):
        link = out_dir / f"{name}.parquet"
        if not link.exists():
            os.symlink(src / f"{name}.parquet", link)
    print(f"wrote {factor}x input to {out_dir} (docs {factor * n_docs}, events {factor * n_ev})")


if __name__ == "__main__":
    main()
