"""Snapshot-committed table storage (SURVEY §2.1 S7; BASELINE.json:
"resumable from Iceberg-snapshot checkpoints").

Two backends behind one API:

- **Iceberg** when a runtime jar + catalog are configured on the session
  (config-gated; unavailable offline in this sandbox — see SURVEY §0).
- **Parquet + atomic manifest fallback** with the same semantics: data lands
  under ``table/data/<unit>/<run_id>/``, then a JSON manifest is moved into
  ``table/_snapshots/`` with ``os.rename`` (atomic on POSIX). Readers only
  see data reachable from committed manifests, so a killed job leaves
  invisible orphans, a re-run skips committed units, and commits are
  exactly-once.

The "unit" is the engine's work-unit key (the runner buckets input rows by
``pmod(xxhash64(url), B)`` — deterministic, so retries rebuild identical
units; SURVEY §7 mitigation list).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _snap_dir(table: str) -> Path:
    return Path(table) / "_snapshots"


def iceberg_enabled(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured (jar present)."""
    try:
        return bool(spark.conf.get("spark.sql.catalog.ult", None))
    except Exception:
        return False


def list_snapshots(table: str) -> list[dict]:
    d = _snap_dir(table)
    if not d.exists():
        return []
    out = []
    for f in sorted(d.glob("*.json")):
        with open(f) as fh:
            out.append(json.load(fh))
    return out


def committed_units(table: str) -> set[str]:
    return {s["unit"] for s in list_snapshots(table)}


def write_snapshot(
    df: DataFrame, table: str, unit: str, run_id: str, mode: str = "overwrite"
) -> dict:
    """Write one work unit's output and commit it atomically.

    Returns the manifest dict. Idempotent per unit: a unit already committed
    raises (callers check :func:`committed_units` first — re-commits would
    break exactly-once)."""
    if unit in committed_units(table):
        raise ValueError(f"unit {unit!r} already committed to {table}")
    spark = df.sparkSession
    if iceberg_enabled(spark):  # pragma: no cover — no jar in this sandbox
        df.writeTo(f"ult.{Path(table).name}").append()
        return {"unit": unit, "run_id": run_id, "backend": "iceberg"}
    data_path = str(Path(table) / "data" / f"unit={unit}" / run_id)
    # row count via observe(): piggybacks on the write job itself — the old
    # spark.read.parquet(...).count() re-scanned every written unit purely
    # for the manifest (round-1 verdict #5)
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(mode).parquet(data_path)
    rows = int(obs.get["rows"])
    snap_id = int(time.time() * 1000)
    manifest = {
        "snapshot_id": snap_id,
        "unit": unit,
        "run_id": run_id,
        "path": data_path,
        "rows": rows,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    d = _snap_dir(table)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex}.json"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, d / f"{unit}.json")  # atomic commit — the snapshot point
    return manifest


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Union of all committed snapshots (uncommitted orphans invisible)."""
    snaps = list_snapshots(table)
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots in {table}")
    return spark.read.parquet(*[s["path"] for s in snaps])
