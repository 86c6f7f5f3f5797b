"""Runtime package shipping — make ``ult_spark`` importable on executors.

Mirrors the production mechanism (``spark-submit --py-files ult_spark.zip``,
scripts/package.py) for sessions that were NOT launched that way: a zip of
the package is built once per process and registered with
``sc.addPyFile``, so Python workers can ``import ult_spark`` inside
mapInPandas/applyInPandas kernels. Ops whose kernels need the package call
:func:`ensure_py_files` before returning their DataFrame.

(The repo's scalar pandas-UDF closures stay SELF-CONTAINED regardless —
this is only for table-shaped kernels like the distributed polyfill where
duplicating the geometry core would be a sync hazard.)
"""

from __future__ import annotations

import os
import tempfile
import uuid
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

# applicationId + startTime uniquely identify a context across restarts
# (id() of a stopped context can be reused by CPython — self-review #2)
_SHIPPED: set[tuple[str, int]] = set()
_ZIP: Path | None = None  # per-process unique file; never shared across pids


def build_zip(out: str | Path | None = None) -> Path:
    global _ZIP
    if out is None:
        if _ZIP is not None and _ZIP.exists():
            return _ZIP
        out = Path(tempfile.gettempdir()) / (
            f"ult_spark_pyfiles_{os.getpid()}_{uuid.uuid4().hex[:8]}.zip"
        )
    pkg = Path(__file__).resolve().parent
    out = Path(out)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*")):
            if f.suffix in (".py", ".json") and "__pycache__" not in f.parts:
                z.write(f, Path("ult_spark") / f.relative_to(pkg))
    _ZIP = out
    return out


def ensure_py_files(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime)
    if key in _SHIPPED:
        return
    sc.addPyFile(str(build_zip()))
    _SHIPPED.add(key)
