"""Resume / exactly-once / lineage (SURVEY §5.7): kill after N units, rerun,
assert identical output to a single-shot run with no duplicates."""

from __future__ import annotations

import pandas as pd
import pytest

from ult_spark.datagen.pages import pages_df
from ult_spark.io import catalog
from ult_spark.io.lineage import read_lineage
from ult_spark.runner import run_job


@pytest.fixture()
def pages(spark):
    return pages_df(spark, 2000, partitions=4)


def _tiles(spark, table) -> pd.DataFrame:
    return (
        catalog.read_table(spark, table)
        .toPandas()
        .sort_values(["level", "cell"])
        .reset_index(drop=True)
    )


def test_resume_exactly_once(spark, pages, tmp_path):
    t_full = str(tmp_path / "full")
    t_resumed = str(tmp_path / "resumed")

    units = run_job(spark, pages, t_full, buckets=4, run_id="r_full")
    assert units == [f"b{i:04d}" for i in range(4)]

    # crash after 2 units...
    with pytest.raises(RuntimeError, match="injected failure"):
        run_job(spark, pages, t_resumed, buckets=4, run_id="r_a", fail_after=2)
    assert len(catalog.committed_units(t_resumed)) == 2
    # ...resume commits ONLY the remaining units
    units2 = run_job(spark, pages, t_resumed, buckets=4, run_id="r_b")
    assert len(units2) == 2
    assert catalog.committed_units(t_resumed) == {f"b{i:04d}" for i in range(4)}

    a, b = _tiles(spark, t_full), _tiles(spark, t_resumed)
    # per-(level, cell) aggregate equality: bucket split re-aggregates exactly
    ga = a.groupby(["level", "cell"])["cnt"].sum().reset_index()
    gb = b.groupby(["level", "cell"])["cnt"].sum().reset_index()
    assert ga.equals(gb)

    # re-running a fully committed table is a no-op (exactly-once)
    assert run_job(spark, pages, t_resumed, buckets=4, run_id="r_c") == []

    # double-commit of a unit is refused
    with pytest.raises(ValueError, match="already committed"):
        catalog.write_snapshot(
            catalog.read_table(spark, t_resumed), t_resumed, "b0000", "r_dup"
        )


def test_write_snapshot_single_scan(spark, tmp_path, monkeypatch):
    """Round-1 verdict #5: the manifest row count must come from observe()
    metrics on the write job itself — proven by making any re-read of the
    written unit explode."""
    import pyspark.sql.readwriter as RW

    def _boom(self, *a, **k):
        raise AssertionError("write_snapshot re-read the written unit")

    monkeypatch.setattr(RW.DataFrameReader, "parquet", _boom)
    df = spark.range(123).selectExpr("id", "id * 2 AS v")
    man = catalog.write_snapshot(df, str(tmp_path / "t"), "u0", "r0")
    assert man["rows"] == 123
    monkeypatch.undo()
    assert catalog.read_table(spark, str(tmp_path / "t")).count() == 123


def test_lineage_rows(spark, pages, tmp_path):
    t = str(tmp_path / "lin")
    run_job(spark, pages, t, buckets=2, run_id="r_lin")
    lin = read_lineage(spark, f"{t}/_lineage").toPandas()
    assert set(lin["unit"]) == {"b0000", "b0001"}
    assert (lin["status"] == "ok").all()
    assert lin["rows_out"].sum() == catalog.read_table(spark, t).count()
    assert {"run_id", "partition_id", "wall_ms", "ts"} <= set(lin.columns)
