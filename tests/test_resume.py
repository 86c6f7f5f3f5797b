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


def test_run_job_scans_input_once(spark, tmp_path):
    """Round-2 verdict #1: a B-unit run must read the input ONCE, not B
    times. The whole run is one lazy plan over one scan + one
    partitionBy(unit) write; asserted on the physical plan of the actual
    parquet input (the path may appear in exactly one scan node)."""
    from ult_spark.runner import units_plan

    src = str(tmp_path / "pages_src")
    pages_df(spark, 500, partitions=4).write.parquet(src)
    pages = spark.read.parquet(src)
    df = units_plan(pages, [f"b{i:04d}" for i in range(8)], buckets=8)
    # count parquet relation LEAVES of the optimized plan (the tree string
    # is length-truncated by Spark, so regex over toString() is unreliable)
    leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
    parquet_leaves = [
        leaves.apply(i).toString()
        for i in range(leaves.length())
        if "parquet" in leaves.apply(i).toString().lower()
    ]
    assert len(parquet_leaves) == 1, f"input scanned {len(parquet_leaves)}x: {parquet_leaves}"

    # and the full runner over the same source commits all units from that
    # one plan (ONE write job) with outputs identical to the bucketed split
    t = str(tmp_path / "once")
    units = run_job(spark, pages, t, buckets=8, run_id="r_once")
    assert len(units) == 8
    total = catalog.read_table(spark, t)
    from ult_spark.pipeline import pages_pipeline

    exp = pages_pipeline(pages, levels=(12, 10, 8)).toPandas()
    got = (
        total.toPandas().groupby(["level", "cell"], as_index=False)["cnt"].sum()
    )
    exp = exp.sort_values(["level", "cell"]).reset_index(drop=True)
    got = got.sort_values(["level", "cell"]).reset_index(drop=True)
    assert got.equals(exp[["level", "cell", "cnt"]].astype(got.dtypes.to_dict()))


def test_iceberg_branch_routes_writeTo(spark, tmp_path, monkeypatch):
    """Round-2 verdict #9: with a catalog conf present, write_snapshot /
    write_units must route to the Iceberg writeTo branch (mocked at the
    DataFrame boundary — no jar exists offline) instead of the parquet
    fallback, and report the iceberg backend in their manifests."""
    calls = []

    class _FakeWriterV2:
        def __init__(self, table):
            self.table = table

        def append(self):
            calls.append(self.table)

    df = spark.range(5).selectExpr("id", "id AS v")
    # patch the CONCRETE DataFrame class (pyspark 4: pyspark.sql.DataFrame
    # is the abstract API; classic sessions instantiate a subclass)
    monkeypatch.setattr(type(df), "writeTo", lambda self, t: _FakeWriterV2(t))
    spark.conf.set("spark.sql.catalog.ult", "fake.Catalog")
    try:
        man = catalog.write_snapshot(df, str(tmp_path / "ice_t"), "u0", "r0")
        assert man["backend"] == "iceberg"
        assert calls == ["ult.ice_t"]

        dfu = spark.range(6).selectExpr("id", "pmod(id, 2) AS unit")
        mans = catalog.write_units(dfu, str(tmp_path / "ice_u"), ["b0", "b1"], "r1")
        assert {m["backend"] for m in mans.values()} == {"iceberg"}
        assert calls == ["ult.ice_t", "ult.ice_u"]
        # no parquet fallback data may exist for either table
        assert not (tmp_path / "ice_t" / "data").exists()
        assert not (tmp_path / "ice_u" / "data").exists()
    finally:
        spark.conf.unset("spark.sql.catalog.ult")


def test_lineage_rows(spark, pages, tmp_path):
    t = str(tmp_path / "lin")
    run_job(spark, pages, t, buckets=2, run_id="r_lin")
    lin = read_lineage(spark, f"{t}/_lineage").toPandas()
    assert set(lin["unit"]) == {"b0000", "b0001"}
    assert (lin["status"] == "ok").all()
    assert lin["rows_out"].sum() == catalog.read_table(spark, t).count()
    assert {"run_id", "partition_id", "wall_ms", "ts"} <= set(lin.columns)


def test_read_table_iceberg_routing_and_all_empty(spark, tmp_path, monkeypatch):
    """ADVICE r3: read_table must (a) route tables with iceberg-committed
    units to spark.table instead of KeyError-ing on their path-less
    manifests, (b) return an EMPTY DataFrame (not None) when every
    committed unit has 0 rows, and (c) write_snapshot's iceberg branch
    must COMMIT its manifest (streaming replays depend on it)."""
    # (a) + (c): mocked iceberg write commits; read routes to spark.table
    calls = []

    class _FakeWriterV2:
        def __init__(self, table):
            self.table = table

        def append(self):
            calls.append(self.table)

    df = spark.range(3).selectExpr("id")
    monkeypatch.setattr(type(df), "writeTo", lambda self, t: _FakeWriterV2(t))
    spark.conf.set("spark.sql.catalog.ult", "fake.Catalog")
    t_ice = str(tmp_path / "ice_r")
    try:
        catalog.write_snapshot(df, t_ice, "u0", "r0")
        assert catalog.committed_units(t_ice) == {"u0"}  # (c)
        sentinel = spark.range(7)
        monkeypatch.setattr(type(spark), "table", lambda self, name: sentinel)
        got = catalog.read_table(spark, t_ice)
        assert got is sentinel  # (a)
    finally:
        spark.conf.unset("spark.sql.catalog.ult")

    # (b): all committed units empty → empty DataFrame, no crash
    t_empty = str(tmp_path / "empty_r")
    catalog.write_snapshot(df.limit(0), t_empty, "u0", "r0")
    out = catalog.read_table(spark, t_empty)
    assert out is not None and out.count() == 0


def test_read_table_refuses_mixed_backends(spark, tmp_path, monkeypatch):
    """Round-4 advice: a table committed under BOTH parquet and iceberg
    backends has no single read path — read_table must raise, not silently
    drop the parquet units by routing to spark.table."""
    t = str(tmp_path / "mixed")
    df = spark.range(3).selectExpr("id")
    catalog.write_snapshot(df, t, "u0", "r0")  # parquet-backed unit

    class _FakeWriterV2:
        def __init__(self, table):
            self.table = table

        def append(self):
            pass

    monkeypatch.setattr(type(df), "writeTo", lambda self, tb: _FakeWriterV2(tb))
    spark.conf.set("spark.sql.catalog.ult", "fake.Catalog")
    try:
        catalog.write_snapshot(df, t, "u1", "r1")  # iceberg-backed unit
        assert catalog.committed_units(t) == {"u0", "u1"}
        with pytest.raises(ValueError, match="mixed snapshot backends"):
            catalog.read_table(spark, t)
    finally:
        spark.conf.unset("spark.sql.catalog.ult")


def test_runner_snapshot_cell_layout_prunes(spark, pages, tmp_path):
    """r6 verdict #4: the runner's committed snapshots are Z-order
    cell-partitioned (catalog.write_units cell layout) — a descendant read
    of one spatial subtree prunes whole directories (scan numFiles metric,
    NOT inputFiles — CLAUDE.md) while returning exactly the rows a
    full-scan range filter returns, with manifest semantics intact."""
    import numpy as np
    from pyspark.sql import functions as F

    from ult_spark.grid import cells as C
    from ult_spark.io.layout import DIR_LEVEL

    t = str(tmp_path / "zt")
    assert run_job(spark, pages, t, buckets=4, run_id="r_z") == [
        f"b{i:04d}" for i in range(4)
    ]
    full = catalog.read_table(spark, t)
    assert "cell_dir" not in full.columns  # layout column stays internal

    def files_read(make_df) -> int:
        # rebuild the plan per read: the numFiles metric rides the lazy
        # partition listing, once per plan object (CLAUDE.md r5). read_table
        # is a union of per-snapshot scans — sum the metric over all leaves.
        df = make_df()
        df.collect()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        return sum(
            int(leaves.apply(i).metrics().apply("numFiles").value())
            for i in range(leaves.length())
        )

    total_files = files_read(lambda: catalog.read_table(spark, t))

    # ancestor = the dir-level parent of the most-populated finest cell
    top = full.groupBy("cell").count().orderBy(F.desc("count"), F.asc("cell")).first()
    anc = int(C.cell_parent(np.array([top.cell], dtype=np.int64), DIR_LEVEL)[0])
    lo, hi = (int(x[0]) for x in C.cell_range(np.array([anc], dtype=np.int64)))

    got = catalog.read_table(spark, t, descendants_of=anc)
    assert "cell_dir" not in got.columns
    expect = full.where(F.col("cell").between(lo, hi))
    key = lambda df: sorted((r.level, r.cell, r.cnt) for r in df.collect())
    assert key(got) == key(expect)
    assert len(key(got)) > 0  # the subtree actually has data
    pruned = files_read(lambda: catalog.read_table(spark, t, descendants_of=anc))
    assert pruned < total_files
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    # a table committed WITHOUT the layout refuses descendant reads loudly
    t2 = str(tmp_path / "flat")
    catalog.write_snapshot(spark.range(5).selectExpr("id AS cell"), t2, "u0", "r0")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cell layout"):
        catalog.read_table(spark, t2, descendants_of=anc)
