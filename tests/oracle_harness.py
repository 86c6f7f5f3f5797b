"""Replicates the driver's Spark-vs-DuckDB compare so failures surface in
pytest before the round gate runs (SURVEY.md §5.5).

Compare semantics mirrored from the driver contract: row count + schema
(column names) + order-insensitive value comparison with columns sorted by
name. Values must match exactly (the driver hashes them).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from ult_spark.io.testdata import duckdb_views


def run_pair(spark, sf_dir: str, query_fn, sql: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    got = query_fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    duckdb_views(con, sf_dir)
    exp = con.execute(sql).df()
    con.close()
    return got, exp


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(dt) -> str:
    s = str(dt)
    if s == "bool":
        return "bool"
    if s.startswith(("int", "uint", "Int")):
        return "int"
    if s.startswith("float"):
        return "float"
    return "other"


def assert_match(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> None:
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: schema mismatch spark={sorted(got.columns)} duck={sorted(exp.columns)}"
    )
    # Dtype CLASS must match before normalization: the driver hashes
    # rendered values, so a DuckDB HUGEINT (object/float in pandas) vs a
    # Spark BIGINT hash-diverges even when every value is equal — the
    # r5 h3_parent_rollup red row. Catch that here, pre-canon.
    for c in got.columns:
        gc, ec = _dtype_class(got[c].dtype), _dtype_class(exp[c].dtype)
        assert gc == ec, (
            f"{name}: column {c!r} dtype class spark={got[c].dtype}({gc}) "
            f"duck={exp[c].dtype}({ec}) — driver value-hash would diverge; "
            "CAST the oracle (sums → BIGINT) or align the Spark type"
        )
    assert len(got) == len(exp), f"{name}: row count spark={len(got)} duck={len(exp)}"
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype == np.float64:
            same = (gv == ev) | (np.isnan(gv) & np.isnan(ev))
        else:
            same = gv == ev
        if not np.all(same):
            bad = np.flatnonzero(~same)[:5]
            raise AssertionError(
                f"{name}: column {c!r} differs at {len(np.flatnonzero(~same))} rows; "
                f"first idx {bad.tolist()}: spark={gv[bad].tolist()} duck={ev[bad].tolist()}"
            )


def check(spark, sf_dir: str, name: str, query_fn, sql: str) -> None:
    got, exp = run_pair(spark, sf_dir, query_fn, sql)
    assert_match(name, got, exp)
