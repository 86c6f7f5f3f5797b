"""Run every registered queries()/oracle_sql() pair exactly as the driver
does, at sf0.01 (the driver's correctness tier)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import check


def _pairs():
    from ult_spark.querydefs import ORACLES, QUERIES

    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may omit oracles; they still need rows>0 (below)
    return sorted(QUERIES), sorted(ORACLES), missing


ALL_QUERIES, ORACLE_NAMES, _ = _pairs()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_correct, name):
    from ult_spark.querydefs import ORACLES, QUERIES

    check(spark, sf_correct, name, QUERIES[name], ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLE_NAMES)))
def test_rows_only(spark, sf_correct, name):
    from ult_spark.querydefs import QUERIES

    df = QUERIES[name](spark, sf_correct)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"cell", "cnt", "sum_val_e4"} <= set(df.columns)
    # schema stability: driver re-runs this every round
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint", "bigint", "bigint"]
