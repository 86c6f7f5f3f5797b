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


def test_priority_window_names_all_resolve():
    """r7: every _PRIORITY name must exist in the registry — a typo or a
    renamed query would otherwise silently burn one of the driver's 50
    correctness slots (the r6 'never driver-checked' gap was exactly a
    window-ordering failure mode)."""
    import __spark_entry__ as E

    qs = E.queries()
    missing = [n for n in E._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names absent from queries(): {missing}"
    # the first 50 (the driver window) must each have an oracle, except
    # the HLL rows-only query which is oracle-less by design
    os_ = E.oracle_sql()
    window = list(qs)[:50]
    no_oracle = [n for n in window if n not in os_]
    # either the rows-only HLL query occupies a slot this round or the
    # rotation pushed it out and the window is fully oracle-backed
    assert no_oracle in ([], ["approx_users_per_tile_l6"]), no_oracle
