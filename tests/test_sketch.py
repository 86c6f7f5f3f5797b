"""Count-min sketch audit (r7, ops/sketch.py)."""

from pyspark.sql import functions as F


def test_countmin_overestimates_only_and_tight_when_wide(spark):
    from ult_spark.ops.sketch import countmin_estimates

    rows = [(f"u{i % 7}",) for i in range(700)] + [("hot",)] * 300
    df = spark.createDataFrame(rows, "user_id string")
    got = {r.key: (r.exact, r.est, r.overcount) for r in
           countmin_estimates(df, "user_id", top=8).collect()}
    assert set(got) == {"hot"} | {f"u{i}" for i in range(7)}
    assert got["hot"][0] == 300
    for exact, est, over in got.values():
        # the count-min theorem: estimates never undercount
        assert est >= exact and over == est - exact and over >= 0
    # at w=1 every key shares one bucket per row: est = N for all keys
    one = countmin_estimates(df, "user_id", top=3, w=1).collect()
    assert all(r.est == 1000 for r in one)
