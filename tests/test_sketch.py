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


def test_hll_pinned_regimes(spark):
    from ult_spark.ops.sketch import hll_estimate

    # small-range regime: 40 keys over 256 registers → linear counting
    small = spark.createDataFrame(
        [(f"k{i}",) for i in range(40) for _ in range(3)], "user_id string"
    )
    r = hll_estimate(small, "user_id").collect()[0]
    assert r.n_exact == 40 and r.v_zero > 0
    # linear counting at this load is within ~10% of exact
    assert abs(r.est - 40) <= 4
    # duplicates must not move the sketch: registers hold MAX rank
    r2 = hll_estimate(small.distinct(), "user_id").collect()[0]
    assert (r2.s49, r2.v_zero, r2.est) == (r.s49, r.v_zero, r.est)
    # raw-estimate regime: 5000 distinct keys, expect ~1/sqrt(256) ≈ 6.5%
    big = spark.createDataFrame(
        [(f"x{i}",) for i in range(5000)], "user_id string"
    )
    b = hll_estimate(big, "user_id").collect()[0]
    assert b.n_exact == 5000
    assert abs(b.est - 5000) / 5000 < 0.2


def test_bloom_no_false_negatives_and_fp_pressure(spark):
    from pyspark.sql import functions as F

    from ult_spark.ops.sketch import bloom_audit

    rows = [(f"m{i}", "in") for i in range(50)] + [
        (f"o{i}", "out") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "user_id string, tag string")
    r = bloom_audit(df, "user_id", F.col("tag") == "in").collect()[0]
    assert (r.n_members, r.n_probes) == (50, 550)
    assert r.n_false_neg == 0 and r.n_true_pos == 50  # the Bloom theorem
    assert 0 <= r.n_false_pos <= 500 and r.fp_e6 is not None
    # undersized filter (m=8): every lane collides, all probes positive
    tiny = bloom_audit(df, "user_id", F.col("tag") == "in", m=8).collect()[0]
    assert tiny.n_false_neg == 0 and tiny.n_false_pos == 500
