"""Mobility statistics: user_rog anchored moments (r7 hardening).

Certifies the r6-verdict correctness cliff is closed: a localized but
off-origin user with enough events overflowed the RAW moment form
(n·Σx² with x ∈ ±1.8e5 crosses 2^63 near n ≈ 8k-20k), while the
anchored form (ult_spark.querydefs.rog_from_points) is bounded by the
per-user SPREAD and returns the exact value. Expected values computed
with Python arbitrary-precision integers — the same formula, no Spark.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _expected(pts):
    """Exact-integer reference: (n, rog2_num, rog_e3) with Python bigints."""
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sx2 = sum(p[0] * p[0] for p in pts)
    sy2 = sum(p[1] * p[1] for p in pts)
    num = n * (sx2 + sy2) - (sx * sx + sy * sy)
    return n, num, math.floor(math.sqrt(float(num)) / float(n))


def _planted(spark, n=20000):
    """One user parked near (+179°, +89°) with a 1000-unit spread.

    Raw second moments: n·Σ(x²+y²) ≈ 2e4·2e4·(1.79e5²+8.9e4²) ≈ 1.6e19
    > 2^63 — the old form overflows. Anchored: n²·spread² ≈ 4e14 — fine.
    """
    rows = [
        (7, 179000 + (i * 2654435761) % 1000, 89000 + (i * 40503) % 1000)
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "user_id long, x long, y long")


def test_rog_anchored_exact(spark):
    from ult_spark.querydefs import rog_from_points

    rows, df = _planted(spark)
    got = rog_from_points(df).collect()
    assert len(got) == 1
    n, num, rog = _expected([(x, y) for _, x, y in rows])
    r = got[0]
    assert (r["n"], r["rog2_num"], r["rog_e3"]) == (n, num, rog)


def test_rog_raw_form_overflows(spark):
    """The pre-r7 unanchored moments overflow BIGINT on the planted
    fixture — ANSI mode raises instead of wrapping, which is exactly
    the cliff the anchored form removes."""
    _, df = _planted(spark)
    raw = df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    bad = raw.select(
        (F.col("n") * (F.col("sx2") + F.col("sy2"))).cast("long").alias("num")
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        bad.collect()


def test_rog_translation_invariance(spark):
    """Anchored ≡ unanchored on small data (the driver-oracle argument)."""
    from ult_spark.querydefs import rog_from_points

    rows = [(u, (u * 37 + i * 911) % 4001 - 2000, (u + i * 577) % 3001 - 1500)
            for u in range(1, 6) for i in range(u * 7)]
    df = spark.createDataFrame(rows, "user_id long, x long, y long")
    got = {r["user_id"]: r for r in rog_from_points(df).collect()}
    for u in range(1, 6):
        n, num, rog = _expected([(x, y) for uu, x, y in rows if uu == u])
        r = got[u]
        assert (r["n"], r["rog2_num"], r["rog_e3"]) == (n, num, rog)


def test_rog_plan_broadcasts_anchors(spark):
    from ult_spark.querydefs import rog_from_points

    _, df = _planted(spark, n=100)
    plan = rog_from_points(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
