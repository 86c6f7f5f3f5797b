"""Round-8 optimization internals.

The oracle contract already certifies every optimized query value-exactly;
these tests pin the NEW internal contracts the r8 rewrites rely on, so a
future refactor can't silently break them:

- ``io.testdata.fanout`` is a no-op on sufficiently-parallel inputs and
  row-preserving when it does repartition (scale-adaptivity is the whole
  point — a cluster-scale scan must NOT pay the extra exchange);
- ``countmin_estimates``'s pre-aggregated sketch (sum of per-key counts)
  equals the sketch built directly from raw rows (counter addition is
  associative — the algebraic identity the rewrite rests on);
- ``gopher_repetition``'s single-pass combined gram aggregate matches the
  old two-pipeline formulation on edge-case docs (no grams / only 2-grams
  / repeated grams).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fanout_noop_on_parallel_input(spark):
    from ult_spark.io.testdata import fanout

    df = spark.range(1000).repartition(200)
    out = fanout(df, factor=2)
    # already >= 2x parallelism: plan object returned unchanged
    assert out is df


def test_fanout_repartitions_small_scan_and_preserves_rows(spark):
    from ult_spark.io.testdata import fanout

    df = spark.range(100).coalesce(1)
    out = fanout(df, factor=2)
    assert out is not df
    assert out.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_countmin_preagg_sketch_equals_direct_sketch(spark):
    """est values from the per-key pre-aggregated sketch must equal the
    direct row-level sketch (the r8 rewrite's algebraic identity)."""
    from ult_spark.ops.sketch import DEFAULT_D, DEFAULT_W, countmin_estimates, countmin_sketch

    rows = [(i % 7,) for i in range(500)] + [(99,)] * 40
    df = spark.createDataFrame(rows, "user_id int")
    est = {
        r["key"]: (r["exact"], r["est"])
        for r in countmin_estimates(df, "user_id", top=8).collect()
    }
    sk = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in countmin_sketch(df, "user_id", DEFAULT_D, DEFAULT_W).collect()
    }
    from ult_spark.ops.sketch import _lane

    probe = spark.createDataFrame([(k,) for k in est], "key string").select(
        "key", *[_lane(F.col("key"), i, DEFAULT_W).alias(f"b{i}") for i in range(DEFAULT_D)]
    )
    for r in probe.collect():
        direct = min(sk.get((i, r[f"b{i}"]), 0) for i in range(DEFAULT_D))
        assert est[r["key"]][1] == direct, r["key"]
    # count-min invariant: est >= exact
    assert all(e >= x for x, e in est.values())


def test_gopher_single_pass_edge_cases(spark):
    from ult_spark.ops.curation import gopher_repetition

    rows = [
        # (an n_tok = 0 doc is outside the operator's domain — the pinned
        # frac expression divides by n_tok in BOTH engines, unchanged here)
        (1, "one"),                    # 1 token: no grams
        (2, "a b"),                    # 2-grams only, no 3-grams
        (3, "a a a a"),                # heavy repetition, both families
        (4, "w x y z w x y z"),        # repeated 2- and 3-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    # doc 1: no grams -> zeros, kept
    assert (got[1]["top2_cnt"], got[1]["dup3_frac_e4"], got[1]["keep"]) == (0, 0, 1)
    # doc 2: one 2-gram 'a b' (count 1), no 3-grams
    assert got[2]["top2_cnt"] == 1 and got[2]["dup3_frac_e4"] == 0
    # doc 3: 'a a' occurs 3x of 4 tokens -> top2 covers min(2*3,4)=4 of 4
    assert got[3]["top2_cnt"] == 3
    assert got[3]["top2_frac_e4"] == 10000 and got[3]["keep"] == 0
    # doc 3: both 3-grams are 'a a a' (count 2 > 1) -> all dup
    assert got[3]["dup3_frac_e4"] == 10000
    # doc 4: every 2-gram distinct except repeats across halves
    assert got[4]["top2_cnt"] == 2  # e.g. 'w x' twice
