"""Bucketed co-located joins (r6 io/bucketing.py): the one-time write
shuffle buys exchange-free joins and aggs on the bucket key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ult_spark.io.bucketing import assert_colocated, bucket_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("v")
    )
    labels = spark.range(0, 2000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("cluster")
    )
    write_bucketed(docs, "b_docs", "doc_id", 8, path=str(tmp_path / "b_docs"))
    write_bucketed(labels, "b_labels", "doc_id", 8, path=str(tmp_path / "b_labels"))
    yield "b_docs", "b_labels"
    for t in ("b_docs", "b_labels", "b_labels16"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_join_has_no_exchange_and_exact_rows(spark, bucketed_pair):
    l, r = bucketed_pair
    # force the merge-join path (a broadcast would hide the property)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucket_join(spark, l, r, "doc_id")
        assert_colocated(j)  # no Exchange on either side
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        got = sorted((r_.doc_id, r_.v, r_.cluster) for r_ in j.collect())
        assert len(got) == 1000
        assert got[0] == (0, 0, 0) and all(d % 2 == 0 for d, _, _ in got)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_skips_exchange(spark, bucketed_pair):
    l, _ = bucketed_pair
    agg = spark.table(l).groupBy("doc_id").agg(F.sum("v").alias("s"))
    assert_colocated(agg)
    assert agg.count() == 2000


def test_mismatched_bucket_counts_are_detected(spark, bucketed_pair, tmp_path):
    l, _ = bucketed_pair
    labels16 = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("cluster")
    )
    write_bucketed(labels16, "b_labels16", "doc_id", 16, path=str(tmp_path / "b16"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucket_join(spark, l, "b_labels16", "doc_id")
        with pytest.raises(AssertionError, match="Exchange"):
            assert_colocated(j)
        assert j.count() == 100  # still correct, just not co-located
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_dedup_layout_keep_best_is_colocated_and_exact(spark, tmp_path):
    """r7 (verdict #7): the dedup working set published as a bucketed
    layout — the downstream keep-best doc_id join must read committed
    tables with ZERO Exchange, and the decisions must be identical to
    the direct dup_keep_best computation."""
    from ult_spark.ops.textops import (
        dup_keep_best,
        keep_best_from_layout,
        publish_dedup_layout,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lt, qt = publish_dedup_layout(
            docs, "dedup_t", buckets=4, path=str(tmp_path / "dedup")
        )
        got = keep_best_from_layout(spark, "dedup_t")  # asserts colocation
        # the ONLY Exchange in the full plan is the cluster_id window
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1 and "cluster_id" in plan
        want = {
            r.doc_id: (r.cluster_id, r.canon_id, r.keep, r.reason)
            for r in dup_keep_best(docs).collect()
        }
        have = {
            r.doc_id: (r.cluster_id, r.canon_id, r.keep, r.reason)
            for r in got.collect()
        }
        assert have == want and len(have) == docs.count()
        # the split re-cut is row-local on the committed labels: zero
        # Exchange in the WHOLE plan, and identical to the direct op
        from ult_spark.ops.textops import cluster_safe_split, split_from_layout

        s = split_from_layout(spark, "dedup_t", val_e4=3000, test_e4=3000)
        assert "Exchange" not in s._jdf.queryExecution().executedPlan().toString()
        want_s = {
            r.doc_id: (r.cluster_id, r.bucket_e4, r.split)
            for r in cluster_safe_split(docs, val_e4=3000, test_e4=3000).collect()
        }
        have_s = {
            r.doc_id: (r.cluster_id, r.bucket_e4, r.split) for r in s.collect()
        }
        assert have_s == want_s
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("dedup_t_labels", "dedup_t_qual"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
