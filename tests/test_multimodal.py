"""Multimodal plumbing: the v2 feature kernel (round-2 verdict #6) — native
JVM digest + pure-vectorized numpy encode, values pinned against an
all-native Spark twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from ult_spark.ops.multimodal import extract_features, frame_sample, synth_assets


def test_features_v2_match_native_twin(spark, sf_smoke):
    assets = synth_assets(spark, sf_smoke)
    got = {
        r.asset_id: (r.f0, r.f1, r.f2, r.f3)
        for r in extract_features(assets, dim=4).collect()
    }
    # the same formula as a 100%-native Column program: dim j is hex slice
    # [8j, 8j+8) of ONE md5 of the payload
    native = assets.select(
        "asset_id",
        *[
            F.conv(F.substring(F.md5("payload"), 8 * j + 1, 8), 16, 10)
            .cast("long")
            .alias(f"f{j}")
            for j in range(4)
        ],
    )
    exp = {r.asset_id: (r.f0, r.f1, r.f2, r.f3) for r in native.collect()}
    assert got == exp and len(got) > 0


def test_features_digest_runs_in_jvm(spark, sf_smoke):
    # the expensive byte crunch (md5 of the payload) must sit in a native
    # Project BELOW the Python encoder stage, not inside it
    df = extract_features(synth_assets(spark, sf_smoke), dim=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "md5" in plan  # JVM-side digest
    assert plan.index("md5") > plan.index("MapInPandas")  # below the kernel


def test_frame_sample_metadata_only(spark, sf_smoke):
    frames = frame_sample(synth_assets(spark, sf_smoke), every_ms=60000)
    rows = frames.groupBy("asset_id").count().collect()
    assert len(rows) > 0
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
