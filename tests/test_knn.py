"""kNN / distance join vs brute force (SURVEY.md §5.5 kNN oracle)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.ops.knn import distance_join, knn_join


def _brute_knn(qpts, data, k):
    exp = []
    for qid, qlat, qlon in qpts:
        d = (qlat - data["lat"]) ** 2 + (qlon - data["lon"]) ** 2
        order = np.lexsort((data["id"].to_numpy(), d.to_numpy()))[:k]
        exp += [(qid, int(data["id"].iloc[i]), r + 1) for r, i in enumerate(order)]
    return set(exp)


def test_knn_matches_bruteforce(spark, sf_smoke):
    pts = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select(
            F.col("event_id").alias("id"),
            UF.event_lat().alias("lat"),
            UF.event_lon().alias("lon"),
        )
    )
    # includes a straggler query near the pole (sparse region → fallback path)
    qpts = [(1, 20.0, -100.0), (2, -20.0, -30.0), (3, 89.5, 179.5), (4, 0.0, 0.0)]
    qdf = spark.createDataFrame(qpts, "qid long, qlat double, qlon double")
    got = {
        (r.qid, r.id, r.rk)
        for r in knn_join(qdf, pts, k=7, start_radius=1).collect()
    }
    exp = _brute_knn(qpts, pts.toPandas(), 7)
    assert got == exp


def test_knn_fewer_than_k(spark):
    data = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 11.0, 11.0), (3, -50.0, 120.0)], "id long, lat double, lon double"
    )
    qdf = spark.createDataFrame([(1, 10.5, 10.5)], "qid long, qlat double, qlon double")
    rows = knn_join(qdf, data, k=10).collect()
    assert len(rows) == 3  # only 3 points exist; all returned, ranked
    assert sorted(r.rk for r in rows) == [1, 2, 3]


def test_distance_join_matches_bruteforce(spark, sf_smoke):
    pts = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select(
            F.col("event_id").alias("id"),
            UF.event_lat().alias("lat"),
            UF.event_lon().alias("lon"),
        )
        .limit(400)
    )
    pdf = pts.toPandas()
    left = pts.select(F.col("id").alias("lid"), F.col("lat").alias("llat"), F.col("lon").alias("llon"))
    right = pts.select(F.col("id").alias("rid"), F.col("lat").alias("rlat"), F.col("lon").alias("rlon"))
    got = {
        (r.lid, r.rid)
        for r in distance_join(left, right, radius_deg=2.0).where(F.col("lid") < F.col("rid")).collect()
    }
    la = pdf["lat"].to_numpy()[:, None] - pdf["lat"].to_numpy()[None, :]
    lo = pdf["lon"].to_numpy()[:, None] - pdf["lon"].to_numpy()[None, :]
    m = (la * la + lo * lo) <= 4.0
    ids = pdf["id"].to_numpy()
    exp = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(*np.where(m))
        if ids[i] < ids[j]
    }
    assert got == exp
