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


def _brute_knn_metric(qpts, data, k, dist_fn):
    exp = []
    for qid, qlat, qlon in qpts:
        d = dist_fn(qlat, qlon, data["lat"].to_numpy(), data["lon"].to_numpy())
        order = np.lexsort((data["id"].to_numpy(), d))[:k]
        exp += [(qid, int(data["id"].iloc[i]), r + 1) for r, i in enumerate(order)]
    return set(exp)


def _wrap_sq(qlat, qlon, lat, lon):
    dla = qlat - lat
    dab = np.abs(qlon - lon)
    dlo = np.minimum(dab, 360.0 - dab)
    return dla * dla + dlo * dlo


def _hav_m(qlat, qlon, lat, lon):
    r1, r2 = np.radians(qlat), np.radians(lat)
    dla, dlo = np.radians(lat - qlat) / 2, np.radians(lon - qlon) / 2
    a = np.sin(dla) ** 2 + np.cos(r1) * np.cos(r2) * np.sin(dlo) ** 2
    return 2.0 * 6371008.8 * np.arcsin(np.sqrt(a))


def test_knn_wrapped_metric_crosses_antimeridian(spark):
    """Round-1 verdict missing #1: queries at lon ±179.9 must find their
    cross-seam neighbors. Seed near-seam clusters on BOTH sides."""
    rng = np.random.default_rng(7)
    n = 3000
    lat = rng.uniform(-60, 60, n)
    lon = np.where(rng.random(n) < 0.5, 179.0 + rng.random(n), -180.0 + rng.random(n))
    # plus background points elsewhere
    lat2 = rng.uniform(-60, 60, n)
    lon2 = rng.uniform(-170, 170, n)
    pdf = pd.DataFrame(
        {
            "id": np.arange(2 * n, dtype=np.int64),
            "lat": np.concatenate([lat, lat2]),
            "lon": np.concatenate([lon, lon2]),
        }
    )
    data = spark.createDataFrame(pdf)
    qpts = [(1, 10.0, 179.9), (2, -30.0, -179.9), (3, 0.0, 179.99)]
    qdf = spark.createDataFrame(qpts, "qid long, qlat double, qlon double")
    got = {
        (r.qid, r.id, r.rk)
        for r in knn_join(qdf, data, k=6, metric="sq_deg_wrap", start_radius=1).collect()
    }
    exp = _brute_knn_metric(qpts, pdf, 6, _wrap_sq)
    assert got == exp
    # sanity: at least one winner sits on the OTHER side of the seam
    winners = {i for (_, i, _) in got}
    signs = {np.sign(pdf["lon"].iloc[i]) for i in winners}
    assert len(signs) == 2


def test_knn_haversine_matches_bruteforce(spark, sf_smoke):
    pts = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select(
            F.col("event_id").alias("id"),
            UF.event_lat().alias("lat"),
            UF.event_lon().alias("lon"),
        )
    )
    # high-latitude query: nearest-by-meters != nearest-by-degrees there
    qpts = [(1, 75.0, 10.0), (2, -20.0, -30.0), (3, 0.0, 179.9)]
    qdf = spark.createDataFrame(qpts, "qid long, qlat double, qlon double")
    got = {
        (r.qid, r.id, r.rk)
        for r in knn_join(qdf, pts, k=5, metric="haversine_m").collect()
    }
    exp = _brute_knn_metric(qpts, pts.toPandas(), 5, _hav_m)
    assert got == exp


def test_knn_many_queries(spark, sf_smoke):
    """2000 query points in one pass — the lazy plan's round/fallback
    machinery must stay exact when the query side is large."""
    pts = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select(
            F.col("event_id").alias("id"),
            UF.event_lat().alias("lat"),
            UF.event_lon().alias("lon"),
        )
    )
    rng = np.random.default_rng(23)
    qpts = [
        (int(i), float(la), float(lo))
        for i, (la, lo) in enumerate(
            zip(rng.uniform(-88, 88, 2000), rng.uniform(-180, 180, 2000))
        )
    ]
    qdf = spark.createDataFrame(qpts, "qid long, qlat double, qlon double")
    got = {
        (r.qid, r.id, r.rk) for r in knn_join(qdf, pts, k=3).collect()
    }
    exp = _brute_knn(qpts, pts.toPandas(), 3)
    assert got == exp


def test_knn_exact_without_aqe(spark):
    """AQE's empty-relation pruning is an OPTIMIZATION of the lazy plan;
    with AQE off the inactive rounds execute and the result must be
    byte-identical."""
    data = spark.createDataFrame(
        [(i, float(i % 37) - 18.0, float(i % 53) * 3.0 - 78.0) for i in range(500)],
        "id long, lat double, lon double",
    )
    qdf = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 15.0, 40.0)], "qid long, qlat double, qlon double"
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        off = {(r.qid, r.id, r.rk) for r in knn_join(qdf, data, k=4).collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    on = {(r.qid, r.id, r.rk) for r in knn_join(qdf, data, k=4).collect()}
    assert off == on and len(on) == 8


def test_knn_haversine_near_pole_exact(spark):
    """Regression (round-2 self-review #1): near the pole, tiny great-circle
    distances span many longitude columns; the lon completeness bound must
    vanish there so the query is NOT marked done while a closer
    cross-longitude neighbor sits outside the disk."""
    rng = np.random.default_rng(31)
    n = 1500
    lat = np.concatenate([89.99 + rng.random(n // 2) * 0.009, rng.uniform(-60, 60, n // 2)])
    lon = rng.uniform(-180, 180, n)
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon})
    data = spark.createDataFrame(pdf)
    qpts = [(1, 89.9995, 0.0), (2, 89.995, 120.0), (3, -89.999, -60.0)]
    qdf = spark.createDataFrame(qpts, "qid long, qlat double, qlon double")
    got = {
        (r.qid, r.id, r.rk)
        for r in knn_join(qdf, data, k=4, metric="haversine_m", start_radius=1).collect()
    }
    exp = _brute_knn_metric(qpts, pdf, 4, _hav_m)
    assert got == exp


def test_knn_source_has_no_driver_collect():
    """Round-1 verdict #2: the per-round completion decision must be fully
    distributed — no .collect()/.take() of per-query rows in ops/knn.py."""
    import inspect

    import ult_spark.ops.knn as K

    src = inspect.getsource(K)
    assert ".collect()" not in src and ".take(" not in src and ".toPandas()" not in src


def test_knn_fewer_than_k(spark):
    data = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 11.0, 11.0), (3, -50.0, 120.0)], "id long, lat double, lon double"
    )
    qdf = spark.createDataFrame([(1, 10.5, 10.5)], "qid long, qlat double, qlon double")
    rows = knn_join(qdf, data, k=10).collect()
    assert len(rows) == 3  # only 3 points exist; all returned, ranked
    assert sorted(r.rk for r in rows) == [1, 2, 3]


def test_distance_join_m_matches_bruteforce(spark):
    """Geodesic distance join: cross-seam pairs and a high-latitude cluster
    (where lon-degrees shrink and the x-radius must widen)."""
    from ult_spark.ops.knn import distance_join_m

    rng = np.random.default_rng(11)
    n = 800
    lat = np.concatenate([rng.uniform(60, 80, n // 2), rng.uniform(-20, 20, n // 2)])
    lon = np.where(rng.random(n) < 0.3, 179.0 + rng.random(n) * 2 - 1, rng.uniform(-170, 170, n))
    lon = np.where(lon > 180.0, lon - 360.0, lon)
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon})
    df = spark.createDataFrame(pdf)
    left = df.select(F.col("id").alias("lid"), F.col("lat").alias("llat"), F.col("lon").alias("llon"))
    right = df.select(F.col("id").alias("rid"), F.col("lat").alias("rlat"), F.col("lon").alias("rlon"))
    r_m = 400_000.0
    got = {
        (r.lid, r.rid)
        for r in distance_join_m(left, right, r_m).where(F.col("lid") < F.col("rid")).collect()
    }
    d = _hav_m(pdf["lat"].to_numpy()[:, None], pdf["lon"].to_numpy()[:, None],
               pdf["lat"].to_numpy()[None, :], pdf["lon"].to_numpy()[None, :])
    ii, jj = np.where(d <= r_m)
    exp = {(int(i), int(j)) for i, j in zip(ii, jj) if i < j}
    assert got == exp and len(got) > 0


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
