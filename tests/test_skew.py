"""Hot-cell skew handling (SURVEY §2.5 A2; BASELINE.json "explicit salting
for hot-cell skew"): the two-stage salted aggregate must (a) equal the
unsalted result exactly and (b) bound the rows any single reduce key sees in
stage 2 to the salt fan-in, even under adversarial skew."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ult_spark import functions as UF
from ult_spark.ops.tiles import tile_agg


def _skewed_points(spark, n=40000):
    rng = np.random.default_rng(99)
    # 85% of points in ONE megacity cell, the rest uniform
    hot = int(n * 0.85)
    lat = np.concatenate([40.7 + rng.uniform(-0.001, 0.001, hot), rng.uniform(-60, 60, n - hot)])
    lon = np.concatenate([-74.0 + rng.uniform(-0.001, 0.001, hot), rng.uniform(-170, 170, n - hot)])
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon,
                        "v": rng.integers(0, 1000, n)})
    return spark.createDataFrame(pdf)


def test_salted_equals_unsalted_under_skew(spark):
    pts = _skewed_points(spark).withColumn("cell", UF.latlon_to_cell("lat", "lon", 10))
    plain = {
        (r.cell, r.cnt, r.sum_val)
        for r in tile_agg(pts, value="v").collect()
    }
    salted = {
        (r.cell, r.cnt, r.sum_val)
        for r in tile_agg(pts, value="v", salt_by="id", salt_buckets=32).collect()
    }
    assert plain == salted
    # the hot cell exists and dominates
    top = max(plain, key=lambda t: t[1])
    assert top[1] >= 0.8 * 40000


def test_salt_bounds_stage2_fanin(spark):
    """Stage 1 emits at most salt_buckets rows per cell — the merge shuffle
    never sees a hot key with more than that many rows."""
    pts = _skewed_points(spark).withColumn("cell", UF.latlon_to_cell("lat", "lon", 10))
    salt = F.pmod(F.xxhash64(F.col("id")), F.lit(16)).alias("_salt")
    stage1 = pts.groupBy("cell", salt).agg(F.count("*").alias("c"))
    per_cell = stage1.groupBy("cell").agg(F.count("*").alias("rows_into_merge"))
    assert per_cell.agg(F.max("rows_into_merge")).first()[0] <= 16
    # and the hot cell actually fans out across many salts
    hot_cell = pts.groupBy("cell").count().orderBy(F.desc("count")).first()["cell"]
    fanout = stage1.where(F.col("cell") == hot_cell).count()
    assert fanout == 16
