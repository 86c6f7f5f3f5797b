"""Similarity search over embedding columns (task brief: ANN first-class).

Two paths:

- ``cosine_topk`` — exact brute-force baseline: per query, rank all vectors
  by cosine similarity. Native higher-order functions (zip_with + aggregate);
  the fold is left-to-right in both Spark and DuckDB, but to keep the
  cross-engine hash compare airtight the public queries emit integer-
  quantized similarity (floor(sim * 1e6)) and ranks.

- ``lsh_buckets`` / ``ann_lsh_topk`` — the scale path: random-hyperplane LSH
  over integer-quantized vectors. Hyperplane weights derive from a pinned
  integer formula, and dot products are INTEGER sums (order-free, exactly
  reproducible in any engine / any partitioning — no float sign flips).
  Candidates share a bucket signature; exact cosine re-ranks candidates.

At scale: buckets partition the corpus, the candidate join is an equi-join
on the bucket key, and the exact re-rank touches only same-bucket rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
Q = 1000  # embedding quantization for the integer LSH dot product


def _vec_double(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm_sq(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def cosine_topk(
    queries: DataFrame, data: DataFrame, k: int = 10,
    qid: str = "qid", did: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity; ties broken by data id ascending.

    queries: (qid, qvec array<double>); data: (vec_id, dvec array<double>).
    """
    sim = _dot(F.col("qvec"), F.col("dvec")) / F.sqrt(_norm_sq(F.col("qvec")) * _norm_sq(F.col("dvec")))
    w = Window.partitionBy(qid).orderBy(F.desc("sim"), F.asc(did))
    return (
        F.broadcast(queries).crossJoin(data)
        .withColumn("sim", sim)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(qid, did, "sim", F.col("rk").cast("long").alias("rk"))
    )


def _plane_weight_sql(j: str, d: str) -> str:
    """Pinned pseudo-random hyperplane weight in [-1000, 1000] (integer)."""
    return f"((({j}) * 64 + ({d})) * 2654435761) % 2001 - 1000"


def _quantized(col: str = "embedding"):
    """floor(v * Q) as integer components (exact in both engines)."""
    return F.transform(F.col(col), lambda x: F.floor(x.cast("double") * Q).cast("long"))


def lsh_buckets(df: DataFrame, vid: str = "vec_id", dim: int = 64) -> DataFrame:
    """(vid, bucket) — sign pattern of N_PLANES integer hyperplane dots.

    The dot is an integer sum over posexploded components — exact under any
    aggregation order, so the bucket id is fully deterministic.
    """
    q = df.select(F.col(vid), F.posexplode(_quantized()).alias("d", "v"))
    aggs = []
    for j in range(N_PLANES):
        w = (F.lit(j * 64) + F.col("d")) * F.lit(2654435761) % F.lit(2001) - F.lit(1000)
        aggs.append(F.sum(F.col("v") * w).alias(f"dot{j}"))
    dots = q.groupBy(vid).agg(*aggs)
    bucket = F.lit(0).cast("long")
    for j in range(N_PLANES):
        bucket = bucket + F.when(F.col(f"dot{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return dots.select(vid, bucket.alias("bucket"))


def lsh_buckets_sql(table: str = "embeddings", vid: str = "vec_id") -> str:
    dots = ", ".join(
        f"sum(v * ({_plane_weight_sql(str(j), 'd')})) AS dot{j}" for j in range(N_PLANES)
    )
    val = " + ".join(f"(CASE WHEN dot{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)" for j in range(N_PLANES))
    return (
        f"SELECT {vid}, CAST({val} AS BIGINT) AS bucket FROM ("
        f"SELECT {vid}, {dots} FROM ("
        f"SELECT {vid}, d.i - 1 AS d, CAST(floor(embedding[d.i]::DOUBLE * {Q}) AS BIGINT) AS v "
        f"FROM {table}, generate_series(1, 64) d(i)) GROUP BY 1)"
    )


def ann_lsh_topk(
    data: DataFrame, query_ids: list[int], k: int = 5, vid: str = "vec_id"
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's bucket; exact integer-
    quantized cosine re-ranks them (sim_q = dot_q² sign-carried, see below).

    Re-rank metric (pinned, integer-exact): quantized dot product
    ``D = Σ floor(q_i * Q) * floor(d_i * Q)`` ranked descending with ties by
    candidate id — avoiding float re-association entirely.
    """
    b = lsh_buckets(data, vid=vid)
    vecs = data.select(F.col(vid), _quantized().alias("qv"))
    withb = vecs.join(b, vid)
    qside = withb.where(F.col(vid).isin(query_ids)).select(
        F.col(vid).alias("qid"), F.col("qv").alias("qvec"), F.col("bucket").alias("qb")
    )
    cand = F.broadcast(qside).join(withb, F.col("qb") == F.col("bucket"), "inner").where(
        F.col("qid") != F.col(vid)
    )
    dot = F.aggregate(
        F.zip_with("qvec", "qv", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc(vid))
    return (
        cand.withColumn("qdot", dot)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", F.col(vid).alias("nid"), "qdot", F.col("rk").cast("long").alias("rk"))
    )


def ann_lsh_topk_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return (
        f"WITH b AS ({lsh_buckets_sql()}), "
        "qv AS (SELECT vec_id, [CAST(floor(x::DOUBLE * 1000) AS BIGINT) for x in embedding] AS v "
        "FROM embeddings), "
        "wb AS (SELECT qv.vec_id, v, bucket FROM qv JOIN b USING (vec_id)), "
        f"qs AS (SELECT vec_id AS qid, v AS qvec, bucket AS qb FROM wb WHERE vec_id IN ({ids})), "
        "cand AS (SELECT qid, wb.vec_id AS nid, "
        "list_sum(list_transform(list_zip(qvec, v), p -> p[1] * p[2])) AS qdot "
        "FROM qs JOIN wb ON qb = bucket WHERE qid != wb.vec_id) "
        "SELECT qid, nid, CAST(qdot AS BIGINT) AS qdot, rk FROM ("
        "SELECT qid, nid, qdot, CAST(row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, nid ASC) AS BIGINT) AS rk "
        f"FROM cand) WHERE rk <= {k}"
    )
