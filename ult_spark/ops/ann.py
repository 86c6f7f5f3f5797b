"""Similarity search over embedding columns (task brief: ANN first-class).

Three paths:

- ``cosine_topk`` — exact brute-force baseline: per query, rank all vectors
  by cosine similarity. Native higher-order functions (zip_with + aggregate);
  the fold is left-to-right in both Spark and DuckDB, but to keep the
  cross-engine hash compare airtight the public queries emit integer-
  quantized similarity (floor(sim * 1e6)) and ranks.

- ``lsh_bands`` / ``ann_lsh_topk`` — the scale path: BANDED random-
  hyperplane LSH over integer-quantized vectors (round-1 verdict #3: a
  single 8-plane signature gives a constant 256 buckets, which does not
  partition a 100 TB corpus; the banded scheme mirrors the MinHash banding
  in ops/textops.py). ``B`` bands × ``R`` planes per band: each vector gets
  B bucket keys; candidates share at least one (band, bucket). Recall is
  1-(1-p^R)^B per pair (p = 1 - θ/π); bucket width shrinks as 2^-R, so at
  scale R is THE knob: size R ≈ log2(N / target_bucket_width) and raise B
  to recover recall. Hyperplane weights derive from a pinned integer
  formula, and dot products are INTEGER sums (order-free, exactly
  reproducible in any engine / any partitioning — no float sign flips).

- ``oversized_buckets`` + the ``max_bucket`` knob — even banded LSH can be
  handed a degenerate corpus (all-identical vectors). ``max_bucket`` drops
  (band, bucket) groups wider than the cap BEFORE the candidate self-join,
  bounding the join to O(Σ bucket²) ≤ O(n_buckets × cap²);
  ``oversized_buckets`` returns exactly what was (or would be) dropped so
  callers can count/log it instead of silently joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BANDS = 4
N_PLANES = 8  # per band → 2^8 buckets per band at test scale; raise with N
Q = 1000  # embedding quantization for the integer LSH dot product
DIM = 64

# Default bucket-width cap (round-2 verdict #2: the bounded plan existed but
# was opt-in). Conservative by design: with R sized to the corpus
# (R ≈ log2(N / target_bucket_width)), expected bucket width is tens-to-
# hundreds, so 1024 never engages on a healthy distribution (measured max
# 119 at sf0.1) — it only truncates degenerate mass-duplicate clusters,
# which would otherwise make the bucket self-join quadratic in cluster
# size. Callers who cap MUST check :func:`oversized_buckets` for what was
# dropped; pass ``max_bucket=None`` to disable.
DEFAULT_MAX_BUCKET = 1024


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


def lsh_bands(
    df: DataFrame,
    vid: str = "vec_id",
    n_bands: int = N_BANDS,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """(vid, band, bucket) — one row per band; bucket is the sign pattern of
    the band's ``n_planes`` integer hyperplane dots (plane index is global:
    band*n_planes + i, so band 0 reproduces the round-1 single-signature
    buckets).

    The dot is an integer sum over posexploded components — exact under any
    aggregation order, so the bucket id is fully deterministic. One shuffle:
    all bands' dots are aggregate expressions of a single groupBy.
    """
    # r8: fan the one-split bench scan out — the posexplode + 32-sum
    # partial aggregation otherwise runs on one core (io.testdata.fanout;
    # no-op on multi-split inputs)
    from ult_spark.io.testdata import fanout

    q = fanout(df).select(F.col(vid), F.posexplode(_quantized()).alias("d", "v"))
    aggs = []
    for b in range(n_bands):
        for i in range(n_planes):
            j = b * n_planes + i
            wgt = (F.lit(j * 64) + F.col("d")) * F.lit(2654435761) % F.lit(2001) - F.lit(1000)
            aggs.append(F.sum(F.col("v") * wgt).alias(f"dot{j}"))
    dots = q.groupBy(vid).agg(*aggs)
    bands = []
    for b in range(n_bands):
        bucket = F.lit(0).cast("long")
        for i in range(n_planes):
            j = b * n_planes + i
            bucket = bucket + F.when(
                F.col(f"dot{j}") > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        bands.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    return dots.select(
        vid, F.explode(F.array(*bands)).alias("_bb")
    ).select(vid, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def lsh_bands_sql(
    table: str = "embeddings",
    vid: str = "vec_id",
    n_bands: int = N_BANDS,
    n_planes: int = N_PLANES,
) -> str:
    """DuckDB mirror of :func:`lsh_bands` (same planes, bands, buckets)."""
    total = n_bands * n_planes
    dots = ", ".join(
        f"sum(v * ({_plane_weight_sql(str(j), 'd')})) AS dot{j}" for j in range(total)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT {vid}, {b} AS band, CAST("
        + " + ".join(
            f"(CASE WHEN dot{b * n_planes + i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)"
            for i in range(n_planes)
        )
        + " AS BIGINT) AS bucket FROM dots"
        for b in range(n_bands)
    )
    return (
        f"WITH exploded AS (SELECT {vid}, d.i - 1 AS d, "
        f"CAST(floor(embedding[d.i]::DOUBLE * {Q}) AS BIGINT) AS v "
        f"FROM {table}, generate_series(1, {DIM}) d(i)), "
        f"dots AS (SELECT {vid}, {dots} FROM exploded GROUP BY 1) "
        f"{band_rows}"
    )


def embedding_vectors(df: DataFrame, vid: str = "vec_id") -> DataFrame:
    """(vid, v array<double>) — the verify-side vector frame."""
    return df.select(F.col(vid), _vec_double().alias("v"))


def cosine_pairs_from_vectors(
    vectors: DataFrame, cand: DataFrame, min_sim_e6: int = 200000
) -> DataFrame:
    """Exact floored-cosine verify of candidate (a, b) pairs against
    ``vectors`` from :func:`embedding_vectors` — the shared kernel behind
    the batch ``embedding_near_dup`` query and the streaming increment
    (streaming/stream_embedding_pairs), so the two stay bit-identical."""
    # r8 perf: each side's squared norm is a per-VECTOR quantity — computed
    # once on the |vectors| build side (same left-fold expression, so the
    # double is bit-identical) instead of once per candidate pair; the pair
    # stage then evaluates only the dot (−29% fold work measured at 13.6M
    # candidate pairs, sf1.0).
    va = vectors.select(
        F.col("vec_id").alias("a"), F.col("v").alias("va"),
        _norm_sq(F.col("v")).alias("_nsa"),
    )
    vb = vectors.select(
        F.col("vec_id").alias("b"), F.col("v").alias("vb"),
        _norm_sq(F.col("v")).alias("_nsb"),
    )
    sim_e6 = F.floor(
        _dot(F.col("va"), F.col("vb"))
        / F.sqrt(F.col("_nsa") * F.col("_nsb"))
        * 1000000
    ).cast("long")
    return (
        cand.join(va, "a").join(vb, "b")
        .withColumn("sim_e6", sim_e6)
        .where(F.col("sim_e6") >= min_sim_e6)
        .select("a", "b", "sim_e6")
    )


def near_dup_pairs(
    emb: DataFrame,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    min_sim_e6: int = 200000,
) -> DataFrame:
    """Banded-LSH candidate pairs (a < b sharing any (band, bucket)),
    deduped BEFORE the vector join, then exact floored-cosine threshold —
    the full batch near-dup kernel (see querydefs.embedding_near_dup for
    the scale rationale; callers who cap must run oversized_buckets)."""
    bands = prune_buckets(lsh_bands(emb), max_bucket)
    # r8 perf (measured at sf1.0, guide §2.5 + CLAUDE.md r2 AQE lesson at
    # join scale): the bucket self-join EXPLODES — a few MB of (vid, band,
    # bucket) rows in, 16M candidate rows out — and AQE, which only sees
    # the input bytes, coalesced the join stage onto 1-2 tasks; the
    # explosion plus the pair-distinct partial aggregation ran serially
    # (14 s of the 22 s wall). An explicit repartition by the JOIN KEY with
    # a pinned count replaces the join's own exchange (same key → no extra
    # shuffle) and pins the stage's parallelism. 1× parallelism measured
    # best at BOTH test scales (4× added per-task overhead); at cluster
    # scale the band table is large enough that this exchange was
    # mandatory anyway.
    n_part = emb.sparkSession.sparkContext.defaultParallelism
    bands = bands.repartition(n_part, "band", "bucket")
    l = bands.select(F.col("vec_id").alias("a"), "band", "bucket")
    r = bands.select(F.col("vec_id").alias("b"), "band", "bucket")
    cand = (
        l.join(r, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return cosine_pairs_from_vectors(embedding_vectors(emb), cand, min_sim_e6)


def oversized_buckets(bands: DataFrame, max_bucket: int) -> DataFrame:
    """(band, bucket, n) groups wider than ``max_bucket`` — what
    :func:`prune_buckets` drops. Count/log this; never silently join it."""
    return (
        bands.groupBy("band", "bucket")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
    )


def prune_buckets(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop rows in (band, bucket) groups wider than ``max_bucket`` so the
    candidate self-join is bounded by O(n_buckets × max_bucket²)."""
    if max_bucket is None:
        return bands
    n = F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    return bands.withColumn("_n", n).where(F.col("_n") <= max_bucket).drop("_n")


def ann_lsh_topk(
    data: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vid: str = "vec_id",
    n_bands: int = N_BANDS,
    n_planes: int = N_PLANES,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded-LSH ANN: candidates share ≥1 of the query's (band, bucket)
    keys; exact integer-quantized dot re-ranks the DISTINCT candidates.

    Re-rank metric (pinned, integer-exact): quantized dot product
    ``D = Σ floor(q_i * Q) * floor(d_i * Q)`` ranked descending with ties by
    candidate id — avoiding float re-association entirely.

    ``max_bucket`` (default :data:`DEFAULT_MAX_BUCKET`) prunes oversized
    (band, bucket) groups from the CANDIDATE side only — the query's own
    band keys are exempt (round-2 ADVICE #2: pruning them made a query
    inside an oversized bucket silently return < k rows). A capped query
    can still lose its bucket-MATES: callers must check
    :func:`oversized_buckets` for affected buckets instead of trusting the
    row count alone.
    """
    bands = lsh_bands(data, vid=vid, n_bands=n_bands, n_planes=n_planes)
    qb = bands.where(F.col(vid).isin(query_ids)).select(
        F.col(vid).alias("qid"), "band", "bucket"
    )
    cand_bands = prune_buckets(bands, max_bucket)
    from ult_spark.io.testdata import fanout

    cand = (
        F.broadcast(qb)
        .join(cand_bands, ["band", "bucket"], "inner")
        .where(F.col("qid") != F.col(vid))
        .select("qid", vid)
        .distinct()
    )
    vecs = fanout(data).select(F.col(vid), _quantized().alias("qv"))
    qvecs = vecs.where(F.col(vid).isin(query_ids)).select(
        F.col(vid).alias("qid"), F.col("qv").alias("qvec")
    )
    dot = F.aggregate(
        F.zip_with("qvec", "qv", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc(vid))
    return (
        cand.join(F.broadcast(qvecs), "qid").join(vecs, vid)
        .withColumn("qdot", dot)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", F.col(vid).alias("nid"), "qdot", F.col("rk").cast("long").alias("rk"))
    )


def _ivf_centroids(vecs: DataFrame, n_lists: int, vid: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject — a global row_number
    # window here would force a single-partition sort of the whole corpus
    return (
        vecs.orderBy(F.asc(vid)).limit(n_lists)
        .select(F.col(vid).alias("cid"), F.col("qv").alias("cv"))
    )


def ivf_assign(
    data: DataFrame, n_lists: int = 16, vid: str = "vec_id",
    cents: DataFrame | None = None,
) -> DataFrame:
    """(vid, list_id) IVF coarse assignment — the second scale path.

    Centroids are PINNED deterministically: the ``n_lists`` smallest vec_ids
    (no iterative k-means — the partitioning property, not centroid quality,
    is what the engine provides; callers can swap in trained centroids).
    Assignment = argmax integer-quantized dot (ties → smaller centroid id),
    exactly reproducible in DuckDB. Lists partition the corpus: candidate
    work per query is nprobe/n_lists of the data, the IVF analog of LSH
    bucket pruning.
    """
    from ult_spark.io.testdata import fanout

    # r8: fanout — the quantize + broadcast-crossJoin + interpreted dot
    # chain otherwise runs on the one-split scan's single task
    vecs = fanout(data).select(F.col(vid), _quantized().alias("qv"))
    if cents is None:
        cents = _ivf_centroids(vecs, n_lists, vid)
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    # argmax via max_by over struct(dot, -cid): map-side combinable (one
    # partially-aggregated shuffle of 1 row/vector), vs a window that would
    # shuffle all N x n_lists scored rows
    key = F.struct(F.col("_dot").alias("d"), (-F.col("cid")).alias("nc"))
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("_dot", dot)
        .groupBy(vid)
        .agg(F.max_by("cid", key).alias("list_id"))
    )


def ivf_train(
    data: DataFrame, n_lists: int = 16, rounds: int = 2, vid: str = "vec_id"
) -> DataFrame:
    """(cid, cv) centroids after ``rounds`` Lloyd iterations of integer
    k-means, seeded by the pinned smallest-id centroids (round-2 verdict #5:
    pinned centroids give sound partitioning but poor recall on clustered
    corpora).

    ONE LAZY PLAN (CLAUDE.md r2 kNN lesson): the Python loop only CHAINS
    DataFrames — no per-round driver action; nothing executes until the
    caller's plan runs. Each round is: broadcast-crossJoin assignment
    (argmax integer dot via max_by — map-side combinable), then an exact
    integer mean per (list, dim): floor(Σv / n) on 56-bit-safe sums, arrays
    rebuilt by dim-sorted collect_list. Every step is order-free integer
    arithmetic, so trained centroids are exactly reproducible in DuckDB.
    Lists that lose all members drop out (deterministic)."""
    from ult_spark.io.testdata import fanout

    # r8: fanout — per-round assignment work otherwise starts single-task
    vecs = fanout(data).select(F.col(vid), _quantized().alias("qv"))
    cents = _ivf_centroids(vecs, n_lists, vid)
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    key = F.struct(F.col("_dot").alias("d"), (-F.col("cid")).alias("nc"))
    for _ in range(rounds):
        assigned = (
            vecs.crossJoin(F.broadcast(cents))
            .withColumn("_dot", dot)
            .groupBy(vid)
            # qv is constant per vid — any_value avoids a second join back
            .agg(F.max_by("cid", key).alias("cid"), F.any_value("qv").alias("qv"))
        )
        sums = (
            assigned.select("cid", F.posexplode("qv").alias("d", "v"))
            .groupBy("cid", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        cents = (
            sums.withColumn(
                "m", F.floor(F.col("s").cast("double") / F.col("n")).cast("long")
            )
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select("cid", F.transform("dm", lambda x: x["m"]).alias("cv"))
        )
    return cents


def ann_ivf_topk(
    data: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    vid: str = "vec_id",
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat ANN: each query probes its ``nprobe`` nearest centroid lists;
    exact integer-quantized dot re-ranks the probed lists' members.
    ``cents``: swap in trained centroids (:func:`ivf_train`); default = the
    pinned smallest-id seeds."""
    from ult_spark.io.testdata import fanout

    vecs = fanout(data).select(F.col(vid), _quantized().alias("qv"))
    # ONE centroid derivation shared by probes and assignment (self-review
    # #5: two identical TakeOrderedAndProject scans of the corpus before)
    if cents is None:
        cents = _ivf_centroids(vecs, n_lists, vid)
    assigned = ivf_assign(data, n_lists, vid, cents=cents)
    qvecs = vecs.where(F.col(vid).isin(query_ids)).select(
        F.col(vid).alias("qid"), F.col("qv").alias("qvec")
    )
    qdot_c = F.aggregate(
        F.zip_with("qvec", "cv", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    w_probe = Window.partitionBy("qid").orderBy(F.desc("_cd"), F.asc("cid"))
    probes = (
        F.broadcast(qvecs).crossJoin(F.broadcast(cents))
        .withColumn("_cd", qdot_c)
        .withColumn("_pr", F.row_number().over(w_probe))
        .where(F.col("_pr") <= nprobe)
        .select("qid", F.col("cid").alias("list_id"))
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "list_id")
        .where(F.col("qid") != F.col(vid))
        .select("qid", vid)
    )
    dot = F.aggregate(
        F.zip_with("qvec", "qv", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc(vid))
    return (
        cand.join(F.broadcast(qvecs), "qid").join(vecs, vid)
        .withColumn("qdot", dot)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", F.col(vid).alias("nid"), "qdot", F.col("rk").cast("long").alias("rk"))
    )


def _ivf_train_ctes(n_lists: int, rounds: int) -> str:
    """CTE chain mirroring :func:`ivf_train`: cents0 = pinned seeds, then
    ``rounds`` Lloyd iterations; the final CTE is named ``cents``."""
    parts = [
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM qv ORDER BY vec_id LIMIT {n_lists})"
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        assign = (
            f"a{r} AS (SELECT vec_id, cid FROM ("
            "SELECT qv.vec_id, cid, row_number() OVER (PARTITION BY qv.vec_id ORDER BY "
            "list_sum(list_transform(list_zip(v, cv), p -> p[1] * p[2])) DESC, cid ASC) AS rk "
            f"FROM qv, {prev}) WHERE rk = 1)"
        )
        sums = (
            f"s{r} AS (SELECT cid, d.i AS d, CAST(sum(v[d.i]) AS BIGINT) AS s, count(*) AS n "
            f"FROM a{r} JOIN qv USING (vec_id), generate_series(1, {DIM}) d(i) GROUP BY 1, 2)"
        )
        cname = "cents" if r == rounds else f"c{r}"
        mean = (
            f"{cname} AS (SELECT cid, list(CAST(floor(s::DOUBLE / n) AS BIGINT) ORDER BY d) AS cv "
            f"FROM s{r} GROUP BY cid)"
        )
        parts.extend([assign, sums, mean])
        prev = cname
    if rounds == 0:
        parts[0] = parts[0].replace("c0 AS", "cents AS")
    return ", ".join(parts)


def ann_ivf_topk_sql(
    query_ids: list[int], k: int = 5, n_lists: int = 16, nprobe: int = 4,
    rounds: int = 0,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return (
        f"WITH qv AS (SELECT vec_id, [CAST(floor(x::DOUBLE * {Q}) AS BIGINT) for x in embedding] AS v "
        "FROM embeddings), "
        f"{_ivf_train_ctes(n_lists, rounds)}, "
        "assign AS (SELECT vec_id, cid AS list_id FROM ("
        "SELECT qv.vec_id, cents.cid, row_number() OVER (PARTITION BY qv.vec_id ORDER BY "
        "list_sum(list_transform(list_zip(v, cv), p -> p[1] * p[2])) DESC, cid ASC) AS rk "
        "FROM qv, cents) WHERE rk = 1), "
        f"qs AS (SELECT vec_id AS qid, v AS qvec FROM qv WHERE vec_id IN ({ids})), "
        "probes AS (SELECT qid, cid AS list_id FROM ("
        "SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY "
        "list_sum(list_transform(list_zip(qvec, cv), p -> p[1] * p[2])) DESC, cid ASC) AS pr "
        f"FROM qs, cents) WHERE pr <= {nprobe}), "
        "cand AS (SELECT qid, vec_id FROM probes JOIN assign USING (list_id) WHERE qid != vec_id), "
        "scored AS (SELECT cand.qid, cand.vec_id AS nid, "
        "list_sum(list_transform(list_zip(qs.qvec, qv.v), p -> p[1] * p[2])) AS qdot "
        "FROM cand JOIN qs ON cand.qid = qs.qid JOIN qv ON qv.vec_id = cand.vec_id) "
        "SELECT qid, nid, CAST(qdot AS BIGINT) AS qdot, rk FROM ("
        "SELECT qid, nid, qdot, CAST(row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, nid ASC) AS BIGINT) AS rk "
        f"FROM scored) WHERE rk <= {k}"
    )


def ann_lsh_topk_sql(
    query_ids: list[int],
    k: int = 5,
    n_bands: int = N_BANDS,
    n_planes: int = N_PLANES,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    # mirror of prune_buckets: drop oversized (band, bucket) groups from the
    # candidate side only (query rows in qb come from the unpruned bands)
    cap = (
        "b"
        if max_bucket is None
        else (
            "(SELECT vec_id, band, bucket FROM b QUALIFY "
            f"count(*) OVER (PARTITION BY band, bucket) <= {max_bucket})"
        )
    )
    return (
        f"WITH b AS ({lsh_bands_sql(n_bands=n_bands, n_planes=n_planes)}), "
        f"bp AS (SELECT * FROM {cap}), "
        f"qb AS (SELECT vec_id AS qid, band, bucket FROM b WHERE vec_id IN ({ids})), "
        "cand AS (SELECT DISTINCT qid, bp.vec_id AS nid FROM qb "
        "JOIN bp USING (band, bucket) WHERE qid != bp.vec_id), "
        f"qv AS (SELECT vec_id, [CAST(floor(x::DOUBLE * {Q}) AS BIGINT) for x in embedding] AS v "
        "FROM embeddings), "
        f"qs AS (SELECT vec_id AS qid, v AS qvec FROM qv WHERE vec_id IN ({ids})), "
        "scored AS (SELECT cand.qid, nid, "
        "list_sum(list_transform(list_zip(qvec, v), p -> p[1] * p[2])) AS qdot "
        "FROM cand JOIN qs ON cand.qid = qs.qid JOIN qv ON qv.vec_id = cand.nid) "
        "SELECT qid, nid, CAST(qdot AS BIGINT) AS qdot, rk FROM ("
        "SELECT qid, nid, qdot, CAST(row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, nid ASC) AS BIGINT) AS rk "
        f"FROM scored) WHERE rk <= {k}"
    )


# ---------------------------------------------------------------------------
# r7: int8 symmetric quantization with a recall audit against exact cosine


def _int8(col: str = "embedding"):
    """Per-vector symmetric int8: q_i = floor(127·v_i / max|v|) ∈
    [−127, 127] — ONE shared float division per component (identical
    IEEE expression in the SQL twin), integers after. try_divide keeps
    the all-zero vector NULL instead of tripping ANSI mode; real
    corpora don't emit it (min max-abs 0.23 on the driver table)."""
    s = F.array_max(F.transform(F.col(col), lambda x: F.abs(x.cast("double"))))
    return F.transform(
        F.col(col),
        lambda x: F.floor(F.try_divide(F.lit(127.0) * x.cast("double"), s)).cast("long"),
    )


def ann_int8_recall(
    emb: DataFrame, query_ids: list, k: int = 10, vid: str = "vec_id"
) -> DataFrame:
    """(qid, n_common, recall_e6): top-``k`` by cosine over per-vector
    symmetric int8-quantized components vs top-``k`` by exact float
    cosine — the 4×-memory-compression damage report every
    embedding-serving stack wants before flipping the switch. The int8
    side's dot and norms are EXACT BIGINTs (components ∈ [−127, 127],
    dim 64 → |dot| ≤ 64·127² ≪ 2⁶³) with one float sqrt-divide for the
    ranking; ties pinned by id. Both top-ks are broadcast-query scans
    of the data side (the cosine_topk plan); recall joins the two
    k-sets on (qid, id). Scale: 2 scans, no pairwise blowup beyond the
    brute-force baseline being audited."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    data_f = emb.where(~F.col(vid).isin(query_ids)).select(vid, vec.alias("dvec"))
    qs_f = emb.where(F.col(vid).isin(query_ids)).select(
        F.col(vid).alias("qid"), vec.alias("qvec")
    )
    topf = cosine_topk(qs_f, data_f, k=k).select("qid", vid)
    q8 = _int8()
    data_q = emb.where(~F.col(vid).isin(query_ids)).select(vid, q8.alias("dvec"))
    qs_q = emb.where(F.col(vid).isin(query_ids)).select(
        F.col(vid).alias("qid"), q8.alias("qvec")
    )
    dot = F.aggregate(
        F.zip_with("qvec", "dvec", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    nsq = lambda c: F.aggregate(  # noqa: E731
        F.col(c), F.lit(0).cast("long"), lambda a, v: a + v * v
    )
    simq = dot.cast("double") / F.sqrt((nsq("qvec") * nsq("dvec")).cast("double"))
    w = Window.partitionBy("qid").orderBy(F.desc("simq"), F.asc(vid))
    topq = (
        F.broadcast(qs_q).crossJoin(data_q)
        .withColumn("simq", simq)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", vid)
    )
    # LEFT join + flag: a query whose k-sets are fully disjoint must
    # report recall 0, not silently vanish (inner-join-then-groupBy
    # drops the empty group — caught by the planted sub-step test)
    return (
        topq.join(topf.withColumn("_hit", F.lit(1)), ["qid", vid], "left")
        .groupBy("qid")
        .agg(
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_common")
        )
        .select(
            "qid",
            "n_common",
            F.floor(F.lit(1000000.0) * F.col("n_common") / F.lit(float(k)))
            .cast("long")
            .alias("recall_e6"),
        )
    )


def ann_int8_recall_sql(query_ids: list, k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return (
        "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings), "
        "q8 AS (SELECT vec_id, list_transform(vec, x -> CAST(floor("
        "127.0::DOUBLE * x / list_max(list_transform(vec, y -> abs(y)))) "
        "AS BIGINT)) AS qv FROM v), "
        f"qsf AS (SELECT vec_id AS qid, vec AS qvec FROM v WHERE vec_id IN ({ids})), "
        f"simsf AS (SELECT qid, vec_id, "
        "list_sum(list_transform(list_zip(qvec, vec), p -> p[1] * p[2])) / "
        "sqrt(list_sum(list_transform(qvec, x -> x * x)) * "
        "list_sum(list_transform(vec, x -> x * x))) AS sim "
        f"FROM qsf, v WHERE vec_id NOT IN ({ids})), "
        "topf AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, "
        "row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rk "
        f"FROM simsf) WHERE rk <= {k}), "
        f"qsq AS (SELECT vec_id AS qid, qv AS qvec FROM q8 WHERE vec_id IN ({ids})), "
        "simsq AS (SELECT qid, q8.vec_id, "
        "CAST(list_sum(list_transform(list_zip(qvec, qv), p -> p[1] * p[2])) AS DOUBLE) / "
        "sqrt(CAST(list_sum(list_transform(qvec, x -> x * x)) * "
        "list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS simq "
        f"FROM qsq, q8 WHERE q8.vec_id NOT IN ({ids})), "
        "topq AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, "
        "row_number() OVER (PARTITION BY qid ORDER BY simq DESC, vec_id ASC) AS rk "
        f"FROM simsq) WHERE rk <= {k}) "
        "SELECT tq.qid, CAST(coalesce(sum(CASE WHEN tf.vec_id IS NULL "
        "THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_common, "
        "CAST(floor(1000000.0::DOUBLE * coalesce(sum(CASE WHEN tf.vec_id IS NULL "
        f"THEN 0 ELSE 1 END), 0) / {float(k)}) AS BIGINT) AS recall_e6 "
        "FROM topq tq LEFT JOIN topf tf ON tf.qid = tq.qid AND tf.vec_id = tq.vec_id "
        "GROUP BY 1"
    )
