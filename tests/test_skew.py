"""Hot-cell skew handling (SURVEY §2.5 A2; BASELINE.json "explicit salting
for hot-cell skew"): the two-stage salted aggregate must (a) equal the
unsalted result exactly and (b) bound the rows any single reduce key sees in
stage 2 to the salt fan-in, even under adversarial skew."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
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


def test_lsh_jaccard_verify_joins_on_pair_keys(spark):
    """Round-1 verdict #1: a shingle appearing in d documents must cost d
    rows, never d². The verify stage therefore must never JOIN on the raw
    shingle key — only on candidate-pair / doc keys (plus the band key for
    candidate generation)."""
    import re

    from ult_spark.ops.textops import (
        jaccard_pairs,
        lsh_candidates,
        minhash_lsh_dedup,
        minhash_signature,
        shingles,
    )

    # one viral boilerplate prefix shared by EVERY doc (the d² hot shingle),
    # and true near-dup pairs (2i, 2i+1) that the LSH bands will catch
    texts = []
    for i in range(30):
        base = f"hot viral trigram shared by all docs tail{i} one two three four five six"
        texts.append(base)
        texts.append(base + " extra")
    docs = pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
    )
    df = spark.createDataFrame(docs)
    out = minhash_lsh_dedup(df, threshold=0.05)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if re.search(r"\bJoin\b", line):
            keys = line.split("Join", 1)[1]
            assert "shingle" not in keys, f"shingle-keyed join in verify plan: {line.strip()}"
    assert "array_intersect" in plan  # per-pair native set intersection

    # and the pruned plan is result-identical to the brute verify restricted
    # to the same candidate set
    sh = shingles(df)
    cand = lsh_candidates(minhash_signature(sh))
    brute = jaccard_pairs(sh, None, threshold=0.05).join(cand, ["a", "b"], "left_semi")
    got = {tuple(r) for r in out.collect()}
    exp = {tuple(r) for r in brute.collect()}
    assert got == exp and len(got) > 0


def test_embedding_near_dup_finds_planted_duplicates(spark, tmp_path):
    """Recall sanity beyond oracle parity: identical vectors share every
    band bucket, so planted exact duplicates MUST surface as sim_e6=1e6
    pairs."""
    from ult_spark.querydefs import QUERIES

    rng = np.random.default_rng(17)
    vecs = rng.uniform(-1, 1, (200, 64)).astype(np.float32)
    vecs[150] = vecs[50]  # planted duplicate pair (50, 150)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(200, dtype=np.int64),
            "embedding": list(map(list, vecs)),
            "label": np.zeros(200, dtype=np.int32),
        }
    )
    d = str(tmp_path / "sf")
    spark.createDataFrame(pdf, "vec_id long, embedding array<float>, label int").write.parquet(
        f"{d}/embeddings.parquet"
    )
    out = {(r.a, r.b): r.sim_e6 for r in QUERIES["embedding_near_dup"](spark, d).collect()}
    assert (50, 150) in out and out[(50, 150)] == 1_000_000


def test_simhash_banding_is_exact(spark):
    """Pigeonhole claim: 4x8-bit banding finds EVERY pair with hamming <= 3
    — compare against brute-force hamming over all signature pairs."""
    from ult_spark.ops.textops import simhash, simhash_near_dup

    texts = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(40):
        texts.append(base + f" tail{i % 7}")  # near-dup clusters
    docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    df = spark.createDataFrame(docs)
    got = {(r.a, r.b, r.hamming) for r in simhash_near_dup(df, max_hamming=3).collect()}
    sigs = {r.doc_id: r.simhash for r in simhash(df).collect()}
    exp = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert got == exp and len(got) > 0


def test_approx_distinct_error_bound(spark, sf_correct):
    """A5 approx twin: HLL++ (rsd=2%) must track the exact distinct count
    within a loose 10% band on every tile (no cross-engine oracle exists
    for sketches, so the exact query is the reference)."""
    from ult_spark.querydefs import QUERIES

    exact = {
        r.cell: r.users for r in QUERIES["distinct_users_per_tile_l6"](spark, sf_correct).collect()
    }
    approx = {
        r.cell: r.approx_users
        for r in QUERIES["approx_users_per_tile_l6"](spark, sf_correct).collect()
    }
    assert set(exact) == set(approx)
    for cell, users in exact.items():
        assert abs(approx[cell] - users) <= max(2, 0.1 * users), (cell, users, approx[cell])


def test_ann_banded_lsh_caps_dense_buckets(spark):
    """Round-1 verdict #3: vector-LSH buckets must be boundable. One dense
    cluster (all-identical vectors → same bucket in every band) must be
    droppable via max_bucket, surfaced by oversized_buckets — never silently
    all-pairs joined."""
    from ult_spark.ops.ann import ann_lsh_topk, lsh_bands, oversized_buckets

    rng = np.random.default_rng(3)
    dense = np.tile(rng.uniform(-1, 1, 64), (200, 1))  # one hot cluster
    rest = rng.uniform(-1, 1, (100, 64))
    vecs = np.vstack([dense, rest]).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(map(list, vecs))}
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    bands = lsh_bands(df)
    over = oversized_buckets(bands, max_bucket=50).collect()
    assert len(over) >= 1 and max(r.n for r in over) >= 200
    # capped: cluster members lose their bucket, so a cluster query finds no
    # candidates through the dropped bucket
    capped = ann_lsh_topk(df, [0], k=5, max_bucket=50)
    uncapped = ann_lsh_topk(df, [0], k=5)
    n_capped, n_uncapped = capped.count(), uncapped.count()
    assert n_uncapped == 5  # 199 identical twins available
    assert n_capped < n_uncapped
    # scatter queries are unaffected by the cap
    assert ann_lsh_topk(df, [250], k=3, max_bucket=50).count() == (
        ann_lsh_topk(df, [250], k=3).count()
    )


def test_near_dup_pipelines_collapse_exact_dup_clusters(spark):
    """Round-2 verdict #7: a planted 500-copy identical-text cluster must
    (a) reach the band self-joins as ONE representative (linear candidate
    counts, not C(500,2)), and (b) still re-expand to the exact uncollapsed
    result — all within-cluster pairs at jaccard 1 / hamming 0."""
    from ult_spark.ops.textops import (
        collapse_exact,
        lsh_candidates,
        minhash_lsh_dedup,
        minhash_signature,
        shingles,
        simhash_near_dup,
    )

    n_clone = 500
    texts = ["clone text alpha beta gamma delta epsilon zeta"] * n_clone + [
        f"unique document number {i} with its own words tail{i}" for i in range(20)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )

    # (a) the collapsed candidate stream the shipped pipeline feeds the band
    # join is linear: one rep for the clone cluster + the uniques
    groups = collapse_exact(df)
    assert groups.count() == 21
    n_cand = lsh_candidates(minhash_signature(shingles(groups))).count()
    assert n_cand < 21 * 20 // 2 + 1  # bounded by rep pairs, nowhere near C(500,2)

    # (b) exact re-expansion: every within-cluster pair present with the
    # identity verify values
    out = minhash_lsh_dedup(df, threshold=0.2)
    clone_pairs = out.where((F.col("a") < n_clone) & (F.col("b") < n_clone))
    n_within = n_clone * (n_clone - 1) // 2
    assert clone_pairs.count() == n_within
    assert clone_pairs.where(F.col("jacc_e4") == 10000).count() == n_within

    sh_out = simhash_near_dup(df, max_hamming=3)
    sh_clone = sh_out.where((F.col("a") < n_clone) & (F.col("b") < n_clone))
    assert sh_clone.count() == n_within
    assert sh_clone.where(F.col("hamming") == 0).count() == n_within


def test_near_dup_default_cap_bounds_degenerate_corpus(spark, tmp_path):
    """Round-2 verdict #2: the bucket cap must be the DEFAULT, not opt-in.
    A corpus dominated by one identical-vector cluster wider than
    DEFAULT_MAX_BUCKET must (a) produce a BOUNDED candidate set in
    embedding_near_dup instead of cluster² pairs, and (b) surface the
    dropped buckets via the near_dup_oversized companion query."""
    from ult_spark.ops.ann import DEFAULT_MAX_BUCKET
    from ult_spark.querydefs import QUERIES

    rng = np.random.default_rng(11)
    n_clone = DEFAULT_MAX_BUCKET + 176  # 1200 — wider than the default cap
    clone = np.tile(rng.uniform(-1, 1, 64), (n_clone, 1))
    rest = rng.uniform(-1, 1, (80, 64))
    vecs = np.vstack([clone, rest]).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": list(map(list, vecs)),
            "label": np.zeros(len(vecs), dtype=np.int32),
        }
    )
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")

    over = QUERIES["near_dup_oversized"](spark, d).collect()
    assert len(over) >= 4  # the clone cluster is oversized in EVERY band
    assert all(r.n >= n_clone for r in over)  # scatter vectors may co-bucket

    pairs = QUERIES["embedding_near_dup"](spark, d).count()
    # uncapped, the clone cluster alone would emit C(1200,2) = 719,400
    # pairs; the capped plan drops the oversized buckets so the remaining
    # pair count is bounded by the scatter vectors
    assert pairs < n_clone * (n_clone - 1) // 20
    # and the capped query on a HEALTHY corpus is identical to uncapped
    # (covered by the sf0.01 oracle run in test_oracle_contract)


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


def test_deterministic_sampling_and_split(spark, sf_smoke):
    """r4 corpus-curation primitives: hash-threshold sampling returns the
    IDENTICAL row set under different partitionings (no rand() anywhere),
    the split is disjoint+exhaustive, and absent strata keep 0 rows."""
    from pyspark.sql import functions as F

    from ult_spark.ops.textops import split_assign, stratified_sample

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    fr = {"en": 0.5, "zh": 0.3}
    s1 = {r.doc_id for r in stratified_sample(docs, fr).collect()}
    s2 = {r.doc_id for r in stratified_sample(docs.repartition(13), fr).collect()}
    assert s1 == s2 and s1
    kept_langs = {
        r.lang for r in stratified_sample(docs, fr).select("lang").distinct().collect()
    }
    assert kept_langs <= {"en", "zh"}
    # rough calibration: the en fraction lands near 0.5 (56-bit hash uniform)
    n_en = docs.where(F.col("lang") == "en").count()
    n_en_kept = len({r.doc_id for r in stratified_sample(docs, fr).where(F.col("lang") == "en").collect()})
    assert abs(n_en_kept / n_en - 0.5) < 0.15

    sp = split_assign(docs, test_e4=2000)
    counts = dict(
        (r.split, r.cnt) for r in sp.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    )
    assert sum(counts.values()) == docs.count() and set(counts) == {"train", "test"}
    # same doc never in both splits across reruns/resharding
    sp2 = split_assign(docs.repartition(7), test_e4=2000)
    joined = sp.select("doc_id", "split").join(
        sp2.select("doc_id", F.col("split").alias("s2")), "doc_id"
    )
    assert joined.where(F.col("split") != F.col("s2")).count() == 0


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_approx_distinct_published_bound_multi_scale(spark, seed):
    """Round-4 verdict #8: the HLL++ sketch (rsd=2%) must hold its
    PUBLISHED error bound — |est − n| ≤ 3·rsd·n (three standard errors)
    — across three seeds and three cardinality scales (1k / 20k / 200k),
    not just the one corpus the rows-only driver check sees. The value
    stream is a seeded bijective affine map, so each run has exactly n
    distinct values with hash-random spread."""
    for n in (1_000, 20_000, 200_000):
        df = spark.range(n).select(
            (F.col("id") * F.lit(2654435761) + F.lit(seed * 1_000_003)).alias("user")
        )
        est = df.agg(
            F.approx_count_distinct("user", rsd=0.02).alias("e")
        ).collect()[0].e
        assert abs(est - n) <= 3 * 0.02 * n, (seed, n, est)


def test_approx_users_per_tile_bound_at_sf01(spark):
    """The registered rows-only query at the BENCH scale (sf0.1): every
    tile's HLL++ estimate within 3 standard errors of the exact distinct
    count. All 4096 sf0.1 tiles sit in the sparse/linear-counting regime
    (<100 users each — measured worst abs error 3 at n=30), where a
    few-count absolute error dominates the 2% relative bound, so small
    tiles get an absolute-5 floor; the tight relative bound at large n is
    carried by test_approx_distinct_published_bound_multi_scale."""
    from ult_spark.querydefs import QUERIES

    sf_dir = "/root/testdata/sf0.1"
    exact = {
        r.cell: r.users
        for r in QUERIES["distinct_users_per_tile_l6"](spark, sf_dir).collect()
    }
    approx = {
        r.cell: r.approx_users
        for r in QUERIES["approx_users_per_tile_l6"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx) and len(exact) > 0
    for cell, users in exact.items():
        assert abs(approx[cell] - users) <= max(5, 3 * 0.02 * users), (
            cell, users, approx[cell],
        )


def test_approx_percentile_error_bound(spark, sf_correct):
    """A6 approx twin: Spark's approx_percentile with accuracy=1000 must
    land within rank-error 1/1000 of the exact order statistics — checked
    against exact percentiles over the events value column at three
    probes across three accuracy settings (the KLL/GK-style guarantee is
    on RANK, not value, so the assertion maps the approx value back to
    its rank in the sorted data)."""
    import numpy as np

    vals = np.sort(
        np.array(
            [
                r.value
                for r in spark.read.parquet(f"{sf_correct}/events.parquet")
                .select("value")
                .collect()
            ]
        )
    )
    n = len(vals)
    for acc in (100, 1000, 10000):
        row = (
            spark.read.parquet(f"{sf_correct}/events.parquet")
            .agg(
                F.percentile_approx(
                    "value", [0.1, 0.5, 0.99], F.lit(acc)
                ).alias("p")
            )
            .collect()[0]
        )
        for q, got in zip((0.1, 0.5, 0.99), row.p):
            # rank of the returned value in the exact sorted data
            rank = np.searchsorted(vals, got, side="right")
            assert abs(rank / n - q) <= 1.0 / acc + 1.0 / n, (acc, q)
