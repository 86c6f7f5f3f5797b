"""PMI co-occurrence planted fixtures (ops/textops.py pmi_pairs):
pair counts / marginals verified against an independent pure-Python
recompute, vocabulary-cap determinism, and the min-pair floor."""

import math
from itertools import combinations


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_pmi(texts: list[str], top_v: int, min_pair: int):
    sets = [set(t.split()) - {""} for t in texts]
    dfreq: dict[str, int] = {}
    for s in sets:
        for tok in s:
            dfreq[tok] = dfreq.get(tok, 0) + 1
    vocab = set(
        t for t, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    )
    n = len(texts)
    pairs: dict[tuple[str, str], int] = {}
    for s in sets:
        for a, b in combinations(sorted(s & vocab), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {
        (a, b): (c, math.floor(math.log((n * c) / (dfreq[a] * dfreq[b])) * 1000000.0))
        for (a, b), c in pairs.items()
        if c >= min_pair
    }


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog and the cat",
    "fish and chips",
    "the mat was red",
]


def test_pmi_matches_python_recompute(spark):
    from ult_spark.ops.textops import pmi_pairs

    got = {
        (r["tok1"], r["tok2"]): (r["c_ab"], r["pmi_e6"])
        for r in pmi_pairs(_docs(spark, TEXTS), top_v=40, min_pair=2).collect()
    }
    assert got == _py_pmi(TEXTS, 40, 2)
    # cat+the co-occur in 3 of 6 docs; marginals 3 and 4 -> pmi = ln(6*3/12)
    assert got[("cat", "the")] == (3, math.floor(math.log(1.5) * 1e6))


def test_pmi_vocab_cap_is_deterministic(spark):
    from ult_spark.ops.textops import pmi_pairs

    # cap of 3 keeps {the(4 docs), cat(3), and/a/...}: tie at dfreq=2 broken
    # by token ascending -- 'and' wins over 'dog'/'fish'/'mat'/'on'/'sat'
    got = {
        (r["tok1"], r["tok2"]): r["c_ab"]
        for r in pmi_pairs(_docs(spark, TEXTS), top_v=3, min_pair=1).collect()
    }
    assert got == {k: v[0] for k, v in _py_pmi(TEXTS, 3, 1).items()}
    toks = {t for k in got for t in k}
    assert toks <= {"the", "cat", "and"}


def test_pmi_min_pair_floor(spark):
    from ult_spark.ops.textops import pmi_pairs

    out = pmi_pairs(_docs(spark, TEXTS), top_v=40, min_pair=3).collect()
    assert all(r["c_ab"] >= 3 for r in out)
    assert {(r["tok1"], r["tok2"]) for r in out} == {("cat", "the")}


# ---------------------------------------------------------------------------
# Overlap-coefficient (containment) near-dups


def test_overlap_containment_pair(spark):
    from ult_spark.ops.textops import overlap_pairs, shingle_array

    import pyspark.sql.functions as F

    # doc 1 = doc 0 + a one-word tail: shingle sets nearly identical
    # (j ~ 0.95 -> banding deterministic-in-md5, pinned observed below),
    # overlap of the smaller set = 100% exactly
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = spark.createDataFrame(
        [(0, base.strip()), (1, base.strip() + " omega"), (2, "totally different words here")],
        "doc_id long, text string",
    )
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select("doc_id", shingle_array("text").alias("sh")).collect()
    }
    inter = len(sets[0] & sets[1])
    want_overlap = inter * 10000 // min(len(sets[0]), len(sets[1]))
    assert want_overlap == 10000  # containment by construction
    got = {(r["a"], r["b"]): (r["inter"], r["overlap_e4"])
           for r in overlap_pairs(docs, threshold=0.5).collect()}
    assert got == {(0, 1): (inter, 10000)}


def test_overlap_exact_dups_within_group(spark):
    from ult_spark.ops.textops import overlap_pairs

    t = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(10, t), (20, t), (30, "unrelated text entirely disjoint tokens")],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]): r["overlap_e4"]
           for r in overlap_pairs(docs, threshold=0.5).collect()}
    assert got == {(10, 20): 10000}


# ---------------------------------------------------------------------------
# Jensen-Shannon source divergence


def _py_js(docs_a: list[str], docs_b: list[str]):
    import math

    def dfreq(docs):
        out = {}
        for t in docs:
            for tok in set(t.split()) - {""}:
                out[tok] = out.get(tok, 0) + 1
        return out

    da, db = dfreq(docs_a), dfreq(docs_b)
    na, nb = sum(da.values()), sum(db.values())
    sa = sb = 0
    toks = set(da) | set(db)
    for t in toks:
        ca, cb = da.get(t, 0), db.get(t, 0)
        den = ca * nb + cb * na
        if ca > 0:
            sa += math.floor(1e9 * (ca / na) * math.log(2.0 * ca * nb / den))
        if cb > 0:
            sb += math.floor(1e9 * (cb / nb) * math.log(2.0 * cb * na / den))
    return len(toks), na, nb, sa, sb, max(sa + sb, 0) // 2


def test_js_matches_python(spark):
    from ult_spark.ops.textops import source_token_js

    docs_a = ["the cat sat", "the dog ran", "a cat and a dog"]
    docs_b = ["le chat", "the cat sat", "fish and chips daily"]
    rows = [(i, t, "A") for i, t in enumerate(docs_a)] + [
        (100 + i, t, "B") for i, t in enumerate(docs_b)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    row = source_token_js(df, "A", "B").collect()[0]
    assert tuple(row) == _py_js(docs_a, docs_b)
    assert row["js_e9"] > 0


def test_js_identical_sources_zero(spark):
    from ult_spark.ops.textops import source_token_js

    docs = ["alpha beta gamma", "beta delta", "gamma alpha"]
    rows = [(i, t, "A") for i, t in enumerate(docs)] + [
        (100 + i, t, "B") for i, t in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    row = source_token_js(df, "A", "B").collect()[0]
    # identical distributions: every ln is ln(1) = 0 exactly
    assert row["sum_a_e9"] == 0 and row["sum_b_e9"] == 0 and row["js_e9"] == 0


# ---------------------------------------------------------------------------
# Mirror-host detection


def test_mirror_planted_structure(spark):
    from ult_spark.ops.textops import host_mirror_pairs, planted_mirror_docs

    # planted rows only: ids 1e6..1e6+59, text = id % 12, host = id % 20.
    # Hosts share a variant iff congruent mod gcd(20,12)=4; each host's 3
    # variants are exactly its mod-4 residue class, so pairs within a class
    # share ALL 3 fps: 4 classes x C(5,2) = 40 pairs, shared=3, sizes 3/3.
    empty = spark.createDataFrame([], "doc_id long, text string")
    got = host_mirror_pairs(planted_mirror_docs(empty)).collect()
    assert len(got) == 40
    assert all(
        (r["shared"], r["size_a"], r["size_b"], r["overlap_e4"]) == (3, 3, 3, 10000)
        for r in got
    )
    assert all(
        int(r["host_a"][4:]) % 4 == int(r["host_b"][4:]) % 4 for r in got
    )


def test_mirror_cap_drops_template_fps(spark):
    from ult_spark.ops.textops import host_mirror_pairs, planted_mirror_docs

    # every planted fp lives on exactly 5 hosts; cap 4 drops them all
    empty = spark.createDataFrame([], "doc_id long, text string")
    got = host_mirror_pairs(planted_mirror_docs(empty), max_hosts=4).collect()
    assert got == []


def test_bm25_planted_ranking(spark):
    """Hand-checkable BM25: doc 1 has the query term twice in a short
    doc, doc 2 once in a longer doc, doc 3 lacks it entirely."""
    from ult_spark.ops.textops import bm25_topk
    import math

    docs = spark.createDataFrame(
        [
            (1, "cat cat dog"),
            (2, "cat fish fish fish fish fish"),
            (3, "dog fish bird bird"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["cat"], topk=10).collect()
    got = {r.doc_id: r for r in rows}
    assert set(got) == {1, 2}
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rk)] == [1, 2]
    n, s, df = 3, 13, 2
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    for doc, tf, ln in ((1, 2, 3), (2, 1, 6)):
        want = math.floor(
            1000000.0 * idf * (22 * s * tf) / (10 * s * tf + 3 * s + 9 * ln * n)
        )
        assert got[doc].bm25_e6 == want and got[doc].matched == 1


def test_zipf_slope_planted_geometric(spark):
    """Frequencies 8,4,2,1 over ranks 1..4: exact hand-recompute of the
    floored-ln regression."""
    from ult_spark.ops.textops import zipf_slope
    import math

    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_slope(docs, topk=10).collect()[0]
    xs = [math.floor(1e6 * math.log(r)) for r in (1, 2, 3, 4)]
    ys = [math.floor(1e6 * math.log(f)) for f in (8, 4, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    assert (row.n_terms, row.sx, row.sy, row.sxy, row.sxx) == (n, sx, sy, sxy, sxx)
    assert row.slope_e6 == math.floor(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
    # log-log of a geometric profile is close to linear with slope ~ -1.5e6
    assert -1_600_000 < row.slope_e6 < -1_400_000


def test_ks_doclen_planted(spark):
    from ult_spark.ops.textops import ks_doclen

    docs = spark.createDataFrame(
        [
            (1, "a", "s0"), (2, "a a", "s0"), (3, "a a a", "s0"),
            (4, "a a a", "s1"), (5, "a a a a", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    row = ks_doclen(docs, a="s0", b="s1").collect()[0]
    # ECDFs: at len 2 F_a=2/3, F_b=0 -> |cumA*nb - cumB*na| = |2*2-0| = 4
    assert (row.na, row.nb, row.d_num) == (3, 2, 4)
    assert row.d_e6 == (1_000_000 * 4) // 6


def test_ks_doclen_identical_sources_zero(spark):
    from ult_spark.ops.textops import ks_doclen

    docs = spark.createDataFrame(
        [(1, "a a", "s0"), (2, "a a", "s1"), (3, "a", "s0"), (4, "a", "s1")],
        "doc_id long, text string, source string",
    )
    row = ks_doclen(docs, a="s0", b="s1").collect()[0]
    assert row.d_num == 0 and row.d_e6 == 0
