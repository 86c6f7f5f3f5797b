"""Near-dup connected components (ops/textops.py dup_clusters): cluster
assignment vs a pure-Python union-find reference, chain convergence within
the pointer-jumping round bound, and exact-dup cluster handling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ult_spark.ops.textops import (
    ConvergenceError,
    connected_components,
    dup_clusters,
    minhash_lsh_dedup,
)


def _uf_reference(n, pairs):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    return {i: find(i) for i in range(n)}


def test_clusters_match_union_find(spark):
    """Mixed corpus: a 6-doc near-dup chain, a 4-copy exact cluster, and
    singletons — Spark components must equal union-find over the SAME pair
    graph minhash_lsh_dedup emits."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    texts = []
    words = base.split()
    # chain: doc i and i+1 differ by one word → adjacent pairs only
    for i in range(6):
        w = list(words)
        for j in range(i):
            w[3 * j] = f"mut{j}"
        texts.append(" ".join(w))
    texts += ["exact copy of this one two three four five six seven"] * 4
    # genuinely disjoint shingle sets (no shared prefix — a common prefix of
    # 3+ words puts short docs over jaccard 0.2)
    texts += [" ".join(f"w{i}_{j}" for j in range(12)) for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    pairs = [
        (r.a, r.b) for r in minhash_lsh_dedup(df, threshold=0.2).collect()
    ]
    exp = _uf_reference(len(texts), pairs)
    got = {r.doc_id: r.cluster_id for r in dup_clusters(df, threshold=0.2).collect()}
    assert got == exp
    # the exact-copy block collapsed into one cluster under its min id
    assert {got[i] for i in range(6, 10)} == {6}
    # singletons keep their own ids
    assert all(got[i] == i for i in range(10, 15))


def test_chain_converges_within_round_bound(spark):
    """A 12-link chain (diameter 12 > rounds=4) must still converge thanks
    to pointer jumping (log-diameter rounds)."""
    base = "one two three four five six seven eight nine ten eleven twelve " * 2
    words = base.split()
    texts = []
    for i in range(13):
        w = list(words)
        for j in range(i):
            w[2 * j] = f"mut{j}"
        texts.append(" ".join(w))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    pairs = [(r.a, r.b) for r in minhash_lsh_dedup(df, threshold=0.2).collect()]
    exp = _uf_reference(len(texts), pairs)
    # only meaningful if the planted chain is actually connected end-to-end
    assert len({v for v in exp.values()}) < len(texts)
    got = {r.doc_id: r.cluster_id for r in dup_clusters(df, threshold=0.2, rounds=4).collect()}
    assert got == exp


def _path_graph(spark, n):
    verts = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": np.arange(n - 1, dtype=np.int64),
                "b": np.arange(1, n, dtype=np.int64),
            }
        )
    )
    return verts, pairs


def test_unconverged_chain_raises_not_silent(spark):
    """Round-3 verdict #4: a chain LONGER than the ~2^rounds coverage must
    be DETECTED — with extension forbidden (max_rounds == rounds),
    connected_components raises ConvergenceError instead of returning
    silently wrong cluster ids. A 40-node path at rounds=2 (coverage ~2^2
    hops) cannot converge."""
    verts, pairs = _path_graph(spark, 40)
    with pytest.raises(ConvergenceError, match="still changing"):
        connected_components(verts, pairs, rounds=2, max_rounds=2)


def test_unconverged_chain_auto_extends(spark):
    """The default path AUTO-EXTENDS instead of raising: the same 40-node
    path started at rounds=2 converges by extension and still labels every
    node to 0."""
    verts, pairs = _path_graph(spark, 40)
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(verts, pairs, rounds=2).collect()
    }
    assert got == {i: 0 for i in range(40)}


def test_long_chain_converges_at_default_rounds(spark):
    """A 60-hop path converges under the DEFAULT low-rounds + auto-extend
    policy (rounds=2 then fixpoint-checked extensions) and every node
    labels to 0."""
    verts, pairs = _path_graph(spark, 61)
    got = {r.doc_id: r.cluster_id for r in connected_components(verts, pairs).collect()}
    assert got == {i: 0 for i in range(61)}


def test_cc_edges_outside_vertex_set_are_ignored(spark):
    """Public-API guard (round-4 advice): pairs referencing ids absent
    from ``vertices`` must neither drop vertices nor leak ghost ids —
    components are computed on the induced subgraph."""
    verts = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64)})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"a": np.array([0, 1, 99], dtype=np.int64),
                      "b": np.array([1, 99, 3], dtype=np.int64)})
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(verts, pairs).collect()}
    # ghost 99 must not bridge 1 and 3; every vertex present, no extras
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4}


def test_dup_keep_best_planted_clusters(spark):
    """dup_keep_best (r6): planted multi-cluster fixture — exact copies plus
    an appended-suffix chain (they share the full base shingle set at
    j≈0.97, far above the LSH no-collision region — CLAUDE.md plant-at-
    high-j rule) and disjoint singletons. Per cluster exactly one keep; the
    canonical is argmax n_tok with min-doc_id tiebreak, checked against a
    reference derived from the independently verified dup_clusters output."""
    from ult_spark.ops.textops import dup_clusters, dup_keep_best

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    texts = [base.strip()] * 3  # docs 0-2: exact copies (n_tok tie)
    # docs 3-5: base plus k extra tokens; doc 5 is the longest
    texts += [(base + " ".join(f"extra{j}" for j in range(k))).strip() for k in (1, 2, 3)]
    # docs 6-7: disjoint singletons (no shared 3-gram with anything)
    texts += [" ".join(f"s{i}_{j}" for j in range(12)) for i in range(2)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    labels = {r.doc_id: r.cluster_id for r in dup_clusters(df, threshold=0.2).collect()}
    n_tok = {i: len(t.split()) for i, t in enumerate(texts)}
    # reference canonical per cluster: argmax n_tok, tie min doc_id
    ref_canon = {}
    for d, c in labels.items():
        best = ref_canon.get(c)
        if best is None or (-n_tok[d], d) < (-n_tok[best], best):
            ref_canon[c] = d
    rows = {r.doc_id: r for r in dup_keep_best(df, threshold=0.2).collect()}
    assert len(rows) == len(texts)
    # the fixture must actually exercise all three reasons: the suffix
    # chain merges with the exact copies into one >1-doc cluster whose
    # longest member is doc 5, and the singletons stay alone
    sizes = pd.Series(list(labels.values())).value_counts()
    assert sizes.max() >= 4 and (sizes == 1).sum() >= 2
    assert ref_canon[labels[5]] == 5  # doc 5 is its cluster's longest
    for d, r in rows.items():
        assert r.cluster_id == labels[d]
        assert r.canon_id == ref_canon[labels[d]]
        expected_keep = 1 if d == ref_canon[labels[d]] else 0
        assert r.keep == expected_keep
        if sizes[labels[d]] == 1:
            assert r.reason == "unique"
        elif expected_keep:
            assert r.reason == "canonical"
        else:
            assert r.reason == "duplicate"
    # exactly one keep per cluster
    from collections import Counter

    per_cluster = Counter(r.cluster_id for r in rows.values() if r.keep == 1)
    assert per_cluster == {c: 1 for c in set(labels.values())}


def test_cluster_safe_split_is_cluster_atomic(spark):
    """r6 cluster_safe_split: every near-dup cluster lands wholly in ONE
    split; the output partitions the corpus; doc-id hashing (split_assign)
    would straddle at least one planted cluster under the same thresholds
    — the leakage this operator exists to prevent."""
    from ult_spark.ops.textops import cluster_safe_split, dup_clusters

    # several 4-copy exact clusters (ids chosen so doc-level h56 buckets
    # differ within a cluster) + singletons
    texts = []
    for c in range(6):
        texts += [f"cluster {c} shared text one two three four five six seven"] * 4
    texts += [" ".join(f"w{i}_{j}" for j in range(12)) for i in range(4)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    out = {r.doc_id: r for r in cluster_safe_split(
        df, threshold=0.2, val_e4=3000, test_e4=3000
    ).collect()}
    assert set(out) == set(range(len(texts)))  # partition of the corpus
    labels = {r.doc_id: r.cluster_id for r in dup_clusters(df, threshold=0.2).collect()}
    # cluster-atomic: one split per cluster
    per_cluster: dict[int, set[str]] = {}
    for d, r in out.items():
        assert r.cluster_id == labels[d]
        per_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in per_cluster.values())
    # buckets/threshold mapping pinned
    for r in out.values():
        exp = "test" if r.bucket_e4 < 3000 else ("val" if r.bucket_e4 < 6000 else "train")
        assert r.split == exp
    # the counterfactual: doc-id hashing straddles at least one cluster
    from ult_spark.ops.textops import split_assign

    doc_split = {r.doc_id: r.split for r in split_assign(df, test_e4=3000).collect()}
    straddled = [
        c for c, members in (
            (c, [d for d, l in labels.items() if l == c]) for c in set(labels.values())
        ) if len({doc_split[d] for d in members}) > 1
    ]
    assert straddled, "fixture too weak: doc-id split never straddled a cluster"


def test_stats_barrier_bounds_iterative_plan_stats(spark):
    """r7 regression: Spark 4 localCheckpoint copies origin statistics onto
    the LogicalRDD, so a self-joining loop compounds sizeInBytes ~k× digits
    per round (BigInteger explosion in the stats visitor — the cell_dbscan
    12-round hang). The barrier must pin stats to a constant-size default."""
    import pyspark.sql.functions as F

    from ult_spark.ops.textops import _stats_barrier

    df = spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("v"))

    def digits(d):
        return len(str(d._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))

    bare, barred = df, df
    bare_digits, barred_digits = [], []
    for _ in range(4):
        j = bare.join(bare.select(F.col("k"), F.col("v").alias("v2")), "k")
        bare = j.select("k", "v").localCheckpoint()
        bare_digits.append(digits(bare))
        j2 = barred.join(barred.select(F.col("k"), F.col("v").alias("v2")), "k")
        barred = _stats_barrier(j2.select("k", "v").localCheckpoint())
        barred_digits.append(digits(barred))
    # unbarred checkpoints compound (each round ~doubles the digit count)
    assert bare_digits[-1] > 2 * bare_digits[0]
    # barrier holds stats at the constant default (Long.MaxValue = 19 digits)
    assert barred_digits[-1] == barred_digits[0] <= 20
    # and the data itself is untouched
    assert barred.count() == 100
