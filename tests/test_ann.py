"""IVF training (ops/ann.py ivf_train): trained centroids must improve
recall over the pinned smallest-id seeds on a clustered corpus, and the
training loop must be pure plan-chaining (no driver actions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ult_spark.ops.ann import Q, ann_ivf_topk, ivf_train


def _clustered_corpus(spark, n_clusters=8, per=40, dim=64, seed=7):
    """Clusters far apart; the first 16 vec_ids ALL live in cluster 0, so
    the pinned smallest-id centroids collapse onto one cluster and probe
    the wrong lists for most queries."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, (n_clusters, dim)) * 4
    # cluster 0 sits at the ORIGIN (every pinned centroid — the 16 smallest
    # ids, all cluster 0 — scores ~0 against everything) and clusters are
    # WIDE (noise comparable to center separation), so pinned assignment
    # splits true neighborhoods across lists; trained centroids re-center
    # on the real clusters and heal the splits (measured: 0.85 → 1.0
    # recall@5 at nprobe=4 on this fixture)
    centers[0] = 0.0
    vecs = np.concatenate(
        [centers[c] + rng.uniform(-2.0, 2.0, (per, dim)) for c in range(n_clusters)]
    )
    # ids 0..15 stay in cluster 0 (order preserved) — adversarial for seeds
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": list(map(list, vecs.astype(np.float32))),
        }
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<float>"), vecs


def _exact_topk(vecs, qids, k):
    qv = np.floor(vecs.astype(np.float64) * Q).astype(np.int64)
    out = {}
    for q in qids:
        dots = qv @ qv[q]
        order = [i for i in np.lexsort((np.arange(len(qv)), -dots)) if i != q]
        out[q] = set(int(i) for i in order[:k])
    return out


def test_trained_centroids_beat_pinned_recall(spark):
    df, vecs = _clustered_corpus(spark)
    qids = [20, 60, 100, 140, 180, 220, 260, 300]
    k = 5
    exact = _exact_topk(np.asarray([np.asarray(v, dtype=np.float32) for v in vecs]), qids, k)

    def recall(cents):
        got = ann_ivf_topk(df, qids, k=k, cents=cents)
        hits = {(r.qid, r.nid) for r in got.collect()}
        found = sum(len({n for (q, n) in hits if q == q0} & exact[q0]) for q0 in qids)
        return found / (k * len(qids))

    r_pinned = recall(None)
    r_trained = recall(ivf_train(df, rounds=2))
    assert r_trained > r_pinned, (r_pinned, r_trained)
    assert r_trained >= 0.95, r_trained


def test_ivf_train_is_lazy(spark):
    """The Lloyd loop must CHAIN plans, never run per-round driver actions
    (CLAUDE.md r2 lesson). Building the trained-centroid plan therefore
    launches zero Spark jobs."""
    df, _ = _clustered_corpus(spark, n_clusters=2, per=10)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    cents = ivf_train(df, rounds=3)  # plan construction only
    topk = ann_ivf_topk(df, [0], k=3, cents=cents)  # still lazy
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "plan construction launched Spark jobs"
    assert topk.count() >= 0  # and the chained plan actually executes


def test_int8_recall_detects_quantization_damage(spark):
    """r7: differences below the int8 step vanish — a planted sub-step
    pair flips under quantization (tie → id order) and recall@1 reads
    0; axis-aligned vectors stay perfect at k=2."""
    from ult_spark.ops.ann import ann_int8_recall

    rows = [
        (0, [1.0, 0.0]),        # query
        (1, [1.0, -0.003]),     # float sim slightly LOWER
        (2, [1.0, 0.003]),      # float sim slightly higher -> float top1
        (3, [0.0, 1.0]),        # orthogonal noise
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r1 = {r.qid: r.n_common for r in ann_int8_recall(emb, [0], k=1).collect()}
    # int8 maps both near-neighbors to [127, 0]: tie -> id 1 wins -> miss
    assert r1 == {0: 0}
    r2 = {r.qid: r.n_common for r in ann_int8_recall(emb, [0], k=2).collect()}
    assert r2 == {0: 2}  # both near vectors inside k=2 either way
