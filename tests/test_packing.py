"""Training-batch assembly (ops/packing.py) + trajectory/diff ops
(ops/relational.py r5): planted-corpus exactness, invariants, and
partitioning-determinism. The cross-engine oracles run in
tests/test_oracle_contract.py; these tests pin the semantics against
independent Python references."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ult_spark.ops.packing import PACK_BUDGET, PACK_SHARDS, domain_balance, pack_sequences


def h56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


# ---------------------------------------------------------------------------
# pack_sequences


def _reference_pack(docs: list[tuple[int, str]], budget: int, shards: int):
    """Independent Python replay of the pinned packing semantics."""
    per_shard: dict[int, list[tuple[int, int, int]]] = {}
    for doc_id, text in docs:
        n_tok = len([t for t in text.split(" ") if t])
        if n_tok == 0:
            continue
        ok = h56(f"{doc_id}:pk")
        per_shard.setdefault(ok % shards, []).append((ok, doc_id, n_tok))
    out: dict[tuple[int, int], list[int]] = {}
    for shard, rows in per_shard.items():
        cum = 0
        for _, _, n_tok in sorted(rows):
            lo, cum = cum, cum + n_tok
            for seq in range(lo // budget, (cum - 1) // budget + 1):
                got = out.setdefault((shard, seq), [0, 0, 0])
                got[0] += 1
                got[1] += int(lo >= seq * budget and cum <= (seq + 1) * budget)
                got[2] += min(cum, (seq + 1) * budget) - max(lo, seq * budget)
    return out


def test_pack_sequences_planted_exact(spark):
    docs = [(i, " ".join(["w"] * (3 + (i * 7) % 11))) for i in range(40)]
    docs.append((40, ""))  # zero-token doc: dropped (pinned)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.shard, r.seq_id): [r.n_docs, r.n_whole, r.n_tokens]
        for r in pack_sequences(df, budget=16, shards=4).collect()
    }
    assert got == _reference_pack(docs, budget=16, shards=4)


def test_pack_sequences_invariants(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    out = pack_sequences(docs).collect()
    total_tok = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != "")))
    ).collect()[0][0]
    # token conservation: every token lands in exactly one sequence slot
    assert sum(r.n_tokens for r in out) == total_tok
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(PACK_SHARDS))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.seq_id)
        # contiguous sequence ids from 0; full budget everywhere but the tail
        assert [r.seq_id for r in rows] == list(range(len(rows)))
        assert all(r.n_tokens == PACK_BUDGET for r in rows[:-1])
        assert 0 < rows[-1].n_tokens <= PACK_BUDGET
        for r in rows:
            assert 0 <= r.n_whole <= r.n_docs


def test_pack_sequences_partitioning_invariant(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# domain_balance


def test_domain_balance_matches_python(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    rows = {r.domain: r for r in domain_balance(docs).collect()}
    pdf = docs.select("doc_id", "source").toPandas()
    counts = pdf.groupby("source").size().to_dict()
    assert set(rows) == set(counts)
    for src, n in counts.items():
        r = rows[src]
        assert r.n_docs == n
        expect_rate = min(1_000_000, math.floor(4_000_000.0 / math.sqrt(n)))
        assert r.keep_rate_e6 == expect_rate
        kept = sum(
            1
            for d in pdf[pdf.source == src].doc_id
            if h56(f"{d}:bal") % 1_000_000 < expect_rate
        )
        assert r.n_kept == kept
        assert 0 <= r.n_kept <= r.n_docs


def test_domain_balance_flattens_distribution(spark):
    """The whole point of α=0.5: a skewed source distribution flattens —
    the kept-count ratio between the dominant and minor domain shrinks
    toward sqrt of the original ratio. (The driver corpus has perfectly
    UNIFORM sources, where hash-threshold binomial noise dominates, so
    this property needs a planted skewed corpus.)"""
    docs = [(i, "big") for i in range(6400)] + [(10000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id long, source string").withColumn(
        "text", F.lit("x")
    )
    got = {r.domain: r for r in domain_balance(df, t_e6=400_000.0).collect()}
    # rates: big -> 400000/80 = 5000 (0.5%), small -> 400000/10 = 40000 (4%)
    assert got["big"].keep_rate_e6 == 5000
    assert got["small"].keep_rate_e6 == 40000
    orig_ratio = got["big"].n_docs / got["small"].n_docs  # 64
    kept_ratio = got["big"].n_kept / max(got["small"].n_kept, 1)
    assert kept_ratio < orig_ratio / 2  # expected ~8 (sqrt(64)), far under 64


# ---------------------------------------------------------------------------
# session_trips


def haversine_m(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1) / 2.0
    dlon = math.radians(lon2 - lon1) / 2.0
    a = (
        math.sin(dlat) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * math.sin(dlon) ** 2
    )
    return 2.0 * 6371008.8 * math.asin(math.sqrt(a))


def test_session_trips_planted(spark):
    from ult_spark.ops.relational import session_trips

    # user 1: two sessions (gap 2000 s > 1800); user 2: one single-event
    # session (zero distance, zero duration)
    rows = [
        (1, 1, "2026-01-01 00:00:00", 10.0, 20.0),
        (2, 1, "2026-01-01 00:10:00", 10.5, 20.0),
        (3, 1, "2026-01-01 00:20:00", 10.5, 20.5),
        (4, 1, "2026-01-01 01:00:00", 11.0, 21.0),  # 2400 s after prev
        (5, 2, "2026-01-01 00:00:00", -30.0, 150.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, lat double, lon double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.user_id, r.session_id): r
        for r in session_trips(df, key="user_id").collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s11 = got[(1, 1)]
    assert s11.n_events == 3 and s11.dur_s == 1200
    legs = [
        math.floor(haversine_m(10.0, 20.0, 10.5, 20.0)),
        math.floor(haversine_m(10.5, 20.0, 10.5, 20.5)),
    ]
    assert s11.dist_m == sum(legs) and s11.max_leg_m == max(legs)
    assert got[(1, 2)].n_events == 1 and got[(1, 2)].dist_m == 0
    s2 = got[(2, 1)]
    assert (s2.n_events, s2.dur_s, s2.dist_m, s2.max_leg_m) == (1, 0, 0, 0)


def test_session_trips_sum_is_order_free(spark, sf_correct):
    """Per-leg floors before the sum: identical totals under repartition."""
    from ult_spark.ops.relational import session_trips
    from ult_spark.querydefs import events_points

    pts = events_points(spark, sf_correct)
    a = sorted(map(tuple, session_trips(pts).collect()))
    b = sorted(map(tuple, session_trips(pts.repartition(17)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# snapshot_diff


def test_snapshot_diff_planted(spark):
    from ult_spark.ops.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, 100, "a"), (2, 200, "b"), (3, 300, "c")], "k long, v long, s string"
    )
    new = spark.createDataFrame(
        [(2, 200, "b"), (3, 301, "c"), (4, 400, "d")], "k long, v long, s string"
    )
    got = {r.k: r for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()}
    assert set(got) == {1, 3, 4}  # 2 is unchanged and dropped
    assert got[1].change_type == "removed" and got[1].new_v is None
    assert got[3].change_type == "changed" and (got[3].old_v, got[3].new_v) == (300, 301)
    assert got[4].change_type == "added" and got[4].old_v is None


def test_snapshot_diff_null_safe_values(spark):
    """NULL value columns compare null-safely: NULL→NULL is unchanged,
    NULL→value and value→NULL are changed."""
    from ult_spark.ops.relational import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, 5), (3, None)], "k long, v long")
    new = spark.createDataFrame([(1, None), (2, None), (3, 7)], "k long, v long")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {2: "changed", 3: "changed"}


def test_time_bucket_interpolate_planted(spark):
    """Gaps lie on the straight line between observations; observed
    buckets are exact; endpoints carry their own values."""
    from ult_spark.ops.relational import time_bucket_interpolate

    # type 'a': 3 events at hour H, 1 at H+3 → gaps at H+1, H+2 on the
    # line 3 → 1 (slope -2/3): lerp(H+1) = 3 - 2/3 ≈ 2.333333
    rows = [
        (1, "a", "2026-01-01 00:10:00"),
        (2, "a", "2026-01-01 00:20:00"),
        (3, "a", "2026-01-01 00:30:00"),
        (4, "a", "2026-01-01 03:30:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.bucket: r for r in time_bucket_interpolate(df).collect()}
    buckets = sorted(got)
    assert len(buckets) == 4
    h = buckets[0]
    assert got[h].cnt == 3 and got[h].lerp_e6 == 3_000_000
    assert got[h + 3].cnt == 1 and got[h + 3].lerp_e6 == 1_000_000
    assert got[h + 1].cnt == 0 and got[h + 1].lerp_e6 == 2_333_333
    assert got[h + 2].cnt == 0 and got[h + 2].lerp_e6 == 1_666_666


def test_pack_sequences_doc_spanning_many_sequences(spark):
    """A doc longer than several budgets spans them all: n_docs counts it
    in each, n_whole in none, and interior sequences it fully owns carry
    exactly budget tokens from it."""
    docs = [(1, " ".join(["w"] * 40)), (2, "a b c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_sequences(df, budget=16, shards=1)
    got = {r.seq_id: r for r in out.collect()}
    assert got == _reference_pack_dict(docs, budget=16, shards=1)


def _reference_pack_dict(docs, budget, shards):
    ref = _reference_pack(docs, budget, shards)
    import collections
    Row = collections.namedtuple("Row", "shard seq_id n_docs n_whole n_tokens")
    return {
        seq: Row(shard, seq, *vals) for (shard, seq), vals in ref.items()
    }


def test_domain_balance_single_doc_domain(spark):
    """A one-doc domain rates at the 1e6 cap and is always kept."""
    df = spark.createDataFrame(
        [(1, "solo"), (2, "big"), (3, "big"), (4, "big")],
        "doc_id long, source string",
    ).withColumn("text", F.lit("x"))
    got = {r.domain: r for r in domain_balance(df).collect()}
    assert got["solo"].keep_rate_e6 == 1_000_000
    assert got["solo"].n_kept == 1


def test_asof_keyed_matches_broadcast_form(spark, sf_correct):
    """On a single-key axis the union-marker keyed as-of must equal the
    broadcast theta-join form exactly (same inclusive-at-equal-ts rule),
    and its plan must contain no nested-loop join (the scalable claim)."""
    from ult_spark.ops.relational import asof_join, asof_join_keyed
    from ult_spark.querydefs import ASOF_VERSIONS, load

    versions = spark.createDataFrame(
        [(0, i, f"{d} 00:00:00") for i, d in ASOF_VERSIONS],
        "k long, version_id long, vts string",
    ).select("k", "version_id", F.to_timestamp("vts").alias("vts"))
    orders = load(spark, sf_correct, "orders").select(
        F.lit(0).alias("k"), "o_orderkey", "o_orderdate"
    )
    keyed = asof_join_keyed(orders, versions, "k", "o_orderdate", "vts", "version_id")
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    a = sorted(
        (r.o_orderkey, r.version_id) for r in keyed.select("o_orderkey", "version_id").collect()
    )
    b = sorted(
        (r.o_orderkey, r.version_id)
        for r in asof_join(
            orders.drop("k"), versions.drop("k"), "o_orderkey", "o_orderdate", "vts"
        ).select("o_orderkey", "version_id").collect()
    )
    assert a == b and len(a) > 0


def test_asof_keyed_inclusive_at_equal_ts(spark):
    """A version effective exactly at the row's timestamp applies (the
    inclusive rule); rows before any version get NULL; keys are isolated."""
    from ult_spark.ops.relational import asof_join_keyed

    versions = spark.createDataFrame(
        [(1, 10, "2026-01-05 00:00:00"), (1, 11, "2026-01-10 00:00:00"),
         (2, 20, "2026-01-07 00:00:00")],
        "k long, version_id long, vts string",
    ).select("k", "version_id", F.to_timestamp("vts").alias("vts"))
    left = spark.createDataFrame(
        [(1, 100, "2026-01-04 00:00:00"),  # before any v of k=1 -> NULL
         (1, 101, "2026-01-05 00:00:00"),  # exactly at v10 -> 10
         (1, 102, "2026-01-10 00:00:00"),  # exactly at v11 -> 11
         (2, 200, "2026-01-09 00:00:00"),  # k=2 sees only v20
         ],
        "k long, row_id long, ts string",
    ).select("k", "row_id", F.to_timestamp("ts").alias("ts"))
    got = {
        r.row_id: r.version_id
        for r in asof_join_keyed(left, versions, "k", "ts", "vts", "version_id").collect()
    }
    assert got == {100: None, 101: 10, 102: 11, 200: 20}


def test_asof_keyed_equal_ts_version_tie_is_deterministic(spark):
    """ADVICE r5: two versions sharing (key, ts) must carry a DETERMINISTIC
    value — the max version_id (final window tiebreak), not a
    partition-dependent pick."""
    from ult_spark.ops.relational import asof_join_keyed

    versions = spark.createDataFrame(
        [(1, 10, "2026-01-05 00:00:00"), (1, 13, "2026-01-05 00:00:00"),
         (1, 11, "2026-01-05 00:00:00")],
        "k long, version_id long, vts string",
    ).select("k", "version_id", F.to_timestamp("vts").alias("vts"))
    left = spark.createDataFrame(
        [(1, 100, "2026-01-06 00:00:00"), (1, 101, "2026-01-05 00:00:00")],
        "k long, row_id long, ts string",
    ).select("k", "row_id", F.to_timestamp("ts").alias("ts"))
    for _ in range(3):  # stable across plans/retries
        got = {
            r.row_id: r.version_id
            for r in asof_join_keyed(
                left.repartition(7), versions.repartition(5), "k", "ts", "vts", "version_id"
            ).collect()
        }
        assert got == {100: 13, 101: 13}


def test_asof_keyed_refuses_ver_col_collision(spark):
    """ADVICE r5: a left table already carrying ver_col would pollute the
    ignorenulls carry — refused loudly."""
    import pytest

    from ult_spark.ops.relational import asof_join_keyed

    versions = spark.createDataFrame(
        [(1, 10, "2026-01-05 00:00:00")], "k long, version_id long, vts string"
    ).select("k", "version_id", F.to_timestamp("vts").alias("vts"))
    left = spark.createDataFrame(
        [(1, 99, "2026-01-06 00:00:00")], "k long, version_id long, ts string"
    ).select("k", "version_id", F.to_timestamp("ts").alias("ts"))
    with pytest.raises(ValueError, match="version_id"):
        asof_join_keyed(left, versions, "k", "ts", "vts", "version_id")


def test_funnel_counts_order_semantics(spark):
    """r6 funnel_counts: a user whose purchase precedes their first click
    does NOT reach step 3; the inclusive same-instant boundary completes
    adjacent steps; counts are monotone."""
    from ult_spark.ops.relational import funnel_counts

    rows = [
        # u1: proper order view→click→purchase
        (1, "view", "2026-01-01 00:00:00"), (1, "click", "2026-01-01 00:01:00"),
        (1, "purchase", "2026-01-01 00:02:00"),
        # u2: purchase BEFORE click — reaches step 2 only
        (2, "view", "2026-01-01 00:00:00"), (2, "purchase", "2026-01-01 00:00:30"),
        (2, "click", "2026-01-01 00:01:00"),
        # u3: click at the SAME instant as view — inclusive boundary counts
        (3, "view", "2026-01-01 00:00:00"), (3, "click", "2026-01-01 00:00:00"),
        # u4: only an error event — step 0 only
        (4, "error", "2026-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.step: r.users for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert got == {0: 4, 1: 3, 2: 3, 3: 1}


def test_scd2_intervals_chain_and_ties(spark):
    """r6 scd2_intervals: intervals chain per key; equal-ts versions order
    by the tiebreak (zero-length interval kept); last version open."""
    from ult_spark.ops.relational import scd2_intervals

    rows = [
        (1, 10, "2026-01-01 00:00:00"), (1, 11, "2026-01-02 00:00:00"),
        (1, 12, "2026-01-02 00:00:00"),  # ties v11 — supersedes instantly
        (2, 20, "2026-01-05 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "k long, vid long, vts string"
    ).withColumn("vts", F.to_timestamp("vts"))
    got = {r.vid: (r.eff_from, r.eff_to) for r in scd2_intervals(df, "k", "vts", "vid").collect()}
    t1 = got[10][0]
    t2 = got[11][0]
    assert got[10] == (t1, t2)
    assert got[11] == (t2, t2)  # zero-length: superseded at the same instant
    assert got[12] == (t2, None)
    assert got[20][1] is None


def test_kernel_smooth_matches_brute_force(spark):
    """r6 kernel_smooth: planted points vs a numpy brute-force of the
    binomial stencil with x-wrap and y-clamp."""
    import numpy as np

    from ult_spark.ops.tiles import _binomial_weights, kernel_smooth
    from ult_spark.grid import cells as C

    level, n = 3, 8
    rng = [(0.0, 0.0), (80.0, 170.0), (-80.0, -170.0), (10.0, 20.0), (10.0, 20.0)]
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(rng)],
        "event_id long, lat double, lon double",
    )
    got = {r.cell: r.smooth for r in kernel_smooth(df, level=level, k=1).collect()}
    # brute force
    grid = np.zeros((n, n), dtype=np.int64)
    for la, lo in rng:
        x = min(int((lo + 180.0) / 360.0 * n), n - 1)
        y = min(int((la + 90.0) / 180.0 * n), n - 1)
        grid[y, x] += 1
    w = _binomial_weights(1)
    exp = {}
    for y in range(n):
        for x in range(n):
            s = 0
            for (dx, dy), wt in w.items():
                sy, sx = y - dy, (x - dx) % n
                if 0 <= sy < n:
                    s += wt * grid[sy, sx]
            if s:
                exp[(x, y)] = s
    got_xy = {}
    for cell, v in got.items():
        cx, cy, _ = C.cell_to_xy(np.array([cell], dtype=np.int64))
        got_xy[(int(cx[0]), int(cy[0]))] = v
    assert got_xy == exp
