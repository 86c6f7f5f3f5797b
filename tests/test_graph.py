"""Fixed-iteration integer PageRank (ops/graph.py): reference-recurrence
parity on small planted graphs, self-loop removal, dangling/dst-only nodes."""

from __future__ import annotations

from ult_spark.ops.graph import E9, pagerank


def _ref(edges: list[tuple[str, str, int]], iters: int = 3, d: int = 850):
    """Pure-Python mirror of the pinned integer recurrence."""
    e = [(s, t, w) for s, t, w in edges if s != t]
    nodes = sorted({s for s, _, _ in e} | {t for _, t, _ in e})
    n = len(nodes)
    outw: dict[str, int] = {}
    for s, _, w in e:
        outw[s] = outw.get(s, 0) + w
    base = (E9 * (1000 - d)) // 1000
    rank = {v: E9 // n for v in nodes}
    for _ in range(iters):
        s: dict[str, int] = {}
        for u, v, w in e:
            s[v] = s.get(v, 0) + (rank[u] * w) // outw[u]
        rank = {v: base // n + (s.get(v, 0) * d) // 1000 for v in nodes}
    return rank


def _run(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    return {r["node"]: r["rank"] for r in pagerank(df, iters=iters).collect()}


def test_two_node_cycle_symmetric(spark):
    edges = [("a", "b", 1), ("b", "a", 1)]
    got = _run(spark, edges)
    assert got == _ref(edges)
    assert got["a"] == got["b"]


def test_star_center_accumulates(spark):
    edges = [("s1", "hub", 2), ("s2", "hub", 1), ("s3", "hub", 5), ("hub", "s1", 1)]
    got = _run(spark, edges)
    assert got == _ref(edges)
    assert got["hub"] == max(got.values())


def test_self_loops_dropped_and_dst_only_node_ranks(spark):
    # c only receives; a's self-loop must not feed itself
    edges = [("a", "a", 9), ("a", "c", 1), ("b", "c", 1)]
    got = _run(spark, edges)
    assert got == _ref(edges)
    assert set(got) == {"a", "b", "c"}
    assert got["c"] == max(got.values())
    # a and b are both pure sources with identical structure
    assert got["a"] == got["b"]


def test_weighted_split_exact_division(spark):
    # w 3:1 split with a rank not divisible by 4 exercises the div floors
    edges = [("src", "x", 3), ("src", "y", 1), ("x", "src", 1), ("y", "src", 1)]
    got = _run(spark, edges, iters=4)
    assert got == _ref(edges, iters=4)
    assert got["x"] > got["y"]


# ---------------------------------------------------------------------------
# HITS

from ult_spark.ops.graph import E6, hits  # noqa: E402


def _ref_hits(edges: list[tuple[str, str, int]], iters: int = 3):
    e = [(s, t, w) for s, t, w in edges if s != t]
    nodes = sorted({s for s, _, _ in e} | {t for _, t, _ in e})
    hub = {v: E6 // len(nodes) for v in nodes}
    auth: dict[str, int] = {}
    for _ in range(iters):
        ar = {v: 0 for v in nodes}
        for u, v, w in e:
            ar[v] += hub[u] * w
        sa = max(sum(ar.values()), 1)
        auth = {v: (ar[v] * E6) // sa for v in nodes}
        hr = {v: 0 for v in nodes}
        for u, v, w in e:
            hr[u] += auth[v] * w
        sh = max(sum(hr.values()), 1)
        hub = {v: (hr[v] * E6) // sh for v in nodes}
    return {v: (hub[v], auth[v]) for v in nodes}


def _run_hits(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    return {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iters=iters).collect()}


def test_hits_bipartite_hubs_vs_authorities(spark):
    # h1,h2 point at a1,a2: pure hubs get auth 0, pure authorities hub 0
    edges = [("h1", "a1", 1), ("h1", "a2", 1), ("h2", "a1", 1)]
    got = _run_hits(spark, edges)
    assert got == _ref_hits(edges)
    assert got["h1"][1] == 0 and got["a1"][0] == 0
    assert got["h1"][0] > got["h2"][0]  # h1 links both authorities
    assert got["a1"][1] > got["a2"][1]  # a1 has two in-links


def test_hits_weighted_and_self_loop(spark):
    edges = [("u", "u", 7), ("u", "v", 3), ("w", "v", 1), ("v", "w", 1)]
    got = _run_hits(spark, edges, iters=4)
    assert got == _ref_hits(edges, iters=4)
    assert got["u"][0] > got["w"][0]  # weight 3 beats weight 1 into v


def test_hits_cycle_symmetry(spark):
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    got = _run_hits(spark, edges)
    assert got == _ref_hits(edges)
    vals = set(got.values())
    assert len(vals) == 1  # perfect symmetry: identical scores


# ---------------------------------------------------------------------------
# Co-citation / bibliographic coupling

from ult_spark.ops.graph import cocitation  # noqa: E402


def test_cocitation_counts_and_weights(spark):
    # s1 -> {a(2), b(3)}, s2 -> {a(1), c(4)}, s3 -> {b(5), c(1)}
    edges = [
        ("s1", "a", 2), ("s1", "b", 3),
        ("s2", "a", 1), ("s2", "c", 4),
        ("s3", "b", 5), ("s3", "c", 1),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {(r["u"], r["v"]): (r["common"], r["w_prod"])
           for r in cocitation(df, by="dst").collect()}
    assert got == {("a", "b"): (1, 6), ("a", "c"): (1, 4), ("b", "c"): (1, 5)}


def test_bibliographic_coupling(spark):
    # s1 and s2 both cite a (w 2*1) and nothing else shared
    edges = [("s1", "a", 2), ("s2", "a", 1), ("s2", "b", 7), ("s3", "b", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {(r["u"], r["v"]): (r["common"], r["w_prod"])
           for r in cocitation(df, by="src").collect()}
    assert got == {("s1", "s2"): (1, 2), ("s2", "s3"): (1, 7)}


# ---------------------------------------------------------------------------
# k-core peel


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, w) for a, b, w in pairs], "src string, dst string, w long"
    )


def test_kcore_peel_cascades(spark):
    from ult_spark.ops.graph import k_core

    # triangle a-b-c (2-core) + a pendant chain d-e hanging off a:
    # round 1 drops e (deg 1), round 2 drops d (deg fell to 1) — the
    # cascade needs BOTH rounds; the triangle survives with deg 2.
    pairs = [
        ("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
        ("a", "d", 1), ("d", "e", 1),
    ]
    got = {r["host"]: r["deg"] for r in
           k_core(_edges_df(spark, pairs), k=2, rounds=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    # one round is NOT enough: d still has deg 2 (a + e) when e is cut
    one = {r["host"] for r in
           k_core(_edges_df(spark, pairs), k=2, rounds=1).collect()}
    assert "d" in one


def test_kcore_merges_directions_and_drops_light_edges(spark):
    from ult_spark.ops.graph import k_core

    # a->b and b->a are ONE undirected edge; w<min_w edges vanish first
    pairs = [
        ("a", "b", 5), ("b", "a", 5), ("b", "c", 5), ("c", "a", 5),
        ("a", "x", 1), ("x", "a", 1),
    ]
    got = {r["host"]: r["deg"] for r in
           k_core(_edges_df(spark, pairs), k=2, rounds=1, min_w=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


# ---------------------------------------------------------------------------
# triangles + clustering coefficient


def test_triangles_k4_plus_pendant(spark):
    from ult_spark.ops.graph import triangles

    # K4 on a,b,c,d (every node in 3 of the 4 triangles, cc = 1) plus a
    # pendant e off a (a's deg rises to 4, cc drops to 3/6; e has deg 1
    # -> cc NULL; no triangle double-counting across directions)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    pairs = [(u, v, 1) for u, v in k4] + [("e", "a", 1), ("a", "e", 1)]
    got = {
        r["host"]: (r["deg"], r["tri"], r["cc_e6"])
        for r in triangles(_edges_df(spark, pairs)).collect()
    }
    assert got == {
        "a": (4, 3, 500000),
        "b": (3, 3, 1000000),
        "c": (3, 3, 1000000),
        "d": (3, 3, 1000000),
        "e": (1, 0, None),
    }


def test_triangles_wedge_without_closure_is_zero(spark):
    from ult_spark.ops.graph import triangles

    # path a-b-c: one wedge at b, never closed -> tri 0 everywhere,
    # b has deg 2 so its cc is DEFINED and 0 (not NULL)
    pairs = [("a", "b", 1), ("b", "c", 1)]
    got = {
        r["host"]: (r["deg"], r["tri"], r["cc_e6"])
        for r in triangles(_edges_df(spark, pairs)).collect()
    }
    assert got == {"a": (1, 0, None), "b": (2, 0, 0), "c": (1, 0, None)}


def test_triangles_degree_orientation_bounds_star_wedges(spark):
    """r7: degree-ordered orientation must probe O(out-degree²) wedges —
    on a star every edge points INTO the hub (leaf deg 1 < hub deg d),
    so the wedge candidate count is 0, where id-ordering with the hub id
    in the middle of the leaf ids probes Θ(d²)."""
    import pyspark.sql.functions as F

    from ult_spark.ops.graph import _oriented_edges, _wedges, triangles

    d = 40
    hub = f"h{d // 2:03d}"  # id sorts into the middle of the leaves
    leaves = [f"h{i:03d}" for i in range(d + 1) if i != d // 2]
    pairs = [(hub, leaf, 1) for leaf in leaves]
    und = (
        _edges_df(spark, pairs)
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    deg = (
        und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("u").alias("host"), "deg")
    )
    # id-ordered wedge join (the pre-r7 form): Θ((d/2)²) candidates
    id_wedges = und.join(
        und.select(F.col("u").alias("v"), F.col("v").alias("w")), "v"
    ).count()
    assert id_wedges == (d // 2) ** 2
    # degree-oriented: zero candidates
    assert _wedges(_oriented_edges(und, deg)).count() == 0
    # and the statistic itself is unchanged
    got = {r["host"]: (r["deg"], r["tri"]) for r in triangles(
        _edges_df(spark, pairs)).collect()}
    assert got[hub] == (d, 0)
    assert all(got[leaf] == (1, 0) for leaf in leaves)


def test_triangles_orientation_tie_break_by_id(spark):
    """All-equal degrees (a triangle): orientation falls back to id order;
    the triangle must still be counted exactly once per corner."""
    from ult_spark.ops.graph import triangles

    pairs = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    got = {r["host"]: (r["deg"], r["tri"], r["cc_e6"]) for r in triangles(
        _edges_df(spark, pairs)).collect()}
    assert got == {k: (2, 1, 1000000) for k in "abc"}


def test_cocitation_cap_bounds_hub_fanout(spark):
    """r7: the enforced per-shared-node cap keeps the top-k edges by
    (w DESC, id ASC) and bounds pair candidates at C(k, 2) per node;
    cocitation_oversized reports exactly the truncated nodes."""
    from ult_spark.ops.graph import cocitation, cocitation_oversized

    hub_edges = [("portal", f"d{i:02d}", 100 - i) for i in range(20)]
    pairs = hub_edges + [("tiny", "d00", 1), ("tiny", "d01", 1)]
    e = _edges_df(spark, pairs)

    capped = cocitation(e, by="dst", max_deg=5).collect()
    # portal keeps its top-5 weighted dsts (d00..d04) -> C(5,2)=10 pairs,
    # tiny keeps both -> 1 pair (d00,d01) overlapping portal's
    got = {(r.u, r.v): (r.common, r.w_prod) for r in capped}
    assert len(got) == 10
    kept = [f"d{i:02d}" for i in range(5)]
    assert set().union(*[{u, v} for u, v in got]) == set(kept)
    # the overlapping pair aggregates BOTH shared nodes
    assert got[("d00", "d01")] == (2, 100 * 99 + 1 * 1)
    # oversized surfacing: portal (deg 20, dropped 15), tiny absent
    over = {r.node: (r.deg, r.dropped) for r in
            cocitation_oversized(e, by="dst", max_deg=5).collect()}
    assert over == {"portal": (20, 15)}
    # uncapped (max_deg=None) still enumerates all C(20,2)+0 pairs
    assert cocitation(e, by="dst", max_deg=None).count() == 190 + 1 - 1


def test_k_core_fixpoint_resolves_deep_cascade(spark):
    """r7: a pendant chain peels ONE node per round (each removal drops
    its neighbor to degree 1), so 3 pinned rounds leave tail remnants
    while the fixpoint resolves to exactly the triangle core."""
    from ult_spark.ops.graph import k_core, k_core_fixpoint

    chain = [(f"c{i}", f"c{i + 1}", 1) for i in range(8)]
    tri = [("c8", "t1", 1), ("c8", "t2", 1), ("t1", "t2", 1)]
    e = _edges_df(spark, chain + tri)
    fix = {r.host: r.deg for r in k_core_fixpoint(e, k=2).collect()}
    assert fix == {"c8": 2, "t1": 2, "t2": 2}
    # the 3-round form still carries chain remnants (cascade too deep);
    # NOTE a deep Spark-side unroll is NOT usable as the truth here —
    # each lazy round references its input 3x, so rounds=12 is a 3^12
    # analyzer blowup (CLAUDE.md r3) — the fixpoint loop exists exactly
    # because of that wall; driver parity vs the unrolled-24 SQL oracle
    # covers the equivalence on real data
    three = {r.host for r in k_core(e, k=2, rounds=3).collect()}
    assert {"c0", "c1", "c2"}.isdisjoint(three) and len(three) > 3


def test_label_propagation_two_cliques(spark):
    """r7: two 4-cliques joined by one bridge edge — after 2 sweeps every
    clique member carries its clique's min id; the deterministic
    (count DESC, label ASC) tie rule keeps the bridge endpoints in their
    own cliques (3 same-clique votes vs 1 across)."""
    from itertools import combinations

    from ult_spark.ops.graph import label_propagation

    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    pairs = [(u, v, 1) for u, v in combinations(a, 2)]
    pairs += [(u, v, 1) for u, v in combinations(b, 2)]
    pairs += [("a0", "b0", 1)]
    got = {r.host: r.label for r in label_propagation(
        _edges_df(spark, pairs), rounds=2).collect()}
    assert {got[h] for h in a} == {"a0"}
    assert {got[h] for h in b} == {"b0"}


def test_linkstats_match_bruteforce_reference(spark):
    """r7: jaccard_links / adamic_adar / assortativity against plain-Python
    brute force on a deterministic pseudo-random digraph (uncapped —
    caps are pinned separately by the hub test)."""
    import math

    from ult_spark.ops.graph import adamic_adar, assortativity, jaccard_links

    # deterministic scruffy digraph: 40 arcs over 8 srcs x 10 dsts
    arcs = sorted({
        (f"s{(i * 7) % 8}", f"d{(i * i + 3 * i) % 10}") for i in range(60)
    })
    pairs = [(u, v, (hash_w := 1 + (len(u + v) + i) % 5)) for i, (u, v) in enumerate(arcs)]
    e = _edges_df(spark, pairs)

    # --- reference: in-neighbor sets per dst (by='dst', share=src)
    nbr: dict[str, set[str]] = {}
    for u, v, _ in pairs:
        nbr.setdefault(v, set()).add(u)
    hosts = sorted(nbr)
    want_j, want_aa = {}, {}
    fan = {}
    for u, v, _ in pairs:
        fan[u] = fan.get(u, 0) + 1
    for i, a in enumerate(hosts):
        for b in hosts[i + 1:]:
            common = nbr[a] & nbr[b]
            if not common:
                continue
            want_j[(a, b)] = math.floor(
                1e6 * len(common) / (len(nbr[a]) + len(nbr[b]) - len(common))
            )
            want_aa[(a, b)] = sum(
                math.floor(1e6 / math.log(fan[z])) for z in common
            )
    got_j = {(r.u, r.v): r.jaccard_e6 for r in
             jaccard_links(e, by="dst", max_deg=None).collect()}
    assert got_j == want_j
    got_aa = {(r.u, r.v): r.aa_e6 for r in
              adamic_adar(e, by="dst", max_deg=None).collect()}
    assert got_aa == want_aa

    # --- assortativity reference over the undirected simple graph
    und = sorted({(min(u, v), max(u, v)) for u, v, _ in pairs if u != v})
    deg: dict[str, int] = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    jk = [(deg[u], deg[v]) for u, v in und] + [(deg[v], deg[u]) for u, v in und]
    m = len(jk)
    s1 = sum(j for j, _ in jk)
    s2 = sum(j * j for j, _ in jk)
    sjk = sum(j * k for j, k in jk)
    want_r = math.floor(1e6 * (m * sjk - s1 * s1) / (m * s2 - s1 * s1))
    row = assortativity(e).collect()[0]
    assert (row.m, row.s1, row.s2, row.sjk, row.r_e6) == (m, s1, s2, sjk, want_r)


# ---------------------------------------------------------------------------
# r7 continuation: edge triangle support, personalized PageRank, CC labels

def test_edge_support_k4_plus_pendant(spark):
    """K4: every edge sits in exactly 2 triangles; the pendant edge in 0."""
    from ult_spark.ops.graph import edge_triangle_support

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    got = {
        (r["u"], r["v"]): r["support"]
        for r in edge_triangle_support(_edges_df(spark, [(a, b, 1) for a, b in k4 + [("d", "p")]])).collect()
    }
    assert len(got) == 7
    assert got[("d", "p")] == 0
    assert all(got[e] == 2 for e in k4)


def test_edge_support_total_is_three_times_triangles(spark):
    """Sum of supports = 3 × triangle count (each triangle has 3 sides)."""
    from ult_spark.ops.graph import edge_triangle_support, triangles

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
             ("e", "c"), ("a", "e")]
    e = _edges_df(spark, [(a, b, 1) for a, b in pairs])
    total_support = sum(r["support"] for r in edge_triangle_support(e).collect())
    tri_sum = sum(r["tri"] for r in triangles(e).collect())  # 3 memberships/tri
    assert total_support == tri_sum


def _ref_ppr(edges, iters=3, d=850):
    """Pure-Python mirror of the personalized integer recurrence."""
    e = [(s, t, w) for s, t, w in edges if s != t]
    nodes = sorted({s for s, _, _ in e} | {t for _, t, _ in e})
    seed = min(nodes)
    outw: dict[str, int] = {}
    for s, _, w in e:
        outw[s] = outw.get(s, 0) + w
    base = (E9 * (1000 - d)) // 1000
    rank = {v: (E9 if v == seed else 0) for v in nodes}
    for _ in range(iters):
        s: dict[str, int] = {}
        for u, v, w in e:
            s[v] = s.get(v, 0) + (rank[u] * w) // outw[u]
        rank = {
            v: (base if v == seed else 0) + (s.get(v, 0) * d) // 1000
            for v in nodes
        }
    return rank


def test_ppr_matches_reference_and_localizes(spark):
    from ult_spark.ops.graph import personalized_pagerank

    edges = [("a", "b", 2), ("b", "a", 1), ("b", "c", 1), ("c", "d", 3),
             ("d", "a", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["rank"] for r in personalized_pagerank(df).collect()}
    assert got == _ref_ppr(edges)
    # seed 'a' always keeps at least the restart mass
    assert got["a"] >= (E9 * 150) // 1000


def test_ppr_unreachable_node_gets_zero(spark):
    from ult_spark.ops.graph import personalized_pagerank

    # seed is 'a' (min id); z→y is a separate component: no walk reaches it
    edges = [("a", "b", 1), ("z", "y", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["rank"] for r in personalized_pagerank(df).collect()}
    assert got["y"] == 0 and got["z"] == 0
    assert got["a"] > 0 and got["b"] > 0


def test_cc_graph_two_cliques_and_bridgeless(spark):
    from ult_spark.ops.graph import connected_components_graph

    pairs = [("a", "b", 1), ("b", "c", 1), ("a", "c", 1), ("x", "y", 1),
             ("y", "z", 1)]
    got = {
        r["host"]: r["component"]
        for r in connected_components_graph(_edges_df(spark, pairs)).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_ktruss_cascade_and_fixpoint(spark):
    """r7: a triangle strip (t_i = v_i v_{i+1} v_{i+2}) under a 4-truss
    peels in stages — skip edges carry support 1 and drop in round 1,
    the surviving path holds no triangles and drops in round 2 — while
    a separate 5-clique (every edge support 3) is untouched; the
    fixpoint resolves to exactly the clique."""
    from itertools import combinations

    from ult_spark.ops.graph import ktruss, ktruss_fixpoint

    strip = [(f"v{i}", f"v{i + 1}", 1) for i in range(9)]
    strip += [(f"v{i}", f"v{i + 2}", 1) for i in range(8)]
    clique = [(u, v, 1) for u, v in combinations([f"k{i}" for i in range(5)], 2)]
    e = _edges_df(spark, strip + clique)

    fix = {(r.u, r.v): r.support for r in ktruss_fixpoint(e, k=4).collect()}
    want = {tuple(sorted(p)) for p in combinations([f"k{i}" for i in range(5)], 2)}
    assert set(fix) == want and set(fix.values()) == {3}

    # round 1 alone still carries the strip's interior path edges
    # (support 2 before the skip edges vanish) — the cascade is real
    one = {(r.u, r.v) for r in ktruss(e, k=4, rounds=1).collect()}
    assert want < one
    assert {(f"v{i}", f"v{i + 1}") for i in range(1, 8)} <= one


def test_rich_club_closed_form(spark):
    """r7: 4-clique + pendant — φ(1) = 1.0 exactly (the deg>1 elite IS
    the clique), φ(3) NULL (a single node is not a club), and suffix
    counts match the hand histogram."""
    from itertools import combinations

    from ult_spark.ops.graph import rich_club

    clique = [(u, v, 1) for u, v in combinations(["a", "b", "c", "d"], 2)]
    e = _edges_df(spark, clique + [("a", "p", 1)])
    got = {r.k: (r.n_k, r.e_k, r.phi_e6) for r in rich_club(e).collect()}
    # degrees: a=4, b=c=d=3, p=1 → thresholds {1, 3, 4}
    assert set(got) == {1, 3, 4}
    assert got[1] == (4, 6, 1_000_000)  # the clique is a perfect rich club
    assert got[3] == (1, 0, None)
    assert got[4] == (0, 0, None)


def test_transitivity_closed_forms(spark):
    """r7: a 4-clique is perfectly transitive (C = 1), a star has
    wedges but no triangle (C = 0), and the pair composes additively
    in the sums."""
    from itertools import combinations

    from ult_spark.ops.graph import transitivity

    clique = [(u, v, 1) for u, v in combinations(["a", "b", "c", "d"], 2)]
    star = [("h", f"s{i}", 1) for i in range(4)]
    c = transitivity(_edges_df(spark, clique)).collect()[0]
    assert (c.wedges, c.triangles, c.trans_e6) == (12, 4, 1_000_000)
    s = transitivity(_edges_df(spark, star)).collect()[0]
    assert (s.wedges, s.triangles, s.trans_e6) == (6, 0, 0)
    both = transitivity(_edges_df(spark, clique + star)).collect()[0]
    assert (both.wedges, both.triangles) == (18, 4)


def test_harmonic_centrality_path_closed_form(spark):
    """r7: all-seed harmonic centrality on a 4-path — interior nodes
    reach everyone closer (1/1+1/1+1/2), endpoints pay the long way
    (1/1+1/2+1/3 with the 333333 floor)."""
    from ult_spark.ops.graph import harmonic_centrality

    path = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    got = {r.host: (r.n_reached, r.h_e6) for r in
           harmonic_centrality(_edges_df(spark, path), k_seeds=4, rounds=4).collect()}
    assert got == {
        "a": (3, 1_833_333), "b": (3, 2_500_000),
        "c": (3, 2_500_000), "d": (3, 1_833_333),
    }
