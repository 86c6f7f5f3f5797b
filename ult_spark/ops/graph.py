"""Link-graph analytics — fixed-iteration weighted PageRank.

``pagerank(edges, iters)`` runs the classic power iteration (Page et al.
1999) over a weighted directed edge list, in ALL-INTEGER arithmetic so
the result is bit-identical across engines and partitionings:

- ranks are e9-scaled BIGINTs, ``r0 = 10^9 div N`` per node;
- a node's rank flows along its out-edges proportional to edge weight:
  ``contrib(u→v) = (r_u * w) div outw_u`` (exact integer division);
- ``r_{i+1}(v) = ((10^9 * (1000 - d_e3)) div 1000) div N
  + (sum_contrib * d_e3) div 1000`` with damping ``d_e3 = 850``.

Pinned simplifications (documented, deterministic): self-loops are
removed before weighting; dangling-node mass is NOT redistributed (the
usual teleport-to-all correction needs a global scalar per iteration —
rank totals therefore shrink slightly each round, which is fine for the
ranking/feature use cases this feeds); integer-div remainders are
dropped per term.

Scale shape: the node set and per-source out-weights are one groupBy
each; every iteration is one edges⋈ranks hash equi-join keyed by src +
one dst-keyed partial-agg groupBy + one nodes left-join — all shuffles
on graph keys, nothing quadratic, no driver actions inside the loop
(``iters`` chained rounds build ONE lazy plan, the ivf_train pattern —
plan growth is linear in ``iters`` because rounds are not self-joins).
N reaches the plan as a broadcast one-row aggregate, not a collected
literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

E9 = 1_000_000_000


def _idiv(a: str, b: str) -> F.Column:
    """Exact BIGINT integer division of two named columns."""
    return F.expr(f"{a} div {b}")


def pagerank(edges: DataFrame, iters: int = 3, damping_e3: int = 850) -> DataFrame:
    """(node, rank) after ``iters`` damped power-iteration rounds.

    ``edges`` is (src, dst, w) with BIGINT-compatible weights; self-loops
    are dropped here. Nodes = every distinct endpoint (a node appearing
    only as a dst still ranks — it just contributes nothing onward).
    """
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst", "w")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n1 = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("long").alias("_n")))
    outw = e.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    ew = e.join(outw, "src")
    base = (E9 * (1000 - damping_e3)) // 1000
    ranks = (
        nodes.crossJoin(n1)
        .withColumn("_e9", F.lit(E9).cast("long"))
        .select("node", _idiv("_e9", "_n").alias("rank"))
    )
    for _ in range(iters):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .withColumn("_rw", (F.col("rank") * F.col("w")).cast("long"))
            .select(F.col("dst").alias("node"), _idiv("_rw", "outw").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").cast("long").alias("_s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(n1)
            .withColumn("_base", F.lit(base).cast("long"))
            .withColumn(
                "_d", (F.coalesce(F.col("_s"), F.lit(0)) * damping_e3).cast("long")
            )
            .select(
                "node",
                (_idiv("_base", "_n") + F.expr("_d div 1000")).alias("rank"),
            )
        )
    return ranks


def pagerank_sql(
    edges_sql: str, iters: int = 3, damping_e3: int = 850
) -> str:
    """DuckDB mirror: ``edges_sql`` must select (src, dst, w); the CTE chain
    unrolls the same integer iteration."""
    base = (E9 * (1000 - damping_e3)) // 1000
    # AS MATERIALIZED everywhere — the k_core_sql/hits_sql inlining rule
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "e AS MATERIALIZED (SELECT src, dst, w FROM e0 WHERE src != dst)",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, e.w, ow.outw FROM e JOIN ow USING (src))",
        f"r0 AS MATERIALIZED (SELECT node, {E9} // (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT ew.dst AS node, "
            f"CAST(sum((r.rank * ew.w) // ew.outw) AS BIGINT) AS s "
            f"FROM ew JOIN r{i - 1} r ON r.node = ew.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.node, {base} // (SELECT n FROM nn) "
            f"+ (coalesce(c{i}.s, 0) * {damping_e3}) // 1000 AS rank "
            f"FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node, CAST(rank AS BIGINT) AS rank FROM r{iters}"
    )


E6 = 1_000_000


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, hub, auth) after ``iters`` HITS rounds (Kleinberg 1999) in
    ALL-INTEGER e6 arithmetic.

    Per round: ``auth_raw(v) = Σ_{u→v} hub(u)·w`` then sum-normalize
    ``auth = auth_raw · 10^6 div Σauth_raw`` (exact integer division,
    remainders dropped — pinned); hubs symmetrically from the NEW auths.
    Init ``hub = 10^6 div N``. Nodes without in-edges (out-edges) carry
    auth (hub) 0, kept in the output via left joins.

    Determinism: identical integer sequences in both engines; the only
    divisions are BIGINT ``div``. Overflow bound (documented): scores
    are ≤ 10^6 after each normalization, so the raw products need
    ``10^6 · max node degree-weight < 2^63/10^6`` ⇒ per-node weighted
    degree below ~9·10^9 — far above any real host graph; pre-scale w
    otherwise.

    Scale shape: every round is two hash equi-joins keyed by src/dst +
    two partial-agg groupBys; each round's raw aggregates are
    localCheckpoint'd so the normalizer's broadcast one-row agg and the
    probe side read ONE materialized RDD instead of re-executing the
    upstream per branch (r7 fix — see the inline comment for the
    measured 2^iters re-execution the lazy form had)."""
    # r7 (r6 ADVICE): iters=0 left auth uninitialized and crashed in the
    # final join; the SQL twin also assumes at least one round — reject.
    assert iters >= 1, "hits needs at least one iteration"
    from ult_spark.ops.textops import _stats_barrier

    # r7 (measured at 10x input): the one-lazy-plan form re-executed its
    # upstream once per normalizer branch — each crossJoin(broadcast(agg))
    # is a SEPARATE branch Spark does not share with the probe side, and
    # with 2 normalizers per round the re-execution compounds ~2^iters
    # (16 s wall at 10x, FLAT from local[2] to local[8] — the work was
    # driver-sequenced branch recomputation, not parallel tasks). Each
    # round's raw aggregates are therefore localCheckpoint'd (one tiny
    # keyed job; the normalizer agg and the probe side then both read the
    # materialized RDD), with the stats barrier from the CC core. The
    # integer sequence is unchanged — the oracle certifies it.
    e = _stats_barrier(
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst", "w")
        .localCheckpoint()
    )
    nodes = _stats_barrier(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n1 = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("long").alias("_n")))
    hub = (
        nodes.crossJoin(n1)
        .withColumn("_e6", F.lit(E6).cast("long"))
        .select("node", _idiv("_e6", "_n").alias("hub"))
    )
    auth = None
    for _ in range(iters):
        araw = _stats_barrier(
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("hub") * F.col("w")).cast("long").alias("_hw"))
            .groupBy("dst")
            .agg(F.sum("_hw").cast("long").alias("_ar"))
            .localCheckpoint()
        )
        sa = F.broadcast(
            araw.agg(F.greatest(F.sum("_ar"), F.lit(1)).cast("long").alias("_sa"))
        )
        auth = (
            nodes.join(araw.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(sa)
            .withColumn(
                "_num", (F.coalesce(F.col("_ar"), F.lit(0)) * E6).cast("long")
            )
            .select("node", _idiv("_num", "_sa").alias("auth"))
        )
        hraw = _stats_barrier(
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .select("src", (F.col("auth") * F.col("w")).cast("long").alias("_aw"))
            .groupBy("src")
            .agg(F.sum("_aw").cast("long").alias("_hr"))
            .localCheckpoint()
        )
        sh = F.broadcast(
            hraw.agg(F.greatest(F.sum("_hr"), F.lit(1)).cast("long").alias("_sh"))
        )
        hub = (
            nodes.join(hraw.withColumnRenamed("src", "node"), "node", "left")
            .crossJoin(sh)
            .withColumn(
                "_num", (F.coalesce(F.col("_hr"), F.lit(0)) * E6).cast("long")
            )
            .select("node", _idiv("_num", "_sh").alias("hub"))
        )
    return hub.join(auth, "node").select("node", "hub", "auth")


def hits_sql(edges_sql: str, iters: int = 3) -> str:
    """DuckDB mirror of :func:`hits`: unrolled CTE chain, identical
    integer sequence."""
    # every CTE AS MATERIALIZED (r7): DuckDB inlines CTE references, so
    # the unrolled normalizer chain re-read the base ~2^(2*iters) times
    # (99 s at sf0.01; materialized, sub-second) — the k_core_sql rule
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "e AS MATERIALIZED (SELECT src, dst, w FROM e0 WHERE src != dst)",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        f"h0 AS MATERIALIZED (SELECT node, {E6} // (SELECT n FROM nn) AS hub FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts += [
            f"ar{i} AS MATERIALIZED (SELECT e.dst, CAST(sum(h.hub * e.w) AS BIGINT) AS ar "
            f"FROM e JOIN h{i - 1} h ON h.node = e.src GROUP BY 1)",
            f"sa{i} AS MATERIALIZED (SELECT greatest(CAST(sum(ar) AS BIGINT), 1) AS s FROM ar{i})",
            f"a{i} AS MATERIALIZED (SELECT n.node, "
            f"(coalesce(ar{i}.ar, 0) * {E6}) // (SELECT s FROM sa{i}) AS auth "
            f"FROM nodes n LEFT JOIN ar{i} ON ar{i}.dst = n.node)",
            f"hr{i} AS MATERIALIZED (SELECT e.src, CAST(sum(a.auth * e.w) AS BIGINT) AS hr "
            f"FROM e JOIN a{i} a ON a.node = e.dst GROUP BY 1)",
            f"sh{i} AS MATERIALIZED (SELECT greatest(CAST(sum(hr) AS BIGINT), 1) AS s FROM hr{i})",
            f"h{i} AS MATERIALIZED (SELECT n.node, "
            f"(coalesce(hr{i}.hr, 0) * {E6}) // (SELECT s FROM sh{i}) AS hub "
            f"FROM nodes n LEFT JOIN hr{i} ON hr{i}.src = n.node)",
        ]
    return (
        ", ".join(parts)
        + f" SELECT h.node, CAST(h.hub AS BIGINT) AS hub, "
        f"CAST(a.auth AS BIGINT) AS auth "
        f"FROM h{iters} h JOIN a{iters} a ON a.node = h.node"
    )


#: Per-shared-node edge cap for :func:`cocitation` — a hub citing k
#: counterparts contributes C(k, 2) pairs, so the cap bounds self-join
#: fanout at max_deg² per node. 256 keeps any realistic reporting graph
#: intact while making the adversarial hub (a portal page linking
#: 100k hosts → 5·10⁹ pairs) structurally impossible.
DEFAULT_MAX_DEG = 256


def _capped_edges(edges: DataFrame, share: str, other: str, max_deg: int) -> DataFrame:
    """Top-``max_deg`` edges per shared node by (w DESC, other ASC) — a
    deterministic total order (``other`` is unique within a shared node
    on the aggregated edge list), so both engines keep the same rows."""
    w = Window.partitionBy(share).orderBy(F.col("w").desc(), F.col(other).asc())
    return (
        edges.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_deg)
        .drop("_rn")
    )


def cocitation(
    edges: DataFrame, by: str = "dst", max_deg: int = DEFAULT_MAX_DEG
) -> DataFrame:
    """Co-citation and bibliographic coupling (Small 1973 / Kessler 1963).
    ``by='dst'``: pairs of destinations sharing a SOURCE (cited together
    by the same page) — co-citation. ``by='src'``: pairs of sources
    sharing a DESTINATION (citing the same page) — bibliographic
    coupling. Emits (u, v, common, w_prod) with
    u < v: ``common`` = number of shared counterpart nodes, ``w_prod`` =
    Σ over shared nodes of the two edge weights' product (the classic
    weighted form) — all exact integers.

    One self-join keyed on the SHARED endpoint + one partial-agg groupBy
    on the pair. Cost is quadratic in per-node degree by definition of
    the statistic, so the operator ENFORCES a per-shared-node cap (r7,
    was a docstring suggestion): each shared node keeps its top
    ``max_deg`` edges by (weight DESC, id ASC) — one window + filter
    before the self-join, bounding fanout at max_deg² per node. A
    capped result is a lower bound for hub-adjacent pairs — run
    :func:`cocitation_oversized` alongside to see exactly which shared
    nodes were truncated and by how much (the near_dup_oversized
    protocol). ``max_deg=None`` disables the cap."""
    share, other = ("src", "dst") if by == "dst" else ("dst", "src")
    if max_deg is not None:
        edges = _capped_edges(edges, share, other, max_deg)
    l = edges.select(F.col(share).alias("_s"), F.col(other).alias("u"),
                     F.col("w").alias("_wu"))
    r = edges.select(F.col(share).alias("_s"), F.col(other).alias("v"),
                     F.col("w").alias("_wv"))
    return (
        l.join(r, "_s")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum(F.col("_wu") * F.col("_wv")).cast("long").alias("w_prod"),
        )
    )


def cocitation_oversized(
    edges: DataFrame, by: str = "dst", max_deg: int = DEFAULT_MAX_DEG
) -> DataFrame:
    """The surfacing half of the capped co-citation plan: shared nodes
    whose fanout exceeds ``max_deg`` as (node, deg, dropped) — exactly
    the edges :func:`cocitation`'s cap pruned. Empty on a healthy graph;
    one partial-agg groupBy on the shared endpoint."""
    share = "src" if by == "dst" else "dst"
    return (
        edges.groupBy(F.col(share).alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .where(F.col("deg") > max_deg)
        .select("node", "deg", (F.col("deg") - F.lit(max_deg)).cast("long").alias("dropped"))
    )


def cocitation_sql(
    edges_sql: str, by: str = "dst", max_deg: int | None = DEFAULT_MAX_DEG
) -> str:
    share, other = ("src", "dst") if by == "dst" else ("dst", "src")
    cap = (
        f"(SELECT * FROM e0 QUALIFY row_number() OVER "
        f"(PARTITION BY {share} ORDER BY w DESC, {other} ASC) <= {max_deg})"
        if max_deg is not None
        else "(SELECT * FROM e0)"
    )
    return (
        f"WITH e0 AS ({edges_sql}), e AS {cap} "
        f"SELECT l.{other} AS u, r.{other} AS v, "
        "CAST(count(*) AS BIGINT) AS common, "
        "CAST(sum(l.w * r.w) AS BIGINT) AS w_prod "
        f"FROM e l JOIN e r ON l.{share} = r.{share} "
        f"AND l.{other} < r.{other} GROUP BY 1, 2"
    )


def cocitation_oversized_sql(
    edges_sql: str, by: str = "dst", max_deg: int = DEFAULT_MAX_DEG
) -> str:
    share = "src" if by == "dst" else "dst"
    return (
        f"WITH e AS ({edges_sql}) "
        f"SELECT {share} AS node, CAST(count(*) AS BIGINT) AS deg, "
        f"CAST(count(*) - {max_deg} AS BIGINT) AS dropped "
        f"FROM e GROUP BY 1 HAVING count(*) > {max_deg}"
    )


# ---------------------------------------------------------------------------
# k-core peel (Seidman 1983) — fixed-round degeneracy peeling

def k_core(edges: DataFrame, k: int = 4, rounds: int = 3, min_w: int = 1) -> DataFrame:
    """(host, deg) of nodes surviving ``rounds`` k-core peels of the
    UNDIRECTED simple graph (self-loops dropped, directions merged; a
    directed edge must carry weight >= ``min_w`` to contribute, so the
    undirected edge survives iff EITHER direction does): each round
    removes every node with degree < k and the edges touching it, so
    removals CASCADE — the classic core-decomposition step that
    isolates the densely interlinked host community from the long tail.

    Fixed ``rounds`` (unrolled identically in the SQL twin) rather than
    a fixpoint loop: each round's plan references the previous round
    three times (degree + two endpoint semi-joins), so plan size grows
    ~3^rounds — fine at the 2-4 rounds a reporting query wants; a true
    fixpoint version would need the localCheckpoint-per-round pattern
    (textops dup_clusters). ``deg`` is the degree INSIDE the surviving
    subgraph after the final peel. Scale: each round is one groupBy +
    two hash semi-joins on the (already aggregated) edge list."""
    und = (
        edges.where((F.col("src") != F.col("dst")) & (F.col("w") >= min_w))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    cur = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    for _ in range(rounds):
        keep = (
            cur.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") >= k)
            .select("u")
        )
        cur = cur.join(keep, "u").join(keep.select(F.col("u").alias("v")), "v")
    return (
        cur.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("u").alias("host"), "deg")
    )


def k_core_fixpoint(
    edges: DataFrame, k: int = 4, min_w: int = 1, max_rounds: int = 64
) -> DataFrame:
    """TRUE-fixpoint k-core (r7, was 3 pinned rounds): peel until no
    node is removed, so arbitrarily deep cascades (a long pendant chain
    peels one node per round) resolve exactly.

    Same construction and output as :func:`k_core`; the loop is the
    dup_clusters discipline — per-round localCheckpoint truncates
    lineage (each round references its input 3×: degree + two endpoint
    semi-joins, so a lazy chain grows 3^rounds), the stats barrier
    stops Spark 4's checkpoint-stats compounding, and the fixpoint test
    rides the round's own materialization as an observe() row count
    (edge count unchanged ⇔ the keep-filter removed nothing ⇔ fixpoint,
    since rounds are monotone deletions). Still changing at
    ``max_rounds`` raises :class:`ConvergenceError` loudly."""
    from pyspark.sql import Observation

    from ult_spark.ops.textops import ConvergenceError, _stats_barrier

    und = (
        edges.where((F.col("src") != F.col("dst")) & (F.col("w") >= min_w))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    cur = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    prev: int | None = None
    for _ in range(max_rounds):
        keep = (
            cur.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") >= k)
            .select("u")
        )
        ob = Observation()
        nxt = (
            cur.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .observe(ob, F.count(F.lit(1)).alias("n"))
        )
        cur = _stats_barrier(nxt.localCheckpoint())
        n = ob.get["n"] or 0
        if n == prev:
            break
        prev = n
    else:
        raise ConvergenceError(
            f"k_core_fixpoint: still peeling after {max_rounds} rounds — "
            "raise max_rounds for adversarially deep cascades"
        )
    return (
        cur.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("u").alias("host"), "deg")
    )


def k_core_sql(edges_sql: str, k: int = 4, rounds: int = 3, min_w: int = 1) -> str:
    """Unrolled peel rounds. Every round CTE is AS MATERIALIZED (r7):
    DuckDB INLINES each CTE reference by default, and a round references
    its predecessor 3× — an un-materialized unroll re-reads the base
    parquet 3^rounds times (rounds=8 already ran minutes / exhausted
    file handles; materialized, rounds=24 runs in 0.09 s)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM e WHERE src <> dst AND w >= {min_w}), "
        "s0 AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v, u FROM und)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f", k{i} AS MATERIALIZED (SELECT u FROM s{i - 1} GROUP BY 1 "
            f"HAVING count(*) >= {k}), "
            f"s{i} AS MATERIALIZED (SELECT s.u, s.v FROM s{i - 1} s "
            f"JOIN k{i} a ON a.u = s.u JOIN k{i} b ON b.u = s.v)"
        )
    parts.append(
        f" SELECT u AS host, CAST(count(*) AS BIGINT) AS deg FROM s{rounds} "
        "GROUP BY 1"
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# Triangle counting + local clustering coefficient

def _oriented_edges(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient each undirected (u, v) edge from its lower-(deg, id)
    endpoint to its higher-(deg, id) endpoint (degree-ordered
    orientation; strict total order since ids are distinct). Returns
    (a, b, _db) where a→b and ``_db`` is b's degree (carried so wedge
    legs can be ordered without another join)."""
    e = (
        und.join(deg.select(F.col("host").alias("u"), F.col("deg").alias("_du")), "u")
        .join(deg.select(F.col("host").alias("v"), F.col("deg").alias("_dv")), "v")
    )
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("_db"),
    )


def _wedges(ori: DataFrame) -> DataFrame:
    """Wedge candidates (x, y) per center ``a`` from the degree-oriented
    edge list, legs ordered by (deg, id) so each potential triangle is
    probed exactly once. Per-center fanout is outdeg², and degree
    orientation bounds outdeg by O(√m) / graph arboricity — on a hub of
    degree d whose neighbors are leaves, the id-ordered form probes
    Θ(d²) wedges while this form probes 0 (every edge points INTO the
    hub). tests/test_graph.py pins that star-graph contrast."""
    l = ori.select("a", F.col("b").alias("x"), F.col("_db").alias("_dx"))
    r = ori.select("a", F.col("b").alias("y"), F.col("_db").alias("_dy"))
    leg_lt = (F.col("_dx") < F.col("_dy")) | (
        (F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y"))
    )
    return l.join(r, "a").where(leg_lt).select("a", "x", "y")


def triangles(edges: DataFrame, min_w: int = 1) -> DataFrame:
    """(host, deg, tri, cc_e6) over the undirected simple graph (same
    construction as :func:`k_core`): per-node triangle membership count
    and the local clustering coefficient ``2·tri / (deg·(deg−1))``
    e6-floored (NULL when deg < 2 — no wedge to close).

    r7: triangles are enumerated once each via DEGREE-ORDERED
    orientation (Ortmann & Brandes 2014 / the standard compact-forward
    refinement): orient every edge toward its higher-(deg, id)
    endpoint, pair out-edges per center with legs ordered by (deg, id),
    and close each wedge against the oriented edge list — wedge fanout
    is bounded by out-degree ≤ O(√m) instead of max degree, exactly the
    skew a web host graph has (hubs). The orientation is a
    deterministic total order, so the DuckDB twin mirrors it
    expression-for-expression and the driver hash-match certifies the
    whole enumeration."""
    und = (
        edges.where((F.col("src") != F.col("dst")) & (F.col("w") >= min_w))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("u").alias("host"), "deg")
    )
    ori = _oriented_edges(und, deg)
    tri = (
        _wedges(ori)
        .join(ori.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"])
        .select(
            F.explode(F.array("a", "x", "y")).alias("host")
        )
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    cc = F.floor(
        F.lit(1000000.0)
        * (F.lit(2) * F.coalesce(F.col("tri"), F.lit(0))).cast("double")
        / (F.col("deg") * (F.col("deg") - F.lit(1))).cast("double")
    ).cast("long")
    return (
        deg.join(tri, "host", "left")
        .select(
            "host",
            "deg",
            F.coalesce("tri", F.lit(0).cast("long")).alias("tri"),
            F.when(F.col("deg") >= 2, cc).alias("cc_e6"),
        )
    )


def triangles_sql(edges_sql: str, min_w: int = 1) -> str:
    """DuckDB twin of :func:`triangles` — mirrors the degree-ordered
    orientation with row-value comparisons on (deg, id)."""
    return (
        f"WITH e AS ({edges_sql}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v "
        f"FROM e WHERE src <> dst AND w >= {min_w}), "
        "deg AS (SELECT u AS host, CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT u, v FROM und UNION ALL SELECT v, u FROM und) GROUP BY 1), "
        "ori AS (SELECT "
        "CASE WHEN (du.deg, und.u) < (dv.deg, und.v) THEN und.u ELSE und.v END AS a, "
        "CASE WHEN (du.deg, und.u) < (dv.deg, und.v) THEN und.v ELSE und.u END AS b, "
        "CASE WHEN (du.deg, und.u) < (dv.deg, und.v) THEN dv.deg ELSE du.deg END AS db "
        "FROM und JOIN deg du ON du.host = und.u JOIN deg dv ON dv.host = und.v), "
        "t AS (SELECT l.a, l.b AS x, r.b AS y FROM ori l "
        "JOIN ori r ON r.a = l.a AND (l.db, l.b) < (r.db, r.b) "
        "JOIN ori c ON c.a = l.b AND c.b = r.b), "
        "tri AS (SELECT host, CAST(count(*) AS BIGINT) AS tri FROM "
        "(SELECT a AS host FROM t UNION ALL SELECT x FROM t "
        "UNION ALL SELECT y FROM t) GROUP BY 1) "
        "SELECT d.host, d.deg, COALESCE(tri.tri, 0) AS tri, "
        "CASE WHEN d.deg >= 2 THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(2 * COALESCE(tri.tri, 0) AS DOUBLE) "
        "/ CAST(d.deg * (d.deg - 1) AS DOUBLE)) AS BIGINT) "
        "ELSE NULL END AS cc_e6 "
        "FROM deg d LEFT JOIN tri ON tri.host = d.host"
    )


# ---------------------------------------------------------------------------
# r7 link-analysis family: degree distribution, neighbor-set similarity
# (Jaccard / Adamic-Adar), degree assortativity, label propagation

def _und_simple(edges: DataFrame, min_w: int = 1) -> DataFrame:
    """The shared undirected simple graph: (u, v) with u < v, self-loops
    dropped, directions merged, light edges (< min_w in BOTH directions)
    out."""
    return (
        edges.where((F.col("src") != F.col("dst")) & (F.col("w") >= min_w))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )


def _und_degrees(und: DataFrame) -> DataFrame:
    """(host, deg) over the undirected simple graph."""
    return (
        und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("u").alias("host"), "deg")
    )


def degree_distribution(edges: DataFrame, min_w: int = 1) -> DataFrame:
    """(deg, n_hosts) histogram of undirected simple-graph degrees — the
    first thing anyone plots about a web graph (power-law check). Two
    partial-agg groupBys; nothing else."""
    return (
        _und_degrees(_und_simple(edges, min_w))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hosts"))
    )


def degree_distribution_sql(edges_sql: str, min_w: int = 1) -> str:
    return (
        f"WITH e AS ({edges_sql}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v "
        f"FROM e WHERE src <> dst AND w >= {min_w}), "
        "deg AS (SELECT u AS host, CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT u, v FROM und UNION ALL SELECT v, u FROM und) GROUP BY 1) "
        "SELECT deg, CAST(count(*) AS BIGINT) AS n_hosts FROM deg GROUP BY 1"
    )


def jaccard_links(
    edges: DataFrame, by: str = "dst", max_deg: int = DEFAULT_MAX_DEG
) -> DataFrame:
    """Neighbor-set Jaccard similarity between node pairs: for ``by='dst'``,
    N(u) is the set of SOURCES linking to u (in-neighbor sets) and
    J(u, v) = |N(u)∩N(v)| / |N(u)∪N(v)| — the classic link-based host
    similarity. Emits (u, v, common, deg_u, deg_v, jaccard_e6) for pairs
    with common >= 1; jaccard_e6 = floor(1e6·common/(deg_u+deg_v−common)),
    exact integer ingredients, one floored float expression.

    Same enforced per-shared-node cap as :func:`cocitation` — common AND
    the degrees are computed from the SAME capped edge list, so the
    statistic stays a true Jaccard of the truncated neighbor sets (not a
    mixed-universe ratio)."""
    share, other = ("src", "dst") if by == "dst" else ("dst", "src")
    e = edges.select(share, other, "w").distinct()
    if max_deg is not None:
        e = _capped_edges(e, share, other, max_deg)
    deg = e.groupBy(other).agg(F.count(F.lit(1)).cast("long").alias("deg"))
    l = e.select(F.col(share).alias("_s"), F.col(other).alias("u"))
    r = e.select(F.col(share).alias("_s"), F.col(other).alias("v"))
    common = (
        l.join(r, "_s")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    j_e6 = F.floor(
        F.lit(1000000.0)
        * F.col("common").cast("double")
        / (F.col("deg_u") + F.col("deg_v") - F.col("common")).cast("double")
    ).cast("long")
    return (
        common.join(deg.select(F.col(other).alias("u"),
                               F.col("deg").alias("deg_u")), "u")
        .join(deg.select(F.col(other).alias("v"),
                         F.col("deg").alias("deg_v")), "v")
        .select("u", "v", "common", "deg_u", "deg_v", j_e6.alias("jaccard_e6"))
    )


def jaccard_links_sql(
    edges_sql: str, by: str = "dst", max_deg: int | None = DEFAULT_MAX_DEG
) -> str:
    share, other = ("src", "dst") if by == "dst" else ("dst", "src")
    cap = (
        f"(SELECT * FROM e0 QUALIFY row_number() OVER "
        f"(PARTITION BY {share} ORDER BY w DESC, {other} ASC) <= {max_deg})"
        if max_deg is not None
        else "(SELECT * FROM e0)"
    )
    return (
        f"WITH e0 AS (SELECT DISTINCT src, dst, w FROM ({edges_sql})), "
        f"e AS {cap}, "
        f"deg AS (SELECT {other} AS n, CAST(count(*) AS BIGINT) AS deg "
        "FROM e GROUP BY 1), "
        f"c AS (SELECT l.{other} AS u, r.{other} AS v, "
        "CAST(count(*) AS BIGINT) AS common "
        f"FROM e l JOIN e r ON l.{share} = r.{share} AND l.{other} < r.{other} "
        "GROUP BY 1, 2) "
        "SELECT c.u, c.v, c.common, du.deg AS deg_u, dv.deg AS deg_v, "
        "CAST(floor(1000000.0::DOUBLE * CAST(c.common AS DOUBLE) "
        "/ CAST(du.deg + dv.deg - c.common AS DOUBLE)) AS BIGINT) AS jaccard_e6 "
        "FROM c JOIN deg du ON du.n = c.u JOIN deg dv ON dv.n = c.v"
    )


def adamic_adar(
    edges: DataFrame, by: str = "dst", max_deg: int = DEFAULT_MAX_DEG
) -> DataFrame:
    """Adamic-Adar link-prediction index (Adamic & Adar 2003): for each
    node pair, Σ over shared neighbors z of 1/ln(deg(z)) — rare shared
    neighbors count more than hubs. Emits (u, v, common, aa_e6).

    Cross-engine exactness: the per-z term floor(1e6/ln(deg z)) is
    floored BEFORE the pair sum, so the sum is an order-free integer
    (the host_lang_divergence discipline); deg(z) ≥ 2 whenever z is a
    shared neighbor, so ln is never 0. Same per-shared-node cap as
    :func:`cocitation`; deg(z) is the CAPPED fanout for consistency."""
    share, other = ("src", "dst") if by == "dst" else ("dst", "src")
    e = edges.select(share, other, "w").distinct()
    if max_deg is not None:
        e = _capped_edges(e, share, other, max_deg)
    fan = e.groupBy(share).agg(F.count(F.lit(1)).cast("long").alias("_fan"))
    term = F.floor(
        F.lit(1000000.0) / F.log(F.col("_fan").cast("double"))
    ).cast("long")
    ez = e.join(fan, share).select(
        F.col(share).alias("_s"), F.col(other).alias("u"), term.alias("_t")
    )
    return (
        ez.join(
            ez.select(F.col("_s"), F.col("u").alias("v"), F.col("_t").alias("_t2")),
            "_s",
        )
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum("_t").cast("long").alias("aa_e6"),
        )
    )


def adamic_adar_sql(
    edges_sql: str, by: str = "dst", max_deg: int | None = DEFAULT_MAX_DEG
) -> str:
    share, other = ("src", "dst") if by == "dst" else ("dst", "src")
    cap = (
        f"(SELECT * FROM e0 QUALIFY row_number() OVER "
        f"(PARTITION BY {share} ORDER BY w DESC, {other} ASC) <= {max_deg})"
        if max_deg is not None
        else "(SELECT * FROM e0)"
    )
    return (
        f"WITH e0 AS (SELECT DISTINCT src, dst, w FROM ({edges_sql})), "
        f"e AS {cap}, "
        f"fan AS (SELECT {share} AS s, CAST(count(*) AS BIGINT) AS f "
        "FROM e GROUP BY 1), "
        f"ez AS (SELECT e.{share} AS s, e.{other} AS u, "
        "CAST(floor(1000000.0::DOUBLE / ln(CAST(fan.f AS DOUBLE))) AS BIGINT) AS t "
        f"FROM e JOIN fan ON fan.s = e.{share}) "
        "SELECT l.u, r.u AS v, CAST(count(*) AS BIGINT) AS common, "
        "CAST(sum(l.t) AS BIGINT) AS aa_e6 "
        "FROM ez l JOIN ez r ON l.s = r.s AND l.u < r.u GROUP BY 1, 2"
    )


def assortativity(edges: DataFrame, min_w: int = 1) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the undirected
    simple graph — do high-degree hosts link to each other (r > 0) or to
    the long tail (r < 0, the classic web shape)? Over the symmetric
    directed edge list with endpoint degrees (j, k):
    ``r = (M·Σjk − S1²) / (M·Σj² − S1²)`` where S1 = Σj (= Σk by
    symmetry) — every ingredient an exact integer, one floored float
    ratio. Emits the single row (m, s1, s2, sjk, r_e6); r_e6 NULL for a
    degree-regular graph (zero variance). Integer range: M·Σj² needs
    deg³·m < 2^63 — shard the sums by parent host prefix beyond ~10⁶
    average degree², far past any real host graph."""
    und = _und_simple(edges, min_w)
    deg = _und_degrees(und)
    both = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    jk = (
        both.join(deg.select(F.col("host").alias("u"), F.col("deg").alias("_j")), "u")
        .join(deg.select(F.col("host").alias("v"), F.col("deg").alias("_k")), "v")
    )
    agg = jk.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("_j").cast("long").alias("s1"),
        F.sum(F.col("_j") * F.col("_j")).cast("long").alias("s2"),
        F.sum(F.col("_j") * F.col("_k")).cast("long").alias("sjk"),
    )
    num = F.col("m") * F.col("sjk") - F.col("s1") * F.col("s1")
    den = F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    r_e6 = F.when(
        den > 0,
        F.floor(F.lit(1000000.0) * num.cast("double") / den.cast("double")),
    ).cast("long")
    return agg.select("m", "s1", "s2", "sjk", r_e6.alias("r_e6"))


def assortativity_sql(edges_sql: str, min_w: int = 1) -> str:
    return (
        f"WITH e AS ({edges_sql}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v "
        f"FROM e WHERE src <> dst AND w >= {min_w}), "
        "both_d AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und), "
        "deg AS (SELECT u AS host, CAST(count(*) AS BIGINT) AS deg "
        "FROM both_d GROUP BY 1), "
        "jk AS (SELECT dj.deg AS j, dk.deg AS k FROM both_d b "
        "JOIN deg dj ON dj.host = b.u JOIN deg dk ON dk.host = b.v), "
        "a AS (SELECT CAST(count(*) AS BIGINT) AS m, "
        "CAST(sum(j) AS BIGINT) AS s1, CAST(sum(j * j) AS BIGINT) AS s2, "
        "CAST(sum(j * k) AS BIGINT) AS sjk FROM jk) "
        "SELECT m, s1, s2, sjk, "
        "CASE WHEN m * s2 - s1 * s1 > 0 THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(m * sjk - s1 * s1 AS DOUBLE) "
        "/ CAST(m * s2 - s1 * s1 AS DOUBLE)) AS BIGINT) ELSE NULL END AS r_e6 "
        "FROM a"
    )


def label_propagation(
    edges: DataFrame, rounds: int = 2, min_w: int = 1
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan 2007 with a
    pinned tie rule): labels start as own ids; each round every node
    adopts the most frequent label among its NEIGHBORS, ties broken by
    min label — fully deterministic, so the unrolled SQL twin matches
    exactly. Fixed small ``rounds`` (community detection plateaus in a
    few sweeps; each round is one groupBy + one ranked window over
    neighbor-label counts, all keyed shuffles). Emits (host, label)."""
    und = _und_simple(edges, min_w)
    both = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = both.select("u").distinct().select(
        F.col("u").alias("host"), F.col("u").alias("label")
    )
    for _ in range(rounds):
        votes = (
            both.join(labels.select(F.col("host").alias("v"), "label"), "v")
            .groupBy(F.col("u").alias("host"), "label")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        w = Window.partitionBy("host").orderBy(
            F.col("_n").desc(), F.col("label").asc()
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("host", "label")
        )
    return labels


def label_propagation_sql(edges_sql: str, rounds: int = 2, min_w: int = 1) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM e WHERE src <> dst AND w >= {min_w}), "
        "b AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v, u FROM und), "
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS host, u AS label FROM b)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f", v{i} AS MATERIALIZED (SELECT b.u AS host, l.label, "
            f"count(*) AS n FROM b JOIN l{i - 1} l ON l.host = b.v "
            "GROUP BY 1, 2), "
            f"l{i} AS MATERIALIZED (SELECT host, label FROM v{i} "
            "QUALIFY row_number() OVER (PARTITION BY host "
            "ORDER BY n DESC, label ASC) = 1)"
        )
    parts.append(f" SELECT host, label FROM l{rounds}")
    return "".join(parts)


# ---------------------------------------------------------------------------
# r7 continuation: per-edge triangle support (the k-truss ingredient),
# personalized PageRank, connected-component labels


def edge_triangle_support(edges: DataFrame, min_w: int = 1) -> DataFrame:
    """(u, v, support): per-undirected-edge triangle count — the k-truss
    ingredient (an edge is in the k-truss iff support ≥ k−2; Cohen 2008).
    Triangles are enumerated once each via the same degree-ordered
    orientation as :func:`triangles`, then each triangle credits its
    three sides; edges in no triangle surface with support 0 via a left
    join (they matter — the k-truss peel drops exactly those first).

    Scale shape: identical to :func:`triangles` (wedge fanout bounded by
    out-degree ≤ O(√m)) plus one explode(3) and one (u, v)-keyed
    partial-agg groupBy — nothing quadratic in degree."""
    return _edge_support(_und_simple(edges, min_w))


def _edge_support(und: DataFrame) -> DataFrame:
    """(u, v, support) over an already-undirected simple (u < v) edge
    list — the per-round kernel shared by :func:`edge_triangle_support`
    and the :func:`ktruss` peel."""
    deg = _und_degrees(und)
    ori = _oriented_edges(und, deg)
    tri = _wedges(ori).join(
        ori.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"]
    )
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "x").alias("u"), F.greatest("a", "x").alias("v")
                ),
                F.struct(
                    F.least("a", "y").alias("u"), F.greatest("a", "y").alias("v")
                ),
                F.struct(
                    F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
                ),
            )
        ).alias("s")
    ).select("s.u", "s.v")
    sup = sides.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    return und.join(sup, ["u", "v"], "left").select(
        "u",
        "v",
        F.coalesce("support", F.lit(0).cast("long")).alias("support"),
    )


def edge_triangle_support_sql(edges_sql: str, min_w: int = 1) -> str:
    """DuckDB twin of :func:`edge_triangle_support` (same orientation as
    triangles_sql; three side-emits per enumerated triangle)."""
    return (
        f"WITH e AS ({edges_sql}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v "
        f"FROM e WHERE src <> dst AND w >= {min_w}), "
        "deg AS (SELECT u AS host, CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT u, v FROM und UNION ALL SELECT v, u FROM und) GROUP BY 1), "
        "ori AS (SELECT "
        "CASE WHEN (du.deg, und.u) < (dv.deg, und.v) THEN und.u ELSE und.v END AS a, "
        "CASE WHEN (du.deg, und.u) < (dv.deg, und.v) THEN und.v ELSE und.u END AS b, "
        "CASE WHEN (du.deg, und.u) < (dv.deg, und.v) THEN dv.deg ELSE du.deg END AS db "
        "FROM und JOIN deg du ON du.host = und.u JOIN deg dv ON dv.host = und.v), "
        "t AS (SELECT l.a, l.b AS x, r.b AS y FROM ori l "
        "JOIN ori r ON r.a = l.a AND (l.db, l.b) < (r.db, r.b) "
        "JOIN ori c ON c.a = l.b AND c.b = r.b), "
        "sides AS (SELECT least(a, x) AS u, greatest(a, x) AS v FROM t "
        "UNION ALL SELECT least(a, y), greatest(a, y) FROM t "
        "UNION ALL SELECT least(x, y), greatest(x, y) FROM t), "
        "sup AS (SELECT u, v, CAST(count(*) AS BIGINT) AS support "
        "FROM sides GROUP BY 1, 2) "
        "SELECT und.u, und.v, COALESCE(sup.support, 0) AS support "
        "FROM und LEFT JOIN sup ON sup.u = und.u AND sup.v = und.v"
    )


def personalized_pagerank(
    edges: DataFrame, iters: int = 3, damping_e3: int = 850
) -> DataFrame:
    """(node, rank) after ``iters`` rounds of PERSONALIZED PageRank
    (random walk with restart; Jeh & Widom 2003): the teleport mass goes
    entirely to one seed node instead of uniformly to all — ranks become
    proximity-to-seed scores (the classic related-host / topic-locality
    feature). The seed is pinned deterministically to min(node), derived
    in-plan as a broadcast one-row aggregate (no collect).

    Same all-integer e9 arithmetic and per-round plan shape as
    :func:`pagerank`: one edges⋈ranks hash join + one dst-keyed groupBy +
    one nodes left-join per round, ONE lazy plan overall, nothing
    quadratic. Dangling mass is dropped (documented in the module
    docstring); remainders floor per term."""
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst", "w")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed = F.broadcast(nodes.agg(F.min("node").alias("_seed")))
    nds = nodes.crossJoin(seed).select(
        "node", (F.col("node") == F.col("_seed")).alias("_is_seed")
    )
    outw = e.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    ew = e.join(outw, "src")
    base = (E9 * (1000 - damping_e3)) // 1000
    ranks = nds.select(
        "node",
        F.when(F.col("_is_seed"), F.lit(E9))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for _ in range(iters):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .withColumn("_rw", (F.col("rank") * F.col("w")).cast("long"))
            .select(F.col("dst").alias("node"), _idiv("_rw", "outw").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").cast("long").alias("_s"))
        )
        ranks = (
            nds.join(contrib, "node", "left")
            .withColumn(
                "_d", (F.coalesce(F.col("_s"), F.lit(0)) * damping_e3).cast("long")
            )
            .select(
                "node",
                (
                    F.when(F.col("_is_seed"), F.lit(base))
                    .otherwise(F.lit(0))
                    .cast("long")
                    + F.expr("_d div 1000")
                ).alias("rank"),
            )
        )
    return ranks


def personalized_pagerank_sql(
    edges_sql: str, iters: int = 3, damping_e3: int = 850
) -> str:
    """DuckDB mirror of :func:`personalized_pagerank` — unrolled
    MATERIALIZED CTEs (the k_core_sql/hits_sql inlining rule)."""
    base = (E9 * (1000 - damping_e3)) // 1000
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "e AS MATERIALIZED (SELECT src, dst, w FROM e0 WHERE src != dst)",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "sd AS MATERIALIZED (SELECT min(node) AS s FROM nodes)",
        "ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, e.w, ow.outw FROM e JOIN ow USING (src))",
        f"r0 AS MATERIALIZED (SELECT node, CASE WHEN node = (SELECT s FROM sd) "
        f"THEN {E9} ELSE 0 END AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT ew.dst AS node, "
            f"CAST(sum((r.rank * ew.w) // ew.outw) AS BIGINT) AS s "
            f"FROM ew JOIN r{i - 1} r ON r.node = ew.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.node, "
            f"CASE WHEN n.node = (SELECT s FROM sd) THEN {base} ELSE 0 END "
            f"+ (coalesce(c{i}.s, 0) * {damping_e3}) // 1000 AS rank "
            f"FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node, CAST(rank AS BIGINT) AS rank FROM r{iters}"
    )


def connected_components_graph(
    edges: DataFrame, min_w: int = 1, max_rounds: int = 16
) -> DataFrame:
    """(host, component) min-label component ids of the undirected simple
    graph — the dedup-cluster CC core (ops/textops.py
    connected_components: pointer jumping + per-round localCheckpoint +
    observe()-folded fixpoint detection) re-exposed for the host link
    graph. Host graphs are star/hub-shaped (small effective diameter),
    so rounds stay low; ``max_rounds`` guards pathological chains."""
    from ult_spark.ops.textops import connected_components

    und = _und_simple(edges, min_w)
    verts = (
        und.select(F.col("u").alias("doc_id"))
        .unionByName(und.select(F.col("v").alias("doc_id")))
        .distinct()
    )
    pairs = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    cc = connected_components(
        verts, pairs, max_rounds=max_rounds, assume_contained=True
    )
    return cc.select(
        F.col("doc_id").alias("host"), F.col("cluster_id").alias("component")
    )


def connected_components_graph_sql(edges_sql: str, min_w: int = 1) -> str:
    """DuckDB twin: TRUE WITH RECURSIVE min-label fixpoint (the
    cell_dbscan oracle pattern) — validates the pointer-jumping result
    against the actual converged labeling, not an unrolled bound."""
    return (
        f"WITH RECURSIVE e0 AS ({edges_sql}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v "
        f"FROM e0 WHERE src <> dst AND w >= {min_w}), "
        "b AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und), "
        "nodes AS (SELECT DISTINCT u AS host FROM b), "
        "comp(host, label) AS (SELECT host, host FROM nodes "
        "UNION SELECT b.u, c.label FROM b JOIN comp c ON c.host = b.v) "
        "SELECT host, min(label) AS component FROM comp GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# r7 continuation: k-truss peel + modularity of the LP communities


def ktruss(
    edges: DataFrame, k: int = 4, rounds: int = 2, min_w: int = 1
) -> DataFrame:
    """(u, v, support) of edges surviving ``rounds`` k-truss peels
    (Cohen 2008): each round recomputes per-edge triangle support in
    the CURRENT subgraph and drops edges with support < k−2, so
    deletions cascade — the edge-density core that k-core's
    degree-only peel can't isolate (a hub with many degree-1 spokes
    survives k-core but holds no triangles). ``support`` is the count
    that qualified the edge in the FINAL round, i.e. measured in the
    graph entering that round.

    Fixed ``rounds`` unrolled identically in :func:`ktruss_sql` (a
    support round references its input ~5×: degrees, orientation, the
    wedge closure, side-credit, and the left join — so a lazy chain
    grows ~5^rounds; fine at reporting depths 1-3, and
    :func:`ktruss_fixpoint` carries the localCheckpoint discipline for
    full convergence). Scale per round: the triangles wedge bound
    (out-degree ≤ O(√m)) + one (u, v)-keyed groupBy."""
    assert rounds >= 1, "ktruss needs at least one peel round"
    cur = _und_simple(edges, min_w)
    sup = None
    for _ in range(rounds):
        sup = _edge_support(cur).where(F.col("support") >= k - 2)
        cur = sup.select("u", "v")
    return sup


def ktruss_fixpoint(
    edges: DataFrame, k: int = 4, min_w: int = 1, max_rounds: int = 64
) -> DataFrame:
    """TRUE-fixpoint k-truss: peel until no edge is removed (the
    k_core_fixpoint discipline — per-round localCheckpoint truncates
    the ~5^rounds lineage, the stats barrier stops Spark 4's
    checkpoint-stats compounding, and convergence rides each round's
    own materialization via observe(): monotone deletions, so an
    unchanged edge count ⇔ fixpoint). Emits (u, v, support) with
    support measured in the converged subgraph's entering round.
    Still peeling at ``max_rounds`` raises ConvergenceError loudly."""
    from pyspark.sql import Observation

    from ult_spark.ops.textops import ConvergenceError, _stats_barrier

    cur = _und_simple(edges, min_w)
    prev: int | None = None
    for _ in range(max_rounds):
        ob = Observation()
        nxt = (
            _edge_support(cur)
            .where(F.col("support") >= k - 2)
            .observe(ob, F.count(F.lit(1)).alias("n"))
        )
        kept = _stats_barrier(nxt.localCheckpoint())
        n = ob.get["n"] or 0
        if n == prev:
            return kept
        prev = n
        cur = kept.select("u", "v")
    raise ConvergenceError(
        f"ktruss_fixpoint: still peeling after {max_rounds} rounds — "
        "raise max_rounds for adversarially deep cascades"
    )


def ktruss_sql(
    edges_sql: str, k: int = 4, rounds: int = 2, min_w: int = 1
) -> str:
    """Unrolled DuckDB twin of :func:`ktruss`. Every round CTE is
    AS MATERIALIZED (the k_core_sql lesson — DuckDB inlines CTE
    references, and a support round references its input ~5×, so an
    un-materialized unroll re-reads the base 5^rounds times)."""
    assert rounds >= 1, "ktruss needs at least one peel round"
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "t0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM e WHERE src <> dst AND w >= {min_w})"
    ]
    for i in range(1, rounds + 1):
        p = f"t{i - 1}"
        parts.append(
            f", deg{i} AS MATERIALIZED (SELECT u AS host, "
            "CAST(count(*) AS BIGINT) AS deg FROM "
            f"(SELECT u, v FROM {p} UNION ALL SELECT v, u FROM {p}) GROUP BY 1), "
            f"ori{i} AS MATERIALIZED (SELECT "
            "CASE WHEN (du.deg, t.u) < (dv.deg, t.v) THEN t.u ELSE t.v END AS a, "
            "CASE WHEN (du.deg, t.u) < (dv.deg, t.v) THEN t.v ELSE t.u END AS b, "
            "CASE WHEN (du.deg, t.u) < (dv.deg, t.v) THEN dv.deg ELSE du.deg END AS db "
            f"FROM {p} t JOIN deg{i} du ON du.host = t.u "
            f"JOIN deg{i} dv ON dv.host = t.v), "
            f"tr{i} AS MATERIALIZED (SELECT l.a, l.b AS x, r.b AS y FROM ori{i} l "
            f"JOIN ori{i} r ON r.a = l.a AND (l.db, l.b) < (r.db, r.b) "
            f"JOIN ori{i} c ON c.a = l.b AND c.b = r.b), "
            f"sides{i} AS (SELECT least(a, x) AS u, greatest(a, x) AS v FROM tr{i} "
            f"UNION ALL SELECT least(a, y), greatest(a, y) FROM tr{i} "
            f"UNION ALL SELECT least(x, y), greatest(x, y) FROM tr{i}), "
            f"sup{i} AS MATERIALIZED (SELECT u, v, "
            f"CAST(count(*) AS BIGINT) AS support FROM sides{i} GROUP BY 1, 2), "
            f"t{i} AS MATERIALIZED (SELECT t.u, t.v, "
            "COALESCE(s.support, CAST(0 AS BIGINT)) AS support "
            f"FROM {p} t LEFT JOIN sup{i} s ON s.u = t.u AND s.v = t.v "
            f"WHERE COALESCE(s.support, 0) >= {k - 2})"
        )
    parts.append(f" SELECT u, v, support FROM t{rounds}")
    return "".join(parts)


def lp_modularity(
    edges: DataFrame, rounds: int = 2, min_w: int = 1
) -> DataFrame:
    """Newman modularity Q of the :func:`label_propagation` communities
    — the one-number answer to "did community detection find real
    structure?" (Q ≈ 0: no better than random given the degree
    sequence; Q ≳ 0.3: strong structure). With m undirected edges,
    e_c intra-community edges and d_c the community degree sum,
    ``Q = Σ_c [e_c/m − (d_c/2m)²] = (4m·E_in − Σ_c d_c²) / 4m²`` —
    the numerator is an EXACT BIGINT (4m² < 2⁶³ through ~1.5e9 edges),
    ONE final floored e6 division. Emits one row
    (m, e_in, n_comms, q_e6); NULL q on an empty graph.

    Scale: the LP rounds themselves (host-keyed groupBys + ranked
    windows), then two label-keyed hash joins and two tiny aggs —
    nothing beyond LP's own cost. The label frame is referenced twice
    (intra-edge filter + degree rollup), so its fixed-``rounds`` plan
    is evaluated twice; at production depth localCheckpoint it first."""
    und = _und_simple(edges, min_w)
    labels = label_propagation(edges, rounds, min_w)
    m = F.broadcast(und.agg(F.count(F.lit(1)).cast("long").alias("m")))
    e_in = F.broadcast(
        und.join(
            labels.select(F.col("host").alias("u"), F.col("label").alias("_lu")),
            "u",
        )
        .join(
            labels.select(F.col("host").alias("v"), F.col("label").alias("_lv")),
            "v",
        )
        .where(F.col("_lu") == F.col("_lv"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    dc = (
        _und_degrees(und)
        .join(labels, "host")
        .groupBy("label")
        .agg(F.sum("deg").cast("long").alias("d_c"))
    )
    sums = dc.agg(
        F.coalesce(F.sum(F.col("d_c") * F.col("d_c")), F.lit(0))
        .cast("long")
        .alias("sd2"),
        F.count(F.lit(1)).cast("long").alias("n_comms"),
    )
    q_e6 = F.floor(
        F.lit(1000000.0)
        * (
            F.lit(4) * F.col("m") * F.col("e_in") - F.col("sd2")
        ).cast("double")
        / (F.lit(4) * F.col("m") * F.col("m")).cast("double")
    ).cast("long")
    return (
        sums.crossJoin(m)
        .crossJoin(e_in)
        .select(
            "m",
            "e_in",
            "n_comms",
            F.when(F.col("m") > 0, q_e6).alias("q_e6"),
        )
    )


def lp_modularity_sql(edges_sql: str, rounds: int = 2, min_w: int = 1) -> str:
    return (
        f"WITH qe AS MATERIALIZED ({edges_sql}), "
        "qund AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM qe WHERE src <> dst AND w >= {min_w}), "
        f"lab AS MATERIALIZED ({label_propagation_sql(edges_sql, rounds, min_w)}), "
        "mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM qund), "
        "intra AS (SELECT CAST(count(*) AS BIGINT) AS e_in FROM qund u "
        "JOIN lab la ON la.host = u.u "
        "JOIN lab lb ON lb.host = u.v AND lb.label = la.label), "
        "deg AS (SELECT u AS host, CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT u, v FROM qund UNION ALL SELECT v, u FROM qund) GROUP BY 1), "
        "dc AS (SELECT la.label, CAST(sum(d.deg) AS BIGINT) AS d_c "
        "FROM deg d JOIN lab la ON la.host = d.host GROUP BY 1), "
        "sums AS (SELECT CAST(coalesce(sum(d_c * d_c), 0) AS BIGINT) AS sd2, "
        "CAST(count(*) AS BIGINT) AS n_comms FROM dc) "
        "SELECT mm.m, intra.e_in, sums.n_comms, "
        "CASE WHEN mm.m > 0 THEN "
        "CAST(floor(1000000.0 * CAST(4 * mm.m * intra.e_in - sums.sd2 AS DOUBLE) "
        "/ CAST(4 * mm.m * mm.m AS DOUBLE)) AS BIGINT) ELSE NULL END AS q_e6 "
        "FROM mm CROSS JOIN intra CROSS JOIN sums"
    )


# ---------------------------------------------------------------------------
# r7 final wave: rich-club coefficient


def rich_club(edges: DataFrame, min_w: int = 1) -> DataFrame:
    """Rich-club coefficient φ(k) for every degree threshold k present
    (Zhou & Mondragón 2004): among the N_k nodes of degree > k,
    ``φ(k) = 2·E_k / (N_k·(N_k−1))`` where E_k counts edges with BOTH
    endpoints of degree > k — do the hubs of the web graph form a
    densely wired elite, or are they mutually avoiding (as in the
    Internet AS graph)? Rising φ(k) with k = rich club; compare against
    the degree-preserving-random expectation offline.

    ONE pass, no per-k work over the graph: E_k and N_k are SUFFIX
    COUNTS of two histograms — per-edge min(deg_u, deg_v) and per-node
    degree — so the graph-sized stages are the shared degree computation
    plus one two-sided degree join, and the per-k fan-out is a
    grid × histogram non-equi join over POST-AGGREGATION rows (at most
    |distinct degree values|² pairs, data-size-independent; the
    BroadcastNestedLoopJoin it plans is over the tiny aggregates, never
    the edge list). Emits (k, n_k, e_k, phi_e6) for k ∈ the distinct
    degrees; phi NULL when N_k < 2. Exact BIGINTs throughout, one
    floored e6 division."""
    und = _und_simple(edges, min_w)
    deg = _und_degrees(und)
    md = (
        und.join(deg.select(F.col("host").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("host").alias("v"), F.col("deg").alias("dv")), "v")
        .select(F.least("du", "dv").alias("m"))
    )
    hd = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    hm = md.groupBy("m").agg(F.count(F.lit(1)).cast("long").alias("ne"))
    grid = hd.select(F.col("deg").alias("k"))
    nk = (
        grid.join(hd, hd["deg"] > F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("nd"), F.lit(0)).cast("long").alias("n_k"))
    )
    ek = (
        grid.join(hm, hm["m"] > F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("ne"), F.lit(0)).cast("long").alias("e_k"))
    )
    phi = F.floor(
        F.lit(1000000.0)
        * (F.lit(2) * F.col("e_k")).cast("double")
        / (F.col("n_k") * (F.col("n_k") - F.lit(1))).cast("double")
    ).cast("long")
    return (
        nk.join(ek, "k")
        .select("k", "n_k", "e_k", F.when(F.col("n_k") >= 2, phi).alias("phi_e6"))
    )


def rich_club_sql(edges_sql: str, min_w: int = 1) -> str:
    return (
        f"WITH rce AS ({edges_sql}), "
        "rcund AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM rce WHERE src <> dst AND w >= {min_w}), "
        "rcdeg AS MATERIALIZED (SELECT u AS host, CAST(count(*) AS BIGINT) AS deg "
        "FROM (SELECT u, v FROM rcund UNION ALL SELECT v, u FROM rcund) GROUP BY 1), "
        "rcmd AS (SELECT least(a.deg, b.deg) AS m FROM rcund e "
        "JOIN rcdeg a ON a.host = e.u JOIN rcdeg b ON b.host = e.v), "
        "hd AS (SELECT deg, CAST(count(*) AS BIGINT) AS nd FROM rcdeg GROUP BY 1), "
        "hm AS (SELECT m, CAST(count(*) AS BIGINT) AS ne FROM rcmd GROUP BY 1), "
        "grid AS (SELECT deg AS k FROM hd), "
        "nk AS (SELECT k, CAST(coalesce(sum(hd.nd), 0) AS BIGINT) AS n_k "
        "FROM grid LEFT JOIN hd ON hd.deg > grid.k GROUP BY 1), "
        "ek AS (SELECT k, CAST(coalesce(sum(hm.ne), 0) AS BIGINT) AS e_k "
        "FROM grid LEFT JOIN hm ON hm.m > grid.k GROUP BY 1) "
        "SELECT nk.k, nk.n_k, ek.e_k, "
        "CASE WHEN nk.n_k >= 2 THEN CAST(floor(1000000.0::DOUBLE * "
        "CAST(2 * ek.e_k AS DOUBLE) / CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE)) "
        "AS BIGINT) ELSE NULL END AS phi_e6 "
        "FROM nk JOIN ek USING (k)"
    )


def transitivity(edges: DataFrame, min_w: int = 1) -> DataFrame:
    """One-row global transitivity (Newman's "global clustering
    coefficient"): C = 3·triangles / wedges = Σ_v tri_v / Σ_v C(deg_v, 2)
    — the graph-wide companion to :func:`triangles`' per-node cc_e6
    (a high-transitivity web graph is community-like; near 0 is
    star/bipartite-like). Both sums are exact BIGINTs from the SAME
    degree frame and the SAME degree-ordered triangle enumeration
    (Σ_v tri_v counts each triangle exactly 3×, so no separate 3·T
    term), ONE e6-floored division. Emits (wedges, triangles,
    trans_e6); NULL when the graph has no wedge."""
    und = _und_simple(edges, min_w)
    deg = _und_degrees(und)
    ori = _oriented_edges(und, deg)
    tri3 = (
        _wedges(ori)
        .join(ori.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"])
        .agg((F.lit(3) * F.count(F.lit(1))).cast("long").alias("t3"))
    )
    wd = deg.agg(
        F.coalesce(
            F.sum(F.expr("deg * (deg - 1) div 2")), F.lit(0)
        ).cast("long").alias("wedges")
    )
    trans = F.floor(
        F.lit(1000000.0) * F.col("t3").cast("double") / F.col("wedges").cast("double")
    ).cast("long")
    return (
        wd.crossJoin(tri3)
        .select(
            "wedges",
            F.expr("t3 div 3").cast("long").alias("triangles"),
            F.when(F.col("wedges") > 0, trans).alias("trans_e6"),
        )
    )


def transitivity_sql(edges_sql: str, min_w: int = 1) -> str:
    return (
        f"WITH te AS ({edges_sql}), "
        "tund AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM te WHERE src <> dst AND w >= {min_w}), "
        "tdeg AS MATERIALIZED (SELECT u AS host, CAST(count(*) AS BIGINT) AS deg "
        "FROM (SELECT u, v FROM tund UNION ALL SELECT v, u FROM tund) GROUP BY 1), "
        "tori AS MATERIALIZED (SELECT "
        "CASE WHEN (du.deg, tund.u) < (dv.deg, tund.v) THEN tund.u ELSE tund.v END AS a, "
        "CASE WHEN (du.deg, tund.u) < (dv.deg, tund.v) THEN tund.v ELSE tund.u END AS b, "
        "CASE WHEN (du.deg, tund.u) < (dv.deg, tund.v) THEN dv.deg ELSE du.deg END AS db "
        "FROM tund JOIN tdeg du ON du.host = tund.u JOIN tdeg dv ON dv.host = tund.v), "
        "t3 AS (SELECT CAST(3 * count(*) AS BIGINT) AS t3 FROM "
        "(SELECT l.a, l.b AS x, r.b AS y FROM tori l "
        "JOIN tori r ON r.a = l.a AND (l.db, l.b) < (r.db, r.b) "
        "JOIN tori c ON c.a = l.b AND c.b = r.b)), "
        "wd AS (SELECT CAST(coalesce(sum(deg * (deg - 1) // 2), 0) AS BIGINT) "
        "AS wedges FROM tdeg) "
        "SELECT wd.wedges, CAST(t3.t3 // 3 AS BIGINT) AS triangles, "
        "CASE WHEN wd.wedges > 0 THEN CAST(floor(1000000.0::DOUBLE * "
        "CAST(t3.t3 AS DOUBLE) / CAST(wd.wedges AS DOUBLE)) AS BIGINT) "
        "ELSE NULL END AS trans_e6 FROM wd CROSS JOIN t3"
    )


def harmonic_centrality(
    edges: DataFrame, k_seeds: int = 8, rounds: int = 3, min_w: int = 1
) -> DataFrame:
    """Sampled harmonic centrality (Boldi & Vigna 2014's estimator
    shape): H(v) = Σ_seeds 1/d(seed, v) over d ≤ ``rounds``, from
    ``k_seeds`` DETERMINISTIC seeds (lowest md5-hash hosts — a rerun
    or another engine picks the same sample; the full statistic is
    all-pairs and infeasible at web scale, pinned sampling is the
    standard estimator). Per-term 1/d is the EXACT integer
     1000000 div d — no floats anywhere in this operator.

    BFS as k simultaneous sources in ONE (seed, node, d) frame:
    each round expands the frame through the adjacency list and
    re-minimizes per (seed, node) — a fixed ``rounds``-deep lazy chain
    (each round references its predecessor twice: expansion + union,
    so plan size ~2^rounds; fine at reporting depths ≤ 4, apply the
    localCheckpoint discipline beyond, per the connected_components
    pattern). Emits (host, n_reached, h_e6) for reached hosts —
    n_reached counts seeds within the horizon, h_e6 the harmonic sum."""
    und = _und_simple(edges, min_w)
    adj = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("a"), F.col("v").alias("b"))
    hosts = _und_degrees(und).select("host")
    from ult_spark.ops.textops import _h56

    sw = Window.orderBy(_h56(F.col("host")).asc(), F.col("host").asc())
    seeds = (
        hosts.withColumn("rk", F.row_number().over(sw))
        .where(F.col("rk") <= k_seeds)
        .select(F.col("host").alias("seed"))
    )
    dist = seeds.select("seed", F.col("seed").alias("node"), F.lit(0).cast("long").alias("d"))
    for i in range(1, rounds + 1):
        grown = dist.join(adj, dist["node"] == adj["a"]).select(
            "seed", F.col("b").alias("node"), F.lit(i).cast("long").alias("d")
        )
        dist = (
            dist.unionByName(grown)
            .groupBy("seed", "node")
            .agg(F.min("d").cast("long").alias("d"))
        )
    return (
        dist.where(F.col("d") >= 1)
        .groupBy(F.col("node").alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum(F.expr("1000000 div d")).cast("long").alias("h_e6"),
        )
    )


def harmonic_centrality_sql(
    edges_sql: str, k_seeds: int = 8, rounds: int = 3, min_w: int = 1
) -> str:
    parts = [
        f"WITH hce AS ({edges_sql}), "
        "hcund AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        f"greatest(src, dst) AS v FROM hce WHERE src <> dst AND w >= {min_w}), "
        "hcadj AS MATERIALIZED (SELECT u AS a, v AS b FROM hcund "
        "UNION ALL SELECT v, u FROM hcund), "
        "hchosts AS (SELECT DISTINCT a AS host FROM hcadj), "
        "hcseeds AS MATERIALIZED (SELECT host AS seed FROM ("
        "SELECT host, row_number() OVER (ORDER BY "
        "('0x' || substr(md5(host), 1, 14))::BIGINT ASC, host ASC) AS rk "
        f"FROM hchosts) WHERE rk <= {k_seeds}), "
        "hcd0 AS MATERIALIZED (SELECT seed, seed AS node, "
        "CAST(0 AS BIGINT) AS d FROM hcseeds)"
    ]
    prev = "hcd0"
    for i in range(1, rounds + 1):
        parts.append(
            f", hcd{i} AS MATERIALIZED (SELECT seed, node, CAST(min(d) AS BIGINT) AS d "
            f"FROM (SELECT seed, node, d FROM {prev} UNION ALL "
            f"SELECT p.seed, adj.b AS node, CAST({i} AS BIGINT) AS d "
            f"FROM {prev} p JOIN hcadj adj ON adj.a = p.node) GROUP BY 1, 2)"
        )
        prev = f"hcd{i}"
    parts.append(
        f" SELECT node AS host, CAST(count(*) AS BIGINT) AS n_reached, "
        f"CAST(sum(1000000 // d) AS BIGINT) AS h_e6 FROM {prev} "
        "WHERE d >= 1 GROUP BY 1"
    )
    return "".join(parts)
