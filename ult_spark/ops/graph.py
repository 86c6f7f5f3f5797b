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

from pyspark.sql import DataFrame
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
    parts = [
        f"WITH e0 AS ({edges_sql})",
        "e AS (SELECT src, dst, w FROM e0 WHERE src != dst)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1)",
        "ew AS (SELECT e.src, e.dst, e.w, ow.outw FROM e JOIN ow USING (src))",
        f"r0 AS (SELECT node, {E9} // (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS (SELECT ew.dst AS node, "
            f"CAST(sum((r.rank * ew.w) // ew.outw) AS BIGINT) AS s "
            f"FROM ew JOIN r{i - 1} r ON r.node = ew.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, {base} // (SELECT n FROM nn) "
            f"+ (coalesce(c{i}.s, 0) * {damping_e3}) // 1000 AS rank "
            f"FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node, CAST(rank AS BIGINT) AS rank FROM r{iters}"
    )
