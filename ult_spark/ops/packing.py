"""Training-batch assembly operators (r5): sequence packing and
temperature-balanced corpus resampling — the last mile between a curated
corpus and a training run.

- :func:`pack_sequences` — GPT-style concat-and-chunk sequence packing:
  documents are concatenated in a deterministic order and chopped every
  ``budget`` tokens; the op reports, per packed sequence, how many
  documents contribute, how many fit whole, and the token fill. The
  global order is SHARDED (pinned: ``h56(doc_id || ':pk') % shards``):
  each shard packs independently, which is exactly how a 100 TB corpus is
  packed in practice — a single global concatenation order would funnel
  the cumulative-sum window through one partition, while per-shard
  windows parallelize to ``shards`` tasks (set shards ≈ 10× cores at
  cluster scale; the per-sequence accounting never changes, only how
  many tail-fragment sequences exist — one per shard).
- :func:`domain_balance` — temperature-based source rebalancing (the
  multinomial-smoothing shape of GPT-3 / CCNet corpus weighting) with
  α = 0.5 pinned: keep probability ∝ count^(α-1) = 1/sqrt(count),
  realized as a DETERMINISTIC hash threshold per doc (no rand() — the
  same auditable-at-100-TB property as ops/textops.py sampling). α = 0.5
  is pinned because sqrt is IEEE-exactly-rounded in BOTH engines, so the
  per-domain keep rate quantizes identically (a pow(x, 0.7) form would
  ride on exp/ln libm agreement instead).

Both are native Column programs (zero Python eval nodes, asserted in
tests/test_layout.py) with exact DuckDB oracles.

Scale notes (100 TB): ``pack_sequences`` is one shard-partitioned window
(sort within shard) + one explode + one (shard, seq) aggregation — no
global sort, no skew (shards are hash-uniform). ``domain_balance`` is a
per-source aggregation joined back over the docs — the per-source table
is tiny (thousands of rows), so the join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ult_spark.ops.textops import _h56, tokens_col

H56_SQL = "('0x' || substr(md5({col}), 1, 14))::BIGINT"

# pinned defaults for the registered queries
PACK_BUDGET = 256
PACK_SHARDS = 8
BALANCE_T_E6 = 4_000_000.0  # keep_rate_e6 = floor(T_e6 / sqrt(count))


def pack_sequences(
    df: DataFrame,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-sequence packing accounting: (shard, seq_id, n_docs, n_whole,
    n_tokens).

    Pinned semantics: tokens are the whitespace tokens of ``text`` (docs
    with zero tokens are dropped — they cannot contribute to a sequence);
    within a shard, docs concatenate in ``(h56(doc_id || ':pk'), doc_id)``
    order; sequence ``s`` of a shard owns token positions
    ``[s*budget, (s+1)*budget)`` of the shard's concatenation. A doc
    spanning a boundary contributes to both sequences (``n_docs`` counts
    it in each; ``n_whole`` counts only docs fully inside). Every
    sequence has ``n_tokens = budget`` except each shard's tail fragment.
    """
    okey = _h56(F.concat(F.col(id_col).cast("string"), F.lit(":pk")))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text)).cast("long").alias("n_tok"),
        okey.alias("ok"),
        (okey % shards).alias("shard"),
    ).where(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("ok", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = base.select(
        "shard",
        "n_tok",
        F.sum("n_tok").over(w).alias("cum"),
    ).select(
        "shard",
        "n_tok",
        (F.col("cum") - F.col("n_tok")).alias("lo"),
        "cum",
    )
    spans = cum.select(
        "shard",
        "lo",
        "cum",
        F.explode(
            F.sequence(
                F.expr(f"lo div {budget}"), F.expr(f"(cum - 1) div {budget}")
            )
        ).alias("seq_id"),
    )
    b = F.lit(budget).cast("long")
    tokens_in = F.least(F.col("cum"), (F.col("seq_id") + 1) * b) - F.greatest(
        F.col("lo"), F.col("seq_id") * b
    )
    whole = (F.col("lo") >= F.col("seq_id") * b) & (
        F.col("cum") <= (F.col("seq_id") + 1) * b
    )
    return spans.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(whole.cast("long")).cast("long").alias("n_whole"),
        F.sum(tokens_in).cast("long").alias("n_tokens"),
    )


def pack_sequences_sql(budget: int = PACK_BUDGET, shards: int = PACK_SHARDS) -> str:
    h = H56_SQL.format(col="CAST(doc_id AS VARCHAR) || ':pk'")
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT)
           AS n_tok,
         {h} AS ok, {h} % {shards} AS shard
  FROM documents
), nz AS (
  SELECT * FROM base WHERE n_tok > 0
), cum AS (
  SELECT shard, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY ok ASC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM nz
), bounds AS (
  SELECT shard, cum - n_tok AS lo, cum FROM cum
), spans AS (
  SELECT shard, lo, cum,
         unnest(generate_series(lo // {budget}, (cum - 1) // {budget})) AS seq_id
  FROM bounds
)
SELECT shard, seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN lo >= seq_id * {budget} AND cum <= (seq_id + 1) * {budget}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_whole,
       CAST(sum(least(cum, (seq_id + 1) * {budget}) -
                greatest(lo, seq_id * {budget})) AS BIGINT) AS n_tokens
FROM spans GROUP BY shard, seq_id
"""


def domain_balance(
    df: DataFrame,
    t_e6: float = BALANCE_T_E6,
    id_col: str = "doc_id",
    domain: str = "source",
) -> DataFrame:
    """Per-domain α=0.5 temperature resampling accounting:
    (domain, n_docs, keep_rate_e6, n_kept).

    ``keep_rate_e6 = least(1e6, floor(t_e6 / sqrt(n_docs)))`` — smaller
    domains keep a larger fraction, flattening the source distribution
    toward ``count^0.5``. A doc is kept iff
    ``h56(doc_id || ':bal') % 1_000_000 < keep_rate_e6`` — deterministic
    under any partitioning, retry, or engine; rerunning on a grown corpus
    only moves docs whose domain rate actually changed.
    """
    rates = (
        df.groupBy(F.col(domain).alias("domain"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn(
            "keep_rate_e6",
            F.least(
                F.lit(1_000_000).cast("long"),
                F.floor(F.lit(t_e6) / F.sqrt(F.col("n_docs").cast("double"))).cast(
                    "long"
                ),
            ),
        )
    )
    keep_h = _h56(F.concat(F.col(id_col).cast("string"), F.lit(":bal"))) % 1_000_000
    kept = (
        df.select(F.col(domain).alias("domain"), keep_h.alias("kh"))
        .join(F.broadcast(rates), "domain")
        .groupBy("domain")
        .agg(F.sum((F.col("kh") < F.col("keep_rate_e6")).cast("long")).alias("n_kept"))
    )
    return rates.join(kept, "domain").select(
        "domain", "n_docs", "keep_rate_e6", F.col("n_kept").cast("long").alias("n_kept")
    )


def domain_balance_sql(t_e6: float = BALANCE_T_E6, domain: str = "source") -> str:
    h = H56_SQL.format(col="CAST(doc_id AS VARCHAR) || ':bal'")
    return f"""
WITH rates AS (
  SELECT {domain} AS domain, CAST(count(*) AS BIGINT) AS n_docs,
         least(CAST(1000000 AS BIGINT),
               CAST(floor({t_e6!r}::DOUBLE / sqrt(CAST(count(*) AS DOUBLE)))
                    AS BIGINT)) AS keep_rate_e6
  FROM documents GROUP BY 1
), kept AS (
  SELECT d.{domain} AS domain,
         CAST(sum(CASE WHEN {h} % 1000000 < r.keep_rate_e6 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept
  FROM documents d JOIN rates r ON d.{domain} = r.domain
  GROUP BY 1
)
SELECT rates.domain, n_docs, keep_rate_e6, n_kept
FROM rates JOIN kept ON rates.domain = kept.domain
"""
