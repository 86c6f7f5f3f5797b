"""Webtext / training-data operators over the documents table.

First-class components per the task brief: exact + near-duplicate detection
(MinHash-LSH, SimHash, n-gram Jaccard), language ID, quality scoring, token
counting, document fingerprinting. All are native Column programs (no UDFs)
so they stay in whole-stage codegen AND have exact DuckDB oracles.

Cross-engine hash primitive (verified identical): the first/second 14 hex
chars of md5 cast to bigint — 56-bit values, so affine double-hashing
``h1 + j*h2`` stays far below int64 overflow (DuckDB errors on overflow;
Spark wraps — staying in range keeps both exact and equal).

Scale notes: every operator is shuffle-minimal — shingle explode → groupBy
doc (one shuffle); LSH banding joins on band keys (pre-aggregated, skew-safe
because band buckets are md5-uniform); the LSH verify is PAIR-KEYED
(array_intersect over per-doc sets — a shingle in d docs costs d rows,
never d²; round-2 rewrite); simhash near-dup banding is pigeonhole-exact.
The brute-force Jaccard join exists as the small-scale oracle twin of the
LSH path, not the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P_FP = 1_000_000_007  # fingerprint modulus (pinned)
N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_N = 3


def _h56(col, offset: int = 1):
    """56-bit bigint from md5 hex substring — matches DuckDB
    ``('0x'||substr(md5(x),off,14))::bigint`` exactly."""
    return F.conv(F.substring(F.md5(col), offset, 14), 16, 10).cast("long")


def tokens_col(text="text"):
    """Whitespace tokens (single-space split, empties dropped) — pinned."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != "")


def token_count(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    return df.select(id_col, F.size(tokens_col(text)).cast("long").alias("n_tokens"))


TOKEN_COUNT_SQL = (
    "SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) "
    "AS n_tokens FROM documents"
)

# GPT-2-flavoured pre-tokenizer pattern (contractions, space-prefixed
# letter/digit runs, punctuation runs) — pinned; Java regex and RE2 agree
# on it (leftmost-first alternation, verified)
BPE_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"


def bpe_token_count(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """BPE-ish token count per doc (task brief: 'whitespace + a BPE-ish
    regex'): one native regexp_extract_all, no UDF."""
    toks = F.regexp_extract_all(F.col(text), F.lit(BPE_PATTERN), 0)
    return df.select(id_col, F.size(toks).cast("long").alias("n_bpe"))


BPE_TOKEN_COUNT_SQL = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, "
    f"'{BPE_PATTERN.replace(chr(39), chr(39) * 2)}')) AS BIGINT) "
    "AS n_bpe FROM documents"
)


def fingerprint(df: DataFrame, id_col: str = "doc_id", text: str = "text", nchars: int = 64) -> DataFrame:
    """Polynomial rolling hash of the first ``nchars`` chars (pinned: base 31
    mod 1e9+7 over ascii codepoints)."""
    chars = F.filter(F.split(F.substring(F.col(text), 1, nchars), ""), lambda x: x != "")
    fp = F.aggregate(chars, F.lit(0).cast("long"), lambda a, x: (a * 31 + F.ascii(x)) % P_FP)
    return df.select(id_col, fp.alias("fp"))


FINGERPRINT_SQL = (
    "SELECT doc_id, list_reduce(list_prepend(0::BIGINT, "
    "[ascii(c) for c in string_split_regex(substr(text, 1, 64), '') if c != '']), "
    f"(a, b) -> (a * 31 + b) % {P_FP}) AS fp FROM documents"
)


WINNOW_K = 8  # k-gram char width (pinned)
WINNOW_W = 4  # window width in positions (pinned)


def winnowing_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text: str = "text",
    k: int = WINNOW_K, w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints [Schleimer/Wilkerson/Aiken, MOSS —
    public algorithm]: hash every char k-gram, take the min hash of each
    w-window of consecutive positions, emit the DISTINCT window-mins
    (pinned set semantics; rightmost-min tie rule is irrelevant under
    distinct). Guarantees any shared substring of length ≥ k+w-1 yields a
    shared fingerprint. Fully row-local until the final explode."""
    c = F.col(text)

    def _seq1(n):  # 1..n, EMPTY when n < 1 (Spark sequence(1,0) descends!)
        return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    npos = F.length(c) - F.lit(k - 1)
    hashes = F.transform(_seq1(npos), lambda i: _h56(F.substring(c, i, k), 1))
    # hashes MUST be a materialized column: referencing the transform
    # expression inside the window lambda re-evaluates the whole O(n) md5
    # array per window — O(n²) per doc (measured 40x slower)
    base = df.select(F.col(id_col).alias("doc_id"), hashes.alias("_hs"))
    nwin = F.size("_hs") - F.lit(w - 1)
    mins = F.transform(
        _seq1(nwin), lambda j: F.array_min(F.slice(F.col("_hs"), j, w))
    )
    return base.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("fp")
    )


def winnowing_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    return (
        "SELECT doc_id, unnest(list_distinct(["
        f"list_min(hs[j : j + {w - 1}]) "
        f"for j in generate_series(1, greatest(len(hs) - {w - 1}, 0))])) AS fp FROM ("
        "SELECT doc_id, [('0x' || substr(md5(text[i : i + "
        f"{k - 1}]), 1, 14))::BIGINT "
        f"for i in generate_series(1, greatest(length(text) - {k - 1}, 0))] AS hs "
        "FROM documents)"
    )


# ---------------------------------------------------------------------------
# exact dedup

def dedup_exact(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Group identical texts by md5; keeper = min id, dup count per group."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_md5"))
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("copies"))
    )


DEDUP_EXACT_SQL = (
    "SELECT md5(text) AS text_md5, min(doc_id) AS keeper, count(*) AS copies "
    "FROM documents GROUP BY 1"
)


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH

def shingle_array(text: str = "text"):
    """Distinct word ``SHINGLE_N``-grams of a doc as a per-row ARRAY column.

    Per-doc distinctness is row-local, so it's an ``array_distinct`` — NOT a
    DataFrame ``.distinct()`` — which keeps the whole shingle derivation
    shuffle-free (round-2 perf: the exploded+distinct variant shuffled the
    full shingle set and was re-executed per consumer branch)."""
    # zip_with over shifted slices (r6): O(tokens) interpreted-lambda work
    # instead of an O(SHINGLE_N)-sized slice+join per element — same
    # speedup as curation._grams (whose docstring has the measurements);
    # byte-identical strings, and only FULL windows exist by construction
    # so the old partial-tail filter is structurally unnecessary.
    toks = tokens_col(text)
    k = F.greatest(F.size(toks) - F.lit(SHINGLE_N - 1), F.lit(0))
    sh = F.slice(toks, 1, k)
    for i in range(1, SHINGLE_N):
        sh = F.zip_with(sh, F.slice(toks, i + 1, k), lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(sh)


def shingles(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Distinct word ``SHINGLE_N``-grams per doc, exploded (oracle-twin shape)."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(shingle_array(text)).alias("shingle")
    )


SHINGLES_SQL = (
    # list-comprehension over scalar generate_series: the position bound is
    # driven by each doc's own token count (no fixed ceiling — ADVICE r1)
    "SELECT DISTINCT doc_id, shingle FROM ("
    "SELECT doc_id, unnest([array_to_string(toks[i : i + 2], ' ') "
    "for i in generate_series(1, greatest(len(toks) - 2, 0))]) AS shingle "
    "FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks "
    "FROM documents)) "
    "WHERE len(string_split(shingle, ' ')) = 3"
)


def minhash_signature(sh: DataFrame) -> DataFrame:
    """16 minhash values per doc via affine double hashing of the 56-bit
    shingle hash: ``min(h1 + j*h2)`` for j = 0..15 (exploded-input shape)."""
    h1 = _h56(F.col("shingle"), 1)
    h2 = _h56(F.col("shingle"), 15)
    aggs = [F.min(h1 + F.lit(j) * h2).alias(f"mh{j}") for j in range(N_MINHASH)]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_key(b: int):
    r = N_MINHASH // N_BANDS
    cols = [F.col(f"mh{b * r + i}").cast("string") for i in range(r)]
    return F.md5(F.concat_ws("_", F.lit(str(b)), *cols))


def band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band) rows — ONE explode over a struct array, not a union
    of per-band selects (a union re-executes the signature pipeline once
    per band; CLAUDE.md perf lesson). Shared by the batch candidate join
    and the streaming signature store."""
    return sig.select(
        "doc_id", F.explode(F.array(*[_band_key(b) for b in range(N_BANDS)])).alias("band")
    )


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Candidate pairs (a < b) sharing at least one LSH band.

    r8 perf: the band self-join EXPLODES (small band table in, every
    bucket-mate pair out) and AQE coalesces the join stage from its tiny
    INPUT bytes, serializing the explosion (see ops/ann.near_dup_pairs —
    measured there). The explicit keyed repartition with a pinned count
    replaces the join's own exchange (same key, no extra shuffle) and pins
    the stage's parallelism."""
    n_part = sig.sparkSession.sparkContext.defaultParallelism
    bands = band_rows(sig).repartition(n_part, "band")
    l = bands.select(F.col("doc_id").alias("a"), "band")
    r = bands.select(F.col("doc_id").alias("b"), "band")
    return (
        l.join(r, "band")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, pairs: DataFrame | None = None, threshold: float = 0.2) -> DataFrame:
    """Exact Jaccard over shingle sets. Emits jaccard in e4 integer form for
    cross-engine exactness.

    Two plans (identical results for threshold > 0):

    - ``pairs`` given (the LSH scale path): ALL work is restricted to the
      candidate pairs. Shingles are grouped per doc once (one shuffle), the
      pair-keyed join fetches the two doc arrays, and the intersection is a
      native ``array_intersect`` — work is O(candidate pairs × shingles/doc).
      Crucially there is NO shingle self-join, so a boilerplate shingle
      appearing in d documents costs d rows, never d² (round-1 verdict #1:
      the previous plan joined shingles before pruning, quadratic in
      hot-shingle document frequency).
    - ``pairs`` None (brute twin, small-scale oracle only): all pairs sharing
      any shingle via the shingle self-join.
    """
    if pairs is None:
        a = sh.select(F.col("doc_id").alias("a"), "shingle")
        b = sh.select(F.col("doc_id").alias("b"), "shingle")
        shared = (
            a.join(b, "shingle")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
        sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
        sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
        out = (
            shared.join(sa, "a").join(sb, "b")
            # floor, not cast: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
            .withColumn("jacc_e4", F.floor(F.col("inter") * 10000 / (F.col("sza") + F.col("szb") - F.col("inter"))).cast("long"))
            .where(F.col("jacc_e4") >= int(threshold * 10000))
        )
        return out.select("a", "b", "inter", "jacc_e4")
    # hashed sets (r6): the verify only needs set EQUALITY, so carry the
    # 56-bit shingle hash instead of the string — ~6x less array memory
    # traffic in the pair join/intersect (measured -20% on the 30x corpus).
    # sz counts the STRING-distinct shingles; a 2^-56 collision would shrink
    # shs only, and the oracle (which joins on the string) would surface it.
    docsets = sh.groupBy("doc_id").agg(
        F.collect_set(_h56(F.col("shingle"))).alias("shs"),
        F.count("*").alias("sz"),
    )
    return jaccard_pairs_from_sets(docsets, pairs, threshold)


def jaccard_pairs_from_sets(
    docsets: DataFrame, pairs: DataFrame, threshold: float = 0.2
) -> DataFrame:
    """Exact Jaccard for candidate ``pairs`` given per-doc shingle-set rows
    (doc_id, shs, sz). The kernel only uses element EQUALITY, so ``shs``
    may carry the raw shingle strings or (the r6 default in every caller)
    their 56-bit hashes — ~6x less array memory traffic through the pair
    join; ``sz`` always counts the string-distinct shingles."""
    a = docsets.select(F.col("doc_id").alias("a"), F.col("shs").alias("sha"), F.col("sz").alias("sza"))
    b = docsets.select(F.col("doc_id").alias("b"), F.col("shs").alias("shb"), F.col("sz").alias("szb"))
    return (
        pairs.join(a, "a").join(b, "b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")).cast("long"))
        .withColumn("jacc_e4", F.floor(F.col("inter") * 10000 / (F.col("sza") + F.col("szb") - F.col("inter"))).cast("long"))
        .where(F.col("jacc_e4") >= int(threshold * 10000))
        .select("a", "b", "inter", "jacc_e4")
    )


def collapse_exact(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Collapse identical-text groups to one representative row (round-2
    verdict #7): (doc_id = min id of the group, text, _members = sorted
    member ids). Identical texts share every LSH band, so leaving them in
    makes any band self-join quadratic in cluster size for pairs the
    collapse answers for free."""
    return df.groupBy(F.md5(F.col(text)).alias("_g")).agg(
        F.min(id_col).alias("doc_id"),
        F.sort_array(F.collect_list(id_col)).alias("_members"),
        F.first(text).alias("text"),
    )


def _expand_group_pairs(rep_pairs: DataFrame, groups: DataFrame, val_cols: list[str]) -> DataFrame:
    """Re-expand representative-level near-dup pairs to all cross-group
    member pairs. Exact: every member shares its representative's text,
    hence its signature/shingle set, hence the pair's verify values."""
    ma = groups.select(F.col("doc_id").alias("a"), F.col("_members").alias("_ma"))
    mb = groups.select(F.col("doc_id").alias("b"), F.col("_members").alias("_mb"))
    return (
        rep_pairs.join(ma, "a").join(mb, "b")
        .select(F.explode("_ma").alias("_xa"), "_mb", *val_cols)
        .select("_xa", F.explode("_mb").alias("_xb"), *val_cols)
        .select(
            F.least("_xa", "_xb").alias("a"),
            F.greatest("_xa", "_xb").alias("b"),
            *val_cols,
        )
    )


def minhash_lsh_dedup(df: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Full near-dup pipeline: exact-dup pre-collapse → shingle → minhash →
    band → candidate pairs → exact Jaccard verify ≥ threshold → re-expand.

    Round-2 verdict #7: identical-text groups are collapsed to ONE
    representative BEFORE the band join (exact-duplicate clusters share
    every band bucket, so the bucket self-join was quadratic in cluster
    size), then pairs re-expand exactly afterwards: within-group pairs are
    (sz, 10000) by definition of identity, cross-group pairs inherit the
    representative pair's verify values. Result-identical to the uncollapsed
    plan — the DuckDB oracle is unchanged and stays hash-green.

    Shuffle budget (the 100 TB shape): one groupBy for the collapse (keyed
    by text md5), one for the signatures, one for the docsets (both keyed
    by rep id over per-doc-distinct shingles); the band self-join shuffles
    by band key (md5-uniform, now cluster-free); pair dedup + the two
    docset joins shuffle by rep id. Nothing is EVER keyed on a raw shingle,
    and no identical-text pair ever reaches a shuffle.

    Raw docs go through ONE upfront exchange with an EXPLICIT partition
    count (AQE would coalesce by byte size, but shingle construction is
    CPU-bound per row — tiny byte volume still wants every core; and input
    files this small arrive as a single split). Signature and docsets both
    reuse that exchange; the md5 double-hash stays in a codegen'd groupBy
    aggregate where CSE shares the md5 across the 16 min expressions."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    groups = collapse_exact(df)
    # explicit repartition AFTER the collapse: the agg output is tiny in
    # BYTES so AQE coalesces it onto ~1 partition, which would serialize
    # the CPU-bound shingle/minhash md5 stage (CLAUDE.md r2 lesson;
    # measured +4.4s at sf0.1 when the exchange sat before the collapse)
    reps = groups.select("doc_id", "text").repartition(n_part)
    sh = shingles(reps)
    # r8: the signature mins and the verify-side hashed shingle sets are
    # aggregates of the SAME per-doc exploded shingles — compute both in
    # ONE groupBy (one shingle derivation + one shuffle instead of two;
    # guide §1.2 "don't compute things twice"), and note collect_set(h1)
    # reuses the signature's own first md5 lane. h1/h2 are PROJECTED
    # columns, not expressions inside the aggregate: collect_set forces
    # ObjectHashAggregate (no whole-stage codegen, no subexpression
    # elimination), which would re-evaluate the md5 interpreted once per
    # min-lane per row — the Project stage keeps it codegen'd and CSE'd
    # (guide §4.1; measured −1.3 s on the fuzzy-decontam twin). The plan's
    # four references to this aggregate share one execution via Spark's
    # ReuseExchange (identical exchange subtrees) — an explicit
    # localCheckpoint was tried and REVERTED (build-time jobs cost more
    # than they saved).
    hashed = sh.select(
        "doc_id",
        _h56(F.col("shingle"), 1).alias("h1"),
        _h56(F.col("shingle"), 15).alias("h2"),
    )
    per_doc = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.col("h1") + F.lit(j) * F.col("h2")).alias(f"mh{j}")
            for j in range(N_MINHASH)
        ],
        F.collect_set("h1").alias("shs"),
        F.count("*").alias("sz"),
    )
    sig = per_doc.select("doc_id", *[f"mh{j}" for j in range(N_MINHASH)])
    docsets = per_doc.select("doc_id", "shs", "sz")
    cand = lsh_candidates(sig)
    rep_pairs = jaccard_pairs_from_sets(docsets, cand, threshold)
    cross = _expand_group_pairs(rep_pairs, groups, ["inter", "jacc_e4"])
    # within-group pairs: identical texts ⇒ inter = the group's distinct-
    # shingle count, jaccard = 1 exactly; groups whose text yields no
    # shingle produce no signature and no pairs (inner join drops them)
    within = (
        groups.join(docsets.select("doc_id", "sz"), "doc_id")
        .select(F.explode("_members").alias("_xa"), "_members", "sz")
        .select("_xa", F.explode("_members").alias("_xb"), "sz")
        .where(F.col("_xa") < F.col("_xb"))
        .select(
            F.col("_xa").alias("a"),
            F.col("_xb").alias("b"),
            F.col("sz").cast("long").alias("inter"),
            F.lit(10000).cast("long").alias("jacc_e4"),
        )
    )
    return cross.unionByName(within)


def dup_clusters(
    df: DataFrame, threshold: float = 0.2, rounds: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Connected components of the near-dup pair graph — the step a dedup
    pipeline runs after :func:`minhash_lsh_dedup` to keep ONE document per
    duplicate cluster. Output (doc_id, cluster_id) with cluster_id = the
    component's smallest doc id; documents with no near-dup pair are
    singletons under their own id.

    Algorithm: ``rounds`` iterations of min-label edge propagation PLUS
    pointer jumping (label := label-of-label). The jump step shortcuts
    label chains, so convergence needs O(log diameter) rounds, not
    diameter. The default is LOW (rounds=2) because the convergence check
    below is a true fixpoint test and the loop auto-extends when it
    fails: real near-dup graphs converge in 1-2 rounds (measured at
    sf0.1: changed=0 after round 1; each extra round costs a full
    driver-synchronized pass — r4 cut the fixed 6-round default, −6 s on
    the bench wall), while a pathological deep chain pays extensions
    instead of every corpus paying the worst case. The DuckDB oracle
    computes the TRUE fixpoint via WITH RECURSIVE, so the driver check
    validates the converged result at test scale.

    Plan-shape note (this operator is the documented EXCEPTION to the kNN
    one-lazy-plan lesson): each round SELF-JOINS labels, so chaining embeds
    ~3 copies of the previous round's logical plan per round — the
    analyzer's cost grows exponentially even with persist() (cache
    substitution happens after analysis). Each round therefore
    localCheckpoint()s: one materializing job per round that TRUNCATES the
    lineage, the same per-iteration checkpoint discipline every
    distributed connected-components implementation uses (GraphFrames
    included). rounds is small and fixed, so the driver-loop cost is
    bounded and independent of data size.

    Labels only ever decrease and every label is a live doc id, so the
    jump join is an inner equi-join on the label — all shuffles are keyed
    by doc id / label; nothing quadratic in cluster size (the pair input
    is already collapse-expanded by minhash_lsh_dedup).

    Non-convergence is DETECTED, not silent: after the rounds, one more
    propagation+jump step is computed lazily and its changed-label count
    checked — non-zero auto-extends the loop (round-3 verdict: a
    >2^rounds-hop near-dup chain would otherwise silently mis-cluster at
    scale), raising only past connected_components' max_rounds cap.
    Planted-chain tests: tests/test_dup_clusters.py."""
    pairs = minhash_lsh_dedup(df, threshold).select("a", "b")
    vertices = df.select(F.col(id_col).alias("doc_id"))
    # pairs derive from df itself — containment holds by construction
    return connected_components(vertices, pairs, rounds=rounds, assume_contained=True)


class ConvergenceError(RuntimeError):
    """Raised when an iterative operator's round bound was too small."""


def _stats_barrier(df: DataFrame) -> DataFrame:
    """Reset plan STATISTICS at an iteration boundary (r7).

    Spark 4's ``localCheckpoint`` truncates lineage but COPIES the origin
    plan's estimated statistics onto the new ``LogicalRDD``. In an
    iterative loop whose round plan references its input k>1 times
    through joins (propagation + pointer jumps here), join size
    estimation MULTIPLIES child sizes, so sizeInBytes compounds as
    stats(round) ~ stats(round-1)^k — a BigInteger whose digit count
    grows k× per round. Past ~8 rounds the driver burns minutes per
    round inside SizeInBytesOnlyStatsPlanVisitor doing million-digit
    BigInteger.multiply (measured: 1.3 s → 13 s → 96 s per round at
    937 rows; data-size-INDEPENDENT, jstack shows the Karatsuba stack).

    The barrier rebuilds the checkpointed RDD as a fresh LogicalRDD with
    no origin stats (leaf falls back to spark.sql.defaultSizeInBytes):
    zero extra jobs, constant 19-digit stats at any round count. Join
    strategy loses nothing — every session runs AQE, which re-plans
    joins from ACTUAL runtime shuffle sizes. Falls back to the input
    unchanged if the internal constructor moves (future pyspark) —
    correct either way, just slow past ~8 rounds."""
    try:
        jdf = df._jdf
        new_jdf = df.sparkSession._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return type(df)(new_jdf, df.sparkSession)
    except Exception:  # pragma: no cover - only on pyspark API drift
        return df


def _cc_round(
    labels: DataFrame, edges: DataFrame, track: bool = False, jumps: int = 1
) -> DataFrame:
    """One CC round: min-label edge propagation, then ``jumps`` pointer jumps.

    ``track=True`` carries the incoming label through as ``_old`` so the
    caller can fold the fixpoint test into the round's own materialization
    (an observe() metric) — the column rides the round's existing joins,
    so tracking costs no extra shuffle and no extra job.

    ``jumps`` > 1 applies the label := label-of-label shortcut repeatedly
    within one round; each extra jump is one more tiny keyed self-join in
    the SAME lazy plan but compounds the chain-shortcut exponent, cutting
    the number of driver-synchronized rounds on large-diameter graphs
    (percolated grids). Near-dup corpora (diameter ~1) keep jumps=1."""
    nbr = (
        edges.join(labels.withColumnRenamed("doc_id", "b"), "b")
        .groupBy(F.col("a").alias("doc_id"))
        .agg(F.min("label").alias("_nl"))
    )
    cols = [F.col("doc_id"), F.least("label", "_nl").alias("label")]
    if track:
        cols.append(F.col("label").alias("_old"))
    # least() ignores NULLs: no-neighbor rows keep their label
    labels = labels.join(nbr, "doc_id", "left").select(*cols)
    # pointer jump: label := label's own label (labels only decrease,
    # so this shortcuts chains and buys log-diameter convergence)
    out = [F.col("doc_id"), F.col("_jl").alias("label")]
    if track:
        out.append(F.col("_old"))
    for _ in range(jumps):
        jump = labels.select(
            F.col("doc_id").alias("label"), F.col("label").alias("_jl")
        )
        labels = labels.join(jump, "label").select(*out)
    return labels


def connected_components(
    vertices: DataFrame,
    pairs: DataFrame,
    rounds: int = 2,
    max_rounds: int = 16,
    check: bool = True,
    assume_contained: bool = False,
    jumps: int = 1,
) -> DataFrame:
    """CC core behind :func:`dup_clusters` (see its docstring for the
    algorithm and the per-round localCheckpoint rationale). ``vertices``
    is (doc_id), ``pairs`` is undirected (a, b) edges; returns
    (doc_id, cluster_id).

    ``check=True`` (the default) runs a pure FIXPOINT loop: each round
    carries its input label through as ``_old`` and an ``observe()``
    metric counts changed labels during the round's own localCheckpoint
    materialization — convergence detection is free (no extra shuffle, no
    extra job; r6, was previously one full extra count job per run). The
    loop stops at the first round whose output equals its input (a
    fixpoint, since a round is a pure function of its input), so ``rounds``
    is ignored under check=True; a graph still changing at ``max_rounds``
    raises :class:`ConvergenceError`. Round-count caveat (measured r7):
    pointer jumping shortcuts the LABEL forest, not the input graph, so
    on path-shaped components (percolated grids) the min-label frontier
    can advance only a few hops per round — the sf0.01 L6 dense grid
    needed 12 rounds at jumps=2, NOT log2(diameter). Near-dup corpora
    (star-shaped clusters, diameter ~1-2) converge in 1-2 rounds; grid
    callers should pass a generous ``max_rounds`` (cell_dbscan uses 64).
    ``check=False`` runs exactly ``rounds`` blind rounds."""
    from pyspark.sql import Observation

    # r8: both edge directions from ONE pass over pairs — the union shape
    # read the pairs plan (the whole minhash pipeline for dup_clusters)
    # once per branch before the persist materialized it (guide §1.2)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("_e")
    ).select("_e.a", "_e.b")
    if not assume_contained:
        # public-API guard (round-4 advice): an edge endpoint absent from
        # ``vertices`` must not leak into label propagation — restrict to
        # the induced subgraph via two semi-joins. Internal callers whose
        # pairs derive from the vertex frame itself (dup_clusters) pass
        # assume_contained=True and skip the two shuffles.
        v = vertices.select("doc_id")
        edges = edges.join(v.withColumnRenamed("doc_id", "a"), "a", "semi").join(
            v.withColumnRenamed("doc_id", "b"), "b", "semi"
        )
    edges = edges.persist()
    labels = vertices.select("doc_id", F.col("doc_id").alias("label"))
    if not check:
        for _ in range(rounds):
            # truncate lineage each round (see docstring); the stats
            # barrier stops per-round sizeInBytes compounding (r7)
            labels = _stats_barrier(
                _cc_round(labels, edges, jumps=jumps).localCheckpoint()
            )
        edges.unpersist()
        return labels.select("doc_id", F.col("label").alias("cluster_id"))
    done = 0
    while True:
        ob = Observation()
        stepped = _cc_round(labels, edges, track=True, jumps=jumps).observe(
            ob,
            F.sum((F.col("label") != F.col("_old")).cast("long")).alias("changed"),
        )
        labels = _stats_barrier(stepped.select("doc_id", "label").localCheckpoint())
        done += 1
        changed = ob.get["changed"] or 0  # None on an empty vertex set
        if not changed:
            break
        if done >= max_rounds:
            edges.unpersist()
            raise ConvergenceError(
                f"connected_components: {changed} labels still changing after "
                f"{done} rounds (max_rounds={max_rounds}, covers diameter "
                f"~2^{max_rounds}) — raise max_rounds for adversarial graphs"
            )
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def _cc_ctes(threshold: float) -> str:
    """The WITH RECURSIVE CTE chain computing true connected components of
    the minhash pair graph; terminal CTE ``labels`` is (doc_id, cluster_id).
    Shared by :func:`dup_clusters_sql` and :func:`dup_keep_best_sql`."""
    return (
        f"WITH RECURSIVE pairs AS (SELECT a, b FROM ({minhash_lsh_sql(threshold)})), "
        "e AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs), "
        "comp(doc_id, label) AS ("
        "SELECT doc_id, doc_id FROM documents "
        "UNION "
        "SELECT e.a, c.label FROM e JOIN comp c ON c.doc_id = e.b), "
        "labels AS (SELECT doc_id, min(label) AS cluster_id FROM comp GROUP BY 1)"
    )


def dup_clusters_sql(threshold: float = 0.2) -> str:
    """DuckDB fixpoint mirror: true connected components via WITH RECURSIVE
    over the same pair graph."""
    return _cc_ctes(threshold) + " SELECT doc_id, cluster_id FROM labels"


def dup_keep_best(
    df: DataFrame,
    threshold: float = 0.2,
    rounds: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Cluster-canonical near-dup RETENTION — the pipeline step between
    :func:`dup_clusters` and sampling: per duplicate cluster keep exactly one
    representative, emit an auditable keep/drop decision for every document.

    Canonical = argmax token count (the standard keep-the-longest near-dup
    policy), tie → min doc_id — a total order, so the choice is
    partition/engine/retry invariant (no first-seen race). Output per doc:
    (doc_id, cluster_id, canon_id, keep 1/0, reason) with reason ∈
    {'unique', 'canonical', 'duplicate'}; exactly one keep=1 row per
    cluster.

    Scale: one groupBy-shuffle pipeline — quality (n_tok) is a row-local
    projection joined onto the cluster labels by doc_id, then ONE window
    partitioned by cluster_id (cluster sizes are near-dup clusters, bounded
    small; the window never sees a global sort). All native Columns."""
    labels = dup_clusters(df, threshold=threshold, rounds=rounds, id_col=id_col)
    qual = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text)).cast("long").alias("n_tok"),
    )
    return _keep_best_decisions(labels.join(qual, "doc_id"))


def _keep_best_decisions(j: DataFrame) -> DataFrame:
    """The keep/drop tail shared by :func:`dup_keep_best` and the
    bucketed-layout path: ``j`` is (doc_id, cluster_id, n_tok)."""
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tok"), F.asc("doc_id"))
    wc = Window.partitionBy("cluster_id")
    canon = F.first("doc_id").over(w)
    csize = F.count(F.lit(1)).over(wc)
    keep = (F.col("doc_id") == canon).cast("long")
    return j.select(
        "doc_id",
        "cluster_id",
        canon.alias("canon_id"),
        keep.alias("keep"),
        F.when(csize == 1, F.lit("unique"))
        .when(keep == 1, F.lit("canonical"))
        .otherwise(F.lit("duplicate"))
        .alias("reason"),
    )


def publish_dedup_layout(
    df: DataFrame,
    prefix: str,
    buckets: int = 8,
    threshold: float = 0.2,
    rounds: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
    path: str | None = None,
) -> tuple[str, str]:
    """Persist the dedup working set as a BUCKETED layout (r7): cluster
    labels and the token-quality projection, both hash-bucketed (and
    bucket-sorted) by doc_id into ``<prefix>_labels`` / ``<prefix>_qual``.

    Why: every downstream consumer re-joins these on doc_id — keep-best
    retention, cluster-safe splits, per-cluster audits. Stored flat,
    each of those queries pays the full doc_id shuffle on 100 TB of
    labels; bucketed, the shuffle is paid ONCE here and every later
    join reads bucket i against bucket i with zero Exchange
    (:func:`keep_best_from_layout` asserts it). ``path`` prefixes
    external-table locations (catalog metadata carries the bucket spec
    either way)."""
    from ult_spark.io.bucketing import write_bucketed

    labels = dup_clusters(df, threshold=threshold, rounds=rounds, id_col=id_col)
    qual = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text)).cast("long").alias("n_tok"),
    )
    lt, qt = f"{prefix}_labels", f"{prefix}_qual"
    write_bucketed(labels, lt, "doc_id", buckets,
                   path=None if path is None else f"{path}/labels")
    write_bucketed(qual, qt, "doc_id", buckets,
                   path=None if path is None else f"{path}/qual")
    return lt, qt


def keep_best_from_layout(spark, prefix: str) -> DataFrame:
    """:func:`dup_keep_best` over a :func:`publish_dedup_layout` table
    pair — the doc_id join is co-located (zero Exchange, ASSERTED: a
    silently degraded layout would re-shuffle the corpus per query);
    the only shuffle left is the cluster_id window that the statistic
    itself requires."""
    from ult_spark.io.bucketing import assert_colocated, bucket_join

    j = bucket_join(spark, f"{prefix}_labels", f"{prefix}_qual", "doc_id")
    assert_colocated(j)
    return _keep_best_decisions(j)


def split_from_layout(
    spark, prefix: str, val_e4: int = 500, test_e4: int = 500
) -> DataFrame:
    """:func:`cluster_safe_split` over a :func:`publish_dedup_layout`
    labels table — the expensive part (LSH + connected components) was
    paid once at publish; the split itself is a ROW-LOCAL projection on
    the committed labels (zero Exchange in the WHOLE plan, ASSERTED),
    so re-cutting splits with different ratios costs one scan."""
    from ult_spark.io.bucketing import assert_colocated

    labels = spark.table(f"{prefix}_labels")
    h = _h56(F.col("cluster_id").cast("string")) % 10000
    out = labels.select(
        "doc_id",
        "cluster_id",
        h.alias("bucket_e4"),
        F.when(h < test_e4, F.lit("test"))
        .when(h < test_e4 + val_e4, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    assert_colocated(out)
    return out


def dup_keep_best_sql(threshold: float = 0.2) -> str:
    """DuckDB mirror of :func:`dup_keep_best` (same total order, same
    token-count quality key)."""
    return (
        _cc_ctes(threshold) + ", "
        "qual AS (SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
        "x -> x != '')) AS BIGINT) AS n_tok FROM documents), "
        "j AS (SELECT l.doc_id, l.cluster_id, q.n_tok FROM labels l "
        "JOIN qual q USING (doc_id)), "
        "ranked AS (SELECT doc_id, cluster_id, "
        "first_value(doc_id) OVER (PARTITION BY cluster_id "
        "ORDER BY n_tok DESC, doc_id ASC) AS canon_id, "
        "count(*) OVER (PARTITION BY cluster_id) AS csize FROM j) "
        "SELECT doc_id, cluster_id, canon_id, "
        "CAST(doc_id = canon_id AS BIGINT) AS keep, "
        "CASE WHEN csize = 1 THEN 'unique' "
        "WHEN doc_id = canon_id THEN 'canonical' "
        "ELSE 'duplicate' END AS reason FROM ranked"
    )


def cluster_safe_split(
    df: DataFrame,
    threshold: float = 0.2,
    rounds: int = 2,
    val_e4: int = 500,
    test_e4: int = 500,
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-free train/val/test split at the near-dup CLUSTER level
    (r6): the split key is the hash of the document's :func:`dup_clusters`
    component id, so near-duplicate documents can NEVER straddle a split
    boundary — the guarantee :func:`split_assign` (doc-id hashing) cannot
    give, since a lightly-edited copy of a training doc lands in test with
    probability test_e4/10000 and silently inflates eval scores.

    Same pinned hash convention as every sampling op (h56 % 10000,
    engine-exact): bucket < test_e4 → 'test', < test_e4+val_e4 → 'val',
    else 'train'. Disjoint, exhaustive, stable under reruns/resharding,
    and cluster-atomic by construction. Output (doc_id, cluster_id,
    bucket_e4, split) per document.

    Scale: dup_clusters' cost dominates (banded LSH + log-diameter CC);
    the split itself is one row-local projection on the labels — no
    additional shuffle."""
    labels = dup_clusters(df, threshold=threshold, rounds=rounds, id_col=id_col)
    h = _h56(F.col("cluster_id").cast("string")) % 10000
    return labels.select(
        "doc_id",
        "cluster_id",
        h.alias("bucket_e4"),
        F.when(h < test_e4, F.lit("test"))
        .when(h < test_e4 + val_e4, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def cluster_safe_split_sql(
    threshold: float = 0.2, val_e4: int = 500, test_e4: int = 500
) -> str:
    """DuckDB mirror of :func:`cluster_safe_split` (true-fixpoint clusters
    via WITH RECURSIVE, same h56 bucket and thresholds)."""
    h = H56_SQL.format(col="cluster_id")
    return (
        _cc_ctes(threshold)
        + f" SELECT doc_id, cluster_id, CAST({h} AS BIGINT) AS bucket_e4, "
        f"CASE WHEN {h} < {test_e4} THEN 'test' "
        f"WHEN {h} < {test_e4 + val_e4} THEN 'val' ELSE 'train' END AS split "
        "FROM labels"
    )


def minhash_lsh_sql(threshold: float = 0.2) -> str:
    """DuckDB mirror of :func:`minhash_lsh_dedup` (same hashes, bands, verify)."""
    r = N_MINHASH // N_BANDS
    mh = ", ".join(f"min(h1 + {j} * h2) AS mh{j}" for j in range(N_MINHASH))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, md5(concat_ws('_', '{b}', "
        + ", ".join(f"CAST(mh{b * r + i} AS VARCHAR)" for i in range(r))
        + ")) AS band FROM sig"
        for b in range(N_BANDS)
    )
    return (
        f"WITH sh AS ({SHINGLES_SQL}), "
        "hs AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1, "
        "('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2 FROM sh), "
        f"sig AS (SELECT doc_id, {mh} FROM hs GROUP BY 1), "
        f"bands AS ({bands}), "
        "cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM bands l "
        "JOIN bands r USING (band) WHERE l.doc_id < r.doc_id), "
        "inters AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS inter FROM sh sa "
        "JOIN sh sb USING (shingle) WHERE sa.doc_id < sb.doc_id GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1) "
        "SELECT c.a, c.b, i.inter, CAST(floor(i.inter * 10000 / (za.sz + zb.sz - i.inter)) AS BIGINT) AS jacc_e4 "
        "FROM cand c JOIN inters i ON c.a = i.a AND c.b = i.b "
        "JOIN sz za ON za.doc_id = c.a JOIN sz zb ON zb.doc_id = c.b "
        f"WHERE floor(i.inter * 10000 / (za.sz + zb.sz - i.inter)) >= {int(threshold * 10000)}"
    )


def jaccard_pairs_sql(threshold: float = 0.3) -> str:
    """DuckDB mirror of the brute n-gram Jaccard join (no LSH pruning)."""
    return (
        f"WITH sh AS ({SHINGLES_SQL}), "
        "inters AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS inter FROM sh sa "
        "JOIN sh sb USING (shingle) WHERE sa.doc_id < sb.doc_id GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1) "
        "SELECT i.a, i.b, i.inter, CAST(floor(i.inter * 10000 / (za.sz + zb.sz - i.inter)) AS BIGINT) AS jacc_e4 "
        "FROM inters i JOIN sz za ON za.doc_id = i.a JOIN sz zb ON zb.doc_id = i.b "
        f"WHERE floor(i.inter * 10000 / (za.sz + zb.sz - i.inter)) >= {int(threshold * 10000)}"
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms (training-data curation: per-document salient terms)

def tfidf_top_terms(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf (ties → term ascending).

    Pinned integer math so both engines agree bit-for-bit: per-doc term
    counts (tf) and document frequencies (dfreq) are exact integers;
    idf = ln((N + 1) / (dfreq + 1)) evaluated as the SAME double expression
    in both engines; score_e6 = floor(tf · idf · 1e6).

    Shuffle budget: one explode+groupBy for term counts (keyed (doc, tok)),
    one groupBy for document frequencies (keyed tok — partial aggs make the
    hot-token skew a non-issue), one broadcast-able join tok→dfreq, one
    per-doc window for the top-k. N is computed inside the plan via a
    window-free scalar: count over the dfreq table would need an action, so
    the caller-visible plan uses a cross-joined 1-row count aggregate
    (broadcast, no driver scalar)."""
    # r8 perf: the scored branch and the document-frequency branch both
    # re-derived the (doc, tok) aggregate (no subplan sharing). dfreq only
    # needs "how many docs contain tok", which per-doc row-local
    # array_distinct + a tok-keyed count gives without the (doc, tok)
    # shuffle; tf then executes exactly once. fanout: one-split scan at
    # bench scale (io.testdata.fanout).
    from ult_spark.io.testdata import fanout

    fdf = fanout(df)
    toks = fdf.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col(text)).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = (
        fdf.select(F.explode(F.array_distinct(tokens_col(text))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("dfreq"))
    )
    ndocs = df.agg(F.count("*").alias("n_docs"))
    idf = F.log((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("dfreq") + F.lit(1)).cast("double"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(ndocs))
        .withColumn("score_e6", F.floor(F.col("tf") * idf * F.lit(1_000_000)).cast("long"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_e6"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("doc_id", "tok", "score_e6", F.col("rk").cast("long").alias("rk"))
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    return (
        "WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
        "x -> x != '')) AS tok FROM documents), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2), "
        "dfreq AS (SELECT tok, count(*) AS dfreq FROM tf GROUP BY 1), "
        "nd AS (SELECT count(*) AS n_docs FROM documents), "
        "scored AS (SELECT doc_id, tok, CAST(floor(tf * ln("
        "CAST(n_docs + 1 AS DOUBLE) / CAST(dfreq + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS score_e6 "
        "FROM tf JOIN dfreq USING (tok), nd) "
        "SELECT doc_id, tok, score_e6, rk FROM ("
        "SELECT doc_id, tok, score_e6, CAST(row_number() OVER ("
        "PARTITION BY doc_id ORDER BY score_e6 DESC, tok ASC) AS BIGINT) AS rk "
        f"FROM scored) WHERE rk <= {k}"
    )


# ---------------------------------------------------------------------------
# SimHash

def simhash(df: DataFrame, id_col: str = "doc_id", text: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash over distinct tokens (bit j set iff strictly more
    token hashes have bit j set than not — pinned tie rule: tie → 0).

    One shuffle: all ``bits`` per-bit scores are aggregate expressions of a
    single groupBy (literal shifts — Spark's shiftright takes only int)."""
    # r8 perf: per-doc distinctness is ROW-LOCAL when ids are unique (every
    # caller passes an id-unique frame), so array_distinct replaces the
    # DataFrame .distinct() — one whole Exchange removed (guide §2.4); the
    # md5 partial-agg work is fanned out across cores (the docs scan is a
    # single split at bench scale — see io.testdata.fanout).
    from ult_spark.io.testdata import fanout

    toks = fanout(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(text))).alias("tok"),
    ).withColumn("h", _h56(F.col("tok"), 1))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    sc = toks.groupBy("doc_id").agg(*aggs)
    val = F.lit(0).cast("long")
    for j in range(bits):
        val = val + F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sc.select("doc_id", val.alias("simhash"))


def simhash_sql(bits: int = 32) -> str:
    score = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(bits)
    )
    val = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)" for j in range(bits))
    return (
        f"SELECT doc_id, CAST({val} AS BIGINT) AS simhash FROM ("
        f"SELECT doc_id, {score} FROM ("
        "SELECT DISTINCT doc_id, ('0x' || substr(md5(tok), 1, 14))::BIGINT AS h "
        "FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok "
        "FROM documents)) GROUP BY 1)"
    )


def simhash_near_dup(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ max_hamming.

    Banding is EXACT here, not probabilistic: splitting the 32-bit signature
    into 4 8-bit chunks, any pair within hamming ≤ 3 must agree on at least
    one chunk (pigeonhole), so the (chunk_idx, chunk_value) equi-join loses
    nothing and the verify is a cheap bit_count(xor). One signature pass +
    one band-keyed shuffle — the simhash analog of the MinHash-LSH plan.

    Round-2 verdict #7: identical-text groups collapse to one
    representative BEFORE the chunk self-join (identical texts share every
    chunk, so the join was quadratic in exact-dup cluster size) and pairs
    re-expand exactly afterwards: within-group pairs have hamming 0,
    cross-group pairs inherit the representative pair's hamming (identical
    text ⇒ identical simhash). Result-identical; oracle unchanged.
    """
    if max_hamming > 3:
        raise ValueError("4x8-bit banding is exact only for max_hamming <= 3")
    groups = collapse_exact(df, id_col=id_col, text=text)
    # r8: simhash fans its input out internally now — no pre-repartition
    sig = simhash(groups, id_col="doc_id", text="text")
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.shiftright(F.col("simhash"), 8 * j).bitwiseAND(F.lit(255)).alias("v"),
                )
                for j in range(4)
            ]
        )
    ).alias("_c")
    bands = sig.select("doc_id", "simhash", chunks).select(
        "doc_id", "simhash", F.col("_c.j").alias("j"), F.col("_c.v").alias("v")
    )
    # r8: pin the exploding chunk self-join's parallelism (same rationale
    # and shape as lsh_candidates — keyed repartition replaces the join's
    # own exchange)
    bands = bands.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "j", "v"
    )
    l = bands.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"), "j", "v")
    r = bands.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"), "j", "v")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    rep_pairs = (
        l.join(r, ["j", "v"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    cross = _expand_group_pairs(rep_pairs, groups, ["hamming"])
    # within-group: identical texts ⇒ hamming 0; token-less docs have no
    # signature and therefore no pairs (semi join drops their groups)
    within = (
        groups.join(sig.select("doc_id"), "doc_id", "left_semi")
        .select(F.explode("_members").alias("_xa"), "_members")
        .select("_xa", F.explode("_members").alias("_xb"))
        .where(F.col("_xa") < F.col("_xb"))
        .select(
            F.col("_xa").alias("a"),
            F.col("_xb").alias("b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(within)


def simhash_near_dup_sql(max_hamming: int = 3) -> str:
    chunks = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS j, (simhash >> {8 * j}) & 255 AS v FROM sig"
        for j in range(4)
    )
    return (
        f"WITH sig AS ({simhash_sql()}), bands AS ({chunks}) "
        "SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, "
        "CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming "
        "FROM bands l JOIN bands r USING (j, v) WHERE l.doc_id < r.doc_id "
        f"AND bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}"
    )


# ---------------------------------------------------------------------------
# language ID + quality score (heuristic marker-word scoring, pinned)

# marker tokens drawn from the documents vocabulary so predictions vary
# (a heuristic demo of n-gram language ID over synthetic word-soup text)
LANG_MARKERS = {
    "en": ("the", "fast"),
    "es": ("data", "row"),
    "de": ("slow", "group"),
}


def lang_id(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Argmax of marker-token counts, priority order en > es > de > und."""
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col(text)).alias("tok"))
    scores = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("tok").isin(*LANG_MARKERS[lang]), 1).otherwise(0)).alias(f"s_{lang}")
            for lang in LANG_MARKERS
        ]
    )
    best = F.greatest(*[F.col(f"s_{la}") for la in LANG_MARKERS])
    pred = (
        F.when(best == 0, "und")
        .when(F.col("s_en") == best, "en")
        .when(F.col("s_es") == best, "es")
        .otherwise("de")
    )
    return scores.select("doc_id", pred.alias("pred_lang"))


def lang_id_sql() -> str:
    score = {
        la: f"sum(CASE WHEN tok IN ({', '.join(repr(m) for m in LANG_MARKERS[la])}) THEN 1 ELSE 0 END)"
        for la in LANG_MARKERS
    }
    return (
        "SELECT doc_id, CASE WHEN best = 0 THEN 'und' WHEN s_en = best THEN 'en' "
        "WHEN s_es = best THEN 'es' ELSE 'de' END AS pred_lang FROM ("
        "SELECT doc_id, s_en, s_es, s_de, greatest(s_en, s_es, s_de) AS best FROM ("
        f"SELECT doc_id, {score['en']} AS s_en, {score['es']} AS s_es, {score['de']} AS s_de "
        "FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok "
        "FROM documents) GROUP BY 1))"
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Length + mean word length + stopword ratio, all e4 integers (pinned)."""
    toks = tokens_col(text)
    n_tok = F.size(toks).cast("long")
    n_char = F.length(text).cast("long")
    stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "and", "of"))).cast("long")
    return df.select(
        id_col,
        n_char.alias("n_char"),
        n_tok.alias("n_tok"),
        (stop * 10000 / n_tok).cast("long").alias("stop_ratio_e4"),
        ((n_char - n_tok + 1) * 10000 / n_tok).cast("long").alias("mean_wlen_e4"),
    )


QUALITY_SQL = (
    "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_char, CAST(n_tok AS BIGINT) AS n_tok, "
    "CAST(stop * 10000 // n_tok AS BIGINT) AS stop_ratio_e4, "
    "CAST((length(text) - n_tok + 1) * 10000 // n_tok AS BIGINT) AS mean_wlen_e4 FROM ("
    "SELECT doc_id, text, len(toks) AS n_tok, "
    "len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS stop FROM ("
    "SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents))"
)


# ---------------------------------------------------------------------------
# Deterministic sampling / splitting (r4) — the reproducible corpus-curation
# primitives: NO rand() anywhere (CLAUDE.md salting rule generalized), so the
# same rows are selected on every run, on every engine, under any
# partitioning or retry — which is what makes a 100-TB sampled training set
# auditable. Keep-rule: h56(id) % 10000 < frac·10000, with the md5-derived
# 56-bit hash both engines share (see _h56).


def stratified_sample(
    df: DataFrame,
    fracs: dict[str, float] | float,
    strata: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling. ``fracs`` is either one global
    fraction or {stratum_value: fraction} (absent strata keep 0 rows —
    explicit-allowlist semantics, the honest default for curation)."""
    h = _h56(F.col(id_col).cast("string")) % 10000
    if isinstance(fracs, dict):
        thr = F.lit(0)
        for val, frac in sorted(fracs.items()):
            thr = F.when(F.col(strata) == val, F.lit(int(frac * 10000))).otherwise(thr)
    else:
        thr = F.lit(int(fracs * 10000))
    return df.where(h < thr)


def split_assign(
    df: DataFrame, test_e4: int = 1000, id_col: str = "doc_id", out: str = "split"
) -> DataFrame:
    """Deterministic train/test assignment by id hash: h56 % 10000 <
    ``test_e4`` → 'test', else 'train'. Disjoint and exhaustive by
    construction — the leakage-free split a training pipeline needs, stable
    under reruns and resharding."""
    h = _h56(F.col(id_col).cast("string")) % 10000
    return df.withColumn(out, F.when(h < test_e4, F.lit("test")).otherwise(F.lit("train")))


H56_SQL = "(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 14))::BIGINT % 10000)"


def stratified_sample_sql(fracs: dict[str, float], strata: str = "lang") -> str:
    """DuckDB mirror of :func:`stratified_sample` over the documents view."""
    h = H56_SQL.format(col="doc_id")
    cases = " ".join(
        f"WHEN {strata} = '{v}' THEN {int(f * 10000)}"
        for v, f in sorted(fracs.items())
    )
    return (
        f"SELECT doc_id, {strata}, n_chars FROM documents "
        f"WHERE {h} < (CASE {cases} ELSE 0 END)"
    )


def split_counts_sql(test_e4: int = 1000) -> str:
    h = H56_SQL.format(col="doc_id")
    return (
        f"SELECT CASE WHEN {h} < {test_e4} THEN 'test' ELSE 'train' END AS split, "
        "lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS chars "
        "FROM documents GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# PMI co-occurrence (corpus analysis: which term pairs travel together)

def pmi_pairs(
    df: DataFrame,
    top_v: int = 40,
    min_pair: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Pointwise mutual information over term pairs from a CAPPED
    vocabulary: (tok1, tok2, c_ab, pmi_e6) with tok1 < tok2.

    Doc-level co-occurrence on DISTINCT (doc, term) incidences.
    Vocabulary = the ``top_v`` terms by document frequency (ties → term
    ascending — a total order, so the cap is deterministic), taken with
    orderBy+limit (Spark plans TakeOrderedAndProject: distributed
    partial top-k, no single-partition window) and broadcast. The
    within-doc pair self-join is bounded by ``top_v`` terms per doc, so
    the pair space is <= V²/2 regardless of corpus size — the cap is
    what makes this 100-TB-safe; raising it trades pairs for cost, and
    an uncapped run is a deliberate caller choice.

    Exact cross-engine: all counts integers; pmi = ln of ONE double
    division of two exact integer products (n_docs·c_ab ≤ ~1e12 « 2^53,
    so both products are exactly representable), floored to e6 — the
    tfidf/token_entropy ln-parity precedent.
    """
    dt = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text)).alias("tok")
    ).distinct()
    dfreq = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("dfreq"))
    vocab = dfreq.orderBy(F.desc("dfreq"), F.asc("tok")).limit(top_v)
    ft = dt.join(F.broadcast(vocab), "tok").select("doc_id", "tok", "dfreq")
    a = ft.select("doc_id", F.col("tok").alias("tok1"), F.col("dfreq").alias("c_a"))
    b = ft.select("doc_id", F.col("tok").alias("tok2"), F.col("dfreq").alias("c_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("tok1") < F.col("tok2"))
        .groupBy("tok1", "tok2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c_ab"),
            F.first("c_a").alias("_ca"),
            F.first("c_b").alias("_cb"),
        )
        .where(F.col("c_ab") >= min_pair)
    )
    nd = F.broadcast(df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    pmi = F.floor(
        F.log(
            (F.col("n_docs") * F.col("c_ab")).cast("double")
            / (F.col("_ca") * F.col("_cb")).cast("double")
        )
        * F.lit(1000000.0)
    ).cast("long")
    return pairs.crossJoin(nd).select("tok1", "tok2", "c_ab", pmi.alias("pmi_e6"))


def pmi_pairs_sql(top_v: int = 40, min_pair: int = 2) -> str:
    return (
        "WITH dt AS (SELECT DISTINCT doc_id, unnest(list_filter("
        "string_split(text, ' '), x -> x != '')) AS tok FROM documents), "
        "dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfreq "
        "FROM dt GROUP BY 1), "
        f"vocab AS (SELECT tok, dfreq FROM dfreq "
        f"ORDER BY dfreq DESC, tok ASC LIMIT {top_v}), "
        "ft AS (SELECT doc_id, tok, dfreq FROM dt JOIN vocab USING (tok)), "
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents), "
        "pr AS (SELECT a.tok AS tok1, b.tok AS tok2, "
        "CAST(count(*) AS BIGINT) AS c_ab, "
        "any_value(a.dfreq) AS _ca, any_value(b.dfreq) AS _cb "
        "FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_pair}) "
        "SELECT tok1, tok2, c_ab, "
        "CAST(floor(ln(CAST(n_docs * c_ab AS DOUBLE) "
        "/ CAST(_ca * _cb AS DOUBLE)) * 1000000.0) AS BIGINT) AS pmi_e6 "
        "FROM pr CROSS JOIN nd"
    )


# ---------------------------------------------------------------------------
# Overlap-coefficient (containment) near-dups — catches truncation/quoting
# pairs that Jaccard misses (a small doc fully inside a big one has low
# Jaccard but overlap ~= 1)

def overlap_pairs(df: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs by the Szymkiewicz-Simpson overlap coefficient
    ``|A∩B| / min(|A|, |B|)`` over distinct shingle sets, e4-floored.

    Same 100-TB pipeline shape as :func:`minhash_lsh_dedup` (exact-dup
    pre-collapse → minhash bands → candidate pairs → exact verify →
    re-expand; nothing keyed on a raw shingle, no identical-text pair
    reaches a shuffle) — only the verify statistic differs. NOTE the
    recall caveat (documented, inherent): candidates come from the
    symmetric LSH bands, so a SMALL doc buried in a much larger one can
    miss banding even at overlap 1.0 — this op upgrades precision ranking
    for pairs the bands do surface; full containment recall needs a
    dedicated asymmetric index (out of scope, same judgment call as the
    capped ANN default)."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    groups = collapse_exact(df)
    reps = groups.select("doc_id", "text").repartition(n_part)
    sh = shingles(reps)
    cand = lsh_candidates(minhash_signature(sh))
    docsets = sh.groupBy("doc_id").agg(
        F.collect_set(_h56(F.col("shingle"))).alias("shs"),
        F.count("*").alias("sz"),
    )
    a = docsets.select(F.col("doc_id").alias("a"), F.col("shs").alias("sha"), F.col("sz").alias("sza"))
    b = docsets.select(F.col("doc_id").alias("b"), F.col("shs").alias("shb"), F.col("sz").alias("szb"))
    rep_pairs = (
        cand.join(a, "a").join(b, "b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")).cast("long"))
        .withColumn(
            "overlap_e4",
            F.floor(F.col("inter") * 10000 / F.least("sza", "szb")).cast("long"),
        )
        .where(F.col("overlap_e4") >= int(threshold * 10000))
        .select("a", "b", "inter", "overlap_e4")
    )
    cross = _expand_group_pairs(rep_pairs, groups, ["inter", "overlap_e4"])
    within = (
        groups.join(docsets.select("doc_id", "sz"), "doc_id")
        .select(F.explode("_members").alias("_xa"), "_members", "sz")
        .select("_xa", F.explode("_members").alias("_xb"), "sz")
        .where(F.col("_xa") < F.col("_xb"))
        .select(
            F.col("_xa").alias("a"),
            F.col("_xb").alias("b"),
            F.col("sz").cast("long").alias("inter"),
            F.lit(10000).cast("long").alias("overlap_e4"),
        )
    )
    return cross.unionByName(within)


def overlap_pairs_sql(threshold: float = 0.5) -> str:
    """DuckDB mirror (uncollapsed plan — result-identical by the same
    argument as minhash_lsh_sql)."""
    r = N_MINHASH // N_BANDS
    mh = ", ".join(f"min(h1 + {j} * h2) AS mh{j}" for j in range(N_MINHASH))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, md5(concat_ws('_', '{b}', "
        + ", ".join(f"CAST(mh{b * r + i} AS VARCHAR)" for i in range(r))
        + ")) AS band FROM sig"
        for b in range(N_BANDS)
    )
    return (
        f"WITH sh AS ({SHINGLES_SQL}), "
        "hs AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1, "
        "('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2 FROM sh), "
        f"sig AS (SELECT doc_id, {mh} FROM hs GROUP BY 1), "
        f"bands AS ({bands}), "
        "cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM bands l "
        "JOIN bands r USING (band) WHERE l.doc_id < r.doc_id), "
        "inters AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS inter FROM sh sa "
        "JOIN sh sb USING (shingle) WHERE sa.doc_id < sb.doc_id GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1) "
        "SELECT c.a, c.b, i.inter, "
        "CAST(floor(i.inter * 10000 / least(za.sz, zb.sz)) AS BIGINT) AS overlap_e4 "
        "FROM cand c JOIN inters i ON c.a = i.a AND c.b = i.b "
        "JOIN sz za ON za.doc_id = c.a JOIN sz zb ON zb.doc_id = c.b "
        f"WHERE floor(i.inter * 10000 / least(za.sz, zb.sz)) >= {int(threshold * 10000)}"
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between two sources' vocabulary distributions
# (corpus comparison: drift between crawls / sources / snapshots)

def source_token_js(
    df: DataFrame,
    src_a: str,
    src_b: str,
    src_col: str = "source",
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """One row: JS divergence between the two sources' token DOCUMENT-
    frequency distributions — (n_terms, n_a, n_b, sum_a_e9, sum_b_e9,
    js_e9).

    p_t = df_a(t)/N_a against q_t = df_b(t)/N_b where N = Σ_t df(t);
    ``JS = ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q))``. The ln argument
    reduces to exact integer products: ``2p/(p+q) = 2·df_a·N_b /
    (df_a·N_b + df_b·N_a)`` — document frequencies keep the products
    « 2^53 (the PMI bound argument). Each side's terms are e9-floored
    BEFORE the order-free integer sums; the final halving is an integer
    div. Zero-count terms on one side contribute ln 2 on the other side
    only (full outer join, explicit CASE — no log-of-zero branch).

    Scale: one distinct + groupBy per token (partial aggs), one
    token-keyed full outer join of the two marginal tables, broadcast
    1-row totals."""
    dt = (
        df.where(F.col(src_col).isin(src_a, src_b))
        .select(F.col(src_col).alias("_s"),
                F.col(id_col).alias("_d"),
                F.explode(tokens_col(text)).alias("tok"))
        .distinct()
    )
    cnt = dt.groupBy("_s", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ca = cnt.where(F.col("_s") == src_a).select("tok", F.col("c").alias("ca"))
    cb = cnt.where(F.col("_s") == src_b).select("tok", F.col("c").alias("cb"))
    na = F.broadcast(ca.agg(F.sum("ca").cast("long").alias("na")))
    nb = F.broadcast(cb.agg(F.sum("cb").cast("long").alias("nb")))
    j = (
        ca.join(cb, "tok", "full_outer")
        .select(F.coalesce("ca", F.lit(0)).alias("ca"),
                F.coalesce("cb", F.lit(0)).alias("cb"))
        .crossJoin(na)
        .crossJoin(nb)
    )
    num_a = (F.col("ca") * F.col("nb")).cast("long")
    num_b = (F.col("cb") * F.col("na")).cast("long")
    den = (num_a + num_b).cast("double")
    term_a = F.when(
        F.col("ca") > 0,
        F.floor(
            F.lit(1000000000.0)
            * (F.col("ca").cast("double") / F.col("na").cast("double"))
            * F.log(F.lit(2.0) * num_a.cast("double") / den)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    term_b = F.when(
        F.col("cb") > 0,
        F.floor(
            F.lit(1000000000.0)
            * (F.col("cb").cast("double") / F.col("nb").cast("double"))
            * F.log(F.lit(2.0) * num_b.cast("double") / den)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        j.withColumn("_ta", term_a)
        .withColumn("_tb", term_b)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.any_value(F.col("na")).alias("n_a"),
            F.any_value(F.col("nb")).alias("n_b"),
            F.sum("_ta").cast("long").alias("sum_a_e9"),
            F.sum("_tb").cast("long").alias("sum_b_e9"),
        )
        .select(
            "n_terms", "n_a", "n_b", "sum_a_e9", "sum_b_e9",
            # clamp before halving: JS >= 0 but per-term floors can push the
            # integer sums a few ulps negative, and Spark `div` truncates
            # toward zero while DuckDB `//` floors — they differ on negatives
            F.expr("greatest(sum_a_e9 + sum_b_e9, 0L) div 2").alias("js_e9"),
        )
    )


def source_token_js_sql(src_a: str, src_b: str) -> str:
    return (
        "WITH dt AS (SELECT DISTINCT source AS s, doc_id, "
        "unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok "
        f"FROM documents WHERE source IN ('{src_a}', '{src_b}')), "
        "cnt AS (SELECT s, tok, CAST(count(*) AS BIGINT) AS c "
        "FROM dt GROUP BY 1, 2), "
        f"ca AS (SELECT tok, c AS ca FROM cnt WHERE s = '{src_a}'), "
        f"cb AS (SELECT tok, c AS cb FROM cnt WHERE s = '{src_b}'), "
        "na AS (SELECT CAST(sum(ca) AS BIGINT) AS na FROM ca), "
        "nb AS (SELECT CAST(sum(cb) AS BIGINT) AS nb FROM cb), "
        "j AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb "
        "FROM ca FULL OUTER JOIN cb USING (tok)), "
        "t AS (SELECT ca, cb, na, nb, "
        "CASE WHEN ca > 0 THEN CAST(floor(1000000000.0::DOUBLE "
        "* (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) "
        "* ln(2.0::DOUBLE * CAST(ca * nb AS DOUBLE) "
        "/ CAST(ca * nb + cb * na AS DOUBLE))) AS BIGINT) ELSE 0 END AS ta, "
        "CASE WHEN cb > 0 THEN CAST(floor(1000000000.0::DOUBLE "
        "* (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) "
        "* ln(2.0::DOUBLE * CAST(cb * na AS DOUBLE) "
        "/ CAST(ca * nb + cb * na AS DOUBLE))) AS BIGINT) ELSE 0 END AS tb "
        "FROM j CROSS JOIN na CROSS JOIN nb) "
        "SELECT CAST(count(*) AS BIGINT) AS n_terms, "
        "any_value(na) AS n_a, any_value(nb) AS n_b, "
        "CAST(sum(ta) AS BIGINT) AS sum_a_e9, CAST(sum(tb) AS BIGINT) AS sum_b_e9, "
        "greatest(CAST(sum(ta) AS BIGINT) + CAST(sum(tb) AS BIGINT), 0) // 2 "
        "AS js_e9 "
        "FROM t"
    )


# ---------------------------------------------------------------------------
# Mirror-host detection (Bharat & Broder 1999 shape: hosts sharing many
# exact-content fingerprints are mirrors/aliases of one another)

def planted_mirror_docs(
    docs: DataFrame, n: int = 60, base: int = 1_000_000, variants: int = 12
) -> DataFrame:
    """Append ``n`` synthetic mirror rows (the driver corpus has no
    cross-host exact duplicates — same degenerate-corpus plant pattern
    as pii_scrub): doc_id ``base..base+n``, text ``'mirror payload ' ||
    id % variants`` — pure literals, mirrored verbatim in the SQL twin,
    so parity is by construction."""
    spark = docs.sparkSession
    extra = spark.range(base, base + n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("mirror payload "), (F.col("id") % variants).cast("string")
        ).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(extra)


def host_mirror_pairs(
    docs: DataFrame,
    host_mod: int = 20,
    max_hosts: int = 8,
    min_shared: int = 2,
) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, overlap_e4) for host
    pairs sharing >= ``min_shared`` exact-content fingerprints.

    Fingerprint = md5 of the full text; fingerprints present on more
    than ``max_hosts`` hosts are dropped FIRST as non-discriminative
    (site chrome/boilerplate — the standard stop-fingerprint trick
    that keeps the pair join linear in mirrored content instead of
    quadratic in hosts-sharing-a-template); host sizes are counted on
    the same capped universe. overlap_e4 floors shared/min(size) —
    the containment form, robust to one side being a partial mirror.

    Scale: one distinct + one fingerprint-keyed self-join whose fanout
    is capped at ``max_hosts``² per fingerprint, one pair-keyed groupBy,
    two broadcast-size host-size joins — never hosts × hosts."""
    host = F.concat(F.lit("site"), (F.col("doc_id") % host_mod).cast("string"))
    fps = docs.select(host.alias("host"), F.md5(F.col("text")).alias("fp")).distinct()
    disc = fps.join(
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_k"))
        .where(F.col("_k") <= max_hosts)
        .select("fp"),
        "fp",
    )
    sizes = disc.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    pairs = (
        disc.select("fp", F.col("host").alias("host_a"))
        .join(disc.select("fp", F.col("host").alias("host_b")), "fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("size_b")),
            "host_b",
        )
        .select(
            "host_a", "host_b", "shared", "size_a", "size_b",
            F.floor(
                F.col("shared") * 10000 / F.least("size_a", "size_b")
            ).cast("long").alias("overlap_e4"),
        )
    )


def host_mirror_pairs_sql(
    host_mod: int = 20,
    max_hosts: int = 8,
    min_shared: int = 2,
    n: int = 60,
    base: int = 1_000_000,
    variants: int = 12,
) -> str:
    return (
        "WITH d AS (SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT range AS doc_id, 'mirror payload ' || "
        f"CAST(range % {variants} AS VARCHAR) AS text "
        f"FROM range({base}, {base + n})), "
        f"fps AS (SELECT DISTINCT 'site' || CAST(doc_id % {host_mod} AS VARCHAR) "
        "AS host, md5(text) AS fp FROM d), "
        f"keep AS (SELECT fp FROM fps GROUP BY 1 HAVING count(*) <= {max_hosts}), "
        "disc AS (SELECT f.host, f.fp FROM fps f JOIN keep USING (fp)), "
        "sz AS (SELECT host, CAST(count(*) AS BIGINT) AS sz FROM disc GROUP BY 1), "
        "pr AS (SELECT a.host AS host_a, b.host AS host_b, "
        "CAST(count(*) AS BIGINT) AS shared "
        "FROM disc a JOIN disc b ON a.fp = b.fp AND a.host < b.host "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_shared}) "
        "SELECT p.host_a, p.host_b, p.shared, za.sz AS size_a, zb.sz AS size_b, "
        "CAST(floor(p.shared * 10000 / least(za.sz, zb.sz)) AS BIGINT) "
        "AS overlap_e4 "
        "FROM pr p JOIN sz za ON za.host = p.host_a "
        "JOIN sz zb ON zb.host = p.host_b"
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    topk: int = 20,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """BM25 document ranking for a bag of query ``terms`` (Robertson &
    Walker; the Lucene non-negative idf variant): per doc
    ``Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))`` with the
    standard k1=1.2, b=0.75 — emitted as (doc_id, matched, bm25_e6, rk)
    for the top-``topk`` docs (total order: score DESC, doc_id ASC).

    Pinned cross-engine math: with avglen = S/N (S = Σ doc lengths,
    N = docs with ≥1 token) the k1/b constants clear to the EXACT
    integer ratio ``22·S·tf / (10·S·tf + 3·S + 9·len·N)`` — numerator
    and denominator are exact BIGINTs (bound ~22·S·tf, fine past 1e13
    total tokens), idf = ln(1 + (N−df+0.5)/(df+0.5)) is one shared
    double expression over exact integers (the tfidf_top_terms ln-parity
    precedent), and each per-(doc,term) contribution is e6-floored
    BEFORE the order-free integer sum per doc.

    Shuffle budget: one explode+groupBy for (doc, term) tf restricted to
    the query terms (the explode filters BEFORE the shuffle — candidate
    volume is docs containing a query term, not the corpus token count),
    one groupBy for doc lengths, a broadcast term→df join, one top-k
    window. Nothing quadratic; the term list is a literal."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text)).alias("tok")
    )
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("len"))
    tot = F.broadcast(
        doclen.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("len").cast("long").alias("s"),
        )
    )
    qtf = (
        toks.where(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = F.broadcast(
        qtf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    num = (F.lit(22) * F.col("s") * F.col("tf")).cast("double")
    den = (
        F.lit(10) * F.col("s") * F.col("tf")
        + F.lit(3) * F.col("s")
        + F.lit(9) * F.col("len") * F.col("n")
    ).cast("double")
    contrib = F.floor(F.lit(1000000.0) * idf * num / den).cast("long")
    scored = (
        qtf.join(dfreq, "tok")
        .join(doclen, "doc_id")
        .crossJoin(tot)
        .select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("matched"),
            F.sum("c").cast("long").alias("bm25_e6"),
        )
    )
    w = Window.orderBy(F.desc("bm25_e6"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= topk)
        .select("doc_id", "matched", "bm25_e6", "rk")
    )


def bm25_topk_sql(terms: list[str], topk: int = 20, table: str = "documents") -> str:
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return (
        f"WITH toks AS (SELECT doc_id, unnest(list_filter("
        f"string_split(text, ' '), x -> x != '')) AS tok FROM {table}), "
        "doclen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len "
        "FROM toks GROUP BY 1), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(len) AS BIGINT) AS s FROM doclen), "
        f"qtf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf "
        f"FROM toks WHERE tok IN ({tlist}) GROUP BY 1, 2), "
        "dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df "
        "FROM qtf GROUP BY 1), "
        "scored AS (SELECT q.doc_id, CAST(count(*) AS BIGINT) AS matched, "
        "CAST(sum(CAST(floor(1000000.0::DOUBLE * "
        "ln(1.0::DOUBLE + (CAST(t.n - d.df AS DOUBLE) + 0.5::DOUBLE) "
        "/ (CAST(d.df AS DOUBLE) + 0.5::DOUBLE)) "
        "* CAST(22 * t.s * q.tf AS DOUBLE) "
        "/ CAST(10 * t.s * q.tf + 3 * t.s + 9 * l.len * t.n AS DOUBLE)) "
        "AS BIGINT)) AS BIGINT) AS bm25_e6 "
        "FROM qtf q JOIN dfreq d ON d.tok = q.tok "
        "JOIN doclen l ON l.doc_id = q.doc_id CROSS JOIN tot t "
        "GROUP BY 1) "
        "SELECT doc_id, matched, bm25_e6, "
        "CAST(row_number() OVER (ORDER BY bm25_e6 DESC, doc_id ASC) AS BIGINT) "
        "AS rk FROM scored "
        f"QUALIFY rk <= {topk}"
    )


def zipf_slope(
    df: DataFrame, topk: int = 100, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Zipf rank-frequency slope of the corpus vocabulary: regress
    floor(1e6·ln freq) on floor(1e6·ln rank) over the top-``topk`` terms
    (rank by freq DESC, term ASC — total order) and emit one row
    (n_terms, sx, sy, sxy, sxx, slope_e6). A healthy natural-language
    corpus reads slope ≈ −1e6 (Zipf's law); template/spam floods bend it
    — the corpus-health gauge next to token_entropy / source JS.

    Cross-engine: the ln values are e6-floored per term BEFORE the
    moment sums (the host_lang_divergence discipline), so sx/sy/sxy/sxx
    are exact BIGINTs (x ≤ 1e6·ln(topk) ≈ 4.6e6, y ≤ 1e6·ln(Σtokens);
    n·Σxy stays under 2^63 through ~1e15 total tokens at topk=100);
    slope_e6 = floor(1e6·(n·sxy − sx·sy)/(n·sxx − sx·sx)) is the single
    float division. Scale: one explode+groupBy (partial aggs absorb the
    hot-token skew) + TakeOrderedAndProject for the top-k + one tiny
    agg — never a global sort of the vocabulary."""
    freq = (
        df.select(F.explode(tokens_col(text)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(topk)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    xy = freq.select(
        F.floor(F.lit(1000000.0) * F.log(F.row_number().over(w).cast("double")))
        .cast("long")
        .alias("x"),
        F.floor(F.lit(1000000.0) * F.log(F.col("cnt").cast("double")))
        .cast("long")
        .alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    den = F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.floor(
        F.lit(1000000.0)
        * (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / den.cast("double")
    ).cast("long")
    return m.select(
        "n_terms", "sx", "sy", "sxy", "sxx",
        F.when(den != 0, slope).alias("slope_e6"),
    )


def zipf_slope_sql(topk: int = 100, table: str = "documents") -> str:
    return (
        f"WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '), "
        f"x -> x != '')) AS tok FROM {table}), "
        "freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks "
        f"GROUP BY 1 ORDER BY cnt DESC, tok ASC LIMIT {topk}), "
        "xy AS (SELECT CAST(floor(1000000.0::DOUBLE * ln(CAST(row_number() "
        "OVER (ORDER BY cnt DESC, tok ASC) AS DOUBLE))) AS BIGINT) AS x, "
        "CAST(floor(1000000.0::DOUBLE * ln(CAST(cnt AS DOUBLE))) AS BIGINT) "
        "AS y FROM freq), "
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_terms, "
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
        "CAST(sum(x * y) AS BIGINT) AS sxy, "
        "CAST(sum(x * x) AS BIGINT) AS sxx FROM xy) "
        "SELECT n_terms, sx, sy, sxy, sxx, "
        "CASE WHEN n_terms * sxx - sx * sx <> 0 THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(n_terms * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n_terms * sxx - sx * sx AS DOUBLE)) AS BIGINT) "
        "ELSE NULL END AS slope_e6 FROM m"
    )


def ks_doclen(
    df: DataFrame,
    a: str = "src0",
    b: str = "src1",
    source: str = "source",
    text: str = "text",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the doc-length
    (token-count) distributions of sources ``a`` and ``b`` — the
    distribution-drift test next to :func:`source_token_js` (JS sees
    vocabulary shift; KS sees length/structure shift, e.g. a source
    that started truncating). One row (na, nb, d_num, d_e6) where
    ``D = max_v |F_a(v) − F_b(v)| = d_num/(na·nb)`` — d_num =
    max |cumA·nb − cumB·na| over the merged value grid is an EXACT
    integer (no float ever enters the max), and d_e6 floors the one
    final division.

    Scale: two filtered length groupBys over the (tiny) distinct-length
    grid, one window cumsum ordered by length, one max agg — cost rides
    distinct lengths, never rows; ``na·nb ≤ 2^63`` through ~3e9 docs
    per side."""
    lens = df.where(F.col(source).isin([a, b])).select(
        F.col(source).alias("src"),
        F.size(tokens_col(text)).cast("long").alias("len"),
    )
    per = lens.groupBy("len").agg(
        F.sum(F.when(F.col("src") == a, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("src") == b, 1).otherwise(0)).cast("long").alias("cb"),
    )
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        F.sum("ca").over(w).cast("long").alias("cuma"),
        F.sum("cb").over(w).cast("long").alias("cumb"),
    )
    tot = F.broadcast(
        lens.agg(
            F.sum(F.when(F.col("src") == a, 1).otherwise(0)).cast("long").alias("na"),
            F.sum(F.when(F.col("src") == b, 1).otherwise(0)).cast("long").alias("nb"),
        )
    )
    d = cum.crossJoin(tot).agg(
        F.max(
            F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
        ).cast("long").alias("d_num"),
        F.max("na").cast("long").alias("na"),
        F.max("nb").cast("long").alias("nb"),
    )
    d_e6 = F.floor(
        F.lit(1000000.0) * F.col("d_num").cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    ).cast("long")
    return d.select(
        "na", "nb", "d_num",
        F.when((F.col("na") > 0) & (F.col("nb") > 0), d_e6).alias("d_e6"),
    )


def ks_doclen_sql(a: str = "src0", b: str = "src1", table: str = "documents") -> str:
    return (
        f"WITH lens AS (SELECT source AS src, "
        "CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) "
        f"AS len FROM {table} WHERE source IN ('{a}', '{b}')), "
        "per AS (SELECT len, "
        f"CAST(sum(CASE WHEN src = '{a}' THEN 1 ELSE 0 END) AS BIGINT) AS ca, "
        f"CAST(sum(CASE WHEN src = '{b}' THEN 1 ELSE 0 END) AS BIGINT) AS cb "
        "FROM lens GROUP BY 1), "
        "cum AS (SELECT CAST(sum(ca) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma, "
        "CAST(sum(cb) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb FROM per), "
        "tot AS (SELECT "
        f"CAST(sum(CASE WHEN src = '{a}' THEN 1 ELSE 0 END) AS BIGINT) AS na, "
        f"CAST(sum(CASE WHEN src = '{b}' THEN 1 ELSE 0 END) AS BIGINT) AS nb "
        "FROM lens), "
        "d AS (SELECT CAST(max(abs(c.cuma * t.nb - c.cumb * t.na)) AS BIGINT) "
        "AS d_num, CAST(max(t.na) AS BIGINT) AS na, "
        "CAST(max(t.nb) AS BIGINT) AS nb FROM cum c CROSS JOIN tot t) "
        "SELECT na, nb, d_num, "
        "CASE WHEN na > 0 AND nb > 0 THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(d_num AS DOUBLE) "
        "/ (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS BIGINT) "
        "ELSE NULL END AS d_e6 FROM d"
    )


def psi_doclen(
    df: DataFrame,
    a: str = "src0",
    b: str = "src1",
    bin_w: int = 32,
    source: str = "source",
    text: str = "text",
) -> DataFrame:
    """Population Stability Index between the doc-length distributions
    of sources ``a`` and ``b`` — the binned production drift monitor
    beside :func:`ks_doclen` (KS is the sup-norm test; PSI is the
    additive per-bin report dashboards alarm on, classically >0.2 =
    major shift). Lengths are binned at width ``bin_w``; the bin grid
    is the UNION of observed bins with add-one (Laplace) smoothing —
    ``p = (c+1)/(n+B)`` with B the grid size — so every term is finite
    and the statistic is deterministic with no epsilon knob:
    ``PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b)``.

    Cross-engine pinned form: every p is a ratio of exact integers, the
    ln argument is the exact integer ratio (c_a+1)(n_b+B) /
    ((c_b+1)(n_a+B)), each bin's term is e9-floored BEFORE the
    order-free BIGINT sum. Emits one row (n_bins, na, nb, psi_e9).
    Scale: one filtered groupBy over the (tiny) bin grid + a broadcast
    one-row total — cost rides distinct bins, never rows."""
    lens = df.where(F.col(source).isin([a, b])).select(
        F.col(source).alias("src"),
        F.floor(
            F.size(tokens_col(text)).cast("double") / F.lit(float(bin_w))
        ).cast("long").alias("bin"),
    )
    per = lens.groupBy("bin").agg(
        F.sum(F.when(F.col("src") == a, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("src") == b, 1).otherwise(0)).cast("long").alias("cb"),
    )
    tot = F.broadcast(
        per.agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("na"),
            F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nb"),
        )
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("n_bins")).cast(
        "double"
    )
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("n_bins")).cast(
        "double"
    )
    lnarg = (
        (F.col("ca") + 1) * (F.col("nb") + F.col("n_bins"))
    ).cast("double") / (
        (F.col("cb") + 1) * (F.col("na") + F.col("n_bins"))
    ).cast("double")
    term = F.floor(F.lit(1000000000.0) * (pa - pb) * F.log(lnarg)).cast("long")
    return (
        per.crossJoin(tot)
        .agg(
            F.max("n_bins").cast("long").alias("n_bins"),
            F.max("na").cast("long").alias("na"),
            F.max("nb").cast("long").alias("nb"),
            F.coalesce(F.sum(term), F.lit(0)).cast("long").alias("psi_e9"),
        )
    )


def psi_doclen_sql(
    a: str = "src0",
    b: str = "src1",
    bin_w: int = 32,
    table: str = "documents",
) -> str:
    return (
        f"WITH lens AS (SELECT source AS src, CAST(floor(CAST("
        "len(list_filter(string_split(text, ' '), x -> x != '')) AS DOUBLE) "
        f"/ {float(bin_w)}) AS BIGINT) AS bin "
        f"FROM {table} WHERE source IN ('{a}', '{b}')), "
        "per AS (SELECT bin, "
        f"CAST(sum(CASE WHEN src = '{a}' THEN 1 ELSE 0 END) AS BIGINT) AS ca, "
        f"CAST(sum(CASE WHEN src = '{b}' THEN 1 ELSE 0 END) AS BIGINT) AS cb "
        "FROM lens GROUP BY 1), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bins, "
        "CAST(coalesce(sum(ca), 0) AS BIGINT) AS na, "
        "CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb FROM per) "
        "SELECT t.n_bins, t.na, t.nb, "
        "CAST(coalesce(sum(CAST(floor(1000000000.0::DOUBLE "
        "* (CAST(p.ca + 1 AS DOUBLE) / CAST(t.na + t.n_bins AS DOUBLE) "
        "- CAST(p.cb + 1 AS DOUBLE) / CAST(t.nb + t.n_bins AS DOUBLE)) "
        "* ln(CAST((p.ca + 1) * (t.nb + t.n_bins) AS DOUBLE) "
        "/ CAST((p.cb + 1) * (t.na + t.n_bins) AS DOUBLE))) AS BIGINT)), 0) "
        "AS BIGINT) AS psi_e9 "
        "FROM per p CROSS JOIN tot t GROUP BY 1, 2, 3"
    )


# ---------------------------------------------------------------------------
# r7 final wave: unigram-LM cross-entropy (the CCNet-style quality score)


def lm_cross_entropy(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-document cross-entropy against the corpus unigram language
    model — the classic LM-perplexity quality filter (CCNet/Wenzek 2020
    shape, with the corpus itself as the model): ``H(d) = Σ_t tf_t ·
    ln(N/c_t) / len_d`` where c_t is the token's corpus frequency and N
    the corpus token total. Low H = made of common words; high H =
    rare-token-heavy (gibberish, boilerplate code, OCR noise) — rank by
    it and cut the tail. Every doc token is in the corpus, so c_t ≥ 1
    and every term is ≥ 0.

    Pinned integer math: tf, c_t, N are exact; each (doc, term)
    contribution is e9-floored BEFORE the order-free per-doc BIGINT sum,
    and the final /len is INTEGER division (both operands ≥ 0, exact in
    both engines). Shuffle budget: one explode+groupBy for tf (keyed
    (doc, tok)), one tok-keyed groupBy for corpus counts (partial aggs
    absorb hot-token skew), one broadcast-able tok join, one per-doc
    groupBy — the tfidf_top_terms plan shape; N rides as a one-row
    broadcast agg (re-derives the count branch, like tfidf's n_docs).
    Emits (doc_id, n_tokens, ce_e9); zero-token docs emit no row."""
    # r8 perf: ct (corpus token counts) == a direct tok-keyed count of the
    # occurrences — it does NOT need the (doc, tok) aggregate, so tf
    # executes once instead of three times (ct and n branches re-derived
    # it; no subplan sharing). ct is a |vocab|-row localCheckpoint so the
    # one-row total n and the probe join read it without re-running the
    # scan. fanout: one-split scan at bench scale (io.testdata.fanout).
    from ult_spark.io.testdata import fanout

    fdf = fanout(df)
    toks = fdf.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text)).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    ct = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    n = ct.agg(F.sum("c").cast("long").alias("n"))
    term = F.floor(
        F.lit(1000000000.0)
        * F.col("tf").cast("double")
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
    ).cast("long")
    per_doc = (
        tf.join(ct, "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(term).cast("long").alias("s"),
        )
    )
    return per_doc.select(
        "doc_id", "n_tokens", F.expr("s div n_tokens").cast("long").alias("ce_e9")
    )


LM_CROSS_ENTROPY_SQL = (
    "WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
    "x -> x != '')) AS tok FROM documents), "
    "tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf "
    "FROM toks GROUP BY 1, 2), "
    "ct AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1), "
    "n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ct), "
    "pd AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, "
    "CAST(sum(CAST(floor(1000000000.0::DOUBLE * CAST(tf AS DOUBLE) * "
    "ln(CAST(n.n AS DOUBLE) / CAST(ct.c AS DOUBLE))) AS BIGINT)) AS BIGINT) AS s "
    "FROM tf JOIN ct USING (tok) CROSS JOIN n GROUP BY 1) "
    "SELECT doc_id, n_tokens, CAST(s // n_tokens AS BIGINT) AS ce_e9 FROM pd"
)
