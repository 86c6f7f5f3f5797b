"""Corpus-curation operators (r5): the crawl-to-training-set filters a
web-scale text pipeline runs between dedup and sampling.

Four first-class components, each a native Column program (zero Python
eval nodes — plan-asserted in tests/test_layout.py) with an exact DuckDB
oracle:

- :func:`gopher_repetition` — repetition quality signals in the style of
  the Gopher rules (Rae et al. 2021, "Scaling Language Models"): the
  fraction of tokens covered by the most frequent 2-gram and the fraction
  of n-gram occurrences that are duplicated, plus a keep flag. Pinned
  variant (documented): token-occurrence fractions, not character
  fractions, so the metric is exact integer arithmetic in both engines.
- :func:`pii_scrub` — regex PII redaction (email / NANP-style phone /
  IPv4) with per-doc redaction counts and a cross-engine hash of the
  scrubbed text. The driver corpus carries no PII, so the registered
  query PLANTS deterministic PII derived from doc_id first (same
  construction in both engines) — the scrub mechanics are what's tested.
- :func:`segment_dedup` — cross-document segment-level dedup (the
  CCNet/RefinedWeb paragraph-dedup shape): segment the corpus, keep
  exactly ONE canonical occurrence of every distinct segment, report
  per-doc kept/dropped counts. Canonical = min (h56(doc:idx), doc, idx)
  over the segment's occurrences — deterministic under any partitioning,
  no "first seen" race. The driver corpus has no newlines, so the
  registered query segments by fixed non-overlapping token windows
  (w=8, tail remainder dropped — pinned); newline segmentation is
  exercised on planted fixtures in tests/test_curation.py.
- :func:`decontaminate` — train-test decontamination: flag training docs
  sharing any token n-gram (n=5 pinned) with a benchmark set. The
  registered query derives the benchmark split deterministically
  (h56(doc_id) % 10000 < 2000) so both engines build the identical set.

Scale notes (100 TB): every op is one-or-two shuffles keyed by doc or by
gram/segment hash — md5-uniform keys, no skew hazard; nothing is
all-pairs. ``decontaminate`` joins corpus grams against the benchmark
gram set — benchmark sets are small (MBs) in practice, so the join is
broadcast; the registered query leaves the strategy to AQE because here
both sides derive from the same table. ``segment_dedup``'s window is
partitioned BY SEGMENT (not global), so it scales like any hash
aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ult_spark.ops.textops import _h56, tokens_col

H56_SQL = "('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 14))::BIGINT"

# ---------------------------------------------------------------------------
# Gopher-style repetition filters


def _grams(toks, n: int):
    """Array of space-joined token n-grams (empty when size < n).

    Built as n−1 ``zip_with`` concats over shifted slices — O(tokens)
    lambda work total. The r5 form (``transform(sequence(1, k),
    i -> array_join(slice(toks, i, n)))``) paid an O(n-gram)-sized slice
    + join per ELEMENT inside Spark's interpreted HOF evaluator, which
    made gram construction the whole cost of gopher_repetition (measured
    2.8 s of the 8.7 s wall at sf0.1 for the 2-grams alone; the zip_with
    form is ~10×). Output strings are byte-identical, so the oracles and
    frozen fixtures are untouched. ``greatest(…, 0)`` guards the short-doc
    case (slice with a negative length errors; k = 0 yields empty arrays
    through every zip)."""
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    out = F.slice(toks, 1, k)
    for i in range(1, n):
        nxt = F.slice(toks, i + 1, k)
        out = F.zip_with(out, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return out


# keep thresholds (pinned): drop when the top 2-gram covers >= 20% of
# tokens or >= 20% of 3-gram occurrences are duplicates.
TOP2_MAX_E4 = 2000
DUP3_MAX_E4 = 2000


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-doc repetition metrics + keep flag (e4 integers, pinned).

    ``top2_frac_e4``: tokens covered by the most frequent 2-gram, as
    ``least(2 * max_count, n_tok) * 10000 // n_tok`` (overlapping
    occurrences of a 2-gram like 'a a' in 'a a a' can exceed n_tok — the
    least() cap keeps the fraction <= 1, pinned).
    ``dup3_frac_e4``: 3-gram occurrences whose gram occurs more than once
    in the doc, over all 3-gram occurrences.
    Docs too short for a gram family score 0 for it (kept).
    """
    toks = tokens_col(text)
    # r8 perf: ONE combined gram explode + one (doc, n, gram) aggregation
    # pass instead of two independent explode→groupBy→groupBy pipelines
    # (each of which re-derived the gram arrays — Spark shares no subplans
    # across branches; guide §1.2). The 2- and 3-gram stats fall out of the
    # same per-doc aggregate via n-conditional aggregates — values are
    # unchanged (max over 2-gram counts; dup/total sums over 3-gram
    # counts; absent gram families produce NULL/0 exactly as the old left
    # joins did). fanout: the docs scan is one split at bench scale, so
    # gram construction otherwise runs on one core.
    from ult_spark.io.testdata import fanout

    base = fanout(df).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tok"),
        _grams(toks, 2).alias("g2"),
        _grams(toks, 3).alias("g3"),
    )
    both = base.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform("g2", lambda x: F.struct(F.lit(2).alias("n"), x.alias("gram"))),
                F.transform("g3", lambda x: F.struct(F.lit(3).alias("n"), x.alias("gram"))),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    cnt = both.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    stats = cnt.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, F.col("cnt"))).alias("top2_cnt"),
        F.sum(
            F.when((F.col("n") == 3) & (F.col("cnt") > 1), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("dup3_occ"),
        F.sum(F.when(F.col("n") == 3, F.col("cnt")).otherwise(F.lit(0))).alias("n3"),
    )
    out = (
        df.select(F.col(id_col).alias("doc_id"), F.size(toks).cast("long").alias("n_tok"))
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("top2_cnt", F.lit(0)).cast("long").alias("top2_cnt"),
            (
                F.least(F.coalesce("top2_cnt", F.lit(0)) * 2, F.col("n_tok"))
                * 10000
                / F.col("n_tok")
            )
            .cast("long")
            .alias("top2_frac_e4"),
            F.when(
                F.coalesce("n3", F.lit(0)) > 0,
                (F.coalesce("dup3_occ", F.lit(0)) * 10000 / F.col("n3")).cast("long"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup3_frac_e4"),
        )
        .withColumn(
            "keep",
            (
                (F.col("top2_frac_e4") < TOP2_MAX_E4)
                & (F.col("dup3_frac_e4") < DUP3_MAX_E4)
            ).cast("int"),
        )
    )
    return out


GOPHER_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
  FROM documents
), base AS (
  SELECT doc_id, len(ts) AS n_tok, ts FROM toks
), i2 AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM base
), g2 AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS gram FROM i2
), c2 AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2
), a2 AS (
  SELECT doc_id, max(cnt) AS top2_cnt FROM c2 GROUP BY 1
), i3 AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i FROM base
), g3 AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram FROM i3
), c3 AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2
), a3 AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup3_occ,
         sum(cnt) AS n3
  FROM c3 GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.n_tok AS BIGINT) AS n_tok,
       CAST(coalesce(a2.top2_cnt, 0) AS BIGINT) AS top2_cnt,
       CAST(least(coalesce(a2.top2_cnt, 0) * 2, b.n_tok) * 10000 // b.n_tok
            AS BIGINT) AS top2_frac_e4,
       CAST(CASE WHEN coalesce(a3.n3, 0) > 0
                 THEN coalesce(a3.dup3_occ, 0) * 10000 // a3.n3
                 ELSE 0 END AS BIGINT) AS dup3_frac_e4,
       CAST(CASE WHEN least(coalesce(a2.top2_cnt, 0) * 2, b.n_tok) * 10000 // b.n_tok
                      < {TOP2_MAX_E4}
                  AND CAST(CASE WHEN coalesce(a3.n3, 0) > 0
                                THEN coalesce(a3.dup3_occ, 0) * 10000 // a3.n3
                                ELSE 0 END AS BIGINT) < {DUP3_MAX_E4}
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM base b
LEFT JOIN a2 ON b.doc_id = a2.doc_id
LEFT JOIN a3 ON b.doc_id = a3.doc_id
"""


# ---------------------------------------------------------------------------
# PII scrub

# Patterns chosen for Java-regex / RE2 agreement: plain classes and
# bounded quantifiers only — no backreferences, no lookaround.
RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
RE_PHONE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
RE_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Redact email / phone / IPv4 from ``text``; per-doc counts + a
    cross-engine 56-bit hash of the scrubbed text. Order pinned:
    emails first, then phones, then IPv4 (an email host never matches the
    later patterns, so the order only matters for documentation)."""
    t = F.col(text)
    # idx=0 (whole match): the patterns are group-free, and Spark's
    # default group index is 1 (errors), while DuckDB's is 0.
    n_email = F.size(F.regexp_extract_all(t, F.lit(RE_EMAIL), F.lit(0))).cast("long")
    n_phone = F.size(F.regexp_extract_all(t, F.lit(RE_PHONE), F.lit(0))).cast("long")
    n_ip = F.size(F.regexp_extract_all(t, F.lit(RE_IPV4), F.lit(0))).cast("long")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, RE_EMAIL, "<EMAIL>"), RE_PHONE, "<PHONE>"
        ),
        RE_IPV4,
        "<IP>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        n_ip.alias("n_ip"),
        _h56(scrubbed).alias("scrub_h56"),
    )


def planted_pii(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Append deterministic doc_id-derived PII to every doc (registered-
    query preamble; same construction in the SQL oracle): an email, a
    phone with h56-derived digits, and an IP from the doc_id byte."""
    h = _h56(F.col(id_col).cast("string"))
    planted = F.concat(
        F.col(text),
        F.lit(" contact user"),
        F.col(id_col).cast("string"),
        F.lit("@example.com or 555-867-"),
        F.lpad((h % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (h % 256).cast("string"),
        F.lit("."),
        (F.col(id_col).cast("long") % 256).cast("string"),
    )
    return df.withColumn(text, planted)


def pii_scrub_sql() -> str:
    h = H56_SQL.format(col="doc_id")
    planted = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-867-' || "
        f"lpad(CAST({h} % 10000 AS VARCHAR), 4, '0') || ' from 10.0.' || "
        f"CAST({h} % 256 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR)"
    )
    e, p, ip = RE_EMAIL, RE_PHONE, RE_IPV4
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text, '{e}', '<EMAIL>', 'g'), "
        f"'{p}', '<PHONE>', 'g'), '{ip}', '<IP>', 'g')"
    )
    return (
        f"WITH planted AS (SELECT doc_id, {planted} AS text FROM documents) "
        f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{e}')) AS BIGINT) AS n_email, "
        f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_phone, "
        f"CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ip, "
        f"('0x' || substr(md5({scrub}), 1, 14))::BIGINT AS scrub_h56 FROM planted"
    )


# ---------------------------------------------------------------------------
# Segment-level (paragraph) dedup


def token_window_segments(
    df: DataFrame, w: int = 8, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(doc_id, seg_idx, seg): non-overlapping w-token windows, tail
    remainder dropped (pinned). seg_idx is 1-based."""
    toks = tokens_col(text)
    k = F.floor(F.size(toks) / w).cast("int")
    segs = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, (i - 1) * w + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(segs).alias("pos0", "seg")
    ).select("doc_id", (F.col("pos0") + 1).alias("seg_idx"), "seg")


def newline_segments(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(doc_id, seg_idx, seg): newline-split segments, blanks dropped,
    seg_idx numbering the KEPT segments 1-based (pinned)."""
    segs = F.filter(F.split(F.col(text), "\n"), lambda x: x != "")
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(segs).alias("pos0", "seg")
    ).select("doc_id", (F.col("pos0") + 1).alias("seg_idx"), "seg")


def segment_dedup(segments: DataFrame) -> DataFrame:
    """Per-doc segment dedup accounting over a (doc_id, seg_idx, seg)
    frame: every distinct segment keeps exactly ONE canonical occurrence
    corpus-wide — argmin of (h56(doc:idx), doc_id, seg_idx), a total
    order, so the result is identical under any partitioning or engine.

    Returns (doc_id, n_seg, n_kept, n_dropped). One shuffle: the window
    partitions by the segment value (md5-uniform — no skew), then a
    doc-keyed aggregation.
    """
    tiebreak = _h56(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("seg_idx").cast("string"))
    )
    w = Window.partitionBy("seg").orderBy(tiebreak, F.col("doc_id"), F.col("seg_idx"))
    ranked = segments.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seg"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
        )
        .withColumn("n_dropped", (F.col("n_seg") - F.col("n_kept")).cast("long"))
    )


def segment_dedup_sql(w: int = 8) -> str:
    h = (
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
        "CAST(seg_idx AS VARCHAR)), 1, 14))::BIGINT"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
  FROM documents
), idx AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) // {w})) AS seg_idx
  FROM toks
), segs AS (
  SELECT doc_id, seg_idx,
         list_aggregate(ts[(seg_idx-1)*{w}+1 : seg_idx*{w}], 'string_agg', ' ') AS seg
  FROM idx
), ranked AS (
  SELECT doc_id, seg_idx,
         row_number() OVER (PARTITION BY seg ORDER BY {h}, doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Train-test decontamination

DECONTAM_N = 5
BENCH_E4 = 2000  # benchmark split: h56(doc_id) % 10000 < 2000


def decontaminate(
    df: DataFrame,
    n: int = DECONTAM_N,
    bench_e4: int = BENCH_E4,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Flag training docs sharing any token n-gram with the benchmark
    split. Returns (doc_id, n_hits, contaminated) for every TRAIN doc —
    n_hits = distinct shared grams, contaminated = 1 if any.

    Scale shape: distinct benchmark grams are one small aggregation; the
    train-side probe is a gram-keyed left semi-ish join (left join +
    count), md5-uniform keys. With a real (small, fixed) benchmark set
    the gram list is broadcast; here both sides derive from `documents`
    so the strategy is left to AQE.
    """
    toks = tokens_col(text)
    h = _h56(F.col(id_col).cast("string")) % 10000
    # r8 perf: per-doc gram distinctness is ROW-LOCAL (array_distinct), so
    # the train side needs NO DataFrame-level distinct — the old shape
    # shuffled every (doc, gram) occurrence to dedupe what each row already
    # determines (guide §2.4). The bench side still dedupes globally, but
    # over per-doc-distinct rows (strictly fewer). fanout: one-split scan
    # at bench scale, gram construction otherwise single-core.
    from ult_spark.io.testdata import fanout

    grams = fanout(df).select(
        F.col(id_col).alias("doc_id"),
        h.alias("h"),
        F.explode(F.array_distinct(_grams(toks, n))).alias("gram"),
    )
    bench = grams.where(F.col("h") < bench_e4).select("gram").distinct()
    train = grams.where(F.col("h") >= bench_e4).select("doc_id", "gram")
    hits = (
        train.join(bench, "gram", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    train_docs = df.where(h >= bench_e4).select(F.col(id_col).alias("doc_id"))
    return (
        train_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def decontaminate_sql(n: int = DECONTAM_N, bench_e4: int = BENCH_E4) -> str:
    h = H56_SQL.format(col="doc_id") + " % 10000"
    return f"""
WITH toks AS (
  SELECT doc_id, {h} AS h,
         list_filter(string_split(text, ' '), x -> x != '') AS ts
  FROM documents
), idx AS (
  SELECT doc_id, h, ts, unnest(generate_series(1, len(ts) - {n - 1})) AS i
  FROM toks
), grams AS (
  SELECT doc_id, h,
         list_aggregate(ts[i : i + {n - 1}], 'string_agg', ' ') AS gram
  FROM idx
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE h < {bench_e4}
), train AS (
  SELECT DISTINCT doc_id, gram FROM grams WHERE h >= {bench_e4}
), hits AS (
  SELECT t.doc_id, count(*) AS n_hits
  FROM train t JOIN bench b USING (gram) GROUP BY 1
)
SELECT d.doc_id, CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN coalesce(hits.n_hits, 0) > 0 THEN 1 ELSE 0 END AS INT)
         AS contaminated
FROM (SELECT doc_id FROM toks WHERE h >= {bench_e4}) d
LEFT JOIN hits ON d.doc_id = hits.doc_id
"""


# ---------------------------------------------------------------------------
# Fuzzy (MinHash) decontamination


FUZZY_THRESHOLD = 0.2  # pinned: same verify threshold as minhash_lsh_pairs


def decontaminate_fuzzy(
    df: DataFrame,
    bench_e4: int = BENCH_E4,
    threshold: float = FUZZY_THRESHOLD,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Fuzzy train-test decontamination: flag training docs whose shingle
    Jaccard vs ANY benchmark doc reaches ``threshold`` — the near-dup
    complement of :func:`decontaminate` (an exact 5-gram hit misses
    lightly-edited benchmark rewordings; MinHash-banded candidates + an
    exact verify catch them).

    Composition (all shared with ops/textops.py, so the semantics and
    cross-engine SQL mirrors are the hash-green minhash_lsh_pairs
    kernels): shingle → 16-minhash signature → 4-band LSH keys; candidate
    pairs come from a TRAIN-bands ⋈ BENCH-bands equi-join (never a
    self-join — work scales with cross-split band collisions only), then
    exact Jaccard over the two shingle sets per candidate pair.

    Returns (doc_id, n_hits, best_jacc_e4, contaminated) for every train
    doc: n_hits = benchmark docs at or above threshold, best_jacc_e4 =
    max Jaccard among them (0 when none).
    """
    from ult_spark.io.testdata import fanout
    from ult_spark.ops.textops import (
        N_MINHASH,
        band_rows,
        jaccard_pairs_from_sets,
        shingle_array,
    )

    h = _h56(F.col(id_col).cast("string")) % 10000
    # r8 perf rework (measured at sf1.0; same shapes as minhash_lsh_dedup):
    # - fanout: the docs scan is one split at bench scale, so the shingle
    #   construction + md5 partial aggregation otherwise run on one core;
    # - ONE combined groupBy computes the 16 signature mins AND the hashed
    #   verify sets; its consuming branches share one execution via
    #   ReuseExchange (identical exchange subtrees);
    # - h is a row-local function of doc_id — recomputed as a column on the
    #   band rows instead of JOINING the base frame back on doc_id.
    base = fanout(df).select(
        F.col(id_col).alias("doc_id"), shingle_array(text).alias("shs")
    )
    # h1/h2 projected BEFORE the aggregate: collect_set forces
    # ObjectHashAggregate (no codegen/CSE), which would re-evaluate the md5
    # interpreted per min-lane per row (see textops.minhash_lsh_dedup)
    sh = base.select("doc_id", F.explode("shs").alias("shingle")).select(
        "doc_id",
        _h56(F.col("shingle"), 1).alias("h1"),
        _h56(F.col("shingle"), 15).alias("h2"),
    )
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(F.col("h1") + F.lit(j) * F.col("h2")).alias(f"mh{j}")
            for j in range(N_MINHASH)
        ],
        F.collect_set("h1").alias("shs"),
        F.count(F.lit(1)).alias("sz"),
    )
    sig = per_doc.select("doc_id", *[f"mh{j}" for j in range(N_MINHASH)])
    hdoc = _h56(F.col("doc_id").cast("string")) % 10000
    # r8: pin the exploding band join's parallelism (same rationale as
    # textops.lsh_candidates — tiny input bytes, many output pairs, AQE
    # would coalesce the stage; the keyed repartition replaces the join's
    # own exchange)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    bands = band_rows(sig).withColumn("h", hdoc).repartition(n_part, "band")
    tb = bands.where(F.col("h") >= bench_e4).select(F.col("doc_id").alias("a"), "band")
    bb = bands.where(F.col("h") < bench_e4).select(F.col("doc_id").alias("b"), "band")
    cand = tb.join(bb, "band").select("a", "b").distinct()
    # hashed sets (r6, same rationale as textops.jaccard_pairs): equality-
    # only verify carries the 56-bit shingle hash, not the string
    docsets = per_doc.select("doc_id", "shs", "sz")
    hits = (
        jaccard_pairs_from_sets(docsets, cand, threshold)
        .groupBy(F.col("a").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.max("jacc_e4").cast("long").alias("best_jacc_e4"),
        )
    )
    train_docs = df.where(h >= bench_e4).select(F.col(id_col).alias("doc_id"))
    return train_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce("best_jacc_e4", F.lit(0)).cast("long").alias("best_jacc_e4"),
        (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


def decontaminate_fuzzy_sql(
    bench_e4: int = BENCH_E4, threshold: float = FUZZY_THRESHOLD
) -> str:
    from ult_spark.ops.textops import N_BANDS, N_MINHASH, SHINGLES_SQL

    r = N_MINHASH // N_BANDS
    mh = ", ".join(f"min(h1 + {j} * h2) AS mh{j}" for j in range(N_MINHASH))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, md5(concat_ws('_', '{b}', "
        + ", ".join(f"CAST(mh{b * r + i} AS VARCHAR)" for i in range(r))
        + ")) AS band FROM sig"
        for b in range(N_BANDS)
    )
    thr = int(threshold * 10000)
    return (
        f"WITH sh AS ({SHINGLES_SQL}), "
        f"hd AS (SELECT doc_id, {H56_SQL.format(col='CAST(doc_id AS VARCHAR)')} % 10000 AS h "
        "FROM documents), "
        "hs AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1, "
        "('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2 FROM sh), "
        f"sig AS (SELECT doc_id, {mh} FROM hs GROUP BY 1), "
        f"bands AS ({bands}), "
        f"tb AS (SELECT b.doc_id AS a, b.band FROM bands b JOIN hd ON b.doc_id = hd.doc_id "
        f"WHERE hd.h >= {bench_e4}), "
        f"bb AS (SELECT b.doc_id AS b, b.band FROM bands b JOIN hd ON b.doc_id = hd.doc_id "
        f"WHERE hd.h < {bench_e4}), "
        "cand AS (SELECT DISTINCT tb.a, bb.b FROM tb JOIN bb USING (band)), "
        "inters AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS inter "
        "FROM sh sa JOIN sh sb USING (shingle) "
        "JOIN hd ha ON sa.doc_id = ha.doc_id JOIN hd hb ON sb.doc_id = hb.doc_id "
        f"WHERE ha.h >= {bench_e4} AND hb.h < {bench_e4} GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1), "
        "hits AS (SELECT c.a AS doc_id, count(*) AS n_hits, "
        "max(CAST(floor(i.inter * 10000 / (za.sz + zb.sz - i.inter)) AS BIGINT)) AS best_jacc_e4 "
        "FROM cand c JOIN inters i ON c.a = i.a AND c.b = i.b "
        "JOIN sz za ON za.doc_id = c.a JOIN sz zb ON zb.doc_id = c.b "
        f"WHERE floor(i.inter * 10000 / (za.sz + zb.sz - i.inter)) >= {thr} GROUP BY 1) "
        f"SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "CAST(coalesce(h.best_jacc_e4, 0) AS BIGINT) AS best_jacc_e4, "
        "CAST(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated "
        f"FROM (SELECT doc_id FROM hd WHERE h >= {bench_e4}) d "
        "LEFT JOIN hits h ON d.doc_id = h.doc_id"
    )


# ---------------------------------------------------------------------------
# Host-level boilerplate removal (CCNet-style frequent-segment strip)


def host_boilerplate(
    df: DataFrame,
    host: F.Column,
    w: int = 2,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Frequent-segment boilerplate removal at the host level — the
    CCNet-shaped cleanup (Wenzek et al. 2020) a crawl pipeline runs before
    corpus-wide dedup: a segment appearing in ``>= min_docs`` DISTINCT
    documents of the SAME host (nav bars, footers, cookie banners) is
    boilerplate; strip it from every document of that host.

    ``host`` is a Column over ``df``'s columns. Output per document (docs
    shorter than one full ``w``-token window carry no segments and drop
    out, same pinned rule as :func:`token_window_segments`):

    - ``n_seg`` / ``n_boiler`` — total and boilerplate-flagged segments;
    - ``clean_h56`` — 56-bit hash of the segment-stripped text (kept
      segments joined by one space in segment order; empty string when
      everything was boilerplate), the cross-engine evidence the strip
      produced identical bytes.

    Scale shape: segment explode (row-local), one (host, seg)-keyed
    count-distinct agg (md5-uniform seg values — no skew), one keyed
    equi-join of the flags back onto the segments, one doc-keyed final
    agg. Nothing global, nothing all-pairs; popular hosts cost partial
    aggs, not a funnel.
    """
    # r8 perf (measured at sf1.0):
    # - carry host THROUGH the segment explode instead of joining it back
    #   on doc_id afterwards (host is a Column over df's columns, so it can
    #   ride the same select — one join + one shuffle of every segment row
    #   removed, guide §2.4);
    # - fan the one-split docs scan out so segment construction runs on
    #   every core (io.testdata.fanout);
    # - the boilerplate-frequency count feeds on per-doc DISTINCT segments
    #   (row-local array_distinct), turning countDistinct's two-level
    #   aggregate into one count (identical value: rows are unique per
    #   (doc, host, seg) by construction).
    from ult_spark.io.testdata import fanout

    fdf = fanout(df)
    toks = tokens_col(text)
    k = F.floor(F.size(toks) / w).cast("int")
    seg_arr = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, (i - 1) * w + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    segs = fdf.select(
        F.col(id_col).alias("doc_id"), host.alias("host"),
        F.posexplode(seg_arr).alias("pos0", "seg"),
    ).select("doc_id", "host", (F.col("pos0") + 1).alias("seg_idx"), "seg")
    boiler = (
        fdf.select(
            host.alias("host"), F.explode(F.array_distinct(seg_arr)).alias("seg")
        )
        .groupBy("host", "seg")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("host", "seg", F.lit(True).alias("_boiler"))
    )
    flagged = segs.join(boiler, ["host", "seg"], "left").withColumn(
        "_b", F.coalesce(F.col("_boiler"), F.lit(False))
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("_b"), F.struct("seg_idx", "seg"))
                )
            ),
            lambda s: s["seg"],
        ),
        " ",
    )
    return flagged.groupBy("doc_id", "host").agg(
        F.count(F.lit(1)).cast("long").alias("n_seg"),
        F.sum(F.col("_b").cast("long")).cast("long").alias("n_boiler"),
        _h56(kept_text).alias("clean_h56"),
    )


def host_boilerplate_sql(
    host_sql: str, w: int = 2, min_docs: int = 3, table: str = "documents"
) -> str:
    """DuckDB mirror of :func:`host_boilerplate` (host_sql over ``table``)."""
    h = H56_SQL.format(col="coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (NOT boiler), '')")
    return f"""
WITH toks AS (
  SELECT doc_id, {host_sql} AS host,
         list_filter(string_split(text, ' '), x -> x != '') AS ts
  FROM {table}
), idx AS (
  SELECT doc_id, host, ts, unnest(generate_series(1, len(ts) // {w})) AS seg_idx
  FROM toks
), segs AS (
  SELECT doc_id, host, seg_idx,
         list_aggregate(ts[(seg_idx-1)*{w}+1 : seg_idx*{w}], 'string_agg', ' ') AS seg
  FROM idx
), freq AS (
  SELECT host, seg FROM segs GROUP BY host, seg
  HAVING count(DISTINCT doc_id) >= {min_docs}
), flagged AS (
  SELECT s.doc_id, s.host, s.seg_idx, s.seg, f.seg IS NOT NULL AS boiler
  FROM segs s LEFT JOIN freq f ON f.host = s.host AND f.seg = s.seg
)
SELECT doc_id, host, CAST(count(*) AS BIGINT) AS n_seg,
       CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       {h} AS clean_h56
FROM flagged GROUP BY doc_id, host
"""


# ---------------------------------------------------------------------------
# Domain language-mix divergence (curation: flag hosts whose language
# distribution diverges from the corpus — mixed-lang spam, scraped UI chrome)

def host_lang_divergence(df: DataFrame, host: Column, lang: str = "lang") -> DataFrame:
    """Per-host KL divergence of the host's language mix from the corpus
    mix: ``KL(host) = Σ_l (c_hl/c_h)·ln((c_hl·N)/(c_h·N_l))`` — emitted
    as (host, n_docs, n_langs, kl_e9).

    Cross-engine exactness: counts are exact integers; each term is the
    SAME pinned double chain in both engines — one ln of one division of
    two exact integer products (c_hl·N ≤ N² « 2^63 and both < 2^53 for
    any realistic host), times the ratio c_hl/c_h — floored to e9 PER
    TERM before the integer sum (order-free; the token_entropy
    precedent). Zero-count langs contribute nothing (inner groupBy), so
    no log-of-zero branch exists.

    Scale: two partial-agg groupBys ((host, lang) then host) + one
    broadcast join of the ≤ #langs corpus marginals + a broadcast 1-row
    total. Popular hosts are one group each — partial aggregation does
    the heavy lifting."""
    hl = df.select(host.alias("host"), F.col(lang).alias("_l")).groupBy(
        "host", "_l"
    ).agg(F.count(F.lit(1)).cast("long").alias("c_hl"))
    nl = F.broadcast(
        hl.groupBy("_l").agg(F.sum("c_hl").cast("long").alias("n_l"))
    )
    tot = F.broadcast(hl.agg(F.sum("c_hl").cast("long").alias("n_all")))
    ch = hl.groupBy("host").agg(F.sum("c_hl").cast("long").alias("c_h"))
    term = F.floor(
        F.lit(1000000000.0)
        * (F.col("c_hl").cast("double") / F.col("c_h").cast("double"))
        * F.log(
            (F.col("c_hl") * F.col("n_all")).cast("double")
            / (F.col("c_h") * F.col("n_l")).cast("double")
        )
    ).cast("long")
    return (
        hl.join(ch, "host")
        .join(nl, "_l")
        .crossJoin(tot)
        .withColumn("_t", term)
        .groupBy("host")
        .agg(
            F.any_value("c_h").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum("_t").cast("long").alias("kl_e9"),
        )
    )


def host_lang_divergence_sql(host_sql: str, lang: str = "lang") -> str:
    return (
        f"WITH hl AS (SELECT {host_sql} AS host, {lang} AS l, "
        "CAST(count(*) AS BIGINT) AS c_hl FROM documents GROUP BY 1, 2), "
        "nl AS (SELECT l, CAST(sum(c_hl) AS BIGINT) AS n_l FROM hl GROUP BY 1), "
        "tot AS (SELECT CAST(sum(c_hl) AS BIGINT) AS n_all FROM hl), "
        "ch AS (SELECT host, CAST(sum(c_hl) AS BIGINT) AS c_h FROM hl GROUP BY 1) "
        "SELECT hl.host, any_value(ch.c_h) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_langs, "
        "CAST(sum(CAST(floor(1000000000.0::DOUBLE "
        "* (CAST(hl.c_hl AS DOUBLE) / CAST(ch.c_h AS DOUBLE)) "
        "* ln(CAST(hl.c_hl * tot.n_all AS DOUBLE) "
        "/ CAST(ch.c_h * nl.n_l AS DOUBLE))) AS BIGINT)) AS BIGINT) AS kl_e9 "
        "FROM hl JOIN ch USING (host) JOIN nl USING (l) CROSS JOIN tot "
        "GROUP BY 1"
    )
