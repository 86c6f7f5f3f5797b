"""Count-min sketch over a keyed event stream, with an exact-vs-estimate
audit — the heavy-hitter memory-bound counter (Cormode & Muthukrishnan
2005). BASELINE.json is the spec (the reference repo is empty, SURVEY.md
§0); HLL distinct sketches live in querydefs (approx_users_per_tile_l6).

The sketch is d hash rows × w buckets of ADDITIVE counters, so it builds
in ONE pass as d partial-agg groupBys folded into a single
explode(d)+groupBy((row, bucket)) — at 100 TB the shuffle carries at most
d·w rows per map partition (the sketch, not the data), and merging
sketches across executors is the same counter addition Spark's partial
aggregation already does. Estimates only ever OVERCOUNT (collisions add,
never subtract): est(k) = min over rows of the k-bucket counter, and
est ≥ exact is a theorem the audit query asserts row by row.

Hash rows are the cross-engine-pinned md5 56-bit lanes at different hex
offsets (textops._h56 ≡ DuckDB ('0x'||substr(md5(x),o,14))::bigint), so
both engines build the IDENTICAL sketch — the oracle certifies counter
values, not just statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ult_spark.ops.textops import _h56

DEFAULT_D = 4
DEFAULT_W = 64


def _lane(col, d: int, w: int):
    """Row-d bucket of ``col``: md5 hex lane at offset 2d+1, mod w."""
    return F.pmod(_h56(col, 2 * d + 1), F.lit(w)).cast("long")


def countmin_sketch(
    df: DataFrame, key: str, d: int = DEFAULT_D, w: int = DEFAULT_W
) -> DataFrame:
    """The d×w counter table (d, bucket, cnt) — the sketch itself,
    shared by the batch audit and the streaming incremental build
    (counter addition is associative+commutative, so a sum of partial
    sketches IS the sketch of the union)."""
    k = F.col(key).cast("string")
    lanes = F.array(
        *[
            F.struct(F.lit(i).alias("d"), _lane(k, i, w).alias("bucket"))
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(lanes).alias("l"))
        .groupBy(F.col("l.d").alias("d"), F.col("l.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_estimates(
    df: DataFrame,
    key: str,
    top: int = 20,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(key, exact, est, overcount) for the exact top-``top`` keys by
    frequency (total order: count DESC, key ASC — LIMIT-safe), where
    ``est`` is the count-min estimate from a ``d``×``w`` sketch built
    over the same input. ``overcount = est − exact ≥ 0`` measures
    collision pressure at this width: size w ≥ e/ε for ε·N additive
    error (w=64 here keeps collisions visible at test scale on purpose).

    Plan: one explode(d)+groupBy for the sketch (≤ d·w rows out of the
    shuffle regardless of input size), one exact groupBy + top-k window
    (the heavy-hitter probe set), then a broadcast-able (row, bucket)
    join and a per-key min — the probe side is ``top``·d rows."""
    k = F.col(key).cast("string")
    # r8 perf: counter addition is associative, so the sketch of the input
    # equals the sketch of the per-key counts — aggregate by key FIRST
    # (guide §2.3 "aggregate before you shuffle"), then hash the d lanes
    # over |distinct keys| rows instead of every input row. The exact
    # branch needs the identical per-key aggregate anyway; localCheckpoint
    # shares the one keyed pass between the sketch and the probe instead
    # of re-executing the scan per plan branch.
    keyed = (
        df.groupBy(k.alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
        .localCheckpoint()
    )
    lanes = F.array(
        *[
            F.struct(F.lit(i).alias("d"), _lane(F.col("key"), i, w).alias("bucket"))
            for i in range(d)
        ]
    )
    sk = (
        keyed.select(F.col("exact").alias("_c"), F.explode(lanes).alias("l"))
        .groupBy(F.col("l.d").alias("d"), F.col("l.bucket").alias("bucket"))
        .agg(F.sum("_c").cast("long").alias("cnt"))
    )
    exact = keyed
    tw = Window.orderBy(F.desc("exact"), F.asc("key"))
    probe = (
        exact.withColumn("rk", F.row_number().over(tw))
        .where(F.col("rk") <= top)
        .select(
            "key",
            "exact",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("d"),
                            _lane(F.col("key"), i, w).alias("bucket"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("l"),
        )
        .select("key", "exact", F.col("l.d").alias("d"), F.col("l.bucket").alias("bucket"))
    )
    return (
        probe.join(sk, ["d", "bucket"])
        .groupBy("key", "exact")
        .agg(F.min("cnt").cast("long").alias("est"))
        .select("key", "exact", "est", (F.col("est") - F.col("exact")).alias("overcount"))
    )


def countmin_estimates_sql(
    table: str, key: str, top: int = 20, d: int = DEFAULT_D, w: int = DEFAULT_W
) -> str:
    lane = (
        lambda col, i: f"(('0x' || substr(md5({col}), {2 * i + 1}, 14))::BIGINT % {w} + {w}) % {w}"
    )
    lanes_src = " UNION ALL ".join(
        f"SELECT {i} AS d, {lane(f'CAST({key} AS VARCHAR)', i)} AS bucket FROM {table}"
        for i in range(d)
    )
    probe_lanes = " UNION ALL ".join(
        f"SELECT key, exact, {i} AS d, {lane('key', i)} AS bucket FROM topk"
        for i in range(d)
    )
    return (
        f"WITH sk AS MATERIALIZED (SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM ({lanes_src}) GROUP BY 1, 2), "
        f"exact AS MATERIALIZED (SELECT CAST({key} AS VARCHAR) AS key, "
        f"CAST(count(*) AS BIGINT) AS exact FROM {table} GROUP BY 1), "
        f"topk AS MATERIALIZED (SELECT key, exact FROM (SELECT key, exact, "
        f"row_number() OVER (ORDER BY exact DESC, key ASC) AS rk FROM exact) "
        f"WHERE rk <= {top}), "
        f"probe AS (SELECT key, exact, d, bucket FROM ({probe_lanes})) "
        "SELECT p.key, p.exact, CAST(min(sk.cnt) AS BIGINT) AS est, "
        "CAST(min(sk.cnt) - p.exact AS BIGINT) AS overcount "
        "FROM probe p JOIN sk USING (d, bucket) GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# pinned HyperLogLog (m = 256 registers) with an EXACT cross-engine oracle

HLL_M = 256
# alpha_m · m² · 2⁴⁹ for m = 256 (Flajolet et al. 2007 §4,
# alpha_m = 0.7213/(1 + 1.079/m)) — ONE double literal shared by both
# engines; 2⁴⁹ cancels the integer lift of Σ2^(−M_j) below.
HLL_NUM = 2.6499581405668102e19


def _bitlen(col):
    """Bit length of a nonnegative BIGINT via its base-2 string — the
    only clz both engines share exactly (Spark conv ≡ DuckDB bin);
    0 → 0 by convention (conv renders '0', length 1, special-cased)."""
    return (
        F.when(col == 0, F.lit(0))
        .otherwise(F.length(F.conv(col.cast("string"), 10, 2)))
        .cast("long")
    )


def hll_estimate(df: DataFrame, key: str) -> DataFrame:
    """One-row (n_exact, v_zero, s49, est): a from-scratch HyperLogLog
    over ``key`` CERTIFIED against the exact distinct count — unlike
    Spark's built-in approx_count_distinct (whose sketch internals are
    opaque, so approx_users_per_tile_l6 is rows-only), every step here
    is pinned integer math both engines reproduce bit-for-bit, so the
    DuckDB oracle checks the REGISTER FOLD, not just plausibility.

    Construction: h = md5-lane-56(key); register j = h mod 256; rank =
    49 − bitlen(h div 256) (48 payload bits, all-zeros → 49); M_j =
    max rank per register over the FULL 256-register universe (empty
    registers M = 0 via a sequence-explode left join — they dominate
    the small-range regime and must not vanish). The harmonic fold
    Σ 2^(−M_j) is lifted to the exact BIGINT s49 = Σ 2^(49−M_j)
    (≤ 256·2⁴⁹ = 2⁵⁷), so the raw estimate is ONE shared double
    division HLL_NUM / s49; the standard small-range branch switches
    to linear counting 256·ln(256/V) when raw ≤ 5/2·m and zero
    registers remain. Scale: one partial-agg groupBy to 256 rows, then
    constants — the shuffle carries the sketch, never the data, and
    merging partial registers IS Spark's partial max aggregation."""
    fold = hll_fold(df.sparkSession, hll_partial(df, key))
    exact = df.agg(F.countDistinct(F.col(key)).cast("long").alias("n_exact"))
    return exact.crossJoin(F.broadcast(fold)).select(
        "n_exact", "v_zero", "s49", "est"
    )


def hll_partial(df: DataFrame, key: str) -> DataFrame:
    """(j, m): max rank per OCCUPIED register over ``df`` — the
    mergeable partial (register max is an idempotent, associative,
    commutative monoid, so partials combine across executors, batches
    or days by a plain MAX — the streaming store's merge)."""
    k = F.col(key).cast("string")
    h = _h56(k, 1)
    # h div 256 as an exact BIT SHIFT — a double division of a 56-bit
    # value would lose bits past 2^53
    reg = df.select(
        F.pmod(h, F.lit(HLL_M)).alias("j"),
        (F.lit(49) - _bitlen(F.shiftright(h, 8))).alias("rank"),
    )
    return reg.groupBy("j").agg(F.max("rank").cast("long").alias("m"))


def hll_fold(spark: SparkSession, m_j: DataFrame) -> DataFrame:
    """One-row (v_zero, s49, est) from occupied-register maxes: the
    full-universe completion (empty registers m = 0 via the
    sequence-explode left join), the exact BIGINT harmonic lift and
    the small-range linear-counting branch."""
    grid = spark.range(HLL_M).select(F.col("id").alias("j"))
    regs = grid.join(m_j, "j", "left").select(
        F.coalesce("m", F.lit(0)).cast("long").alias("m")
    )
    fold = regs.agg(
        F.sum(F.pow(F.lit(2.0), F.lit(49) - F.col("m")).cast("long"))
        .cast("long")
        .alias("s49"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias("v_zero"),
    )
    raw = F.lit(HLL_NUM) / F.col("s49").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("v_zero") > 0),
        F.floor(F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero").cast("double"))),
    ).otherwise(F.floor(raw)).cast("long")
    return fold.select("v_zero", "s49", est.alias("est"))


def hll_estimate_sql(table: str, key: str) -> str:
    m = HLL_M
    return (
        f"WITH hh AS (SELECT (('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 14))"
        f"::BIGINT) AS h FROM {table}), "
        f"rk AS (SELECT h % {m} AS j, 49 - (CASE WHEN h // {m} = 0 THEN 0 "
        f"ELSE length(bin(h // {m})) END) AS rank FROM hh), "
        "mj AS (SELECT j, CAST(max(rank) AS BIGINT) AS m FROM rk GROUP BY 1), "
        f"grid AS (SELECT unnest(generate_series(0, {m - 1})) AS j), "
        "regs AS (SELECT CAST(coalesce(mj.m, 0) AS BIGINT) AS m "
        "FROM grid LEFT JOIN mj USING (j)), "
        "fold AS (SELECT CAST(sum(CAST(pow(2.0, 49 - m) AS BIGINT)) AS BIGINT) AS s49, "
        "CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero FROM regs), "
        f"ex AS (SELECT CAST(count(DISTINCT {key}) AS BIGINT) AS n_exact FROM {table}) "
        "SELECT ex.n_exact, fold.v_zero, fold.s49, "
        f"CASE WHEN {HLL_NUM!r} / CAST(fold.s49 AS DOUBLE) <= {2.5 * m} "
        "AND fold.v_zero > 0 THEN "
        f"CAST(floor({float(m)} * ln({float(m)} / CAST(fold.v_zero AS DOUBLE))) AS BIGINT) "
        f"ELSE CAST(floor({HLL_NUM!r} / CAST(fold.s49 AS DOUBLE)) AS BIGINT) END AS est "
        "FROM ex CROSS JOIN fold"
    )


# ---------------------------------------------------------------------------
# pinned Bloom filter with a full membership audit

BLOOM_M = 1024
BLOOM_K = 3


def bloom_audit(
    df: DataFrame,
    key: str,
    member_pred,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """One-row Bloom-filter audit (Bloom 1970): build an ``m``-bit /
    ``k``-lane filter over the DISTINCT keys satisfying ``member_pred``
    (a boolean Column), probe it with EVERY distinct key, and count the
    confusion matrix — ``n_false_neg`` is 0 by theorem (the audit
    asserts the data structure, not a property of the data), and
    ``fp_e6`` is the measured false-positive rate to compare against
    the classical (1 − e^{−kn/m})^k sizing estimate offline.

    The filter materializes as its SET-BIT LIST (≤ m rows out of a
    distinct over exploded md5 lanes — the same pinned _h56 offsets as
    count-min, so both engines build the identical bitmap) and
    broadcasts to the probe side; a probe is positive iff ALL k of its
    lanes hit (min over a left-join hit flag). Scale: the filter
    shuffle is ≤ m rows regardless of input; the probe side is one
    groupBy over distinct keys × k."""
    keys = (
        df.groupBy(F.col(key).cast("string").alias("key"))
        .agg(F.max(F.when(member_pred, 1).otherwise(0)).alias("is_member"))
    )
    lanes = F.explode(
        F.array(*[_lane(F.col("key"), i, m) for i in range(k)])
    ).alias("bit")
    bits = (
        keys.where(F.col("is_member") == 1).select(lanes).distinct()
    )
    probe = (
        keys.select("key", "is_member", lanes)
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left")
        .groupBy("key", "is_member")
        .agg(F.min(F.coalesce("hit", F.lit(0))).alias("positive"))
    )
    mem = F.col("is_member") == 1
    pos = F.col("positive") == 1
    agg = probe.agg(
        F.sum(F.when(mem, 1).otherwise(0)).cast("long").alias("n_members"),
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(mem & pos, 1).otherwise(0)).cast("long").alias("n_true_pos"),
        F.sum(F.when(~mem & pos, 1).otherwise(0)).cast("long").alias("n_false_pos"),
        F.sum(F.when(mem & ~pos, 1).otherwise(0)).cast("long").alias("n_false_neg"),
    )
    fp_e6 = F.when(
        F.col("n_probes") > F.col("n_members"),
        F.floor(
            F.lit(1000000.0)
            * F.col("n_false_pos").cast("double")
            / (F.col("n_probes") - F.col("n_members")).cast("double")
        ),
    ).cast("long")
    return agg.select(
        "n_members", "n_probes", "n_true_pos", "n_false_pos", "n_false_neg",
        fp_e6.alias("fp_e6"),
    )


def bloom_audit_sql(
    table: str, key: str, member_pred_sql: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> str:
    lane = (
        lambda i: f"(('0x' || substr(md5(key), {2 * i + 1}, 14))::BIGINT % {m} + {m}) % {m}"
    )
    lane_rows = " UNION ALL ".join(
        f"SELECT key, is_member, {lane(i)} AS bit FROM keys" for i in range(k)
    )
    return (
        f"WITH keys AS MATERIALIZED (SELECT CAST({key} AS VARCHAR) AS key, "
        f"max(CASE WHEN {member_pred_sql} THEN 1 ELSE 0 END) AS is_member "
        f"FROM {table} GROUP BY 1), "
        f"lanes AS MATERIALIZED (SELECT key, is_member, bit FROM ({lane_rows})), "
        "bits AS (SELECT DISTINCT bit, 1 AS hit FROM lanes WHERE is_member = 1), "
        "probe AS (SELECT l.key, l.is_member, "
        "min(coalesce(b.hit, 0)) AS positive "
        "FROM lanes l LEFT JOIN bits b USING (bit) GROUP BY 1, 2), "
        "agg AS (SELECT CAST(sum(CASE WHEN is_member = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_members, "
        "CAST(count(*) AS BIGINT) AS n_probes, "
        "CAST(sum(CASE WHEN is_member = 1 AND positive = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pos, "
        "CAST(sum(CASE WHEN is_member = 0 AND positive = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos, "
        "CAST(sum(CASE WHEN is_member = 1 AND positive = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg "
        "FROM probe) "
        "SELECT n_members, n_probes, n_true_pos, n_false_pos, n_false_neg, "
        "CASE WHEN n_probes > n_members THEN "
        "CAST(floor(1000000.0::DOUBLE * CAST(n_false_pos AS DOUBLE) / "
        "CAST(n_probes - n_members AS DOUBLE)) AS BIGINT) ELSE NULL END AS fp_e6 "
        "FROM agg"
    )
