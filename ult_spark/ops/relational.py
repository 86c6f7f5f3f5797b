"""Remaining relational/temporal operator surface (SURVEY §2.4/2.5/2.6/2.7).

Each operator here is a thin, idiomatic DataFrame program; they exist as
named functions (not just query-catalog lambdas) so library users get the
same surface the queries exercise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ult_spark import functions as UF


def cell_range_join(points: DataFrame, ranges: DataFrame, point_cell: str = "cell") -> DataFrame:
    """J4: points ⋈ mixed-level index cells by descendant-range containment.

    ``ranges`` carries (lo, hi) from :func:`ult_spark.functions.cell_range`
    of compacted cells — contiguity of quadtree descendant ids makes the
    containment a pure BETWEEN (range join). Both sides range-partitioned by
    cell id when large ("range-partitioned shuffles keyed on cell id")."""
    return points.join(
        ranges, (F.col(point_cell) >= ranges.lo) & (F.col(point_cell) <= ranges.hi), "inner"
    )


def asof_join(
    left: DataFrame,
    versions: DataFrame,
    row_key: str,
    left_ts: str,
    ver_ts: str,
) -> DataFrame:
    """J5: attach the latest version row with ver_ts <= left_ts per left row.

    ``row_key`` uniquely identifies left rows. Small version side →
    broadcast conditional join + row_number pick (never a sort-merge of the
    big side)."""
    joined = left.join(F.broadcast(versions), F.col(ver_ts) <= F.col(left_ts), "left")
    order = Window.partitionBy(row_key).orderBy(F.desc(ver_ts))
    return joined.withColumn("_rn", F.row_number().over(order)).where(F.col("_rn") == 1).drop("_rn")


def sessionize(
    df: DataFrame, key: str, ts: str, gap_seconds: int, tiebreak: str | None = None
) -> DataFrame:
    """T4-as-batch: gaps-and-islands sessionization — new session when the
    gap to the previous event of ``key`` exceeds ``gap_seconds``.
    ``tiebreak`` makes the ordering total when timestamps collide."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    new_sess = F.when(
        prev.isNull() | (F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev) > gap_seconds), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def time_bucket_gapfill(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Gap-filled time-bucket rollup (the TimescaleDB
    ``time_bucket_gapfill`` + ``locf`` shape, r4): per (key, bucket) counts
    with EVERY bucket in the key's [min, max] range present — missing
    buckets get cnt 0 plus a last-observation-carried-forward column.

    Relational end-to-end: one groupBy for the observed buckets, a tiny
    per-key min/max agg, a native ``sequence`` explode to synthesize the
    full bucket axis (rows = key × its own span — never a global cross
    join), a left join back, and one window for the LOCF. Buckets are
    integer hours (floor(unix/3600)) so the axis arithmetic is exact in
    both engines. At scale the explode output is O(keys × span), dwarfed
    by the input; the only input-sized shuffle is the first groupBy."""
    b = F.floor(F.unix_timestamp(F.col(ts)) / F.lit(bucket_s)).cast("long")
    obs = df.groupBy(F.col(key).alias("k"), b.alias("bucket")).agg(
        F.count("*").alias("_cnt")
    )
    span = obs.groupBy("k").agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    axis = span.select(
        "k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket")
    )
    w = Window.partitionBy("k").orderBy("bucket")
    return (
        axis.join(obs, ["k", "bucket"], "left")
        .select(
            F.col("k").alias(key),
            "bucket",
            F.coalesce("_cnt", F.lit(0)).alias("cnt"),
            F.last("_cnt", ignorenulls=True).over(w).alias("locf"),
        )
    )


def time_bucket_gapfill_sql(key: str = "event_type", bucket_s: int = 3600) -> str:
    """DuckDB mirror over the events view — same integer bucket axis via
    unnest(generate_series), same LOCF window."""
    return (
        "WITH obs AS (SELECT "
        f"{key} AS k, CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / {bucket_s}) AS BIGINT) AS bucket, "
        "count(*) AS _cnt FROM events GROUP BY 1, 2), "
        "span AS (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1), "
        "axis AS (SELECT k, unnest(generate_series(lo, hi)) AS bucket FROM span) "
        f"SELECT a.k AS {key}, a.bucket, CAST(coalesce(_cnt, 0) AS BIGINT) AS cnt, "
        "last_value(_cnt IGNORE NULLS) OVER "
        "(PARTITION BY a.k ORDER BY a.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf "
        "FROM axis a LEFT JOIN obs USING (k, bucket)"
    )


def session_trips(
    events: DataFrame,
    gap_seconds: int = 1800,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-session trajectory stats (r5 — the geospatial reading of T4):
    sessionize, then per (key, session) count events, duration, and the
    great-circle path length over consecutive events.

    Returns (key, session_id, n_events, dur_s, dist_m, max_leg_m). Each
    leg is FLOORED to integer meters before the sum (CLAUDE.md: integer
    sums are addition-order-free, so the result is identical under any
    partitioning and across engines; the haversine sin/cos parity is the
    hash-green precedent from ``haversine_to_origin``).

    Scale shape: both windows partition by ``key`` (and session) with the
    same (ts, tiebreak) order, so Catalyst computes them off one sort —
    a single shuffle keyed by the session key, no global window.
    """
    s = sessionize(events, key, ts, gap_seconds, tiebreak=tiebreak)
    w = Window.partitionBy(key, "session_id").orderBy(ts, tiebreak)
    leg = F.floor(
        UF.haversine_m(
            F.lag(lat).over(w), F.lag(lon).over(w), F.col(lat), F.col(lon)
        )
    ).cast("long")
    return (
        s.withColumn("_leg", leg)
        .groupBy(key, "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.max(F.unix_timestamp(F.col(ts)))
                - F.min(F.unix_timestamp(F.col(ts)))
            )
            .cast("long")
            .alias("dur_s"),
            F.coalesce(F.sum("_leg"), F.lit(0)).cast("long").alias("dist_m"),
            F.coalesce(F.max("_leg"), F.lit(0)).cast("long").alias("max_leg_m"),
        )
    )


def session_trips_sql(
    lat_sql: str, lon_sql: str, gap_seconds: int = 1800
) -> str:
    """DuckDB mirror on the events view: identical sessionization (the
    hash-green ``sessionize_users`` oracle) + textually identical
    haversine structure, floored per leg before the BIGINT sum."""
    hav = (
        "2.0 * 6371008.8 * asin(sqrt("
        "sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2) + "
        "cos(radians(plat)) * cos(radians(lat)) * "
        "sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)))"
    )
    return f"""
WITH pts AS (
  SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         {lat_sql} AS lat, {lon_sql} AS lon
  FROM events
), marked AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL
                   OR es - lag(es) OVER w > {gap_seconds}
                 THEN 1 ELSE 0 END AS new_s
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
), legs AS (
  SELECT user_id, session_id, es,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon, lat, lon
  FROM sess
  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts ASC, event_id ASC)
), measured AS (
  SELECT user_id, session_id, es,
         CASE WHEN plat IS NULL THEN NULL
              ELSE CAST(floor({hav}) AS BIGINT) END AS leg
  FROM legs
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(es) - min(es) AS BIGINT) AS dur_s,
       CAST(coalesce(sum(leg), 0) AS BIGINT) AS dist_m,
       CAST(coalesce(max(leg), 0) AS BIGINT) AS max_leg_m
FROM measured GROUP BY user_id, session_id
"""


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], vals: list[str]
) -> DataFrame:
    """CDC-style snapshot diff: classify every key as added / removed /
    changed between two relation snapshots, dropping unchanged rows.

    Returns ``keys + [change_type] + old_<v>/new_<v>`` for each val
    column. One full-outer hash join on the key columns — at 100 TB this
    is the standard incremental-maintenance primitive between two
    manifest commits (io/catalog.py snapshots); nothing is collected and
    both sides stream through the join.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("_in_old"),
        *[F.col(v).alias(f"old_{v}") for v in vals],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("_in_new"),
        *[F.col(v).alias(f"new_{v}") for v in vals],
    )
    j = o.join(n, keys, "full_outer")
    same_vals = F.lit(True)  # no val columns → presence-only diff
    for v in vals:
        same_vals = same_vals & F.col(f"old_{v}").eqNullSafe(F.col(f"new_{v}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same_vals, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type") != "same")
        .select(
            *keys,
            "change_type",
            *[c for v in vals for c in (f"old_{v}", f"new_{v}")],
        )
    )


def session_cell_path(
    events: DataFrame,
    cell_col: str = "cell",
    gap_seconds: int = 1800,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session cell trajectory (r5): the ordered sequence of grid
    cells visited, consecutive repeats collapsed (run-length path) — the
    cell-index reading of a GPS trace compressor.

    Returns (key, session_id, n_cells, path) where ``path`` joins the
    visited cell ids with '-'. Determinism: the transition rows are
    picked by the same (ts, tiebreak) window as sessionization, and the
    final path is assembled by sorting (epoch, tiebreak, cell) structs —
    a total order, identical under any partitioning or engine.

    Scale shape: both windows and the final aggregation share the
    session key partitioning — one shuffle, then row-local array sort
    (sessions are human-scale; no skew hazard).
    """
    s = sessionize(events, key, ts, gap_seconds, tiebreak=tiebreak)
    w = Window.partitionBy(key, "session_id").orderBy(ts, tiebreak)
    prev = F.lag(cell_col).over(w)
    moves = s.withColumn(
        "_nw", prev.isNull() | (F.col(cell_col) != prev)
    ).where(F.col("_nw"))
    entry = F.struct(
        F.unix_timestamp(F.col(ts)).alias("es"),
        F.col(tiebreak).alias("tb"),
        F.col(cell_col).cast("string").alias("c"),
    )
    return moves.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.concat_ws(
            "-",
            F.transform(F.sort_array(F.collect_list(entry)), lambda x: x["c"]),
        ).alias("path"),
    )


def time_bucket_interpolate(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Gap-filled rollup with LINEAR interpolation (r5 — the TimescaleDB
    ``interpolate()`` companion to :func:`time_bucket_gapfill`'s locf):
    per (key, bucket) over the same per-key dense axis, observed buckets
    carry their exact count and missing buckets the straight line between
    the surrounding observations, e6-floor-quantized.

    Exactness: the lerp is one subtraction/multiply/divide chain over
    integer-derived doubles with the same textual structure in both
    engines, floored BEFORE output; observed rows bypass the float path
    entirely (cnt × 1e6 exactly). The axis spans [min, max] per key, so
    every gap has both neighbors.

    Scale shape: identical to gapfill — one input-sized groupBy shuffle,
    a tiny span agg, a per-key explode, and two frames over one sort.
    """
    b = F.floor(F.unix_timestamp(F.col(ts)) / F.lit(bucket_s)).cast("long")
    obs = df.groupBy(F.col(key).alias("k"), b.alias("bucket")).agg(
        F.count("*").alias("_cnt")
    )
    span = obs.groupBy("k").agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    axis = span.select(
        "k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket")
    )
    filled = axis.join(obs, ["k", "bucket"], "left")
    w_up = Window.partitionBy("k").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_dn = Window.partitionBy("k").orderBy("bucket").rowsBetween(
        0, Window.unboundedFollowing
    )
    ob = F.when(F.col("_cnt").isNotNull(), F.col("bucket"))
    pv = F.last("_cnt", ignorenulls=True).over(w_up)
    pb = F.last(ob, ignorenulls=True).over(w_up)
    nv = F.first("_cnt", ignorenulls=True).over(w_dn)
    nb = F.first(ob, ignorenulls=True).over(w_dn)
    lerp = (
        pv.cast("double")
        + (nv - pv).cast("double")
        * (F.col("bucket") - pb).cast("double")
        / (nb - pb).cast("double")
    ) * F.lit(1000000.0)
    return filled.select(
        F.col("k").alias(key),
        "bucket",
        F.coalesce("_cnt", F.lit(0)).cast("long").alias("cnt"),
        F.when(F.col("_cnt").isNotNull(), F.col("_cnt") * F.lit(1000000))
        .otherwise(F.floor(lerp))
        .cast("long")
        .alias("lerp_e6"),
    )


def time_bucket_interpolate_sql(key: str = "event_type", bucket_s: int = 3600) -> str:
    """DuckDB mirror: same axis, same two IGNORE NULLS frames, textually
    identical lerp structure, floored before output."""
    lerp = (
        "(CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) "
        "* CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)) * 1000000.0"
    )
    return (
        "WITH obs AS (SELECT "
        f"{key} AS k, CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / {bucket_s}) AS BIGINT) AS bucket, "
        "count(*) AS _cnt FROM events GROUP BY 1, 2), "
        "span AS (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1), "
        "axis AS (SELECT k, unnest(generate_series(lo, hi)) AS bucket FROM span), "
        "filled AS (SELECT a.k, a.bucket, _cnt FROM axis a LEFT JOIN obs USING (k, bucket)), "
        "frames AS (SELECT k, bucket, _cnt, "
        "last_value(_cnt IGNORE NULLS) OVER wu AS pv, "
        "last_value(CASE WHEN _cnt IS NOT NULL THEN bucket END IGNORE NULLS) OVER wu AS pb, "
        "first_value(_cnt IGNORE NULLS) OVER wd AS nv, "
        "first_value(CASE WHEN _cnt IS NOT NULL THEN bucket END IGNORE NULLS) OVER wd AS nb "
        "FROM filled "
        "WINDOW wu AS (PARTITION BY k ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
        "wd AS (PARTITION BY k ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
        f"SELECT k AS {key}, bucket, CAST(coalesce(_cnt, 0) AS BIGINT) AS cnt, "
        "CAST(CASE WHEN _cnt IS NOT NULL THEN _cnt * 1000000 "
        f"ELSE CAST(floor({lerp}) AS BIGINT) END AS BIGINT) AS lerp_e6 "
        "FROM frames"
    )


def asof_join_keyed(
    left: DataFrame,
    versions: DataFrame,
    key: str,
    left_ts: str,
    ver_ts: str,
    ver_col: str,
) -> DataFrame:
    """J5 at scale (r5): keyed as-of via the union-marker window — the
    shape that survives a version table too big to broadcast.

    ``left`` rows and ``versions`` rows are unioned on (key, ts) with a
    marker ordering versions FIRST at equal timestamps (a version taking
    effect exactly at left_ts applies — the same inclusive rule as
    :func:`asof_join`); one window per key carries the latest ``ver_col``
    forward; left rows filter back out. ONE shuffle keyed by ``key``, no
    theta join, no broadcast — versions stream through the same sort as
    the data. Returns ``left``'s columns + ``ver_col`` (NULL when no
    version precedes).

    Determinism (ADVICE r5): the window order is (_ts, _is_left,
    ver_col) — the final ver_col tiebreak makes the carried value the MAX
    ``ver_col`` among versions sharing (key, ts), a total order instead of
    a partition-dependent pick. ``left`` must not already carry a column
    named ``ver_col`` (its values would pollute the ignorenulls carry and
    the output would duplicate the name) — refused loudly.
    """
    if ver_col in left.columns:
        raise ValueError(
            f"left already has a column named {ver_col!r} — it would be "
            "read by the ignorenulls carry as version data; rename it first"
        )
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
    )
    v = versions.select(
        F.col(key).alias("_k"),
        F.col(ver_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(ver_col),
    )
    u = l.unionByName(v, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left", F.col(ver_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # left rows carry NULL in ver_col, so last-ignore-nulls reads the
    # newest preceding version row of the same key
    carried = F.last(ver_col, ignorenulls=True).over(w)
    return (
        u.withColumn("_v", carried)
        .where(F.col("_is_left") == 1)
        .select(*lcols, F.col("_v").alias(ver_col))
    )


def cell_range_join_anchored(
    points: DataFrame,
    cells: DataFrame,
    levels: list[int],
    point_cell: str = "cell",
) -> DataFrame:
    """J4 at scale (r5): descendant-range containment as a pure hash
    EQUI-join — the shape for an index-cell table too big to broadcast
    (the BETWEEN form of :func:`cell_range_join` is a range/theta join).

    Each point explodes to its ancestor id at every level present in the
    compacted index (cell ids encode their level via the lsb sentinel,
    so an ancestor at level L can only ever equal an index cell at L —
    the equi-join on the ancestor id is exactly descendant containment).
    Fan-out is |levels| (a handful after compaction); one shuffle keyed
    by cell id, skew-free (md5-free but quadtree-uniform at depth).
    """
    anchors = F.array(
        *[UF.cell_parent(point_cell, lvl) for lvl in sorted(set(levels))]
    )
    anc = points.withColumn("_anchor", F.explode(anchors))
    return anc.join(
        cells.select(F.col("cell").alias("_anchor"), *[c for c in cells.columns if c != "cell"]),
        "_anchor",
    ).drop("_anchor")


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis (r6): how many users reach each step of
    ``steps`` IN ORDER — step k counts users with an event of type
    steps[k] at-or-after their earliest completion of step k-1 (the
    classic product-analytics funnel, windowless formulation).

    Exact boundary (pinned): comparisons are on epoch MICROSECONDS
    (integer, both engines) and at-or-after is inclusive (>=) — an event
    can complete two adjacent steps at the same instant only if both
    types occur at that timestamp. Returns (step, users): step 0 = users
    with ANY event, step k = users whose step-k time exists; every step's
    count is <= the previous (monotone by construction).

    Scale shape: one tiny filtered agg per step (shuffles keyed by user,
    partial aggs map-side), chained through |steps| broadcast-size joins
    — input is scanned once per step but each scan prunes to one event
    type (predicate pushdown); nothing quadratic, no window over the
    full input.
    """
    us = F.unix_micros(F.col(ts).cast("timestamp")).alias("_us")
    e = events.select(F.col(key).alias("_k"), F.col(type_col).alias("_t"), us)
    reached = e.select("_k").distinct().select("_k")
    counts = [("0", reached)]
    prev = None  # DataFrame (_k, _tk): earliest completion of previous step
    for i, step in enumerate(steps, start=1):
        s = e.where(F.col("_t") == step)
        if prev is not None:
            s = s.join(prev, "_k").where(F.col("_us") >= F.col("_tk")).drop("_tk")
        cur = s.groupBy("_k").agg(F.min("_us").alias("_tk"))
        counts.append((str(i), cur.select("_k")))
        prev = cur
    frames = [
        df.groupBy().agg(
            F.lit(int(lbl)).alias("step"), F.count(F.lit(1)).cast("long").alias("users")
        )
        for lbl, df in counts
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def funnel_counts_sql(steps: list[str], table: str = "events") -> str:
    """DuckDB mirror of :func:`funnel_counts` (same inclusive integer-
    microsecond boundary, same step chaining)."""
    ctes = [
        f"e AS (SELECT user_id AS k, event_type AS t, epoch_us(ts) AS us FROM {table})",
        "s0 AS (SELECT DISTINCT k FROM e)",
    ]
    prev = None
    for i, step in enumerate(steps, start=1):
        src = "e"
        cond = f"t = '{step}'"
        if prev is not None:
            ctes.append(
                f"s{i} AS (SELECT e.k, min(us) AS tk FROM e JOIN {prev} p ON e.k = p.k "
                f"WHERE {cond} AND us >= p.tk GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT k, min(us) AS tk FROM e WHERE {cond} GROUP BY 1)"
            )
        prev = f"s{i}"
    selects = ["SELECT 0 AS step, CAST(count(*) AS BIGINT) AS users FROM s0"] + [
        f"SELECT {i} AS step, CAST(count(*) AS BIGINT) AS users FROM s{i}"
        for i in range(1, len(steps) + 1)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def scd2_intervals(
    versions: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """SCD-2 validity intervals (r6): turn a stream of version rows into
    slowly-changing-dimension intervals — each row becomes effective at
    its own timestamp and expires at the NEXT version's timestamp of the
    same key (NULL = still current). The interval table is what an as-of
    join materializes; building it once makes point-in-time lookups a
    plain BETWEEN.

    Total order (pinned): versions of a key are ordered by
    (ts, tiebreak) — equal-timestamp versions chain deterministically,
    the later tiebreak superseding instantly (an equal-ts pair yields a
    zero-length interval, kept: it is the honest record of the
    supersession). Timestamps are floored epoch seconds in the output.

    Scale shape: ONE window keyed by ``key`` (one shuffle); no join.
    """
    eff = F.unix_timestamp(F.col(ts)).alias("eff_from")
    return versions.select(key, tiebreak, eff).select(
        key,
        tiebreak,
        "eff_from",
        F.lead("eff_from").over(
            Window.partitionBy(key).orderBy(
                F.col("eff_from").asc(), F.col(tiebreak).asc()
            )
        ).alias("eff_to"),
    )
