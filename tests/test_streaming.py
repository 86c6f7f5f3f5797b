"""Streaming: availableNow backfill + checkpoint resume + exactly-once sink,
watermark late-data drop, stateful per-cell counters (SURVEY §5, §2.9)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ult_spark.datagen.pages import pages_df
from ult_spark.io import catalog
from ult_spark.streaming import run_backfill, windowed_tile_counts


def _final_counts(spark, table) -> pd.DataFrame:
    """Latest state per (win_start, cell): update-mode snapshots are keyed by
    batch unit — later batches supersede earlier ones."""
    df = catalog.read_table(spark, table).toPandas()
    return (
        df.sort_values("cnt")
        .groupby(["win_start", "cell"], as_index=False)
        .last()
        .sort_values(["win_start", "cell"])
        .reset_index(drop=True)
    )


def test_backfill_checkpoint_resume(spark, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "tiles")
    ckpt = str(tmp_path / "ckpt")

    # chunk 1: docs 0..999 → backfill
    pages_df(spark, 1000, partitions=2).write.mode("append").parquet(src)
    run_backfill(spark, src, out, ckpt)
    n1 = len(catalog.list_snapshots(out))
    assert n1 > 0
    got1 = _final_counts(spark, out)
    assert got1["cnt"].sum() > 0

    # no new files → restart is a no-op (checkpoint remembers offsets):
    # capture snapshot count + row total BEFORE, compare AFTER (ADVICE r1)
    rows_before = sum(s["rows"] for s in catalog.list_snapshots(out))
    run_backfill(spark, src, out, ckpt)
    assert sum(s["rows"] for s in catalog.list_snapshots(out)) == rows_before
    assert _final_counts(spark, out).equals(got1)

    # chunk 2: docs 1000..1999 appended → resume processes only the delta
    from ult_spark.datagen.pages import make_generator
    import numpy as np

    pdf2 = make_generator()(np.arange(1000, 2000, dtype=np.int64))
    spark.createDataFrame(pdf2).write.mode("append").parquet(src)
    run_backfill(spark, src, out, ckpt)

    # final streaming state == one-shot batch computation over all input
    batch = (
        windowed_tile_counts(spark.read.parquet(src))
        .toPandas()
        .sort_values(["win_start", "cell"])
        .reset_index(drop=True)
    )
    got2 = _final_counts(spark, out)
    assert got2[["win_start", "cell", "cnt"]].equals(batch[["win_start", "cell", "cnt"]])


def test_streaming_geo_slice_equals_batch(spark, tmp_path):
    """Round-2 verdict #8: extract → encode → PIP → windowed tile agg run
    END-TO-END through an availableNow backfill must equal the same
    composition evaluated as one batch query on the same input — proving
    the geotag UDF and the ops/pip.py broadcast PIP stage really are shared
    between the two paths, and additionally equal the batch pipeline's
    NATIVE geotag twin."""
    from ult_spark.extract.geo import geotag_native
    from ult_spark.geom.polyio import default_layer
    from ult_spark.ops.pip import pip_join
    from ult_spark.streaming import (
        stream_pages,
        windowed_pip_tile_counts,
        write_stream_snapshots,
    )
    from ult_spark import functions as UF

    src = str(tmp_path / "pages_pip")
    out = str(tmp_path / "tiles_pip")
    ckpt = str(tmp_path / "ckpt_pip")
    pages_df(spark, 1500, partitions=3).write.mode("append").parquet(src)

    q = write_stream_snapshots(
        windowed_pip_tile_counts(stream_pages(spark, src, max_files=2)),
        out, ckpt,
    )
    q.awaitTermination()

    keys = ["win_start", "cell", "poly_id"]
    got = (
        catalog.read_table(spark, out).toPandas()
        .sort_values("cnt").groupby(keys, as_index=False).last()
        .sort_values(keys).reset_index(drop=True)
    )
    batch = (
        windowed_pip_tile_counts(spark.read.parquet(src))
        .toPandas().sort_values(keys).reset_index(drop=True)
    )
    assert got[keys + ["cnt"]].equals(batch[keys + ["cnt"]])
    assert got["cnt"].sum() > 0

    # and the batch pipeline's NATIVE geotag twin agrees end-to-end
    lat, lon = geotag_native("html")
    pts = spark.read.parquet(src).select(
        "url", "warc_ts", lat.alias("lat"), lon.alias("lon")
    )
    native = (
        pip_join(pts, list(default_layer()))
        .withColumn("cell", UF.latlon_to_cell("lat", "lon", 8))
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "cell", "poly_id")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "cell", "poly_id", "cnt")
        .toPandas().sort_values(keys).reset_index(drop=True)
    )
    assert got[keys + ["cnt"]].equals(native[keys + ["cnt"]])


def test_watermark_drops_late_rows(spark, tmp_path):
    """Rows later than watermark behind the max seen ts are dropped from
    append-mode windows (T5)."""
    src = str(tmp_path / "late_src")
    base = pd.Timestamp("2024-01-01T00:00:00")
    on_time = pd.DataFrame(
        {"user": ["a", "b"], "ts": [base + pd.Timedelta(minutes=m) for m in (5, 200)]}
    )
    late = pd.DataFrame({"user": ["late"], "ts": [base + pd.Timedelta(minutes=6)]})
    spark.createDataFrame(on_time).write.mode("append").parquet(src)

    out = []

    def run_once():
        stream = (
            spark.readStream.schema("user string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"))
        )
        batches = []
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / "late_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out.extend(b for b in batches if len(b))

    run_once()
    # the 00:05 window is closed (watermark advanced to 190min by the 200min row)
    spark.createDataFrame(late).write.mode("append").parquet(src)
    run_once()
    all_rows = pd.concat(out)
    w5 = all_rows[all_rows["w"].map(lambda w: w["start"] == base)]
    assert (w5["cnt"] == 1).all(), "late row must NOT increment the closed window"


def test_sliding_and_session_windows(spark, tmp_path):
    """T3 sliding window + T4 session_window on a stream (availableNow)."""
    src = str(tmp_path / "sw_src")
    base = pd.Timestamp("2024-01-01T00:00:00")
    rows = pd.DataFrame(
        {
            "host": ["a", "a", "a", "b"],
            "ts": [base, base + pd.Timedelta(minutes=4),
                   base + pd.Timedelta(minutes=30), base + pd.Timedelta(minutes=1)],
        }
    )
    spark.createDataFrame(rows).write.mode("append").parquet(src)
    stream = spark.readStream.schema("host string, ts timestamp").parquet(src)

    def run(agg, tag, mode):
        batches = []
        q = (
            agg.writeStream.outputMode(mode)
            .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return pd.concat([b for b in batches if len(b)], ignore_index=True)

    # sliding 10-minute windows every 5 minutes: the 00:04 event lands in
    # windows starting 23:55 and 00:00
    slide = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
    )
    sl = run(slide, "slide", "update")
    starts = sorted(w["start"] for w in sl["w"])
    assert len(starts) == len(set(starts)) and len(sl) >= 4

    # session windows with a 10-minute gap: host a → 2 sessions (00:00-…,
    # 00:30-…), host b → 1
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "host")
        .agg(F.count("*").alias("cnt"))
    )
    se = run(sess, "sess", "complete")  # session windows don't support update mode
    per_host = se.groupby("host").size().to_dict()
    assert per_host == {"a": 2, "b": 1}
    a_counts = sorted(se[se["host"] == "a"]["cnt"].tolist())
    assert a_counts == [1, 2]


def test_streaming_dedup_slice_equals_batch(spark, tmp_path, sf_smoke):
    """Round-3 verdict (missing #5): the LLM-dedup family through
    Structured Streaming. availableNow exact dedup keeps each distinct
    text hash exactly once == batch dedup_exact's key set; incremental
    foreachBatch LSH against the committed signature store accumulates
    EXACTLY the batch minhash_lsh_dedup pair set over the same corpus."""
    from ult_spark.ops.textops import dedup_exact, minhash_lsh_dedup
    from ult_spark.streaming import dedup_exact_stream, stream_minhash_pairs

    base = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    # plant cross-chunk exact duplicates: 20 even-id texts reappear under
    # new ids in the second chunk
    dup = (
        base.where(F.col("doc_id") % 2 == 0).limit(20)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    ts = F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))
    src = str(tmp_path / "docs_src")
    chunk1 = base.where(F.col("doc_id") % 2 == 0).withColumn("ts", ts)
    chunk2 = base.where(F.col("doc_id") % 2 == 1).unionByName(dup).withColumn("ts", ts)
    chunk1.coalesce(1).write.mode("append").parquet(src)
    chunk2.coalesce(1).write.mode("append").parquet(src)
    all_docs = spark.read.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    # --- exact dedup: stream keeps each distinct hash exactly once
    kept = []
    q = (
        dedup_exact_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: kept.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_hashes = sorted(
        h for b in kept if len(b) for h in b["text_md5"].tolist()
    )
    exp_hashes = sorted(
        r.text_md5 for r in dedup_exact(all_docs).select("text_md5").collect()
    )
    assert got_hashes == exp_hashes  # every distinct hash, each EXACTLY once

    # --- incremental LSH: accumulated committed pairs == batch pipeline
    pairs_table = str(tmp_path / "pairs")
    q = stream_minhash_pairs(
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        pairs_table,
        str(tmp_path / "sig_store"),
        str(tmp_path / "lsh_ckpt"),
    )
    q.awaitTermination()
    got_pairs = {
        (r.a, r.b, r.inter, r.jacc_e4)
        for r in catalog.read_table(spark, pairs_table).collect()
    }
    exp_pairs = {
        (r.a, r.b, r.inter, r.jacc_e4) for r in minhash_lsh_dedup(all_docs).collect()
    }
    assert got_pairs == exp_pairs
    # the planted cross-chunk exact dups must surface as jacc=1 pairs
    planted = {p for p in exp_pairs if p[3] == 10000}
    assert planted and planted <= got_pairs


def test_dedup_exact_stream_checkpoint_restart(spark, tmp_path, sf_smoke):
    """Content-keyed streaming dedup across a RESTART: a hash first seen in
    run 1 must still suppress copies arriving in run 2 (state lives in the
    checkpoint), and the union of kept rows equals the batch key set."""
    from ult_spark.ops.textops import dedup_exact
    from ult_spark.streaming import dedup_exact_stream

    base = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    dup = (
        base.limit(15)
        .select((F.col("doc_id") + 300000).alias("doc_id"), "text")
    )
    ts = F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 1000)
    src = str(tmp_path / "dd_src")
    kept = []

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            dedup_exact_stream(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: kept.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / "dd_ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    base.withColumn("ts", ts).coalesce(1).write.mode("append").parquet(src)
    run_once()
    n_run1 = sum(len(b) for b in kept)
    # run 2 delivers ONLY duplicates of already-seen texts
    dup.withColumn("ts", ts).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = sorted(h for b in kept if len(b) for h in b["text_md5"].tolist())
    assert sum(len(b) for b in kept) == n_run1, "restart must drop known hashes"
    exp = sorted(
        r.text_md5
        for r in dedup_exact(spark.read.parquet(src)).select("text_md5").collect()
    )
    assert got == exp


def test_streaming_lsh_checkpoint_restart(spark, tmp_path, sf_smoke):
    """The incremental LSH store across RESTARTS: run 1 sees only chunk 1;
    chunk 2 lands later and run 2 (same checkpoint) processes only the
    delta. The accumulated pair set equals the batch pipeline over the
    full corpus and no pair is emitted twice."""
    from ult_spark.ops.textops import minhash_lsh_dedup
    from ult_spark.streaming import stream_minhash_pairs

    base = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    dup = (
        base.where(F.col("doc_id") % 2 == 0).limit(10)
        .select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    src = str(tmp_path / "docs_rs")
    pairs_table = str(tmp_path / "pairs_rs")
    store = str(tmp_path / "store_rs")
    ckpt = str(tmp_path / "ckpt_rs")

    def run_once():
        q = stream_minhash_pairs(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            pairs_table, store, ckpt,
        )
        q.awaitTermination()

    base.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    run_once()
    n_after_1 = len(catalog.list_snapshots(pairs_table))
    assert n_after_1 >= 1
    # delta lands; the SAME checkpoint resumes and processes only chunk 2
    base.where(F.col("doc_id") % 2 == 1).unionByName(dup).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert len(catalog.list_snapshots(pairs_table)) > n_after_1

    got = catalog.read_table(spark, pairs_table)
    all_docs = spark.read.parquet(src)
    got_pairs = {(r.a, r.b, r.inter, r.jacc_e4) for r in got.collect()}
    exp_pairs = {
        (r.a, r.b, r.inter, r.jacc_e4) for r in minhash_lsh_dedup(all_docs).collect()
    }
    assert got_pairs == exp_pairs
    # exactly-once: no pair emitted by two different batches
    assert got.count() == got.select("a", "b").distinct().count()
    # the cross-restart planted dups surfaced
    planted = {p for p in exp_pairs if p[1] >= 200000 and p[3] == 10000}
    assert planted and planted <= got_pairs


def test_stateful_per_cell_counter(spark, tmp_path):
    """T7: applyInPandasWithState — running per-key totals across batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = str(tmp_path / "st_src")
    spark.createDataFrame(
        pd.DataFrame({"k": ["x", "x", "y"], "v": [1, 2, 10]})
    ).write.mode("append").parquet(src)

    def track(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += int(pdf["v"].sum())
        state.update((total,))
        yield pd.DataFrame({"k": [key[0]], "total": [total]})

    def run_once(tag):
        stream = spark.readStream.schema("k string, v long").parquet(src)
        batches = []
        q = (
            stream.groupBy("k")
            .applyInPandasWithState(
                track, "k string, total long", "total long",
                "update", GroupStateTimeout.NoTimeout,
            )
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / "st_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return pd.concat([b for b in batches if len(b)] or [pd.DataFrame({"k": [], "total": []})])

    r1 = run_once("a")
    assert dict(zip(r1["k"], r1["total"])) == {"x": 3, "y": 10}
    # second chunk accumulates into checkpointed state
    spark.createDataFrame(pd.DataFrame({"k": ["x"], "v": [5]})).write.mode("append").parquet(src)
    r2 = run_once("b")
    assert dict(zip(r2["k"], r2["total"]))["x"] == 8


def test_streaming_lsh_recrawled_doc_ids(spark, tmp_path, sf_smoke):
    """Round-4 advice: a doc_id RE-ARRIVING in a later batch (re-crawl)
    must not multiply store rows or re-emit already-committed pairs —
    store reads are latest-batch-wins and re-discoveries are anti-joined
    out. The accumulated pair set equals the batch pipeline over the
    id-distinct corpus, with no (a, b) emitted twice."""
    from ult_spark.ops.textops import minhash_lsh_dedup
    from ult_spark.streaming import stream_minhash_pairs

    base = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    evens = base.where(F.col("doc_id") % 2 == 0)
    recrawl = evens.limit(5)  # same ids, same text, delivered again
    odds = base.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "docs_rc")
    pairs_table = str(tmp_path / "pairs_rc")

    # two files → two micro-batches under maxFilesPerTrigger=1
    evens.coalesce(1).write.mode("append").parquet(src)
    odds.unionByName(recrawl).coalesce(1).write.mode("append").parquet(src)
    q = stream_minhash_pairs(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        pairs_table, str(tmp_path / "store_rc"), str(tmp_path / "ckpt_rc"),
    )
    q.awaitTermination()

    got = catalog.read_table(spark, pairs_table)
    # no pair emitted twice despite the re-crawled ids
    assert got.count() == got.select("a", "b").distinct().count()
    distinct_docs = spark.read.parquet(src).dropDuplicates(["doc_id"])
    got_pairs = {(r.a, r.b, r.inter, r.jacc_e4) for r in got.collect()}
    exp_pairs = {
        (r.a, r.b, r.inter, r.jacc_e4)
        for r in minhash_lsh_dedup(distinct_docs).collect()
    }
    assert got_pairs == exp_pairs


def test_streaming_embedding_pairs_restart_equals_batch(spark, tmp_path, sf_smoke):
    """Round-4 verdict #5: the incremental vector-LSH stream across
    RESTARTS — run 1 sees chunk 1, chunk 2 (including planted exact
    near-dup copies of chunk-1 vectors) lands later and run 2 (same
    checkpoint) processes only the delta. The accumulated pair set equals
    the batch near-dup kernel over the full corpus; no pair emitted
    twice; the cross-chunk planted dups surface."""
    from ult_spark.ops.ann import near_dup_pairs
    from ult_spark.streaming import stream_embedding_pairs

    base = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = (
        base.where(F.col("vec_id") % 2 == 0).limit(5)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    src = str(tmp_path / "emb_src")
    pairs_table = str(tmp_path / "emb_pairs")
    store = str(tmp_path / "emb_store")
    ckpt = str(tmp_path / "emb_ckpt")

    def run_once():
        q = stream_embedding_pairs(
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            pairs_table, store, ckpt,
        )
        q.awaitTermination()

    base.where(F.col("vec_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    run_once()
    n_after_1 = len(catalog.list_snapshots(pairs_table))
    assert n_after_1 >= 1
    base.where(F.col("vec_id") % 2 == 1).unionByName(planted).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert len(catalog.list_snapshots(pairs_table)) > n_after_1

    got = catalog.read_table(spark, pairs_table)
    assert got.count() == got.select("a", "b").distinct().count()
    all_vecs = spark.read.parquet(src)
    got_pairs = {(r.a, r.b, r.sim_e6) for r in got.collect()}
    exp_pairs = {
        (r.a, r.b, r.sim_e6)
        for r in near_dup_pairs(all_vecs, max_bucket=None).collect()
    }
    assert got_pairs == exp_pairs
    # the cross-restart planted copies surfaced (identical vectors)
    planted_found = {p for p in got_pairs if p[1] >= 100000 and p[0] == p[1] - 100000}
    assert len(planted_found) == 5


def test_session_window_counts_equals_batch_sessionize(spark, tmp_path, sf_smoke):
    """r5 session_window_counts ≡ batch gaps-and-islands sessionization.

    Boundary pin: Spark MERGES adjacent session windows, so an event
    exactly ``gap`` seconds after the previous one extends the session —
    a split needs the gap to EXCEED the threshold, which is precisely the
    batch sessionize rule with the same gap_seconds. Asserted on the real
    events table AND on a planted exact-1800s gap (which stays ONE
    session under both forms, and splits only at a 1799s batch
    threshold)."""
    from ult_spark.ops.relational import sessionize
    from ult_spark.streaming import session_window_counts

    events = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    src = str(tmp_path / "sess_src")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(src)

    batches = []
    q = (
        session_window_counts(stream, gap="30 minutes")
        .writeStream.outputMode("complete")
        .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ck_sessc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = pd.concat([b for b in batches if len(b)], ignore_index=True)
    stream_counts = sorted(
        map(tuple, got[["user_id", "n_events"]].itertuples(index=False))
    )

    batch = (
        sessionize(events, "user_id", "ts", 1800, tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    batch_counts = sorted((r.user_id, r.n_events) for r in batch.collect())
    assert stream_counts == batch_counts

    # planted exact-gap boundary: 1800 s apart → ONE session in both the
    # stream (adjacent windows merge; end = last event + gap) and the
    # batch at threshold 1800; the batch at 1799 splits
    planted = spark.createDataFrame(
        [(1, 7, "2026-01-01 00:00:00"), (2, 7, "2026-01-01 00:30:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    psrc = str(tmp_path / "sess_planted")
    planted.write.mode("overwrite").parquet(psrc)
    pstream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(psrc)
    pbatches = []
    pq = (
        session_window_counts(pstream, gap="30 minutes")
        .writeStream.outputMode("complete")
        .foreachBatch(lambda df, bid: pbatches.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ck_sessp"))
        .trigger(availableNow=True)
        .start()
    )
    pq.awaitTermination()
    planted_stream = pd.concat([b for b in pbatches if len(b)], ignore_index=True)
    assert len(planted_stream) == 1
    row = planted_stream.iloc[0]
    assert row["n_events"] == 2
    assert row["sess_end"] - row["sess_start"] == 1800 + 1800  # last event + gap
    assert sessionize(planted, "user_id", "ts", 1800).agg(
        F.max("session_id")
    ).collect()[0][0] == 1
    assert sessionize(planted, "user_id", "ts", 1799).agg(
        F.max("session_id")
    ).collect()[0][0] == 2


def test_stream_session_trips_equals_batch_closed_sessions(spark, tmp_path, sf_smoke):
    """r5 stream_session_trips ≡ batch session_trips for every CLOSED
    session (a session closes when the next event of its user arrives;
    each user's final session stays open in state — pinned contract).
    Run twice over a chronological split to exercise checkpointed state
    across batches, including sessions that SPAN the split."""
    from ult_spark.ops.relational import session_trips
    from ult_spark.querydefs import events_points
    from ult_spark.streaming import stream_session_trips

    pts = events_points(spark, sf_smoke).select(
        "user_id", "event_id",
        F.unix_timestamp("ts").alias("es"), "lat", "lon", "ts",
    )
    cut = pts.agg(F.expr("percentile_approx(es, 0.5)")).collect()[0][0]
    src = str(tmp_path / "trips_src")
    pts.where(F.col("es") <= cut).drop("ts").write.mode("append").parquet(src)

    batches = []

    def run_once():
        stream = spark.readStream.schema(
            "user_id long, event_id long, es long, lat double, lon double"
        ).parquet(src)
        q = (
            stream_session_trips(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / "trips_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    pts.where(F.col("es") > cut).drop("ts").write.mode("append").parquet(src)
    run_once()
    got = pd.concat([b for b in batches if len(b)], ignore_index=True)
    stream_set = {
        tuple(int(r[c]) for c in ("user_id", "session_id", "n_events",
                                  "dur_s", "dist_m", "max_leg_m"))
        for _, r in got.iterrows()
    }

    batch = session_trips(events_points(spark, sf_smoke)).collect()
    last = {}
    for r in batch:
        last[r.user_id] = max(last.get(r.user_id, 0), r.session_id)
    expect = {
        (r.user_id, r.session_id, r.n_events, r.dur_s, r.dist_m, r.max_leg_m)
        for r in batch
        if r.session_id != last[r.user_id]
    }
    assert stream_set == expect and len(expect) > 0


def test_stream_session_trips_out_of_order_detection(spark, tmp_path):
    """ADVICE r5: an event older than the open session's last timestamp
    must fail loudly (the per-key in-order precondition is enforced), and
    on_out_of_order='ignore' restores the permissive behavior."""
    import pytest

    from ult_spark.streaming import stream_session_trips

    schema = "user_id long, event_id long, es long, lat double, lon double"
    src = str(tmp_path / "oo_src")
    spark.createDataFrame(
        [(1, 1, 5000, 0.0, 0.0), (1, 2, 6000, 0.0, 0.0)], schema
    ).write.mode("append").parquet(src)

    def run(ck, **kw):
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_session_trips(stream, **kw)
            .writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ck_oo")  # seeds state: open session, last_es=6000
    spark.createDataFrame([(1, 3, 1000, 0.0, 0.0)], schema).write.mode(
        "append"
    ).parquet(src)
    with pytest.raises(Exception, match="out-of-order input for key 1"):
        run("ck_oo")
    # permissive mode completes on the same feed (fresh checkpoint)
    run("ck_oo_ignore", on_out_of_order="ignore")


def test_stream_session_trips_idle_timeout_flushes(spark, tmp_path):
    """ADVICE r5: with idle_timeout_ms, a user that stops appearing gets
    their open session FLUSHED (emitted as closed) by a processing-time
    timeout and their state removed — state stays bounded. Runs under a
    processing-time trigger: an armed timeout keeps scheduling no-data
    batches, so availableNow would never self-terminate (documented)."""
    import time

    from ult_spark.streaming import stream_session_trips

    schema = "user_id long, event_id long, es long, lat double, lon double"
    src = str(tmp_path / "idle_src")
    spark.createDataFrame(
        [(1, 1, 5000, 0.0, 0.0), (1, 2, 6000, 0.0, 0.0)], schema
    ).write.mode("append").parquet(src)
    batches = []
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_session_trips(stream, idle_timeout_ms=1)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "idle_ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            got = pd.concat([b for b in batches if len(b)], ignore_index=True) \
                if any(len(b) for b in batches) else pd.DataFrame()
            if len(got):
                break
            time.sleep(1)
    finally:
        q.stop()
    flushed = got[got.user_id == 1]
    assert len(flushed) == 1
    row = flushed.iloc[0]
    assert (row.session_id, row.n_events, row.dur_s) == (1, 2, 1000)


def test_stream_countmin_equals_batch(spark, tmp_path):
    """r7: the summed streaming partial sketches equal the one-job batch
    sketch on the same input, and a resumed (replayed) run changes
    nothing — the batch-id overwrite makes additive state exactly-once."""
    from ult_spark.ops.sketch import countmin_sketch
    from ult_spark.streaming import read_countmin_store, stream_countmin

    src = str(tmp_path / "cm_src")
    store = str(tmp_path / "cm_store")
    ckpt = str(tmp_path / "cm_ckpt")
    rows1 = [(f"u{i % 9}",) for i in range(200)]
    rows2 = [("hot",)] * 77 + [(f"u{i % 5}",) for i in range(100)]
    spark.createDataFrame(rows1, "user_id string").write.parquet(f"{src}/a")
    spark.createDataFrame(rows2, "user_id string").write.parquet(f"{src}/b")

    def run():
        stream = (
            spark.readStream.schema("user_id string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        stream_countmin(stream, store, ckpt).awaitTermination()

    run()
    got = {(r.d, r.bucket): r.cnt for r in read_countmin_store(spark, store).collect()}
    full = spark.createDataFrame(rows1 + rows2, "user_id string")
    want = {(r.d, r.bucket): r.cnt for r in
            countmin_sketch(full, "user_id").collect()}
    assert got == want
    # resume with nothing new: store unchanged (no double counting)
    run()
    again = {(r.d, r.bucket): r.cnt for r in read_countmin_store(spark, store).collect()}
    assert again == want


def test_stream_hll_equals_batch(spark, tmp_path):
    """r7: max-folded streaming register partials equal the one-job HLL,
    and a replayed run cannot move a max."""
    from ult_spark.ops.sketch import hll_estimate
    from ult_spark.streaming import read_hll_store, stream_hll

    src = str(tmp_path / "hll_src")
    store = str(tmp_path / "hll_store")
    ckpt = str(tmp_path / "hll_ckpt")
    rows1 = [(f"u{i}",) for i in range(300)]
    rows2 = [(f"u{i}",) for i in range(150, 450)]  # overlap: dedup matters
    spark.createDataFrame(rows1, "user_id string").write.parquet(f"{src}/a")
    spark.createDataFrame(rows2, "user_id string").write.parquet(f"{src}/b")

    def run():
        stream = (
            spark.readStream.schema("user_id string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        stream_hll(stream, store, ckpt).awaitTermination()

    run()
    got = read_hll_store(spark, store).collect()[0]
    full = spark.createDataFrame(rows1 + rows2, "user_id string")
    want = hll_estimate(full, "user_id").collect()[0]
    assert (got.v_zero, got.s49, got.est) == (want.v_zero, want.s49, want.est)
    run()
    again = read_hll_store(spark, store).collect()[0]
    assert (again.v_zero, again.s49, again.est) == (got.v_zero, got.s49, got.est)


def test_stream_bloom_equals_batch_and_never_forgets(spark, tmp_path):
    """r7: the unioned streaming bit store equals the batch filter's bit
    set, and every streamed key tests positive against it (a seen key
    can never go negative — the resumable-crawl guarantee)."""
    from pyspark.sql import functions as F

    from ult_spark.ops.sketch import BLOOM_K, BLOOM_M, _lane
    from ult_spark.streaming import read_bloom_store, stream_bloom

    src = str(tmp_path / "bl_src")
    store = str(tmp_path / "bl_store")
    ckpt = str(tmp_path / "bl_ckpt")
    rows1 = [(f"u{i}",) for i in range(100)]
    rows2 = [(f"u{i}",) for i in range(50, 200)]
    spark.createDataFrame(rows1, "user_id string").write.parquet(f"{src}/a")
    spark.createDataFrame(rows2, "user_id string").write.parquet(f"{src}/b")
    stream = (
        spark.readStream.schema("user_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    stream_bloom(stream, store, ckpt).awaitTermination()
    got = {r.bit for r in read_bloom_store(spark, store).collect()}
    full = spark.createDataFrame(rows1 + rows2, "user_id string")
    want = {
        r.bit
        for r in full.select(
            F.explode(
                F.array(*[_lane(F.col("user_id"), i, BLOOM_M) for i in range(BLOOM_K)])
            ).alias("bit")
        ).distinct().collect()
    }
    assert got == want
    # no false negatives against the streamed store
    lanes = full.select(
        "user_id",
        F.explode(
            F.array(*[_lane(F.col("user_id"), i, BLOOM_M) for i in range(BLOOM_K)])
        ).alias("bit"),
    )
    bits = read_bloom_store(spark, store).withColumn("hit", F.lit(1))
    neg = (
        lanes.join(bits, "bit", "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce("hit", F.lit(0))).alias("pos"))
        .where(F.col("pos") == 0)
        .count()
    )
    assert neg == 0
