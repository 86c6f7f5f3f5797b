"""Unit tests for the round-5 corpus-curation ops (ops/curation.py) on
planted fixtures — the registered queries' oracle parity is covered by
tests/test_oracle_contract.py; here we pin the SEMANTICS on documents the
driver corpus can't express (newlines, real PII, adversarial repetition).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# ---------------------------------------------------------------------------
# gopher_repetition


def test_gopher_repetition_metrics(spark):
    from ult_spark.ops.curation import gopher_repetition

    rows = [
        # 'buy now' repeated: top-2-gram covers everything -> dropped
        ("loop", " ".join(["buy", "now"] * 8)),
        # all-distinct tokens: zero repetition -> kept (20 tokens, so the
        # structural top-2-gram floor 2/n = 10% sits under the 20% gate)
        ("clean", " ".join(f"w{i}" for i in range(20))),
        # too short for any 3-gram (2 tokens): dup3 = 0, kept unless top2 dominates
        ("tiny", "hello world"),
        # single token: no grams at all -> both metrics 0, kept
        ("one", "solo"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition(_docs(spark, rows)).collect()
    }
    assert out["loop"]["keep"] == 0
    assert out["loop"]["top2_frac_e4"] == 10000  # capped at 1.0
    assert out["loop"]["dup3_frac_e4"] == 10000  # every 3-gram repeats
    assert out["clean"]["keep"] == 1
    assert out["clean"]["top2_frac_e4"] == 1000  # 2 of 20 tokens
    assert out["clean"]["dup3_frac_e4"] == 0
    # 2 tokens: one 2-gram covering both tokens -> frac 1.0, dropped by top2
    assert out["tiny"]["top2_frac_e4"] == 10000 and out["tiny"]["keep"] == 0
    assert out["one"]["top2_frac_e4"] == 0 and out["one"]["dup3_frac_e4"] == 0
    assert out["one"]["keep"] == 1


# ---------------------------------------------------------------------------
# pii_scrub


def test_pii_scrub_patterns(spark):
    from ult_spark.ops.curation import pii_scrub

    rows = [
        ("a", "mail me at jane.doe+x@sub.example.org today"),
        ("b", "call 555-867-5309 or 212-555-0100 now"),
        ("c", "server at 192.168.1.254 responded"),
        ("d", "no pii here at all"),
        # phone inside a longer digit run must NOT match (\b guards)
        ("e", "serial 1555-867-53091 is not a phone"),
        ("f", "two mails: a@b.co and c.d@e-f.org end"),
    ]
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (out["a"]["n_email"], out["a"]["n_phone"], out["a"]["n_ip"]) == (1, 0, 0)
    assert (out["b"]["n_email"], out["b"]["n_phone"], out["b"]["n_ip"]) == (0, 2, 0)
    assert (out["c"]["n_email"], out["c"]["n_phone"], out["c"]["n_ip"]) == (0, 0, 1)
    assert (out["d"]["n_email"], out["d"]["n_phone"], out["d"]["n_ip"]) == (0, 0, 0)
    assert out["e"]["n_phone"] == 0
    assert out["f"]["n_email"] == 2


def test_pii_scrub_redacts_in_text(spark):
    from ult_spark.ops.curation import RE_EMAIL, RE_IPV4, RE_PHONE

    df = _docs(spark, [("x", "a@b.co 555-867-5309 10.0.0.1")])
    scrubbed = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", RE_EMAIL, "<EMAIL>"), RE_PHONE, "<PHONE>"
            ),
            RE_IPV4,
            "<IP>",
        ).alias("t")
    ).first()["t"]
    assert scrubbed == "<EMAIL> <PHONE> <IP>"


# ---------------------------------------------------------------------------
# segment dedup


def test_newline_segment_dedup_keeps_one_canonical(spark):
    from ult_spark.ops.curation import newline_segments, segment_dedup

    boiler = "all rights reserved"
    rows = [
        ("d1", f"unique one\n{boiler}\nmore text"),
        ("d2", f"{boiler}\nother unique line"),
        ("d3", f"{boiler}"),
        ("d4", "nothing shared here\n\n"),  # blank segment dropped
    ]
    segs = newline_segments(_docs(spark, rows))
    # blank-line filtering: d4 has exactly 1 segment
    assert segs.where(F.col("doc_id") == "d4").count() == 1
    out = {r["doc_id"]: r.asDict() for r in segment_dedup(segs).collect()}
    total_kept = sum(o["n_kept"] for o in out.values())
    total_seg = sum(o["n_seg"] for o in out.values())
    assert total_seg == 3 + 2 + 1 + 1
    # 3 boiler occurrences collapse to 1: dropped = 2
    assert total_seg - total_kept == 2
    # every doc reports consistent accounting
    for o in out.values():
        assert o["n_seg"] == o["n_kept"] + o["n_dropped"]


def test_segment_dedup_is_partitioning_invariant(spark):
    from ult_spark.ops.curation import newline_segments, segment_dedup

    rows = [(f"d{i}", "shared line\nuniq " + str(i)) for i in range(20)]
    segs = newline_segments(_docs(spark, rows))
    a = sorted(map(tuple, segment_dedup(segs).collect()))
    b = sorted(map(tuple, segment_dedup(segs.repartition(7)).collect()))
    assert a == b
    # exactly one keeper of the shared line
    kept = sum(r[2] for r in a)
    assert kept == 20 + 1  # 20 uniq + 1 canonical shared


def test_token_window_segments_drop_tail(spark):
    from ult_spark.ops.curation import token_window_segments

    df = _docs(spark, [("d", " ".join(f"t{i}" for i in range(19)))])
    segs = token_window_segments(df, w=8).collect()
    assert len(segs) == 2  # 19 tokens -> 2 full windows, 3-token tail dropped
    assert segs[0]["seg"] == " ".join(f"t{i}" for i in range(8))
    assert segs[1]["seg"] == " ".join(f"t{i}" for i in range(8, 16))


# ---------------------------------------------------------------------------
# decontamination


def test_decontaminate_flags_planted_overlap(spark):
    from ult_spark.ops.curation import decontaminate
    from ult_spark.ops.textops import _h56

    # build ids whose h56 lands them in bench (<2000) vs train (>=2000)
    probe = spark.createDataFrame(
        [(f"id{i}",) for i in range(200)], "doc_id string"
    ).select("doc_id", (_h56(F.col("doc_id")) % 10000).alias("h"))
    hs = {r["doc_id"]: r["h"] for r in probe.collect()}
    bench_id = next(k for k, v in hs.items() if v < 2000)
    train_ids = [k for k, v in hs.items() if v >= 2000][:3]

    secret = "zero one two three four five six"
    rows = [
        (bench_id, f"benchmark doc with {secret} inside"),
        # shares the 5-gram window "zero one two three four"
        (train_ids[0], f"a train doc leaking {secret} verbatim"),
        (train_ids[1], "completely disjoint words nothing shared whatsoever here"),
        # 4-token overlap only -> NOT flagged at n=5
        (train_ids[2], "prefix zero one two three xx yy zz ww vv"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(_docs(spark, rows)).collect()
    }
    assert bench_id not in out  # bench docs are not in the result
    assert out[train_ids[0]]["contaminated"] == 1
    assert out[train_ids[0]]["n_hits"] >= 1
    assert out[train_ids[1]]["contaminated"] == 0
    assert out[train_ids[2]]["contaminated"] == 0


def test_decontaminate_fuzzy_planted(spark):
    """A train doc that is a one-word edit of a bench doc is flagged with
    high Jaccard; an unrelated train doc is not. Split membership is the
    pinned h56(doc_id) % 10000 < 2000 rule, so the test picks ids by
    replaying the hash."""
    import hashlib

    from ult_spark.ops.curation import decontaminate_fuzzy

    def h4(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:14], 16) % 10000

    from itertools import islice

    bench_id = next(i for i in range(1000) if h4(i) < 2000)
    t1, t2 = islice((i for i in range(1000) if h4(i) >= 2000), 2)

    # one appended token: shingle Jaccard 18/19 ≈ 0.947 — band collision
    # probability 1-(1-j^4)^4 ≈ 0.9985, and the md5 band hashes are
    # deterministic, so this fixture either collides forever or never;
    # verified colliding (the exact-edit variant at j≈0.71 happened to
    # land in the ~31% no-collision region and was swapped out)
    words = [f"tok{i}" for i in range(20)]
    bench_text = " ".join(words)
    edited = bench_text + " zzz"
    unrelated = " ".join(f"other{i}" for i in range(20))
    df = spark.createDataFrame(
        [(bench_id, bench_text), (t1, edited), (t2, unrelated)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in decontaminate_fuzzy(df).collect()}
    assert set(got) == {t1, t2}
    assert got[t1].contaminated == 1 and got[t1].n_hits == 1
    assert got[t1].best_jacc_e4 >= 2000
    assert got[t2].contaminated == 0 and got[t2].best_jacc_e4 == 0


def test_token_entropy_planted(spark):
    """Uniform tokens → ln(k) nats; constant token → 0; repetitive docs
    score strictly below diverse docs of the same length."""
    import math

    from ult_spark.querydefs import QUERIES
    import tempfile, os
    import pandas as pd

    rows = [
        (1, "a b c d"),              # uniform over 4 → ln(4)
        (2, "x x x x x x"),          # constant → 0
        (3, "a a a b"),              # skewed
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{d}/documents.parquet"
        )
        got = {r.doc_id: r for r in QUERIES["token_entropy"](spark, d).collect()}
    assert got[2].entropy_e9 == 0 and got[2].n_distinct == 1
    # per-term floors: 4 × floor(0.25·ln4·1e9) — within 4 ulps of ln(4)·1e9
    assert abs(got[1].entropy_e9 - math.log(4) * 1e9) <= 4
    skew = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25)) * 1e9
    assert abs(got[3].entropy_e9 - skew) <= 2
    assert got[3].entropy_e9 < got[1].entropy_e9


def _h56_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_host_boilerplate_strips_frequent_segments(spark):
    from ult_spark.ops.curation import host_boilerplate

    # host A: "nav bar" opens 3 of 4 docs (boiler at min_docs=3);
    # "rare tail" appears in only 2 (kept). host B has "nav bar" once.
    docs = spark.createDataFrame(
        [
            (1, "nav bar alpha beta rare tail", "A"),
            (2, "nav bar gamma delta rare tail", "A"),
            (3, "nav bar epsilon zeta", "A"),
            (4, "other text here now", "A"),
            (5, "nav bar solo here", "B"),
        ],
        "doc_id long, text string, host string",
    )
    out = {
        r["doc_id"]: r
        for r in host_boilerplate(docs, F.col("host"), w=2, min_docs=3).collect()
    }
    assert out[1].n_seg == 3 and out[1].n_boiler == 1
    assert out[1].clean_h56 == _h56_py("alpha beta rare tail")
    assert out[3].n_seg == 2 and out[3].n_boiler == 1
    assert out[3].clean_h56 == _h56_py("epsilon zeta")
    assert out[4].n_boiler == 0
    assert out[4].clean_h56 == _h56_py("other text here now")
    # host isolation: B's single "nav bar" is NOT boilerplate
    assert out[5].n_boiler == 0


def test_host_boilerplate_all_boiler_doc_hashes_empty(spark):
    from ult_spark.ops.curation import host_boilerplate

    docs = spark.createDataFrame(
        [(i, "nav bar", "A") for i in range(3)] + [(9, "nav bar extra words", "A")],
        "doc_id long, text string, host string",
    )
    out = {
        r["doc_id"]: r
        for r in host_boilerplate(docs, F.col("host"), w=2, min_docs=3).collect()
    }
    assert out[0].n_seg == 1 and out[0].n_boiler == 1
    assert out[0].clean_h56 == _h56_py("")
    assert out[9].clean_h56 == _h56_py("extra words")


# ---------------------------------------------------------------------------
# host language-mix KL divergence


def test_host_lang_divergence_exact(spark):
    import math

    import pyspark.sql.functions as F

    from ult_spark.ops.curation import host_lang_divergence

    rows = [
        # host A: 3 en, 1 fr; host B: 2 fr; corpus: en 3, fr 3
        (1, "A", "en"), (2, "A", "en"), (3, "A", "en"), (4, "A", "fr"),
        (5, "B", "fr"), (6, "B", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, h string, lang string")
    got = {r["host"]: (r["n_docs"], r["n_langs"], r["kl_e9"])
           for r in host_lang_divergence(df, F.col("h")).collect()}

    def term(c_hl, c_h, n_l, n=6):
        return math.floor(1e9 * (c_hl / c_h) * math.log((c_hl * n) / (c_h * n_l)))

    want_a = term(3, 4, 3) + term(1, 4, 3)
    want_b = term(2, 2, 3)
    assert got == {"A": (4, 2, want_a), "B": (2, 1, want_b)}
    # B is single-language in a half-fr corpus: ln(2) exactly
    assert want_b == math.floor(1e9 * math.log(2.0))


def test_host_lang_divergence_uniform_host_is_zero(spark):
    import pyspark.sql.functions as F

    from ult_spark.ops.curation import host_lang_divergence

    # a host whose mix equals the corpus mix has KL 0 (every term ln(1))
    rows = [(i, "H" + str(i % 2), ["en", "fr"][i % 2]) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, h string, lang string")
    out = host_lang_divergence(df, F.col("h")).collect()
    # hosts H0 (all en) and H1 (all fr) in an even corpus: ln(2) each
    assert all(r["kl_e9"] == 693147180 for r in out)


def test_lm_cross_entropy_closed_form(spark):
    """r7: two tiny docs against their own corpus LM — per-term e9
    floors then integer division, replicated exactly in Python."""
    import math

    from ult_spark.ops.textops import lm_cross_entropy

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.ce_e9) for r in lm_cross_entropy(docs).collect()}
    n = 5
    c = {"a": 3, "b": 1, "c": 1}
    t = lambda tf, tok: math.floor(1e9 * tf * math.log(n / c[tok]))  # noqa: E731
    assert got[1] == (3, (t(2, "a") + t(1, "b")) // 3)
    assert got[2] == (2, (t(1, "a") + t(1, "c")) // 2)
    # common-word doc scores strictly lower than the rare-token doc
    assert got[1][1] < got[2][1]
