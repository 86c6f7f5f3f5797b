"""PMI co-occurrence planted fixtures (ops/textops.py pmi_pairs):
pair counts / marginals verified against an independent pure-Python
recompute, vocabulary-cap determinism, and the min-pair floor."""

import math
from itertools import combinations


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_pmi(texts: list[str], top_v: int, min_pair: int):
    sets = [set(t.split()) - {""} for t in texts]
    dfreq: dict[str, int] = {}
    for s in sets:
        for tok in s:
            dfreq[tok] = dfreq.get(tok, 0) + 1
    vocab = set(
        t for t, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    )
    n = len(texts)
    pairs: dict[tuple[str, str], int] = {}
    for s in sets:
        for a, b in combinations(sorted(s & vocab), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {
        (a, b): (c, math.floor(math.log((n * c) / (dfreq[a] * dfreq[b])) * 1000000.0))
        for (a, b), c in pairs.items()
        if c >= min_pair
    }


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog and the cat",
    "fish and chips",
    "the mat was red",
]


def test_pmi_matches_python_recompute(spark):
    from ult_spark.ops.textops import pmi_pairs

    got = {
        (r["tok1"], r["tok2"]): (r["c_ab"], r["pmi_e6"])
        for r in pmi_pairs(_docs(spark, TEXTS), top_v=40, min_pair=2).collect()
    }
    assert got == _py_pmi(TEXTS, 40, 2)
    # cat+the co-occur in 3 of 6 docs; marginals 3 and 4 -> pmi = ln(6*3/12)
    assert got[("cat", "the")] == (3, math.floor(math.log(1.5) * 1e6))


def test_pmi_vocab_cap_is_deterministic(spark):
    from ult_spark.ops.textops import pmi_pairs

    # cap of 3 keeps {the(4 docs), cat(3), and/a/...}: tie at dfreq=2 broken
    # by token ascending -- 'and' wins over 'dog'/'fish'/'mat'/'on'/'sat'
    got = {
        (r["tok1"], r["tok2"]): r["c_ab"]
        for r in pmi_pairs(_docs(spark, TEXTS), top_v=3, min_pair=1).collect()
    }
    assert got == {k: v[0] for k, v in _py_pmi(TEXTS, 3, 1).items()}
    toks = {t for k in got for t in k}
    assert toks <= {"the", "cat", "and"}


def test_pmi_min_pair_floor(spark):
    from ult_spark.ops.textops import pmi_pairs

    out = pmi_pairs(_docs(spark, TEXTS), top_v=40, min_pair=3).collect()
    assert all(r["c_ab"] >= 3 for r in out)
    assert {(r["tok1"], r["tok2"]) for r in out} == {("cat", "the")}
