"""Scratch probe (r8): isolate shingle-construction cost (guide §1.4 noop
isolation). Compares the shipped zip_with-chain shingler against two
fully-native alternatives, on both a derivation-only harness and the real
per-doc minhash aggregate shape. Writes JSON to BENCH/extra_shingle_probe.json.

Variants:
  cur  — shipped: zip_with×2 over shifted slices (interpreted lambda/elem),
         array_distinct, explode.
  hof1 — one transform(sequence) lambda with 3 element_at + concat_ws.
  win  — posexplode + window lead()×2 + concat_ws (100%% codegen exprs);
         repartition(target, doc_id) BEFORE posexplode so the one exchange
         serves the window AND the downstream groupBys (doc_id-clustered);
         per-doc dedup via a (doc_id, shingle) groupBy that needs NO new
         exchange.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import _session, materialize  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ult_spark.io.testdata import fanout, load  # noqa: E402
from ult_spark.ops.textops import N_MINHASH, _h56, shingle_array, tokens_col  # noqa: E402


def sh_cur(spark, sf):
    d = fanout(load(spark, sf, "documents").select("doc_id", "text"))
    return d.select("doc_id", F.explode(shingle_array("text")).alias("shingle"))


def sh_hof1(spark, sf):
    d = fanout(load(spark, sf, "documents").select("doc_id", "text"))
    t = d.select("doc_id", tokens_col("text").alias("t"))
    n = F.size(F.col("t"))
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - F.lit(2))).otherwise(
        F.array().cast("array<int>")
    )
    arr = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + 1),
            F.element_at(F.col("t"), i + 2),
        ),
    )
    return t.select("doc_id", F.explode(F.array_distinct(arr)).alias("shingle"))


def _win_raw(spark, sf):
    """Non-distinct (doc_id, shingle) rows, hash-partitioned by doc_id."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    target = 2 * spark.sparkContext.defaultParallelism
    d = d.repartition(target, "doc_id")
    t = d.select("doc_id", F.posexplode(tokens_col("text")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    s = t.select(
        "doc_id",
        F.col("tok").alias("t0"),
        F.lead("tok", 1).over(w).alias("t1"),
        F.lead("tok", 2).over(w).alias("t2"),
    )
    return s.where(F.col("t2").isNotNull()).select(
        "doc_id", F.concat_ws(" ", "t0", "t1", "t2").alias("shingle")
    )


def sh_win(spark, sf):
    # per-doc distinct via a (doc_id, shingle) groupBy — the child is already
    # hash(doc_id)-partitioned, so this adds NO exchange
    return _win_raw(spark, sf).groupBy("doc_id", "shingle").agg(F.lit(1).alias("_o")).drop("_o")


def agg_of(sh):
    hashed = sh.select(
        "doc_id",
        _h56(F.col("shingle"), 1).alias("h1"),
        _h56(F.col("shingle"), 15).alias("h2"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(F.col("h1") + F.lit(j) * F.col("h2")).alias(f"mh{j}")
            for j in range(N_MINHASH)
        ],
        F.collect_set("h1").alias("shs"),
        F.count("*").alias("sz"),
    )


VARIANTS = {"cur": sh_cur, "hof1": sh_hof1, "win": sh_win}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/sfwork/sf1.0"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = _session(32)
    out: dict[str, dict] = {}
    for name, fn in VARIANTS.items():
        for harness in ("explode", "agg"):
            walls = []
            rows = None
            for _ in range(runs):
                df = fn(spark, sf)
                if harness == "agg":
                    df = agg_of(df)
                spark.sparkContext.setJobDescription(f"probe:{name}:{harness}")
                t0 = time.monotonic()
                rows = materialize(df)
                walls.append(round(time.monotonic() - t0, 3))
            out[f"{name}:{harness}"] = {"walls": walls, "min": min(walls), "rows": rows}
            print(f"{name}:{harness}: min {min(walls)} walls {walls} rows {rows}", flush=True)
    # cross-variant value check on the agg shape at sf0.01 (shs excluded —
    # set column; compared via sorted size separately)
    small = "/root/testdata/sf0.01"
    cols = ["doc_id", *[f"mh{j}" for j in range(N_MINHASH)], "sz"]
    base = agg_of(sh_cur(spark, small)).select(*cols, F.size("shs").alias("nsh"))
    for name in ("hof1", "win"):
        other = agg_of(VARIANTS[name](spark, small)).select(*cols, F.size("shs").alias("nsh"))
        d1 = base.exceptAll(other).count()
        d2 = other.exceptAll(base).count()
        out[f"parity:{name}"] = {"base_minus": d1, "other_minus": d2}
        print(f"parity {name}: {d1} {d2}", flush=True)
    Path(REPO / "BENCH/extra_shingle_probe.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
