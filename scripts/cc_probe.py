"""Scratch probe (r8 second pass): isolate dup_clusters' connected-components
loop and measure driver-synchronization variants on a PRE-MATERIALIZED pair
frame (so the minhash pipeline cost is excluded).

Variants:
  cur    — shipped loop: one _cc_round per localCheckpoint, AQE on.
  fused  — rounds processed in PAIRS per localCheckpoint (observe counts
           round-2 changes only; fixpoint semantics identical because a
           round is a pure function of its input).
  noaqe  — shipped loop shape but spark.sql.adaptive.enabled=false inside
           the loop (collapses the per-exchange AQE job cascade; tiny
           frames, shuffle work negligible either way).
  nofused— noaqe + fused.

Writes BENCH/extra_cc_probe.json. Interleaved A/B/A/B within one session so
host weather cancels.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import _session, materialize  # noqa: E402
from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ult_spark.io.testdata import load  # noqa: E402
from ult_spark.ops import textops  # noqa: E402


def cc_fused(vertices, pairs, max_rounds=16, stride=2, aqe=None):
    spark = vertices.sparkSession
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("_e")
    ).select("_e.a", "_e.b")
    edges = edges.persist()
    labels = vertices.select("doc_id", F.col("doc_id").alias("label"))
    done = 0
    rounds_run = 0
    while True:
        ob = Observation()
        step = labels
        for _ in range(stride - 1):
            step = textops._cc_round(step, edges)
        stepped = textops._cc_round(step, edges, track=True).observe(
            ob, F.sum((F.col("label") != F.col("_old")).cast("long")).alias("changed")
        )
        labels = textops._stats_barrier(
            stepped.select("doc_id", "label").localCheckpoint()
        )
        done += stride
        rounds_run += 1
        changed = ob.get["changed"] or 0
        if not changed:
            break
        if done >= max_rounds:
            edges.unpersist()
            raise RuntimeError("no convergence")
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster_id")), rounds_run


def run_variant(name, spark, vertices, pairs):
    aqe_off = name in ("noaqe", "nofused")
    stride = 2 if name in ("fused", "nofused") else 1
    old = spark.conf.get("spark.sql.adaptive.enabled")
    t0 = time.monotonic()
    try:
        if aqe_off:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        if stride == 1:
            out = textops.connected_components(
                vertices, pairs, assume_contained=True
            )
            trips = None
        else:
            out, trips = cc_fused(vertices, pairs, stride=stride)
        n = materialize(out)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    return round(time.monotonic() - t0, 3), n, trips


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/sfwork/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = _session(32)
    df = load(spark, sf, "documents")
    vertices = df.select("doc_id")
    pairs = (
        textops.minhash_lsh_dedup(df, 0.2).select("a", "b").localCheckpoint()
    )
    print(f"pairs materialized: {pairs.count()}", flush=True)
    # warm one pass
    run_variant("cur", spark, vertices, pairs)
    out: dict[str, list] = {}
    order = ["cur", "fused", "noaqe", "nofused"]
    for rep in range(reps):
        for name in order:
            spark.sparkContext.setJobDescription(f"cc:{name}:{rep}")
            w, n, trips = run_variant(name, spark, vertices, pairs)
            out.setdefault(name, []).append(w)
            print(f"rep{rep} {name}: {w}s rows={n} trips={trips}", flush=True)
    summary = {k: {"walls": v, "min": min(v)} for k, v in out.items()}
    Path(REPO / "BENCH/extra_cc_probe.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: v["min"] for k, v in summary.items()}))
    # value parity at sf0.01: fused vs shipped
    small = load(spark, "/root/testdata/sf0.01", "documents")
    sv = small.select("doc_id")
    sp = textops.minhash_lsh_dedup(small, 0.2).select("a", "b").localCheckpoint()
    a = textops.connected_components(sv, sp, assume_contained=True)
    b, _ = cc_fused(sv, sp)
    print("parity:", a.exceptAll(b).count(), b.exceptAll(a).count())


if __name__ == "__main__":
    main()
