"""Scale-stress bench for a query FAMILY at a k×-replicated input.

Usage:
  python scripts/make_scale_input.py 10 BENCH/sf10x
  SPARK_GRAFT_RUN_TAG=r6_scale10x_curation \
    python scripts/bench_family_scale.py BENCH/sf10x \
      pack_sequences_b256 session_trips_30m decontam_fuzzy curation_funnel

Protocol mirrors bench.py's pair phase (BENCH/BASELINE.md): the (N, 4N)
legs run INTERLEAVED — rounds of [local[N] all-queries sweep, local[4N]
all-queries sweep] — with min wall per (query, leg) across rounds, so a
neighbor-load episode contaminates both legs of one round rather than one
leg's whole phase, and min-of-k discards it. Efficiency per query =
(thr@4N / thr@N) / (4N/N); the family line is the same ratio on summed
walls. Emits ONE JSON line and archives detail to
BENCH/run_<SPARK_GRAFT_RUN_TAG>.json via bench.emit.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (shares _session, settle, emit)

N = int(os.environ.get("SPARK_GRAFT_N", 2))
N4 = 4 * N
ROUNDS = int(os.environ.get("SPARK_GRAFT_ROUNDS", 3))


def sweep(cores: int, sf_dir: str, names: list[str], warmup: bool) -> dict[str, float]:
    spark = bench._session(cores)
    import __spark_entry__ as E

    qs = E.queries()
    if warmup:  # spawn workers + codegen on the cheapest query once
        bench.materialize(qs[names[0]](spark, sf_dir))
    walls = {}
    for name in names:
        t0 = time.time()
        bench.materialize(qs[name](spark, sf_dir))
        walls[name] = time.time() - t0
    spark.stop()
    return walls


def main() -> None:
    sf_dir = str(Path(sys.argv[1]).resolve())
    names = sys.argv[2:]
    assert names, "usage: bench_family_scale.py <sf_dir> <query> [<query> ...]"
    la0 = bench.settle()
    best_n: dict[str, float] = {}
    best_n4: dict[str, float] = {}
    rounds_n, rounds_n4 = [], []
    for rnd in range(ROUNDS):
        wn = sweep(N, sf_dir, names, warmup=(rnd == 0))
        wn4 = sweep(N4, sf_dir, names, warmup=(rnd == 0))
        rounds_n.append({k: round(v, 3) for k, v in wn.items()})
        rounds_n4.append({k: round(v, 3) for k, v in wn4.items()})
        for k in names:
            best_n[k] = min(best_n.get(k, wn[k]), wn[k])
            best_n4[k] = min(best_n4.get(k, wn4[k]), wn4[k])
    tot_n = sum(best_n.values())
    tot_n4 = sum(best_n4.values())
    eff = (tot_n / tot_n4) / (N4 / N)
    headline = {
        "metric": f"family_scale_wall_sec_local{N4}",
        "value": round(tot_n4, 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "queries": {k: round(v, 3) for k, v in best_n4.items()},
        "queries_n": {k: round(v, 3) for k, v in best_n.items()},
        "cores": [N, N4],
        "scaling_efficiency": round(eff, 3),
        "per_query_efficiency": {
            k: round((best_n[k] / best_n4[k]) / (N4 / N), 3) for k in names
        },
    }
    detail = dict(headline)
    detail["rounds_n"] = rounds_n
    detail["rounds_n4"] = rounds_n4
    detail["loadavg_at_start"] = la0
    detail["loadavg_at_end"] = bench.loadavg_1m()
    print(bench.emit(headline, detail))


if __name__ == "__main__":
    main()
