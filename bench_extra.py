"""Extra per-query benchmark harness for optimization rounds (r8).

NOT the driver contract — bench.py stays the frozen measurement tool. This
file exists so a single query (or subset) can be timed in isolation with
the exact same methodology (same session config, same noop-sink
materialize, min-of-k with plan rebuilt per run) without paying the full
~12-min bench, and so ``.explain("formatted")`` plans can be captured to
plans/r08/ for the before/after evidence.

Usage:
    python bench_extra.py --queries minwise_host_sim,dup_clusters \
        --sf /root/testdata/sf1.0 --runs 2 --tag before \
        [--explain plans/r08 --suffix _before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True, help="comma-separated query names")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default="extra")
    ap.add_argument("--explain", default=None, help="directory to write explain plans into")
    ap.add_argument("--suffix", default="", help="suffix for explain files, e.g. _before")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32)))
    args = ap.parse_args()

    from bench import _session, materialize  # same session config + timing action

    import __spark_entry__ as E

    qs = E.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query: {n}")

    spark = _session(args.cpus)
    out: dict[str, dict] = {}
    for name in names:
        if args.explain:
            import contextlib
            import io

            plan_dir = REPO / args.explain
            plan_dir.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (plan_dir / f"{name}{args.suffix}.txt").write_text(buf.getvalue())
        walls = []
        rows = 0
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            rows = materialize(qs[name](spark, args.sf))
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        if not walls:  # --runs 0: plan capture only
            continue
        out[name] = {"min": min(walls), "walls": walls, "rows": rows}
        print(f"# {name}: min={min(walls)} walls={walls} rows={rows}", file=sys.stderr)
    spark.stop()

    detail = {
        "sf_dir": args.sf,
        "cpus": args.cpus,
        "runs": args.runs,
        "queries": {n: v["min"] for n, v in out.items()},
        "detail": out,
    }
    dst = REPO / "BENCH" / f"extra_{args.tag}.json"
    dst.write_text(json.dumps(detail, indent=1))
    print(json.dumps(detail["queries"]))


if __name__ == "__main__":
    main()
