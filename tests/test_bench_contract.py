"""The bench driver contract (round-3 postmortem): the ONE stdout JSON
line must stay under the driver's ~2,000-byte tail capture no matter how
many queries the bench list grows, with full detail in the sidecar."""

from __future__ import annotations

import json

import bench


def test_emit_line_fits_capture_window(tmp_path):
    sidecar = tmp_path / "last_run.json"
    headline = {
        "metric": "pages_pipeline_wall_sec_local32",
        "value": 4.5,
        "unit": "sec",
        # 200 queries — far past today's list; the guard must still hold
        "queries": {f"query_name_{i:03d}": round(0.123 + i, 3) for i in range(200)},
        "scaling_efficiency": 0.9,
    }
    detail = dict(headline)
    detail["query_out_rows"] = {k: 12345 for k in headline["queries"]}
    line = bench.emit(headline, detail, sidecar)
    assert len(line) <= 1900
    parsed = json.loads(line)  # the driver must be able to parse it
    assert parsed["metric"] == "pages_pipeline_wall_sec_local32"
    assert parsed["scaling_efficiency"] == 0.9
    # full detail survives on disk even when the line was trimmed
    disk = json.loads(sidecar.read_text())
    assert len(disk["queries"]) == 200 and "query_out_rows" in disk


def test_emit_keeps_queries_inline_at_current_size(tmp_path):
    """Today's real query list fits inline — the pointer fallback is the
    emergency path, not the normal one."""
    from bench import BENCH_QUERIES

    headline = {
        "metric": "pages_pipeline_wall_sec_local32",
        "value": 4.5,
        "unit": "sec",
        "queries": {q: 12.345 for q in BENCH_QUERIES},
        "sf": 0.1,
        "pages_rows": 4_000_000,
        "pair_rows": 2_000_000,
        "pages_per_sec_full": 893717.1,
        "pages_per_sec_n4": 353861.2,
        "pages_per_sec_n": 103497.8,
        "cores": [2, 8, 32],
        "scaling_efficiency": 0.915,
        "scaling_efficiency_to_full_box": 0.638,
        "prev_bench": "BENCH_r03.json (unreadable)",
    }
    line = bench.emit(headline, dict(headline), tmp_path / "s.json")
    assert len(line) <= 1900
    assert isinstance(json.loads(line)["queries"], dict)


def test_emit_archives_one_sidecar_per_run(tmp_path, monkeypatch):
    """Round-4 verdict #2: driver/builder/judge runs must stop clobbering
    each other's detail — every emit archives BENCH/run_<tag>.json next to
    the mutable last_run.json."""
    monkeypatch.setenv("SPARK_GRAFT_RUN_TAG", "judge r5/a")
    headline = {"metric": "m", "value": 1.0, "queries": {"q": 1.0}}
    bench.emit(headline, dict(headline), tmp_path / "last_run.json")
    archived = list(tmp_path.glob("run_*.json"))
    assert [p.name for p in archived] == ["run_judge_r5_a.json"]  # sanitized tag
    assert json.loads(archived[0].read_text()) == headline

    # no tag: a unique time+pid tag — two runs never collide
    monkeypatch.delenv("SPARK_GRAFT_RUN_TAG")
    bench.emit(headline, dict(headline), tmp_path / "last_run.json")
    assert len(list(tmp_path.glob("run_*.json"))) == 2


def test_pair_should_extend_matrix():
    """Auto-extend fires ONLY on the asymmetric-contamination signature:
    sub-0.8 min-ratio AND >15% spread on a leg (round-4 verdict #1b)."""
    # clean 0.9-efficiency pair (2→8 cores): walls 38 / 10.6, tight spread
    assert not bench.pair_should_extend([38.0, 38.2], [10.6, 10.7], 4.0)
    # contaminated n4 leg: one clean-ish wall still leaves eff < 0.8 and
    # a wide n4 spread → extend
    assert bench.pair_should_extend([38.0, 38.2], [13.0, 16.0], 4.0)
    # genuinely sub-0.8 engine: low spread on both legs → do NOT extend
    # (extending cannot flip a tight reading)
    assert not bench.pair_should_extend([38.0, 38.3], [13.0, 13.2], 4.0)
    # low ratio but the N leg is the spread-y one (deflated-looking n
    # min would RAISE eff; inflated n4 lowers it) → still extend: one
    # wide leg + sub-0.8 means some leg never ran clean
    assert bench.pair_should_extend([30.0, 38.0], [10.0, 10.1], 4.0)


def test_settle_returns_immediately_when_idle(monkeypatch):
    monkeypatch.setattr(bench, "loadavg_1m", lambda: 0.2)
    t0 = __import__("time").time()
    la = bench.settle(threshold=1.0, max_wait=30.0)
    assert la == 0.2 and __import__("time").time() - t0 < 1.0


def test_settle_bounded_wait(monkeypatch):
    """A genuinely busy box must not block the bench forever."""
    monkeypatch.setattr(bench, "loadavg_1m", lambda: 9.9)
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    la = bench.settle(threshold=1.0, max_wait=40.0, step=10.0)
    assert la == 9.9 and sum(slept) == 40.0


def test_materialize_executes_pruned_branches(spark):
    """r6: count() lets Catalyst eliminate a left join whose right side
    is an aggregate with distinct keys — the bug that made
    decontam_fuzzy's bench wall measure a bare scan. materialize() must
    return the same row count while executing the full plan."""
    from pyspark.sql import functions as F

    left = spark.range(100).select(F.col("id").alias("k"))
    right = (
        spark.range(50)
        .select((F.col("id") * 2).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = left.join(right, "k", "left")
    # the premise: count() prunes the join entirely
    pruned = joined.groupBy().count()._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in pruned
    assert bench.materialize(left.join(right, "k", "left")) == 100
