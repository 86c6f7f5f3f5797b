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
