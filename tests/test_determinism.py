"""Parallelism invariance + frozen golden outputs (SURVEY §5.3/5.4).

The same job at local[1] and local[8] must produce identical
(order-insensitive) results — this is what makes frozen fixtures and the
"exactly match aggregation test fixtures" rule (BASELINE.json) meaningful.
Runs each master in a subprocess (one JVM per master string).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "fixtures", "pipeline_golden.json")

_DRIVER = """
import sys, json, hashlib
sys.path.insert(0, {repo!r})
from ult_spark.session import get_spark
spark = get_spark(master={master!r}, shuffle_partitions={shuffle}, app_name="det")
from ult_spark.datagen.pages import pages_df
from ult_spark.pipeline import pages_pipeline
pages = pages_df(spark, 5000, partitions={parts})
rows = sorted(
    (int(r.level), int(r.cell), int(r.cnt))
    for r in pages_pipeline(pages, levels=(12, 10, 8)).collect()
)
digest = hashlib.sha256(json.dumps(rows).encode()).hexdigest()
print("DIGEST", digest, len(rows))
spark.stop()
"""


def _run(master: str, shuffle: int, parts: int) -> tuple[str, int]:
    code = _DRIVER.format(repo=REPO, master=master, shuffle=shuffle, parts=parts)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=420
    )
    for line in out.stdout.splitlines():
        if line.startswith("DIGEST"):
            _, digest, n = line.split()
            return digest, int(n)
    raise AssertionError(f"no digest in output: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def test_parallelism_invariance_and_golden():
    a = _run("local[1]", 2, 1)
    b = _run("local[8]", 16, 13)
    assert a == b, f"local[1] {a} != local[8] {b}"
    got = {"digest": a[0], "rows": a[1]}
    if not os.path.exists(GOLDEN):  # freeze on first verified generation
        with open(GOLDEN, "w") as f:
            json.dump(got, f)
        pytest.skip("golden pipeline digest frozen on first generation")
    with open(GOLDEN) as f:
        frozen = json.load(f)
    assert got == frozen, "pipeline output drifted from the frozen golden digest"


def test_multimodal_stub_raises():
    from ult_spark.ops.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\\x89PNG")
