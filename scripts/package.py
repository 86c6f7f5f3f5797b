"""Build ult_spark.zip for ``spark-submit --py-files`` (BASELINE.json
north_star: "runs via spark-submit --py-files").

Usage: python scripts/package.py [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str | Path = REPO / "ult_spark.zip") -> Path:
    out = Path(out)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO / "ult_spark").rglob("*")):
            if f.suffix in (".py", ".json") and "__pycache__" not in f.parts:
                z.write(f, f.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = build(sys.argv[1]) if len(sys.argv) > 1 else build()
    print(dest)
