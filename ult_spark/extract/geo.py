"""Native (JVM) geotag extraction — E2's hot-path twin (SURVEY §2.2).

Same pinned grammar + priority order as the pandas pipeline in
``extract.text`` (geo.position meta > ICBM meta > geo: URI > @lat,lon), but
expressed as ``regexp_extract`` + ``coalesce`` Columns: whole-stage codegen,
zero Python workers. Numeric parsing (``cast('double')``) and Java/Python
regex semantics agree for these patterns (verified by parity tests against
the pandas extractor over the full synthetic generator distribution).

Why both exist: the flagship pipeline's only remaining Python stage was the
geotag UDF; measured on this box, any chained Python stage costs a second
worker set (oversubscription) and caps scaling. The pandas version remains
the reference implementation and the fallback for payloads where pattern
logic outgrows Java regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = r"(-?\d+(?:\.\d+)?)"
# pinned grammar — keep in sync with extract/text.py make_text_pipeline()
_PATTERNS = [
    r'(?i)<meta\s+name="geo\.position"\s+content="\s*' + _NUM + r"\s*;\s*" + _NUM + r'\s*"',
    r'(?i)<meta\s+name="ICBM"\s+content="\s*' + _NUM + r"\s*,\s*" + _NUM + r'\s*"',
    r"geo:" + _NUM + r"," + _NUM,
    r"@" + _NUM + r"," + _NUM,
]


def geotag_native(html: Column | str) -> tuple[Column, Column]:
    """(lat, lon) Columns from an html binary/string column; NULL = no tag.

    One big-string regex pass per pattern (group 0), then groups are parsed
    from the ~30-char match — halves the scan work vs extracting each group
    from the full document (GC/allocation pressure was the measured
    bottleneck at 32 cores)."""
    html = F.col(html) if isinstance(html, str) else html
    s = F.decode(html, "UTF-8")
    lats, lons = [], []
    for p in _PATTERNS:
        m = F.regexp_extract(s, p, 0)
        hit = m != ""
        lats.append(F.when(hit, F.regexp_extract(m, p, 1).cast("double")))
        lons.append(F.when(hit, F.regexp_extract(m, p, 2).cast("double")))
    # priority is per-pattern pair: if pattern k matched lat, its lon is the
    # same pattern's group 2 (both groups match or neither — same regex)
    return F.coalesce(*lats), F.coalesce(*lons)
