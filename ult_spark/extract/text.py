"""Pinned text + geotag extraction (SURVEY.md §2.2 E1/E2).

E1 — the byte-identical invariant (BASELINE.json input_hint: "per-row
invariant vs the reference: byte-identical extracted text per url"). The
pipeline below is PINNED; golden fixtures freeze its output — do not change
any step, order, or regex after v0:

1. decode bytes as UTF-8 (errors="replace")
2. remove <script…</script> and <style…</style> blocks (case-insens, DOTALL)
3. remove <!--…--> comments
4. replace every remaining <[^>]*> tag with a single space
5. decode entities &amp; &lt; &gt; &quot; &#39; (that order), then numeric
   &#N; / &#xN;
6. collapse [ \\t\\r\\n]+ → one space
7. strip

E2 — geotag grammar, first match wins, pinned order: geo.position meta,
ICBM meta, geo:LAT,LON URI, @LAT,LON. Parsed from the decoded html.

All steps are vectorized pandas Series.str ops — zero per-row Python.

Worker-shipping note: UDFs are built by factories whose inner functions are
closure-local, so cloudpickle serializes them BY VALUE and executors don't
need the package on PYTHONPATH (see ops/pip.py for the same pattern).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def make_text_pipeline():
    """Build (extract_series, geotag_frame) as self-contained closures."""
    import re

    import numpy as np
    import pandas as _pd

    script_re = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
    style_re = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
    comment_re = re.compile(r"<!--.*?-->", re.DOTALL)
    tag_re = re.compile(r"<[^>]*>")
    ws_re = re.compile(r"[ \t\r\n]+")
    num_dec_re = re.compile(r"&#(\d+);")
    num_hex_re = re.compile(r"&#x([0-9a-fA-F]+);")

    def _decode_numeric(s: str) -> str:
        s = num_dec_re.sub(lambda m: chr(int(m.group(1))), s)
        return num_hex_re.sub(lambda m: chr(int(m.group(1), 16)), s)

    def extract_series(html: _pd.Series) -> _pd.Series:
        """bytes/str html Series → extracted text Series (pinned steps 1-7)."""
        if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
            s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
        else:
            s = html.astype(object)
        s = s.str.replace(script_re, " ", regex=True)
        s = s.str.replace(style_re, " ", regex=True)
        s = s.str.replace(comment_re, " ", regex=True)
        s = s.str.replace(tag_re, " ", regex=True)
        for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
            s = s.str.replace(ent, ch, regex=False)
        s = s.map(lambda t: _decode_numeric(t) if t is not None else None)
        s = s.str.replace(ws_re, " ", regex=True)
        return s.str.strip()

    NUM = r"(-?\d+(?:\.\d+)?)"
    patterns = [
        re.compile(r'<meta\s+name="geo\.position"\s+content="\s*' + NUM + r"\s*;\s*" + NUM + r'\s*"', re.IGNORECASE),
        re.compile(r'<meta\s+name="ICBM"\s+content="\s*' + NUM + r"\s*,\s*" + NUM + r'\s*"', re.IGNORECASE),
        re.compile(r"geo:" + NUM + r"," + NUM),
        re.compile(r"@" + NUM + r"," + NUM),
    ]

    def geotag_frame(html: _pd.Series) -> _pd.DataFrame:
        """decoded-html Series → DataFrame(lat, lon) with NaN for no match."""
        if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
            s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
        else:
            s = html.astype(object)
        lat = _pd.Series(np.nan, index=s.index, dtype="float64")
        lon = _pd.Series(np.nan, index=s.index, dtype="float64")
        for pat in patterns:
            todo = lat.isna()
            if not todo.any():
                break
            ext = s[todo].str.extract(pat)
            got = ext[0].notna()
            idx = ext.index[got]
            lat.loc[idx] = ext.loc[idx, 0].astype("float64")
            lon.loc[idx] = ext.loc[idx, 1].astype("float64")
        return _pd.DataFrame({"lat": lat, "lon": lon})

    return extract_series, geotag_frame


# driver-side singletons (fixtures, datagen)
EXTRACT, GEOTAG = make_text_pipeline()


def extract_text_udf():
    """Scalar pandas UDF: html binary → extracted text (self-contained)."""
    ext, _ = make_text_pipeline()

    @F.pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return ext(html)

    return _extract


def geotag_udf():
    """Scalar pandas UDF: html binary → struct<lat:double, lon:double>."""
    _, geo = make_text_pipeline()

    @F.pandas_udf("lat double, lon double")
    def _geotag(html: pd.Series) -> pd.DataFrame:
        return geo(html)

    return _geotag
