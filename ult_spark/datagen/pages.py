"""Synthetic Common-Crawl-style pages table (FIXTURES.md B1 — pinned).

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Every value is a pure function of
``doc_i`` (integer mixing, no RNG state), so generation is identical under
any partitioning and any engine — the generator runs distributed via
mapInPandas with a self-contained closure.

Geotag form cycles doc_i % 4 across the four pinned grammars; 10% of rows
(doc_i % 10 == 9) carry no geotag; 20% (doc_i % 5 == 4) snap to one of 3 hot
cities (±0.05° deterministic jitter) to create the hot-cell skew that
exercises salting (BASELINE.json: "explicit salting for hot-cell skew").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

HOT_CITIES = ((40.7128, -74.0060), (51.5074, -0.1278), (35.6762, 139.6503))

VOCAB = (
    "data spark engine tile cell index query page crawl web atlas river "
    "mountain city harbor market census climate transit energy forest "
    "signal vector raster polygon point join group window stream batch "
    "shuffle salt skew broadcast lineage snapshot commit resume metric"
).split()


def make_generator():
    """Self-contained closure: np.ndarray of doc ids → pandas DataFrame."""
    import numpy as np
    import pandas as _pd

    from ult_spark.extract.text import make_text_pipeline  # driver-only import

    extract, _ = make_text_pipeline()
    vocab = list(VOCAB)
    cycle_words = (vocab * 8)[:256]
    wcycle = " ".join(cycle_words)  # long word cycle; bodies are slices of it
    cities = HOT_CITIES

    def _mix(i: np.ndarray, salt: int) -> np.ndarray:
        # splitmix64-style integer mixing — deterministic, vectorized
        # (scalar product pre-reduced mod 2^64 to keep numpy warning-free)
        z = i.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def gen(ids: np.ndarray) -> _pd.DataFrame:
        i = ids.astype(np.int64)
        # --- coordinates (pinned formulas)
        lat = -60.0 + (i * 9973 % 120000) / 1000.0
        lon = -170.0 + (i * 31337 % 340000) / 1000.0
        hot = (i % 5) == 4
        if hot.any():
            ci = (i[hot] % 3)
            jlat = ((_j := _mix(i[hot], 7)) % np.uint64(100)).astype(np.float64) / 1000.0 - 0.05
            jlon = (_mix(i[hot], 11) % np.uint64(100)).astype(np.float64) / 1000.0 - 0.05
            lat[hot] = np.asarray([cities[c][0] for c in ci]) + jlat
            lon[hot] = np.asarray([cities[c][1] for c in ci]) + jlon
        lat = np.round(lat, 6)
        lon = np.round(lon, 6)
        has_geo = (i % 10) != 9
        form = i % 4

        # --- body text: deterministic slice of the word cycle
        off = (_mix(i, 3) % np.uint64(len(wcycle) // 2)).astype(np.int64)
        nw = 20 + (_mix(i, 5) % np.uint64(181)).astype(np.int64)  # 20..200 words
        approx_len = nw * 6
        bodies = [wcycle[o : o + L] for o, L in zip(off.tolist(), approx_len.tolist())]

        head = []
        for k in range(len(i)):
            di, la, lo = int(i[k]), lat[k], lon[k]
            if not has_geo[k]:
                tag = ""
            elif form[k] == 0:
                tag = f'<meta name="geo.position" content="{la};{lo}">'
            elif form[k] == 1:
                tag = f'<meta name="ICBM" content="{la}, {lo}">'
            elif form[k] == 2:
                tag = f"<p>find us at geo:{la},{lo} today</p>"
            else:
                tag = f"<p>pinned @{la},{lo} on the map</p>"
            intag = tag if form[k] < 2 and has_geo[k] else ""
            body_tag = tag if form[k] >= 2 and has_geo[k] else ""
            head.append(
                f"<html><head><title>Page {di}</title>{intag}"
                f"<style>p {{margin:0}}</style></head><body>"
                f"<script>var x={di};/* junk {di} */</script>"
                f"<!-- comment {di} -->"
                f"{body_tag}<p>{bodies[k]}</p>"
                f"<p><b>{vocab[di % len(vocab)]}</b> &amp; &lt;tag&gt; &quot;q&quot; &#39; &#8364;</p>"
                f"</body></html>"
            )
        html = _pd.Series(head)
        text = extract(html)
        return _pd.DataFrame(
            {
                "url": [f"https://site{d % 1000}.example/p/{d}" for d in i.tolist()],
                "warc_ts": _pd.Timestamp("2024-01-01T00:00:00") + _pd.to_timedelta(i * 7, unit="s"),
                "html": html.str.encode("utf-8"),
                "text": text,
                "lang": [("en", "es", "zh", "de", "fr")[d % 5] for d in i.tolist()],
            }
        )

    return gen


def pages_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of ``n`` rows."""
    gen = make_generator()

    def batches(it):
        for pdf in it:
            yield gen(pdf["id"].to_numpy())

    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)
    return rng.mapInPandas(batches, PAGES_SCHEMA)


def pages_pdf(n: int, start: int = 0):
    """Driver-side generation (fixtures / tiny tests)."""
    import numpy as np

    return make_generator()(np.arange(start, start + n, dtype=np.int64))
