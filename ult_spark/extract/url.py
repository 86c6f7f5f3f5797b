"""URL canonicalization (E-family, r4) — the dedup-key normalizer a web
crawl pipeline runs before exact dedup: distinct raw spellings of the same
resource (scheme case, ``www.`` prefix, default ports, trailing slash,
fragments) must collapse to ONE canonical form, or URL-keyed dedup
under-merges.

All native Column expressions (regexp_extract / lower / substring — no
backreference replacements, which Java regex and RE2 spell differently),
so the same text runs in DuckDB for the oracle.

Rules (pinned):
- scheme and host lowercase;
- a leading ``www.`` on the host is dropped;
- explicit default ports ``:80`` / ``:443`` are dropped;
- the fragment (``#...``) is dropped (never sent to the server);
- a trailing ``/`` on a non-root path is dropped; an empty path becomes
  ``/``;
- the query string is preserved verbatim (reordering parameters changes
  semantics for some endpoints — out of scope for a safe canonicalizer).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` under the pinned rules above."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, "#.*$", "")  # fragment
    host = F.lower(F.regexp_extract(rest, "^([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    path = F.regexp_extract(rest, "^[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # strip ONE trailing slash on non-root paths (no regex backrefs —
    # dialect-portable substring arithmetic instead)
    path = F.when(
        (F.length(path) > 1) & F.endswith(path, F.lit("/")),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(rest, r"(\?[^#]*)", 1)
    return F.concat(scheme, F.lit("://"), host, path, query)


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB mirror of :func:`canonical_url` — same regexes, same
    substring arithmetic, over ``url_expr``."""
    u = url_expr
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace(regexp_replace({u}, '{_SCHEME_RE}', ''), '#.*$', '')"
    host0 = f"lower(regexp_extract({rest}, '^([^/?#]+)', 1))"
    host = f"regexp_replace(regexp_replace({host0}, '^www\\.', ''), ':(80|443)$', '')"
    path0 = f"regexp_extract({rest}, '^[^/?#]+([^?#]*)', 1)"
    path1 = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    path = (
        f"(CASE WHEN length({path1}) > 1 AND {path1} LIKE '%/' "
        f"THEN substr({path1}, 1, length({path1}) - 1) ELSE {path1} END)"
    )
    query = f"regexp_extract({rest}, '(\\?[^#]*)', 1)"
    return f"concat({scheme}, '://', {host}, {path}, {query})"
