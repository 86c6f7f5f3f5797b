"""URL canonicalization (E-family, r4; hardened r5) — the dedup-key
normalizer a web crawl pipeline runs before exact dedup: distinct raw
spellings of the same resource (scheme case, ``www.`` prefix, default
ports, trailing slash, fragments, tracking parameters) must collapse to
ONE canonical form, or URL-keyed dedup under-merges.

All native Column expressions (regexp_extract / lower / substring /
array HOFs — no backreference replacements, which Java regex and RE2
spell differently), so the same text runs in DuckDB for the oracle.

Rules (pinned; adversarial forms pinned in tests/test_extract.py):
- scheme lowercase; HOST lowercase — userinfo (``user:PASS@``) is kept
  VERBATIM (passwords are case-sensitive; r4 lowercased it, fixed r5);
- a leading ``www.`` on the host is dropped;
- an explicit default port is dropped ONLY for its own scheme —
  ``:80`` when the scheme is http, ``:443`` when it is https
  (r4 stripped both unconditionally, merging http://h:443 with
  http://h — distinct resources; fixed r5);
- IPv6 literal hosts (``[2001:db8::1]``) are lowercased like any host
  (RFC 5952 canonical form is lowercase); the port regexes cannot fire
  inside the brackets because a bare literal always ends in ``]``;
- the fragment (``#...``) is dropped (never sent to the server);
- a trailing ``/`` on a non-root path is dropped; an empty path becomes
  ``/``;
- percent-encoding is preserved verbatim (``%2F`` vs ``%2f`` stay
  distinct — decoding case-folds into un-reserved characters and is NOT
  a safe canonicalization);
- the query string is preserved verbatim by default (reordering
  parameters changes semantics for some endpoints — out of scope for a
  safe canonicalizer). OPT-IN ``strip_tracking=True`` drops the
  click-tracking parameters that make every crawl of the same page a
  distinct URL: ``utm_*``, ``gclid``, ``fbclid``, ``ref`` (name match
  before ``=`` or bare), remaining params re-joined with ``&`` in their
  original order, the ``?`` dropped when nothing survives.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
# a query parameter is tracking iff its NAME (before '=', or the whole
# token when bare) matches one of these — anchored, so `referrer=` stays
_TRACKING_RE = "^(utm_[^=&]*|gclid|fbclid|ref)(=|$)"


def canonical_url(url: Column | str, strip_tracking: bool = False) -> Column:
    """Canonical form of ``url`` under the pinned rules above."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, "#.*$", "")  # fragment
    auth = F.regexp_extract(rest, "^([^/?#]+)", 1)
    # userinfo up to the FIRST '@' (an unencoded '@' later in the
    # authority is malformed per RFC 3986) — kept verbatim
    userinfo = F.regexp_extract(auth, "^([^@]*@)", 1)
    host = F.lower(F.regexp_replace(auth, "^[^@]*@", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(rest, "^[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # strip ONE trailing slash on non-root paths (no regex backrefs —
    # dialect-portable substring arithmetic instead)
    path = F.when(
        (F.length(path) > 1) & F.endswith(path, F.lit("/")),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(rest, r"(\?[^#]*)", 1)
    if strip_tracking:
        kept = F.filter(
            F.split(F.regexp_replace(query, r"^\?", ""), "&"),
            lambda p: (~p.rlike(_TRACKING_RE)) & (p != ""),
        )
        joined = F.array_join(kept, "&")
        query = F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined))
    return F.concat(scheme, F.lit("://"), userinfo, host, path, query)


def canonical_url_sql(url_expr: str, strip_tracking: bool = False) -> str:
    """DuckDB mirror of :func:`canonical_url` — same regexes, same
    substring arithmetic, over ``url_expr``."""
    u = url_expr
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace(regexp_replace({u}, '{_SCHEME_RE}', ''), '#.*$', '')"
    auth = f"regexp_extract({rest}, '^([^/?#]+)', 1)"
    userinfo = f"regexp_extract({auth}, '^([^@]*@)', 1)"
    host0 = f"lower(regexp_replace({auth}, '^[^@]*@', ''))"
    host1 = f"regexp_replace({host0}, '^www\\.', '')"
    host = (
        f"(CASE WHEN {scheme} = 'http' THEN regexp_replace({host1}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host1}, ':443$', '') "
        f"ELSE {host1} END)"
    )
    path0 = f"regexp_extract({rest}, '^[^/?#]+([^?#]*)', 1)"
    path1 = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    path = (
        f"(CASE WHEN length({path1}) > 1 AND {path1} LIKE '%/' "
        f"THEN substr({path1}, 1, length({path1}) - 1) ELSE {path1} END)"
    )
    query = f"regexp_extract({rest}, '(\\?[^#]*)', 1)"
    if strip_tracking:
        # coalesce: DuckDB array_to_string returns NULL on an empty list
        # (and concat would then silently SKIP the NULL, yielding '?')
        joined = (
            f"coalesce(array_to_string(list_filter(str_split(regexp_replace({query}, "
            f"'^\\?', ''), '&'), p -> NOT regexp_matches(p, '{_TRACKING_RE}') "
            f"AND p <> ''), '&'), '')"
        )
        query = (
            f"(CASE WHEN {joined} = '' THEN '' ELSE concat('?', {joined}) END)"
        )
    return f"concat({scheme}, '://', {userinfo}, {host}, {path}, {query})"


# ---------------------------------------------------------------------------
# Longest-prefix-match URL policy (r6) — the robots/path-rule primitive: a
# crawl or curation pipeline matches every URL against a policy table of
# path prefixes and takes the MOST SPECIFIC (longest) matching rule.

def prefix_policy_match(
    urls: "DataFrame",
    rules: "DataFrame",
    id_col: str = "event_id",
    url_col: str = "url",
    default_rule_id: int = -1,
    default_allow: int = 1,
):
    """urls + (rule_id, allow) of each URL's longest matching prefix rule.

    ``rules`` is (prefix string, rule_id long, allow int). The match is
    string-prefix (robots.txt path-rule semantics, longest-match wins;
    ties broken by min rule_id — pinned for determinism); unmatched URLs
    get the defaults.

    Scale shape: the distinct PREFIX LENGTHS are collected to a literal
    array (driver-bound by construction — a policy table has dozens of
    distinct depths; the h3interop resolution-collect precedent), each
    URL explodes into one substring per length, and candidates come from
    ONE broadcast hash equi-join on the prefix string (string equality
    implies equal length, so no residual length filter is needed) —
    never URL × rules. The longest match is a per-URL window argmax."""
    from pyspark.sql.window import Window

    lens = sorted(
        r[0] for r in rules.select(F.length("prefix")).distinct().collect()
    )
    cand = (
        urls.select(id_col, url_col)
        .withColumn("_l", F.explode(F.array(*[F.lit(x) for x in lens])))
        .select(
            id_col, F.col(url_col).substr(F.lit(1), F.col("_l")).alias("_pfx")
        )
        .join(
            F.broadcast(
                rules.select(
                    F.col("prefix").alias("_pfx"),
                    F.col("rule_id").cast("long").alias("rule_id"),
                    F.col("allow").cast("long").alias("allow"),
                    F.length("prefix").alias("_rl"),
                )
            ),
            "_pfx",
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_rl"), F.asc("rule_id"))
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "rule_id", "allow")
    )
    return urls.join(best, id_col, "left").select(
        urls["*"],
        F.coalesce("rule_id", F.lit(default_rule_id).cast("long")).alias("rule_id"),
        F.coalesce("allow", F.lit(default_allow).cast("long")).alias("allow"),
    )
