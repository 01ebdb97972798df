"""URL canonicalization — the first stage of every web-corpus
pipeline: normalize scheme/host/port/path, strip tracking parameters,
sort the survivors, drop fragments, so that the same resource fetched
through different messy links groups under ONE canonical key.

Pure built-in string expressions (regexp_extract / regexp_replace /
split / filter / array_sort / array_join), so canonicalization is
scan-local — no UDF, no shuffle — and the DuckDB oracle evaluates the
identical steps (each helper has a SQL twin below, the
``functions.text.h60_sql`` discipline). Patterns stay in the common
RE2 ∩ java.util.regex subset.

Rules (the widely used subset of RFC 3986 §6 plus tracker stripping):

1. drop the fragment (``#...``);
2. lowercase the scheme and the host;
3. strip a leading ``www.`` from the host;
4. drop the port when it is the scheme default (``https``:443,
   ``http``:80); keep any explicit non-default port;
5. collapse trailing ``/`` on the path; an empty path canonicalizes
   to ``/``;
6. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_cid``, ``mc_eid``, ``ref``) and empty fragments
   of the query string;
7. sort the surviving ``k=v`` parameters byte-wise (binary UTF-8 —
   Spark ``array_sort`` and DuckDB ``list_sort`` agree on ASCII) and
   reassemble; no surviving parameters → no ``?``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# k=v prefixes that identify tracking parameters (anchored at the
# start of one &-separated fragment).
TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules — one scan-local
    string expression, no UDF.

    Precondition: absolute URLs (``scheme://...``). Inputs WITHOUT a
    ``://`` scheme separator pass through UNCHANGED (guard below) —
    they never produce the malformed ``'://...'`` a blind rebuild
    would. Hosts carrying userinfo (``user@host``) or IPv6 bracket
    syntax (``[::1]:8080``) are outside the supported subset: the
    port/host splits treat the whole authority as host[:port], so such
    URLs canonicalize with the authority kept verbatim (lowercased)
    rather than mis-parsing silently — acceptable for web-corpus http(s)
    URLs, documented here for anyone pointing this at raw crawl data."""
    nofrag = F.substring_index(url, "#", 1)
    base = F.substring_index(nofrag, "?", 1)
    qs = F.regexp_extract(nofrag, r"\?(.*)$", 1)  # '' when no query
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    hostport = F.regexp_extract(base, _HOSTPORT_RE, 1)
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)  # '' when none
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, ":[0-9]+$", "")),
        r"^www\.",
        "",
    )
    keep_port = (port != "") & ~(
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    path_stripped = F.regexp_replace(
        F.regexp_extract(base, _PATH_RE, 1), "/+$", ""
    )
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
    # No absolute-URL scheme → not ours to rebuild; pass through.
    return F.when(url.rlike(_SCHEME_RE), rebuilt).otherwise(url)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` over the SQL expression
    ``expr`` — identical rule order, identical patterns (including the
    pass-through guard for inputs without a ``scheme://``). DuckDB's
    ``regexp_replace`` replaces the FIRST match (Spark replaces all);
    every replace here is anchored, so first == all."""
    nofrag = f"split_part({expr}, '#', 1)"
    base = f"split_part({nofrag}, '?', 1)"
    qs = f"regexp_extract({nofrag}, '\\?(.*)$', 1)"
    scheme = f"lower(regexp_extract({base}, '{_SCHEME_RE}', 1))"
    hostport = f"regexp_extract({base}, '{_HOSTPORT_RE}', 1)"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    host = (
        "regexp_replace(lower(regexp_replace("
        f"{hostport}, ':[0-9]+$', '')), '^www\\.', '')"
    )
    keep_port = (
        f"({port} <> '' AND NOT (({scheme} = 'https' AND {port} = '443')"
        f" OR ({scheme} = 'http' AND {port} = '80')))"
    )
    path_stripped = (
        f"regexp_replace(regexp_extract({base}, '{_PATH_RE}', 1), '/+$', '')"
    )
    path = f"(CASE WHEN {path_stripped} = '' THEN '/' ELSE {path_stripped} END)"
    params = (
        f"list_sort(list_filter(string_split({qs}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}')))"
    )
    rebuilt = (
        f"({scheme} || '://' || {host}"
        f" || (CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END)"
        f" || {path}"
        f" || (CASE WHEN len({params}) > 0"
        f" THEN '?' || array_to_string({params}, '&') ELSE '' END))"
    )
    return (
        f"(CASE WHEN regexp_matches({expr}, '{_SCHEME_RE}')"
        f" THEN {rebuilt} ELSE {expr} END)"
    )
