"""URL canonicalization — pure Catalyst expressions for webtext
pipelines (Common-Crawl-style url-level dedup / grouping).

The reference normalizes field VALUES (lower + strip, normalize.go:
9-15); this is the same idea applied to the url column of the
north-rule input table (url, warc_ts, html, text, lang): two fetches
of one page must canonicalize to one key even when the crawler
recorded scheme-case / default-port / param-order / tracking-param /
fragment variants.

Everything compiles to built-in string expressions (regexp_extract /
split / filter / array_sort) — no parse_url, so the DuckDB oracle can
implement the identical grammar with its own regexp/list functions
and the driver hash-compares the two implementations.

Canonical form:
- scheme and host lowercased
- default ports stripped (http:80, https:443); other ports kept
- empty path -> '/'
- query params: drop tracking params (utm_*, gclid, fbclid, ref),
  drop empties, sort byte-lexicographically, rejoin with '&'
- fragment dropped
- leading 'www.' kept (site identity is ambiguous without it; callers
  wanting site-level grouping use host_col + strip_www=True)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params dropped during canonicalization (name before '=')
TRACKING_PARAM_RE = "^(utm_[a-z0-9_]*|gclid|fbclid|ref)="

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
# after scheme://, host:port runs to the first of / ? #
_HOSTPORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# lazy [^#]*? prefix anchors the '?' to the PRE-fragment substring: a
# '?' appearing only after '#' (SPA routes like host/#/route?tab=1) is
# fragment content, not a query, and must not leak into the canonical
# key
_QUERY_RE = "^[^#]*?\\?([^#]*)"


def _c(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def scheme_col(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(url), _SCHEME_RE, 1))


def host_col(url: Column | str, strip_www: bool = False) -> Column:
    """Lowercased host without port; '' for unparseable urls."""
    hostport = F.lower(F.regexp_extract(_c(url), _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, ":[0-9]*$", "")
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    return host


def port_col(url: Column | str) -> Column:
    """Explicit port string ('' when absent)."""
    hostport = F.regexp_extract(_c(url), _HOSTPORT_RE, 1)
    return F.regexp_extract(hostport, ":([0-9]+)$", 1)


def path_col(url: Column | str) -> Column:
    p = F.regexp_extract(_c(url), _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def canonical_query_col(url: Column | str) -> Column:
    """Sorted '&'-joined params with tracking params and empties
    dropped; '' when nothing survives."""
    q = F.regexp_extract(_c(url), _QUERY_RE, 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (F.length(p) > 0)
        & (F.regexp_extract(p, TRACKING_PARAM_RE, 0) == ""),
    )
    return F.array_join(F.array_sort(params), "&")


def url_normalize_col(url: Column | str) -> Column:
    """Canonical url string; urls with no scheme:// prefix pass
    through lowercase-trimmed (best-effort key, never NULL)."""
    u = F.trim(_c(url))
    scheme = scheme_col(u)
    host = host_col(u)
    port = port_col(u)
    default_port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    q = canonical_query_col(u)
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        default_port,
        path_col(u),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(rebuilt)
