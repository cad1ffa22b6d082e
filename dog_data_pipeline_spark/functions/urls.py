"""URL canonicalization as pure column expressions — the first screen
of every web-crawl curation stack (C4/RefinedWeb/FineWeb dedupe and cap
BY canonical URL and registered domain before any content is read).

Everything here is regex/string Catalyst expressions — codegen-
compiled, engine-portable (the DuckDB oracles replay the identical
regexes), no ``parse_url`` (whose JVM semantics have no cross-engine
analog for malformed inputs). The grammar is RFC-3986-lite:

    scheme://host[:port][/path][?query][#fragment]

Canonicalization (each step is standard practice, e.g. the
RFC 3986 §6 normalizations plus the tracking-parameter strip every
crawl pipeline applies):

- scheme and host lowercased (path/query stay case-sensitive)
- default ports dropped (``:80`` for http, ``:443`` for https)
- fragment dropped (never sent to the server)
- tracking query parameters removed (``utm_*``, ``fbclid``,
  ``gclid``, ``ref``), remaining params kept IN ORDER (full
  param sorting changes semantics on duplicate keys; order-preserving
  filtering is the conservative choice)
- empty path normalized to ``/``

At 100 TB all of this is map-only whole-stage-codegen work; the
per-domain rollups downstream (``source_cap_sample``,
``quality_quota_sample``) shuffle on the registered domain this module
extracts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multi-label public suffixes the registered-domain heuristic knows
# about. A production deployment swaps in the full Mozilla Public
# Suffix List (static ~15k entries — still a broadcast-trivial set);
# the heuristic's shape (match the LONGEST known suffix, keep one more
# label) is exactly the PSL algorithm.
PUBLIC_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.ar", "com.tr", "github.io",
    "blogspot.com", "s3.amazonaws.com",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://.*$"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*).*$"
_PORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*:([0-9]+).*$"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*).*$"
_QUERY_RE = r"^[^?#]*\?([^#]*).*$"

_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def url_scheme(url: Column) -> Column:
    """Lowercased scheme; '' when the input has no ``scheme://``."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host (no port); '' when unparseable."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_port(url: Column) -> Column:
    """Explicit port as INT, NULL when absent."""
    p = F.regexp_extract(url, _PORT_RE, 1)
    return F.when(p != "", p.cast("int"))


def url_path(url: Column) -> Column:
    """Path starting at '/'; '/' when absent."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    return F.when(p != "", p).otherwise(F.lit("/"))


def url_query(url: Column) -> Column:
    """Raw query string (no '?'); '' when absent."""
    return F.regexp_extract(url, _QUERY_RE, 1)


def clean_query(url: Column) -> Column:
    """Query with tracking params removed, order preserved; '' if
    nothing survives."""
    parts = F.split(url_query(url), "&")
    kept = F.filter(
        parts, lambda p: (p != "") & ~p.rlike(_TRACKING_RE)
    )
    return F.array_join(kept, "&")


def registered_domain(host: Column) -> Column:
    """Registrable domain of a host: one label above the longest known
    public suffix (PSL algorithm over the built-in suffix set; plain
    TLDs fall through to the last-two-labels rule). Hosts with fewer
    labels than needed return themselves. IPv4 literals are returned
    whole.
    """
    is_ip = host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # longest matching multi-label suffix, as a chain ordered by label
    # count descending so 3-label suffixes win over 2-label ones
    result = F.when(is_ip | (n <= 2), host)
    for nl in (3, 2):
        sufs = [s for s in PUBLIC_SUFFIXES if s.count(".") + 1 == nl]
        suffix = F.array_join(F.slice(labels, -nl, nl), ".")
        hit = suffix.isin(*sufs) & (n >= nl + 1)
        take = F.array_join(F.slice(labels, -(nl + 1), nl + 1), ".")
        result = result.when(hit, take)
    return result.otherwise(F.array_join(F.slice(labels, -2, 2), "."))


def normalize_url(url: Column) -> Column:
    """Canonical form of a URL (see module docstring for the steps).
    Unparseable inputs (no ``scheme://``) normalize to NULL — route
    them to a dead-letter side rather than fabricating a canonical key.
    """
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = F.when(
        port.isNotNull()
        & ~((scheme == "http") & (port == 80))
        & ~((scheme == "https") & (port == 443)),
        F.concat(F.lit(":"), port.cast("string")),
    ).otherwise(F.lit(""))
    q = clean_query(url)
    tail = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    out = F.concat(
        scheme, F.lit("://"), host, keep_port, url_path(url), tail
    )
    return F.when((scheme != "") & (host != ""), out)
