"""URL canonicalization — the normalization pass a web-scale corpus dedup
runs BEFORE any content hash (crawl frontiers and CC-style pipelines dedup
by canonical URL first; content dedup only sees the survivors).

Extends the reference's URL-building surface (utils.py:46-61 builds
wikimedia URLs; this is the inverse problem: many syntactic variants → one
canonical form). Pure Catalyst — regexp + higher-order array functions, no
UDF, no shuffle: the canonicalizer is a per-row projection that runs at the
scan, so at 100 TB it costs nothing beyond the column write. The md5 of the
canonical form is then the dedup key (one hash-groupBy, `exact_dedup`'s
plan).

Normalization rules (each engine-reproducible, mirrored 1:1 by the suite
oracle's DuckDB SQL):

* scheme and host lowercased; leading ``www.`` stripped (optional)
* default ports dropped (``http:80``, ``https:443``); explicit non-default
  ports kept
* empty path → ``/``; trailing slashes stripped off non-root paths
* fragment dropped
* query string: tracking parameters removed (``utm_*`` and the usual
  click-id family), survivors sorted lexicographically and re-joined —
  param ORDER never distinguishes two URLs
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Click-tracking parameters that never identify a resource. The regex is
# anchored to the param NAME (everything before '='), mirrored verbatim in
# the suite oracle.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|dclid|mc_cid|mc_eid|igshid|ref|ref_src)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _c(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def canonicalize_url(url: Column | str, strip_www: bool = True) -> Column:
    """Canonical form of an absolute http(s)-style URL (see module doc).

    Rows that don't match ``scheme://...`` yield NULL — surfaced for a
    quality gate, never silently passed through as their own "canonical"
    spelling.
    """
    u = F.trim(_c(url))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment never identifies
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)

    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )

    stripped = F.regexp_replace(path, r"/+$", "")
    path_norm = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    joined = F.array_join(F.array_sort(params), "&")
    query_part = F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined))

    canon = F.concat(scheme, F.lit("://"), host, port_part, path_norm, query_part)
    return F.when((scheme == "") | (host == ""), F.lit(None).cast("string")).otherwise(
        canon
    )


def url_host(url: Column | str, strip_www: bool = True) -> Column:
    """Lowercased host of an absolute URL (NULL when unparseable) — the
    grouping key for per-site caps, robots policies, and domain mixing."""
    u = F.trim(_c(url))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    has_scheme = _c(url).rlike(_SCHEME_RE)
    return F.when(~has_scheme | (host == ""), F.lit(None).cast("string")).otherwise(host)
