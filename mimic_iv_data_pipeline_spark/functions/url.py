"""URL canonicalization / host extraction column functions.

The web-corpus curation step the reference never needs (its inputs are
hospital exports) but any CommonCrawl-scale pipeline runs before
host-level dedup, per-domain mixing, and blocklist joins (public: the
URL normalizations of RFC 3986 §6 plus the de-facto tracking-param
strip every crawler applies). Everything is a plain Column expression —
RE2-safe regex (no lookaround/backreferences) in whole-stage codegen,
so the exact same patterns run verbatim in DuckDB oracles and the
functions stream at scan speed.

Scope honesty: ``url_registered_domain`` is the LAST-TWO-LABELS
heuristic, not the Public Suffix List (no bundled data files in this
repo); two-label country TLDs (``example.co.uk``) therefore collapse to
``co.uk``. Stated here and in the docstring — a production deployment
joins a PSL dimension table instead (an ordinary broadcast join).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The de-facto strip set: click/campaign trackers that create duplicate
# URLs for identical content. Applied as one alternation, inside the
# query string ONLY (a path segment may legally contain '&').
TRACKING_PARAMS = (
    "utm_[a-z]+",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
)

_PARAM_ALT = "|".join(TRACKING_PARAMS)


def url_host(url: Column) -> Column:
    """Lowercased host, with any userinfo@ and :port stripped; empty
    string when there is no ``scheme://`` (relative or garbage —
    callers filter)."""
    return F.regexp_extract(
        F.lower(url), r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )


def url_registered_domain(url: Column) -> Column:
    """Last two dot-labels of the host (heuristic; see module note —
    a PSL broadcast join replaces this in production)."""
    h = url_host(url)
    return F.when(
        h.rlike(r"[^.]+\.[^.]+$"),
        F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(h)


def canonical_url(url: Column) -> Column:
    """Duplicate-collapsing canonical form:

    1. lowercase scheme and host (path/query case is significant —
       left intact),
    2. strip userinfo and the scheme's default port (``:80`` http,
       ``:443`` https — a NON-default port is meaning, kept),
    3. strip fragments (``#…`` never reaches the server),
    4. drop the tracking params in :data:`TRACKING_PARAMS` from the
       query string only (and a then-empty ``?``),
    5. drop a single trailing ``/`` on a non-root path
       (``/a/`` == ``/a``),
    6. normalize an EMPTY path to ``/`` (RFC 3986 §6.2.3:
       ``http://ex.com`` == ``http://ex.com/`` — the most common
       duplicate class a crawler sees).

    Every step is one ``regexp_replace``/``concat`` — a fixed codegen
    chain, no UDF. Semantics-changing normalizations (resolving
    ``..``, decoding percent-escapes) are deliberately NOT applied —
    they can alias distinct resources; this is the conservative subset
    crawlers agree on. Strings without ``scheme://`` pass through
    unchanged.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # userinfo off, host lowercased; split host[:port] / path / ?query
    rest = F.regexp_replace(rest, r"^[^/@?#]*@", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]+)", 1))
    hostport = F.when(
        scheme == F.lit("http"), F.regexp_replace(hostport, r":80$", "")
    ).otherwise(
        F.when(
            scheme == F.lit("https"), F.regexp_replace(hostport, r":443$", "")
        ).otherwise(hostport)
    )
    after_host = F.regexp_replace(rest, r"^[^/?#]+", "")
    no_frag = F.regexp_replace(after_host, r"#.*$", "")
    path = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)  # '' when no '?'
    had_query = no_frag.rlike(r"\?")
    # tracking params out of the query ONLY: strip 'param=...' runs at
    # the start or after '&', then tidy separators
    query = F.regexp_replace(
        query, r"(^|&)(" + _PARAM_ALT + r")=[^&]*", "$1"
    )
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&|&$", "")
    # non-root trailing slash off; empty path → '/' (RFC 3986 §6.2.3)
    path = F.regexp_replace(path, r"(/[^/?#]+)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tail = F.concat(
        path, F.when(had_query & (query != ""), F.concat(F.lit("?"), query)).otherwise(F.lit(""))
    )
    return F.when(
        scheme != "", F.concat(scheme, F.lit("://"), hostport, tail)
    ).otherwise(url)
