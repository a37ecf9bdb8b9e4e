"""URL canonicalization as pure column expressions (RefinedWeb-style
pre-filter surface; no reference counterpart — the reference pipeline has no
web-curation stage).

Every web-scale training-data pipeline normalizes URLs BEFORE text-level
dedup: the same page arrives under `http://` and `https://`, with and
without `www.`, with tracking parameters (`utm_*`, `fbclid`, `gclid`),
fragments, default ports, and trailing slashes. Normalizing first collapses
those into one key so host-level caps and URL-exact dedup see through the
noise (Penedo et al. 2023, "The RefinedWeb Dataset"; Smith et al. 2022 use
the same canonical-URL dedup in MassiveText/Gopher preprocessing).

All functions are compositions of built-in string/regexp expressions —
whole-stage-codegen, map-only, no UDF — and each has an exact DuckDB twin in
``queries/web.py`` (the regex subset used works identically in Java regex
and RE2: anchored classes, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters that never identify content
TRACKING_PARAM_RE = "(utm_[a-z]+|fbclid|gclid)"


def url_scheme(u: Column) -> Column:
    """Lowercased scheme, '' if the string has no ``scheme://`` prefix."""
    return F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))


def url_host(u: Column) -> Column:
    """Canonical host: lowercased, ``www.`` prefix dropped, scheme-default
    port (``:80`` for http, ``:443`` for https) dropped."""
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1))
    bare = F.regexp_replace(hostport, r"^www\.", "")
    scheme = url_scheme(u)
    return (
        F.when(scheme == "http", F.regexp_replace(bare, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(bare, ":443$", ""))
        .otherwise(bare)
    )


def _path_query(u: Column) -> Column:
    """Path+query with the fragment and the ``scheme://host`` prefix removed."""
    return F.regexp_replace(
        F.regexp_replace(u, "#.*$", ""), r"^[A-Za-z]+://[^/?#]+", ""
    )


def url_normalize(u: Column) -> Column:
    """Full canonical form: lowercased scheme and host, no ``www.``, no
    default port, no fragment, tracking params stripped, surviving query
    params sorted, trailing path slashes trimmed.

    NOT collapsed: percent-encoding case, dot-segments, IDN — those need a
    real parser; this is the cheap column-expression core that catches the
    bulk of web-crawl aliasing.
    """
    pq = _path_query(u)
    path = F.regexp_replace(F.regexp_extract(pq, "^([^?]*)", 1), "/+$", "")
    q0 = F.regexp_extract(pq, r"\?(.*)$", 1)
    # drop tracking params with their leading separator, then any orphaned
    # leading '&' left when the first param was the tracked one
    q1 = F.regexp_replace(
        F.regexp_replace(q0, f"(^|&){TRACKING_PARAM_RE}=[^&]*", ""), "^&+", ""
    )
    # canonical param order: byte-sort the surviving k=v pairs
    q2 = F.array_join(F.array_sort(F.split(q1, "&")), "&")
    return F.concat(
        url_scheme(u),
        F.lit("://"),
        url_host(u),
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
