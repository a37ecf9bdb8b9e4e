"""Edge cases for functions/urls.py beyond what the fixture derivation hits:
the registered queries value-check the derived-URL population; these pin the
canonicalizer on hand-picked shapes (tracking-only query, no query, root
path, non-default port, already-canonical input, scheme-less garbage)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.functions.urls import url_host, url_normalize, url_scheme

CASES = [
    # (raw, expected_norm, expected_host)
    (
        "HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&id=9#frag",
        "https://news.example.com/a/b?id=9",
        "news.example.com",
    ),
    # tracking-only query: the '?' must disappear with it
    ("http://a.example.com/p?utm_medium=m", "http://a.example.com/p", "a.example.com"),
    # no query, no fragment, already canonical: identity
    ("http://a.example.com/p", "http://a.example.com/p", "a.example.com"),
    # param sort is byte-order; non-default port survives
    (
        "http://b.example.com:8080/x?b=2&a=1",
        "http://b.example.com:8080/x?a=1&b=2",
        "b.example.com:8080",
    ),
    # default port is scheme-aware: :443 on plain http is NOT default
    ("http://c.example.com:443/x", "http://c.example.com:443/x", "c.example.com:443"),
    ("https://c.example.com:443/x", "https://c.example.com/x", "c.example.com"),
    # fbclid/gclid stripped wherever they sit; survivors keep relative order then sort
    (
        "https://d.example.com/?fbclid=F&q=1&gclid=G",
        "https://d.example.com?q=1",
        "d.example.com",
    ),
    # root path with trailing slash trims to empty path
    ("http://e.example.com/", "http://e.example.com", "e.example.com"),
]


@pytest.mark.parametrize("raw,norm,host", CASES)
def test_url_normalize_cases(spark, raw, norm, host):
    row = (
        spark.range(1)
        .select(
            url_normalize(F.lit(raw)).alias("n"),
            url_host(F.lit(raw)).alias("h"),
            url_scheme(F.lit(raw)).alias("s"),
        )
        .first()
    )
    assert row["n"] == norm
    assert row["h"] == host


def test_url_functions_on_non_urls(spark):
    """Garbage in, empty parts out — never an exception."""
    row = (
        spark.range(1)
        .select(
            url_scheme(F.lit("not a url")).alias("s"),
            url_host(F.lit("not a url")).alias("h"),
        )
        .first()
    )
    assert row["s"] == "" and row["h"] == ""


def test_url_normalize_is_idempotent_over_fixture_population(spark, sf_dir):
    """Canonicalization must be a projection: applying it twice changes
    nothing, over the full derived messy-URL population (every branch of the
    scheme/host/port/query/fragment derivation)."""
    from pyspark.sql import functions as F2

    from clickhouse_etl_loadtest_spark.queries.web import _raw_url
    from clickhouse_etl_loadtest_spark.queries.text import _docs

    d = _docs(spark, sf_dir).select(_raw_url().alias("raw"))
    once = d.select(url_normalize(F2.col("raw")).alias("n1"))
    twice = once.select("n1", url_normalize(F2.col("n1")).alias("n2"))
    assert twice.where(F2.col("n1") != F2.col("n2")).count() == 0
