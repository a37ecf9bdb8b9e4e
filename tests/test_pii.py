"""Unit tests for functions/pii.py — the regex/redaction edge cases the
registry-level oracle sweep exercises only in aggregate.

The differential coverage (counts + redacted-text hash vs DuckDB on the
derived PII-bearing corpus) lives in tests/test_query_oracles.py via the
``doc_pii_*`` registry entries; these tests pin the micro-semantics that
make that composition safe: placeholders never re-match later passes,
interior (mid-word) matches redact, class order is fixed, and clean text
passes through byte-identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.functions.pii import (
    EMAIL_TAG,
    IPV4_TAG,
    PHONE_TAG,
    pii_email_count,
    pii_ipv4_count,
    pii_phone_count,
    pii_redact,
)


def _redact_one(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(pii_redact(F.col("t")).alias("r")).first()["r"]


def _counts_one(spark, text: str) -> tuple[int, int, int]:
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        pii_email_count(F.col("t")).alias("e"),
        pii_phone_count(F.col("t")).alias("p"),
        pii_ipv4_count(F.col("t")).alias("i"),
    ).first()
    return row["e"], row["p"], row["i"]


@pytest.mark.parametrize(
    "text,expected",
    [
        ("mail me at bob.smith@corp.example.com today", f"mail me at {EMAIL_TAG} today"),
        ("call +1-555-123-4567 now", f"call {PHONE_TAG} now"),
        ("host 10.0.42.7 down", f"host {IPV4_TAG} down"),
        # interior match: the phone splices the middle of a word
        ("wo+1-555-123-4567rd", f"wo{PHONE_TAG}rd"),
        # all three classes in one string, redacted independently
        (
            "a@b.example.com +1-555-000-0000 192.168.1.1",
            f"{EMAIL_TAG} {PHONE_TAG} {IPV4_TAG}",
        ),
        # no PII: byte-identical pass-through
        ("plain words only", "plain words only"),
        # round-8 broadened NANP forms
        ("call (212) 555-0142 now", f"call {PHONE_TAG} now"),
        ("call 212-555-0142 now", f"call {PHONE_TAG} now"),
        ("call 212.555.0142 now", f"call {PHONE_TAG} now"),
        ("call 2125550142 now", f"call {PHONE_TAG} now"),
        ("call +1 (212) 555-0142 now", f"call {PHONE_TAG} now"),
        # bare forms need valid NANP area/exchange digits and boundaries
        ("order 112-555-0142 stays", "order 112-555-0142 stays"),
        ("id x2125550142 stays", "id x2125550142 stays"),
        # octet validation: 999 is not an address octet
        ("at 999.1.2.3 stays", "at 999.1.2.3 stays"),
        ("at 255.255.255.255 goes", f"at {IPV4_TAG} goes"),
    ],
)
def test_redact_cases(spark, text, expected):
    assert _redact_one(spark, text) == expected


def test_placeholders_never_rematch(spark):
    """A fully redacted string is a fixed point: placeholders contain no
    digits or '@', so re-running the redaction changes nothing."""
    once = _redact_one(spark, "a@b.example.com +1-555-000-0000 10.1.2.3")
    assert _redact_one(spark, once) == once


def test_ip_not_matched_inside_phone(spark):
    """The NANP phone contains dash-separated digit runs that must not leak
    into the IPv4 class (dots required), and vice versa."""
    e, p, i = _counts_one(spark, "+1-555-123-4567")
    assert (e, p, i) == (0, 1, 0)
    e, p, i = _counts_one(spark, "10.11.12.13")
    assert (e, p, i) == (0, 0, 1)


def test_email_domain_not_matched_as_ip(spark):
    """Dotted domains with letters never trip the dotted-quad regex."""
    e, p, i = _counts_one(spark, "x@mail.example.com")
    assert (e, p, i) == (1, 0, 0)


def test_redact_and_counts_match_python_re_on_random_corpus(spark):
    """Differential fuzz vs Python ``re`` (a third regex engine beside Java
    and RE2): 400 seeded random texts mixing valid PII, near-misses (no TLD,
    short phone groups, double dots), adjacency (PII glued to words), and
    plain words — counts and redacted output must agree byte-for-byte in
    ONE Spark pass."""
    import random
    import re

    from clickhouse_etl_loadtest_spark.functions.pii import (
        EMAIL_RE,
        EMAIL_TAG,
        IPV4_RE,
        IPV4_TAG,
        PHONE_RE,
        PHONE_TAG,
    )

    rng = random.Random(20260815)
    words = ["alpha", "beta", "gamma", "delta", "x9", "tok", "spark", "row"]

    def frag() -> str:
        k = rng.randrange(10)
        if k == 0:
            return f"{rng.choice(words)}{rng.randrange(99)}@{rng.choice(words)}.example.com"
        if k == 1:
            a, x, l4 = rng.randrange(100, 999), rng.randrange(100, 999), rng.randrange(1000, 9999)
            return rng.choice(
                [
                    f"+1-{a}-{x}-{l4}",
                    f"+1 ({a}) {x}-{l4}",
                    f"({a}) {x}-{l4}",
                    f"{a}-{x}-{l4}",
                    f"{a}.{x}.{l4}",
                    f"{a}{x}{l4}",
                ]
            )
        if k == 2:
            return ".".join(str(rng.randrange(300)) for _ in range(4))
        if k == 3:  # near-misses
            return rng.choice(
                [
                    "a@b",
                    "+1-55-123-4567",
                    "1.2.3",
                    "user@",
                    "@dom.com",
                    "+1-555-1234-567",
                    "112-555-0142",
                    "999.1.2.3",
                    "(112) 555-0142",
                    "21255501429",
                ]
            )
        if k == 4:  # adjacency: PII glued into a word
            return f"wo{rng.choice(['+1-555-111-2222', '1.2.3.4'])}rd"
        return rng.choice(words)

    texts = [" ".join(frag() for _ in range(rng.randrange(1, 12))) for _ in range(400)]

    def py_redact(t: str) -> str:
        t = re.sub(EMAIL_RE, EMAIL_TAG, t)
        t = re.sub(PHONE_RE, PHONE_TAG, t)
        return re.sub(IPV4_RE, IPV4_TAG, t)

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: (r["e"], r["p"], r["ip"], r["r"])
        for r in df.select(
            "i",
            pii_email_count(F.col("t")).alias("e"),
            pii_phone_count(F.col("t")).alias("p"),
            pii_ipv4_count(F.col("t")).alias("ip"),
            pii_redact(F.col("t")).alias("r"),
        ).collect()
    }
    for i, t in enumerate(texts):
        want = (
            len(re.findall(EMAIL_RE, t)),
            len(re.findall(PHONE_RE, t)),
            len(re.findall(IPV4_RE, t)),
            py_redact(t),
        )
        assert got[i] == want, f"text {i}: {t!r}: spark={got[i]} python={want}"
