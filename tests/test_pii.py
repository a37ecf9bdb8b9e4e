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
