"""PII curation wave: detect, redact, and report personally identifiable
information before a corpus ships (SURVEY.md §7.6 extension — the reference
has no PII stage; the step is standard in public training-data pipelines:
BigScience ROOTS, The Pile, RefinedWeb all scrub emails/phones/IPs).

Supersedes the limitation of ``queries/text.py::doc_pii_scrub``, which runs
the same regex idea over the RAW fixture text — word soup that contains no
PII, so its redaction is vacuous (counts all zero, replace a no-op).

The documents fixture carries no PII, so each query derives a PII-bearing
text deterministically from ``(doc_id, source, text)`` — an email prepended,
a phone number spliced mid-text (splitting a word, so redaction must handle
interior matches), an IPv4 appended, each gated by a different ``doc_id``
modulus so classes overlap on some docs and miss others entirely — with the
IDENTICAL arithmetic in the DuckDB oracle. The driver therefore
value-checks the redacted TEXT (via the shared ``h60`` hash), not just
match counts.

Scale notes (100 TB):
- ``doc_pii_detect`` / ``doc_pii_redact``: pure column expressions
  (functions/pii.py) — map-only, zero exchanges, WholeStageCodegen;
  scan-bound at any scale.
- ``doc_pii_source_report``: ONE shuffle (groupBy source, map-side
  combinable); source cardinality ~ corpus provenance list, tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql_duckdb
from ..functions.pii import (
    pii_email_count,
    pii_ipv4_count,
    pii_phone_count,
    pii_redact,
)
from . import register
from .text import _docs

# --- deterministic PII injection (Spark + SQL twins) ---------------------------------


def _pii_text() -> Column:
    d = F.col("doc_id")
    email = F.concat(
        F.lit("u"),
        (d % 97).cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".mail.example.com"),
    )
    phone = F.concat(
        F.lit("+1-555-"),
        (d % 900 + 100).cast("string"),
        F.lit("-"),
        (d % 9000 + 1000).cast("string"),
    )
    ip = F.concat(
        F.lit("10."),
        (d % 200).cast("string"),
        F.lit("."),
        (d % 151).cast("string"),
        F.lit("."),
        (d % 250).cast("string"),
    )
    return F.concat(
        F.when(d % 3 == 0, F.concat(email, F.lit(" "))).otherwise(F.lit("")),
        F.substring(F.col("text"), 1, 40),
        F.when(d % 4 == 1, F.concat(F.lit(" "), phone, F.lit(" "))).otherwise(F.lit("")),
        F.expr("substring(text, 41)"),
        F.when(d % 5 == 2, F.concat(F.lit(" "), ip)).otherwise(F.lit("")),
    )


_PII_TEXT_SQL = """
    (CASE WHEN doc_id % 3 = 0
          THEN 'u' || CAST(doc_id % 97 AS VARCHAR) || '@' || source || '.mail.example.com '
          ELSE '' END)
    || substr(text, 1, 40)
    || (CASE WHEN doc_id % 4 = 1
             THEN ' +1-555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
                  || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' '
             ELSE '' END)
    || substr(text, 41)
    || (CASE WHEN doc_id % 5 = 2
             THEN ' 10.' || CAST(doc_id % 200 AS VARCHAR)
                  || '.' || CAST(doc_id % 151 AS VARCHAR)
                  || '.' || CAST(doc_id % 250 AS VARCHAR)
             ELSE '' END)
"""

# DuckDB twins of functions/pii.py: the SAME pattern strings (the regex
# subset is RE2∩Java∩Python-re equivalent, and SQL single-quoted literals
# pass backslashes through verbatim). regexp_replace needs the explicit
# 'g' flag where Spark's is always-global.
from ..functions.pii import EMAIL_RE as _EMAIL_RE_SQL  # noqa: E402
from ..functions.pii import IPV4_RE as _IPV4_RE_SQL  # noqa: E402
from ..functions.pii import PHONE_RE as _PHONE_RE_SQL  # noqa: E402

_PII_CTES = f"""
pii AS (
    SELECT doc_id, source, {_PII_TEXT_SQL} AS pii_text FROM documents
),
counted AS (
    SELECT doc_id, source, pii_text,
        CAST(len(regexp_extract_all(pii_text, '{_EMAIL_RE_SQL}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(pii_text, '{_PHONE_RE_SQL}')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(pii_text, '{_IPV4_RE_SQL}')) AS BIGINT) AS n_ips
    FROM pii
)
"""


_PII_DETECT_ORACLE = f"""
WITH {_PII_CTES}
SELECT doc_id, n_emails, n_phones, n_ips,
       n_emails + n_phones + n_ips AS pii_total
FROM counted
ORDER BY doc_id
"""


@register("doc_pii_detect", _PII_DETECT_ORACLE)
def doc_pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII match counts by class (email / phone / IPv4),
    regex-detected over the derived PII-bearing text — the audit pass a
    pipeline runs to size the scrubbing problem before redacting.

    Map-only: one scan + one projection of ``regexp_count`` expressions;
    zero exchanges, so at 100 TB it is scan-bound.
    """
    d = _docs(spark, sf_dir).select("doc_id", _pii_text().alias("pii_text"))
    t = F.col("pii_text")
    return (
        d.select(
            "doc_id",
            pii_email_count(t).alias("n_emails"),
            pii_phone_count(t).alias("n_phones"),
            pii_ipv4_count(t).alias("n_ips"),
        )
        .withColumn("pii_total", F.col("n_emails") + F.col("n_phones") + F.col("n_ips"))
        .orderBy("doc_id")
    )


_PII_REDACT_ORACLE = f"""
WITH {_PII_CTES},
redacted AS (
    SELECT doc_id,
           n_emails + n_phones + n_ips AS pii_total,
           regexp_replace(
               regexp_replace(
                   regexp_replace(pii_text, '{_EMAIL_RE_SQL}', '<EMAIL>', 'g'),
                   '{_PHONE_RE_SQL}', '<PHONE>', 'g'),
               '{_IPV4_RE_SQL}', '<IP>', 'g') AS red
    FROM counted
)
SELECT doc_id, pii_total, {h60_sql_duckdb("red")} AS redacted_hash
FROM redacted
ORDER BY doc_id
"""


@register("doc_pii_redact", _PII_REDACT_ORACLE, extra=True)  # rotated out r13 (5 green verdicts; pii family keeps doc_pii_detect + doc_pii_source_report driver-visible)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrub applied: every PII match replaced by its typed placeholder
    (``<EMAIL>``/``<PHONE>``/``<IP>``, fixed class order), verified at the
    redacted-TEXT level via the oracle's ``h60`` string hash — including the
    phone spliced into the middle of a word, so interior matches are
    covered, not just token-aligned ones.

    Map-only like the detector: redaction is three chained
    ``regexp_replace`` column expressions, zero exchanges.
    """
    d = _docs(spark, sf_dir).select("doc_id", _pii_text().alias("pii_text"))
    t = F.col("pii_text")
    return (
        d.select(
            "doc_id",
            (pii_email_count(t) + pii_phone_count(t) + pii_ipv4_count(t)).alias(
                "pii_total"
            ),
            h60(pii_redact(t)).alias("redacted_hash"),
        )
        .orderBy("doc_id")
    )


_PII_REPORT_ORACLE = f"""
WITH {_PII_CTES}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_pii,
       CAST(SUM(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS pii_rate
FROM counted
GROUP BY source
ORDER BY source
"""


@register("doc_pii_source_report", _PII_REPORT_ORACLE)
def doc_pii_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incidence: how many documents in each provenance
    bucket carry at least one match — the compliance report that decides
    which sources need the redaction pass at all.

    ONE shuffle (groupBy source, map-side combinable); source cardinality
    is the provenance list, tiny at any corpus size.
    """
    d = _docs(spark, sf_dir).select("source", _pii_text().alias("pii_text"))
    t = F.col("pii_text")
    pii_total = pii_email_count(t) + pii_phone_count(t) + pii_ipv4_count(t)
    return (
        d.select("source", pii_total.alias("pii_total"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("pii_total") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_with_pii"),
        )
        .withColumn(
            "pii_rate", F.col("docs_with_pii").cast("double") / F.col("n_docs")
        )
        .orderBy("source")
    )
