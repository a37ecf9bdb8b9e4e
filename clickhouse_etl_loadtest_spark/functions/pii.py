"""PII detection and redaction as pure column expressions (no reference
counterpart — the reference pipeline has no PII stage; this is the
training-data curation step every public pipeline runs before release,
e.g. the BigScience ROOTS PII pipeline, Laurençon et al. 2022, and the
regex-class scrubbing described for The Pile / RefinedWeb).

Three PII classes — email addresses, NANP-style phone numbers, IPv4
addresses — each matched by a regex that behaves identically in Java
regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
ASCII word boundaries; no lookaround, no backreferences. Detection is
``regexp_count``; redaction replaces matches with typed placeholders in a
fixed class order (email → phone → ip) so the composed output is
deterministic and the DuckDB twin in ``queries/pii.py`` reproduces it
byte-for-byte.

All functions are compositions of built-in string/regexp expressions —
whole-stage-codegen, map-only, no UDF, no shuffle: at 100 TB the redaction
pass is scan-bound, exactly like ``functions/urls.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex subset valid and equivalent in Java regex, RE2, and Python re:
# character classes, bounded repetition, non-capturing groups, alternation
# (all three engines pick the leftmost match and, at equal start, the
# FIRST listed alternative — order alternatives longest/most-specific
# first), ASCII \b; no lookaround, no backreferences.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"

# NANP phone forms, most-specific first:
#   1. +1-prefixed (separators -, ., space; optional parens) — the explicit
#      country code makes false positives unlikely, so digits stay lenient
#      and no word boundary is required (interior/spliced matches redact).
#   2. parenthesized area code: (NXX) NXX-XXXX
#   3. dashed/dotted: NXX-NXX-XXXX / NXX.NXX.XXXX (space separators NOT
#      accepted bare — "555 123 4567" is too often prose numbers)
#   4. bare 10-digit NXXNXXXXXX
# Forms 2-4 require valid NANP area/exchange ([2-9]XX) and word boundaries.
PHONE_RE = (
    r"\+1[-. ]?(?:\([0-9]{3}\) ?|[0-9]{3}[-. ])[0-9]{3}[-. ]?[0-9]{4}"
    r"|\([2-9][0-9]{2}\) ?[2-9][0-9]{2}[-. ][0-9]{4}\b"
    r"|\b[2-9][0-9]{2}[-.][2-9][0-9]{2}[-.][0-9]{4}\b"
    r"|\b[2-9][0-9]{2}[2-9][0-9]{2}[0-9]{4}\b"
)

# Dotted quad with per-octet range validation (0-255) — "999.1.2.3" is not
# an address and must not be redacted.
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b"

EMAIL_TAG = "<EMAIL>"
PHONE_TAG = "<PHONE>"
IPV4_TAG = "<IP>"


def pii_email_count(t: Column) -> Column:
    """Number of email matches in ``t`` (bigint)."""
    return F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint")


def pii_phone_count(t: Column) -> Column:
    """Number of NANP phone matches (+1-prefixed, parenthesized, dashed,
    dotted, or bare-10-digit forms) in ``t`` (bigint)."""
    return F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint")


def pii_ipv4_count(t: Column) -> Column:
    """Number of dotted-quad IPv4 matches in ``t`` (bigint)."""
    return F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint")


def pii_redact(t: Column) -> Column:
    """Replace every PII match with its typed placeholder.

    Class order is fixed (email, then phone, then ip) and matters only in
    principle — placeholders contain no digits or ``@`` so later passes
    never re-match earlier replacements — but the oracle twin applies the
    identical order so the output is defined, not coincidental.
    """
    r = F.regexp_replace(t, EMAIL_RE, EMAIL_TAG)
    r = F.regexp_replace(r, PHONE_RE, PHONE_TAG)
    return F.regexp_replace(r, IPV4_RE, IPV4_TAG)
