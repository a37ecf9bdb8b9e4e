"""HTML→text extraction wave: the web-pipeline stage BEFORE every other
curation step (SURVEY.md §7.6 extension — the reference has no web stage;
public crawl pipelines all run it: RefinedWeb §3.2 tag stripping +
line-level boilerplate removal, CCNet's WET handling, trafilatura).

The documents fixture is plain text, so each query derives an HTML page
deterministically from ``(doc_id, text)`` — head chrome with ``<style>`` and
``<script>`` bodies that must vanish, a nav bar and footer whose link
density must get the line dropped, headline/content lines that must
survive, an entity-rich variant (``doc_id % 4 == 1``), an ad line
(``doc_id % 5 == 2``), and an HTML comment — with the IDENTICAL
construction in the DuckDB oracle. The driver therefore value-checks the
extracted TEXT (via the shared ``h60`` hash), not just line counts, and the
extraction chain itself (functions/html.py) interpolates the same regex
constants into both engines.

Scale notes (100 TB):
- ``doc_html_extract`` / ``doc_html_boilerplate_stats``: map-only — one
  scan + regexp/higher-order-array projections; zero exchanges,
  WholeStageCodegen; scan-bound at any scale (plan-gated).
- ``doc_html_link_stats``: ONE shuffle (groupBy source, map-side
  combinable); source cardinality ~ provenance list, tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql_duckdb
from ..functions.html import (
    ANCHOR_RE,
    MIN_WORDS,
    WORD_RE,
    anchor_text,
    anchor_text_sql,
    drop_invisible,
    drop_invisible_sql,
    extract_text,
    extract_text_sql,
    html_lines,
    html_lines_sql,
    kept_lines,
    kept_lines_sql,
    strip_tags,
    strip_tags_sql,
)
from . import register
from .text import _docs

# --- deterministic HTML derivation (Spark + SQL twins) -------------------------------

_NAV = '<nav><a href="/">home</a> <a href="/tags">tags</a> <a href="/feed">rss</a></nav>'
_AD = '<p><a href="/buy">BUY NOW</a> <a href="/deal">deal</a></p>'
_FOOT = '<div><a href="/tos">terms</a> | <a href="/privacy">privacy</a></div>'
_ENTITY_TAIL = " &amp; fish &lt;chips&gt; &quot;daily&quot; &#39;special&#39;&nbsp;menu"


def _html_col() -> Column:
    d = F.col("doc_id").cast("string")
    t = F.col("text")
    p1 = F.concat(
        F.lit("<p>"),
        F.substring(t, 31, 150),
        F.when(F.col("doc_id") % 4 == 1, F.lit(_ENTITY_TAIL)).otherwise(F.lit("")),
        F.lit("</p>"),
    )
    return F.concat(
        F.lit("<html><head><title>doc "),
        d,
        F.lit("</title><style>p{margin:0}</style><script>var id = "),
        d,
        F.lit(";</script></head><body>\n"),
        F.lit(_NAV + "\n"),
        F.lit("<h1>"),
        F.substring(t, 1, 30),
        F.lit("</h1>\n"),
        p1,
        F.lit("\n"),
        F.when(F.col("doc_id") % 5 == 2, F.lit(_AD + "\n")).otherwise(F.lit("")),
        F.lit("<p>"),
        F.expr("substring(text, 181)"),
        F.lit("<!-- tracking pixel --></p>\n"),
        F.lit(_FOOT + "\n</body></html>"),
    )


_HTML_SQL = f"""
    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
    || '</title><style>p{{margin:0}}</style><script>var id = '
    || CAST(doc_id AS VARCHAR) || ';</script></head><body>' || chr(10)
    || '{_NAV}' || chr(10)
    || '<h1>' || substr(text, 1, 30) || '</h1>' || chr(10)
    || '<p>' || substr(text, 31, 150)
    || (CASE WHEN doc_id % 4 = 1 THEN '{_ENTITY_TAIL}' ELSE '' END) || '</p>'
    || chr(10)
    || (CASE WHEN doc_id % 5 = 2 THEN '{_AD}' || chr(10) ELSE '' END)
    || '<p>' || substr(text, 181) || '<!-- tracking pixel --></p>' || chr(10)
    || '{_FOOT}' || chr(10) || '</body></html>'
"""

_HTML_CTE = f"html AS (SELECT doc_id, source, {_HTML_SQL} AS h FROM documents)"

# --- queries --------------------------------------------------------------------------

_EXTRACT_ORACLE = f"""
WITH {_HTML_CTE},
ex AS (
    SELECT doc_id,
           {extract_text_sql("h")} AS extracted,
           CAST(len({kept_lines_sql("h")}) AS BIGINT) AS n_lines
    FROM html
)
SELECT doc_id, n_lines,
       CAST(length(extracted) AS BIGINT) AS n_chars,
       {h60_sql_duckdb("extracted")} AS text_hash
FROM ex
ORDER BY doc_id
"""


@register("doc_html_extract", _EXTRACT_ORACLE)
def doc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text extraction end-to-end: script/style/comment removal, block
    tags to line breaks, link-density + min-words boilerplate line filter,
    tag strip, entity decode — verified at the extracted-TEXT level via the
    oracle's ``h60`` string hash, so a single mis-kept nav line or
    mis-decoded entity fails the gate.

    Map-only: the whole chain is regexp + higher-order array expressions
    over one scan; zero exchanges, scan-bound at 100 TB.
    """
    d = _docs(spark, sf_dir).select("doc_id", _html_col().alias("h"))
    ex = d.select(
        "doc_id",
        extract_text(F.col("h")).alias("extracted"),
        F.size(kept_lines(F.col("h"))).cast("bigint").alias("n_lines"),
    )
    return ex.select(
        "doc_id",
        "n_lines",
        F.length("extracted").cast("bigint").alias("n_chars"),
        h60(F.col("extracted")).alias("text_hash"),
    ).orderBy("doc_id")


_NONEMPTY_SQL = (
    f"len(regexp_extract_all({strip_tags_sql('y')}, '{WORD_RE}')) >= 1"
)

_BOILER_ORACLE = f"""
WITH {_HTML_CTE},
lines AS (
    SELECT doc_id,
           CAST(len(list_filter({html_lines_sql("h")}, y -> {_NONEMPTY_SQL})) AS BIGINT)
               AS n_nonempty,
           CAST(len({kept_lines_sql("h")}) AS BIGINT) AS n_kept
    FROM html
)
SELECT doc_id, n_nonempty, n_kept,
       n_nonempty - n_kept AS n_dropped,
       CAST(n_nonempty - n_kept AS DOUBLE) / n_nonempty AS drop_ratio
FROM lines
ORDER BY doc_id
"""


@register("doc_html_boilerplate_stats", _BOILER_ORACLE)
def doc_html_boilerplate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-removal accounting per document: how many non-empty lines
    the page had, how many survived the link-density + min-words filter, and
    the drop ratio — the tuning signal for the line-filter thresholds
    (RefinedWeb reports exactly this per-stage removal rate).

    Map-only like the extractor; zero exchanges.
    """
    d = _docs(spark, sf_dir).select("doc_id", _html_col().alias("h"))

    def _nonempty(y: Column) -> Column:
        return F.size(F.regexp_extract_all(strip_tags(y), F.lit(WORD_RE), F.lit(0))) >= 1

    counted = d.select(
        "doc_id",
        F.size(F.filter(html_lines(F.col("h")), _nonempty)).cast("bigint").alias("n_nonempty"),
        F.size(kept_lines(F.col("h"))).cast("bigint").alias("n_kept"),
    )
    return counted.select(
        "doc_id",
        "n_nonempty",
        "n_kept",
        (F.col("n_nonempty") - F.col("n_kept")).alias("n_dropped"),
        (
            (F.col("n_nonempty") - F.col("n_kept")).cast("double") / F.col("n_nonempty")
        ).alias("drop_ratio"),
    ).orderBy("doc_id")


_LINK_ORACLE = f"""
WITH {_HTML_CTE},
per_doc AS (
    SELECT source,
           CAST(len(regexp_extract_all(h, '{ANCHOR_RE}', 1)) AS BIGINT) AS n_anchors,
           CAST(length({anchor_text_sql("h")}) AS BIGINT) AS anchor_chars,
           CAST(length({strip_tags_sql(drop_invisible_sql("h"))}) AS BIGINT) AS visible_chars
    FROM html
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_anchors) AS BIGINT) AS total_anchors,
       CAST(SUM(anchor_chars) AS BIGINT) AS anchor_chars,
       CAST(SUM(visible_chars) AS BIGINT) AS visible_chars,
       CAST(SUM(anchor_chars) AS DOUBLE) / SUM(visible_chars) AS link_char_ratio
FROM per_doc
GROUP BY source
ORDER BY source
"""


@register("doc_html_link_stats", _LINK_ORACLE, extra=True)  # rotated out r13 (5 green verdicts; html family keeps doc_html_extract + doc_html_boilerplate_stats driver-visible)
def doc_html_link_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source link-density profile over the raw HTML: anchor counts,
    anchor-text chars vs total visible chars — the survey a pipeline owner
    reads to set the link-density threshold before extraction.

    ONE shuffle (groupBy source, map-side combinable); the per-doc link
    metrics are map-side column expressions.
    """
    d = _docs(spark, sf_dir).select("source", _html_col().alias("h"))
    per_doc = d.select(
        "source",
        F.size(F.regexp_extract_all(F.col("h"), F.lit(ANCHOR_RE), F.lit(1)))
        .cast("bigint")
        .alias("n_anchors"),
        F.length(anchor_text(F.col("h"))).cast("bigint").alias("anchor_chars"),
        F.length(strip_tags(drop_invisible(F.col("h"))))
        .cast("bigint")
        .alias("visible_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_anchors").cast("bigint").alias("total_anchors"),
            F.sum("anchor_chars").cast("bigint").alias("anchor_chars"),
            F.sum("visible_chars").cast("bigint").alias("visible_chars"),
        )
        .withColumn(
            "link_char_ratio",
            F.col("anchor_chars").cast("double") / F.col("visible_chars"),
        )
        .orderBy("source")
    )


__all__ = [
    "doc_html_extract",
    "doc_html_boilerplate_stats",
    "doc_html_link_stats",
    "MIN_WORDS",
]


# --- WARC: the archive container feeding the extraction -------------------------------

_WARCINFO_PAYLOAD = "software: graft-crawler/1.0\r\nformat: WARC File Format 1.0"
_HTTP_HEAD = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"


def _warc_record(rec_type: Column | str, uri: Column | None, payload: Column) -> Column:
    """One WARC/1.0 record as a string column; Content-Length is the BYTE
    length of the payload (octet_length), the only legal framing."""
    t = F.lit(rec_type) if isinstance(rec_type, str) else rec_type
    head = F.concat(F.lit("WARC/1.0\r\nWARC-Type: "), t, F.lit("\r\n"))
    if uri is not None:
        head = F.concat(head, F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"))
    return F.concat(
        head,
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n\r\n"),
    )


def _warc_col() -> Column:
    """A 3-record WARC blob per document: warcinfo + request (both must be
    skipped by the walker) + the response carrying the derived HTML behind
    real HTTP headers (which the walker must strip)."""
    uri = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    request = F.concat(
        F.lit("GET /doc/"), F.col("doc_id").cast("string"),
        F.lit(" HTTP/1.1\r\nHost: "), F.col("source"), F.lit(".example.com\r\n\r\n"),
    )
    response = F.concat(F.lit(_HTTP_HEAD), _html_col())
    return F.concat(
        _warc_record("warcinfo", None, F.lit(_WARCINFO_PAYLOAD)),
        _warc_record("request", uri, request),
        _warc_record("response", uri, response),
    )


_WARC_ORACLE = f"""
WITH {_HTML_CTE},
ex AS (
    SELECT doc_id,
           'http://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
               AS target_uri,
           {extract_text_sql("h")} AS extracted
    FROM html
)
SELECT doc_id, CAST(3 AS BIGINT) AS n_records, target_uri,
       CAST(length(extracted) AS BIGINT) AS n_chars,
       {h60_sql_duckdb("extracted")} AS text_hash
FROM ex
ORDER BY doc_id
"""


@register("doc_warc_extract", _WARC_ORACLE)
def doc_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET generation end-to-end: build a real 3-record WARC blob per doc
    (warcinfo + request + HTTP response wrapping the derived HTML), walk it
    with the length-delimited record parser (``operators/warc.py``), strip
    the HTTP headers, then extract text JVM-side — value-checked against an
    oracle that extracts DIRECTLY from the same derived HTML, so the hash
    only matches if the container round-trip is byte-exact.

    The walk is the one Python stage (Arrow-batched ``mapInPandas``; the
    plan gate asserts no row-at-a-time BatchEvalPython) and is
    embarrassingly parallel per blob; all text processing stays in
    whole-stage codegen. Zero keyed exchanges.
    """
    import pandas as pd

    d = _docs(spark, sf_dir).select("doc_id", _warc_col().alias("warc"))

    def walk(it):
        from clickhouse_etl_loadtest_spark.operators.warc import (
            http_body,
            iter_warc_records,
        )

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["warc"]):
                recs = list(iter_warc_records(blob.encode("utf-8")))
                responses = [
                    r for r in recs if r["headers"].get("warc-type") == "response"
                ]
                # per-document blobs carry exactly one response; fail loudly
                # rather than silently keeping one of several (multi-document
                # archives go through operators.warc.response_documents)
                if len(responses) != 1:
                    raise ValueError(
                        f"doc_warc_extract expects one response per blob; "
                        f"doc_id={int(doc_id)} has {len(responses)}"
                    )
                uri = responses[0]["headers"].get("warc-target-uri", "")
                html = http_body(responses[0]["payload"]).decode("utf-8")
                rows.append((int(doc_id), len(recs), uri, html))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_records", "target_uri", "html"]
            )

    walked = d.mapInPandas(
        walk, "doc_id long, n_records long, target_uri string, html string"
    )
    return walked.select(
        "doc_id",
        "n_records",
        "target_uri",
        F.length(extract_text(F.col("html"))).cast("bigint").alias("n_chars"),
        h60(extract_text(F.col("html"))).alias("text_hash"),
    ).orderBy("doc_id")


# --- gzip-framed archives (.warc.gz): real Common Crawl framing ------------------------

_GZ_DOCS_PER_ARCHIVE = 8

_WARC_GZ_ORACLE = f"""
WITH {_HTML_CTE},
counts AS (
    SELECT doc_id // {_GZ_DOCS_PER_ARCHIVE} AS archive_id,
           CAST(1 + 2 * COUNT(*) AS BIGINT) AS n_members
    FROM documents GROUP BY 1
),
ex AS (
    SELECT doc_id, doc_id // {_GZ_DOCS_PER_ARCHIVE} AS archive_id,
           'http://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
               AS target_uri,
           {extract_text_sql("h")} AS extracted
    FROM html
)
SELECT e.doc_id, e.archive_id, c.n_members, e.target_uri,
       CAST(length(e.extracted) AS BIGINT) AS n_chars,
       {h60_sql_duckdb("e.extracted")} AS text_hash
FROM ex e JOIN counts c ON e.archive_id = c.archive_id
ORDER BY e.doc_id
"""


@register("doc_warc_gz_extract", _WARC_GZ_ORACLE)
def doc_warc_gz_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.warc.gz`` end-to-end, the framing real Common Crawl ships: pack
    8-document archives (_GZ_DOCS_PER_ARCHIVE) as RFC 1952 gzip MEMBER-PER-
    RECORD concatenations (warcinfo member + request/response member pair
    per document — ISO 28500 Annex C), walk them back through
    ``operators/warc.py`` (member walk + CRC/ISIZE verify + record parse),
    and extract text JVM-side. The oracle recomputes extraction DIRECTLY
    from the same derived HTML and the member count arithmetically
    (1 + 2·docs), so a single framing byte — a wrong DEFLATE boundary, a
    bad trailer, a dropped record — flips ``text_hash`` or ``n_members``.

    Unlike ``doc_warc_extract`` (one per-document blob), each archive here
    holds MANY responses and every one is emitted (one output row per
    response via ``response_documents`` — multi-response is the normal
    crawl shape, never silently collapsed).

    Scale: the ONE keyed exchange is the archive-assembly groupBy on
    ``doc_id div 8`` — a fixed-size, perfectly
    balanced key (this is the WRITE path of archive generation; readers of
    existing archives skip straight to the walk, which is embarrassingly
    parallel per blob). Python touches bytes only inside one Arrow-batched
    ``mapInPandas`` (pack + walk); extraction/hashing stay whole-stage
    codegen.
    """
    import pandas as pd

    d = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") - F.col("doc_id") % _GZ_DOCS_PER_ARCHIVE)
        .cast("long")
        .alias("k"),
        F.concat(
            F.lit("http://"),
            F.col("source"),
            F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("uri"),
        _html_col().alias("html"),
    ).select(
        (F.col("k") / _GZ_DOCS_PER_ARCHIVE).cast("long").alias("archive_id"),
        F.struct("doc_id", "uri", "html").alias("doc"),
    )
    archives = d.groupBy("archive_id").agg(
        F.sort_array(F.collect_list("doc")).alias("docs")
    )

    def pack_and_walk(it):
        from clickhouse_etl_loadtest_spark.operators.warc import (
            gzip_member,
            iter_gzip_members,
            response_documents,
        )

        def rec(rec_type: str, uri: str | None, payload: bytes) -> bytes:
            head = f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n"
            if uri is not None:
                head += f"WARC-Target-URI: {uri}\r\n"
            head += f"Content-Length: {len(payload)}\r\n\r\n"
            return head.encode("utf-8") + payload + b"\r\n\r\n"

        for pdf in it:
            rows = []
            for archive_id, docs in zip(pdf["archive_id"], pdf["docs"]):
                members = [rec("warcinfo", None, _WARCINFO_PAYLOAD.encode())]
                for doc in docs:
                    uri, html = doc["uri"], doc["html"]
                    members.append(
                        rec("request", uri, f"GET {uri} HTTP/1.1\r\n\r\n".encode())
                    )
                    members.append(
                        rec(
                            "response",
                            uri,
                            _HTTP_HEAD.encode() + html.encode("utf-8"),
                        )
                    )
                blob = b"".join(gzip_member(m) for m in members)
                # member count from the PARSE side, not the writer's intent
                n_members = sum(1 for _ in iter_gzip_members(blob))
                for uri, body in response_documents(blob):
                    rows.append(
                        (int(archive_id), n_members, uri, body.decode("utf-8"))
                    )
            yield pd.DataFrame(
                rows, columns=["archive_id", "n_members", "target_uri", "html"]
            )

    walked = archives.mapInPandas(
        pack_and_walk,
        "archive_id long, n_members long, target_uri string, html string",
    )
    return walked.select(
        F.regexp_extract("target_uri", r"([0-9]+)$", 1).cast("bigint").alias("doc_id"),
        "archive_id",
        "n_members",
        "target_uri",
        F.length(extract_text(F.col("html"))).cast("bigint").alias("n_chars"),
        h60(extract_text(F.col("html"))).alias("text_hash"),
    ).orderBy("doc_id")


# --- the composed WET pipeline: archive → text → filters → dedup ----------------------

from ..operators.langid import predict_lang_spark, predict_lang_sql_ctes  # noqa: E402
from .text import TOKEN_RE  # noqa: E402

# the langid stage is the TRAINED classifier (operators/langid.py), the same
# tier doc_corpus_release composes — since round 11 the two composed
# pipelines agree on language-ID (one implementation, one oracle twin)
_WET_LID_CTES, _WET_LID_OUT = predict_lang_sql_ctes("normed", "doc_id", "norm_text")

_WET_NORM_SQL = h60_sql_duckdb(
    "regexp_replace(trim(lower(extracted)), '\\s+', ' ', 'g')"
)

_WET_ORACLE = f"""
WITH {_HTML_CTE},
ex AS (
    SELECT doc_id, {extract_text_sql("h")} AS extracted FROM html
),
sig AS (
    SELECT doc_id, extracted,
           length(extracted) AS n_chars,
           regexp_extract_all(lower(extracted), '{TOKEN_RE}') AS toks,
           length(extracted)
             - length(regexp_replace(extracted, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
    FROM ex
),
scored AS (
    SELECT doc_id, extracted, toks,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           (CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
            + CASE WHEN n_punct * 1.0 / NULLIF(n_chars, 0) < 0.1 THEN 1 ELSE 0 END
            + CASE WHEN len(toks) >= 20 THEN 1 ELSE 0 END) AS q
    FROM sig
),
normed AS (
    SELECT doc_id,
           regexp_replace(trim(lower(extracted)), '\\s+', ' ', 'g') AS norm_text
    FROM ex
),
{_WET_LID_CTES},
fp AS (
    SELECT s.doc_id, n_tokens,
           CAST(q AS INT) AS quality_score,
           q >= 2 AS keep_quality,
           COALESCE(l.predicted_lang, 'und') AS predicted_lang,
           {_WET_NORM_SQL}
               AS fingerprint,
           {h60_sql_duckdb("extracted")} AS text_hash
    FROM scored s LEFT JOIN {_WET_LID_OUT} l USING (doc_id)
),
dedup AS (
    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_canonical
    FROM fp
)
SELECT doc_id, predicted_lang, n_tokens, quality_score, keep_quality,
       is_canonical, keep_quality AND is_canonical AS kept, text_hash
FROM dedup
ORDER BY doc_id
"""


@register("doc_wet_pipeline", _WET_ORACLE)
def doc_wet_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed web-curation pipeline, archive to training-set verdict in
    ONE DataFrame chain: WARC container walk → HTTP strip → HTML→text
    extraction → quality scoring (length/punct/token signals, same
    thresholds as ``doc_quality_filter``) → marker-word language-ID → exact
    dedup by whitespace-normalized fingerprint (keep-first-by-doc_id) —
    RefinedWeb's stage order, value-checked end-to-end (the oracle recomputes
    every stage from the same derived HTML, so one wrong byte anywhere in
    the chain flips ``text_hash`` or ``kept``).

    Scale: the walk is Arrow-batched mapInPandas (embarrassingly parallel
    per blob); extraction/scoring/langid are map-side column expressions;
    the ONLY keyed exchange is the dedup window on the 60-bit fingerprint —
    raw text never shuffles (dropped before the window).

    The langid stage is the TRAINED classifier (``operators/langid.py``
    ``predict_lang_spark`` — hashed bigram+trigram logistic over the
    normalized text, pinned weights, DECIMAL-folded scores), the same tier
    ``doc_corpus_release`` composes: since round 11 every composed pipeline
    agrees on language-ID through one shared implementation. The extracted
    frame materializes ONCE (localCheckpoint, the corpus-release precedent)
    so the metrics branch and the langid rollup both read it without
    re-running the walk; pages too short to yield a bigram coalesce to
    'und'. The marker-word cheap tier survives as ``doc_language_id``.
    """
    d = _docs(spark, sf_dir).select("doc_id", _warc_col().alias("warc"))

    import pandas as pd

    def walk(it):
        from clickhouse_etl_loadtest_spark.operators.warc import (
            http_body,
            iter_warc_records,
        )

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["warc"]):
                bodies = [
                    http_body(rec["payload"]).decode("utf-8")
                    for rec in iter_warc_records(blob.encode("utf-8"))
                    if rec["headers"].get("warc-type") == "response"
                ]
                # per-document blobs carry exactly one response; a
                # multi-response archive has no doc_id identity here, so
                # fail loudly (multi-document archives go through
                # operators.warc.response_documents, which yields them all)
                if len(bodies) != 1:
                    raise ValueError(
                        f"doc_wet_pipeline expects one response per blob; "
                        f"doc_id={int(doc_id)} has {len(bodies)}"
                    )
                rows.append((int(doc_id), bodies[0]))
            yield pd.DataFrame(rows, columns=["doc_id", "html"])

    walked = d.mapInPandas(walk, "doc_id long, html string")
    ex = walked.select(
        "doc_id", extract_text(F.col("html")).alias("extracted")
    ).localCheckpoint()

    toks = F.regexp_extract_all(F.lower(F.col("extracted")), F.lit(TOKEN_RE), F.lit(0))
    n_chars = F.length("extracted")
    n_punct = n_chars - F.length(F.regexp_replace("extracted", "[^a-zA-Z0-9 ]", ""))
    quality = (
        F.when(n_chars.between(100, 20000), 1).otherwise(0)
        + F.when(n_punct * F.lit(1.0) / F.nullif(n_chars.cast("double"), F.lit(0.0)) < 0.1, 1).otherwise(0)
        + F.when(F.size(toks) >= 20, 1).otherwise(0)
    )

    norm = F.regexp_replace(F.trim(F.lower(F.col("extracted"))), r"\s+", " ")
    # trained language-ID over the normalized text — both branches read the
    # checkpointed frame, so the walk never re-runs and text stays map-side
    lang = predict_lang_spark(
        ex.select("doc_id", norm.alias("norm_text")), "doc_id", "norm_text"
    )
    scored = (
        ex.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_tokens"),
            quality.cast("int").alias("quality_score"),
            (quality >= 2).alias("keep_quality"),
            h60(norm).alias("fingerprint"),
            h60(F.col("extracted")).alias("text_hash"),
        )  # raw text dropped HERE — only 60-bit keys + scalars cross shuffles
        .join(lang, "doc_id", "left")
        .withColumn(
            "predicted_lang", F.coalesce(F.col("predicted_lang"), F.lit("und"))
        )
    )

    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    return (
        scored.withColumn("is_canonical", F.col("doc_id") == F.min("doc_id").over(w))
        .select(
            "doc_id",
            "predicted_lang",
            "n_tokens",
            "quality_score",
            "keep_quality",
            "is_canonical",
            (F.col("keep_quality") & F.col("is_canonical")).alias("kept"),
            "text_hash",
        )
        .orderBy("doc_id")
    )
