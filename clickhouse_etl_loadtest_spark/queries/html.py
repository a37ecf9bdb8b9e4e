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


@register("doc_html_link_stats", _LINK_ORACLE)
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
