"""Unit tests for functions/html.py — the extraction micro-semantics the
registry-level oracle sweep exercises only in aggregate.

The differential coverage (extracted-text hash vs DuckDB on the derived
HTML corpus) lives in tests/test_query_oracles.py via the ``doc_html_*``
registry entries; these tests pin what makes that composition safe:
script/style bodies vanish entirely (including multi-line), entity order
is non-double-decoding, the link-density boundary is exact, and a pure
Python ``re`` twin (a third regex engine beside Java and RE2) agrees
byte-for-byte on random tag soup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.functions.html import (
    ANCHOR_RE,
    BLOCK_RE,
    COMMENT_RE,
    ENTITIES,
    MIN_WORDS,
    SCRIPT_RE,
    STYLE_RE,
    TAG_RE,
    WORD_RE,
    extract_text,
)


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(extract_text(F.col("h")).alias("x")).first()["x"]


def py_extract(html: str) -> str:
    """Pure-Python twin of the full chain, same constants, same order."""
    import re

    for pat in (SCRIPT_RE, STYLE_RE, COMMENT_RE):
        html = re.sub(pat, "", html)
    html = re.sub(BLOCK_RE, "\n", html)
    kept = []
    for line in html.split("\n"):
        visible = re.sub(TAG_RE, "", line)
        anchor = "".join(re.findall(ANCHOR_RE, line))
        if len(re.findall(WORD_RE, visible)) >= MIN_WORDS and 2 * len(anchor) <= len(
            visible
        ):
            for ent, rep in ENTITIES:
                visible = visible.replace(ent, rep)
            kept.append(visible.strip())
    return "\n".join(kept)


@pytest.mark.parametrize(
    "html,expected",
    [
        # script/style bodies vanish, even multi-line with tags inside strings
        (
            "<script>var a = '<p>not a tag</p>';\nmore</script><p>one two three</p>",
            "one two three",
        ),
        ("<style>p{color:red}\n.x{}</style><p>keep me please</p>", "keep me please"),
        # comments vanish
        ("<p>alpha beta gamma<!-- \n secret --></p>", "alpha beta gamma"),
        # nav dropped by link density, content kept
        (
            '<nav><a href="/">home</a> <a href="/x">tags</a></nav>\n<p>real body text here</p>',
            "real body text here",
        ),
        # anchors below 50% density keep the line (and anchor text survives)
        (
            '<p>read the <a href="/d">docs</a> for all the details today</p>',
            "read the docs for all the details today",
        ),
        # short lines dropped (title chrome)
        ("<title>doc 7</title><p>long enough line here</p>", "long enough line here"),
        # entity decode, &amp; last: &amp;lt; stays &lt;
        (
            "<p>fish &amp; chips &lt;hot&gt; &quot;x&quot; &#39;y&#39;&nbsp;z &amp;lt;</p>",
            'fish & chips <hot> "x" \'y\' z &lt;',
        ),
        # block closers create line structure
        ("<p>one two three</p><p>four five six</p>", "one two three\nfour five six"),
        # empty input
        ("", ""),
    ],
)
def test_extract_cases(spark, html, expected):
    assert _extract_one(spark, html) == expected


def test_link_density_boundary_is_exact(spark):
    """keep iff 2*len(anchor) <= len(visible): construct both sides of the
    boundary with single-char precision."""
    # visible = 'aa bb cc dd' (11 chars); anchor 'aa bb' (5) -> 2*5 = 10 <= 11 keep
    keep = '<p><a href="/x">aa bb</a> cc dd</p>'
    # anchor 'aa bb ' (6, trailing space inside the tag) -> 2*6 = 12 > 11 drop
    drop = '<p><a href="/x">aa bb </a>cc dd</p>'
    assert _extract_one(spark, keep) == "aa bb cc dd"
    assert py_extract(keep) == "aa bb cc dd"
    assert _extract_one(spark, drop) == ""
    assert py_extract(drop) == ""


def test_extract_matches_python_re_on_random_tag_soup(spark):
    """Differential fuzz vs the pure-Python twin: 300 seeded random pages
    mixing real structure, unclosed tags, entities, comments, scripts with
    markup inside, and high-link lines — extracted text must agree
    byte-for-byte in ONE Spark pass."""
    import random

    rng = random.Random(20260815)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "row", "scan"]

    def line() -> str:
        k = rng.randrange(8)
        body = " ".join(rng.choice(words) for _ in range(rng.randrange(1, 7)))
        if k == 0:
            return f"<script>var x = '{body}<p></p>';</script>"
        if k == 1:
            return f"<style>.c{{margin:{rng.randrange(9)}}}</style>"
        if k == 2:
            return f'<nav><a href="/a">{rng.choice(words)}</a> <a href="/b">{rng.choice(words)}</a></nav>'
        if k == 3:
            return f"<p>{body} &amp; {rng.choice(words)} &lt;x&gt;</p>"
        if k == 4:
            return f"<h1>{body}</h1>"
        if k == 5:  # unclosed / stray tags
            return f"<p>{body}<br>{rng.choice(words)}"
        if k == 6:
            return f"<!-- {body} --><div>{body}</div>"
        return body

    pages = [
        "".join(line() for _ in range(rng.randrange(1, 10))) for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i long, h string"
    )
    got = {
        r["i"]: r["x"]
        for r in df.select("i", extract_text(F.col("h")).alias("x")).collect()
    }
    for i, p in enumerate(pages):
        assert got[i] == py_extract(p), f"page {i}: {p!r}"
