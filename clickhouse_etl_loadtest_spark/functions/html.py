"""HTML → text extraction as pure column expressions (no reference
counterpart — the reference pipeline starts from structured events; this is
the web-pipeline stage every public crawl corpus runs before any other
curation: tag/script/style stripping, entity decoding, and boilerplate line
removal by link density, as described for RefinedWeb (Penedo et al. 2023
§3.2, trafilatura-style line filtering) and CCNet (Wenzek et al. 2020).

The pipeline is a fixed chain of regexp/string expressions over one string
column — whole-stage codegen, map-only, no UDF, no shuffle; at 100 TB the
extraction pass is scan-bound, exactly like ``functions/pii.py``. Per-line
work (link density, word counts) runs inside higher-order array functions
(``filter``/``transform`` over the split lines), so line structure never
leaves the row: zero exchanges end-to-end.

Every regex lives in the RE2∩Java∩Python-re equivalent subset (character
classes, bounded repetition, non-greedy with ``(?s)``, non-capturing groups;
no lookaround, no backreferences) so the DuckDB oracle twins in
``queries/html.py`` interpolate the IDENTICAL pattern strings.

Extraction chain (both engines, in this order):
 1. drop ``<script>``/``<style>`` element bodies and HTML comments
 2. convert block-element closers and ``<br>`` to newlines
 3. split into lines; per line compute
      - visible text = line with all remaining tags stripped
      - anchor text  = concatenated ``<a>`` inner texts
    keep the line iff visible holds ≥ :data:`MIN_WORDS` words AND
    ``2 * len(anchor) <= len(visible)`` (link density ≤ 0.5)
 4. per kept line: strip tags, decode entities (``&amp;`` LAST so
    ``&amp;lt;`` decodes to ``&lt;``, not ``<``), trim
 5. re-join with newlines
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
COMMENT_RE = r"(?s)<!--.*?-->"
BLOCK_RE = r"</(?:p|div|h1|h2|h3|li|tr|nav|td|title)>|<br ?/?>"
TAG_RE = r"<[^>]*>"
ANCHOR_RE = r"(?s)<a[^>]*>(.*?)</a>"
WORD_RE = r"[^ ]+"

# (entity, replacement) — &amp; deliberately last; the replacement set is the
# five predefined XML entities plus the two most common numeric/space forms.
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

MIN_WORDS = 3  # lines with fewer visible words are chrome/titles, dropped


def strip_tags(c: Column) -> Column:
    """Visible text of an HTML fragment: every ``<...>`` removed."""
    return F.regexp_replace(c, TAG_RE, "")


def decode_entities(c: Column) -> Column:
    """Chained literal replaces; ``&amp;`` last (see module docstring)."""
    for ent, rep in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def drop_invisible(c: Column) -> Column:
    """Steps 1–2: remove script/style bodies and comments, then newline the
    block boundaries so line structure exists for the per-line filter."""
    c = F.regexp_replace(c, SCRIPT_RE, "")
    c = F.regexp_replace(c, STYLE_RE, "")
    c = F.regexp_replace(c, COMMENT_RE, "")
    return F.regexp_replace(c, BLOCK_RE, "\n")


def anchor_text(c: Column) -> Column:
    """Concatenated inner text of every ``<a>`` element (group-1 extracts).

    Spark's ``array_join`` of an empty extract list is ``''``; the DuckDB
    twin must ``coalesce(array_to_string(...), '')`` to match.
    """
    return F.array_join(F.regexp_extract_all(c, F.lit(ANCHOR_RE), F.lit(1)), "")


def _keep_line(line: Column) -> Column:
    visible = strip_tags(line)
    n_words = F.size(F.regexp_extract_all(visible, F.lit(WORD_RE), F.lit(0)))
    return (n_words >= MIN_WORDS) & (
        2 * F.length(anchor_text(line)) <= F.length(visible)
    )


def html_lines(c: Column) -> Column:
    """All lines of the de-invisibled HTML (tags still present)."""
    return F.split(drop_invisible(c), "\n")


def kept_lines(c: Column) -> Column:
    """Lines surviving the boilerplate filter (tags still present)."""
    return F.filter(html_lines(c), _keep_line)


def extract_text(c: Column) -> Column:
    """The full chain: extracted clean text of an HTML string column."""
    cleaned = F.transform(
        kept_lines(c), lambda y: F.trim(decode_entities(strip_tags(y)))
    )
    return F.array_join(cleaned, "\n")


# --- DuckDB twins ---------------------------------------------------------------
# SQL-fragment builders interpolating the same constants, so the oracle chain
# cannot drift from the Spark chain. ``expr`` must be a SQL expression string.


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def strip_tags_sql(expr: str) -> str:
    return f"regexp_replace({expr}, {_sql_quote(TAG_RE)}, '', 'g')"


def decode_entities_sql(expr: str) -> str:
    for ent, rep in ENTITIES:
        expr = f"replace({expr}, {_sql_quote(ent)}, {_sql_quote(rep)})"
    return expr


def drop_invisible_sql(expr: str) -> str:
    for pat in (SCRIPT_RE, STYLE_RE, COMMENT_RE):
        expr = f"regexp_replace({expr}, {_sql_quote(pat)}, '', 'g')"
    return f"regexp_replace({expr}, {_sql_quote(BLOCK_RE)}, chr(10), 'g')"


def anchor_text_sql(expr: str) -> str:
    # coalesce: DuckDB's array_to_string of an empty list is NULL where
    # Spark's array_join is '' — patch the engine difference here, once.
    return (
        f"coalesce(array_to_string("
        f"regexp_extract_all({expr}, {_sql_quote(ANCHOR_RE)}, 1), ''), '')"
    )


def _keep_line_sql(var: str = "y") -> str:
    visible = strip_tags_sql(var)
    n_words = f"len(regexp_extract_all({visible}, {_sql_quote(WORD_RE)}))"
    return (
        f"{n_words} >= {MIN_WORDS} AND "
        f"2 * length({anchor_text_sql(var)}) <= length({visible})"
    )


def html_lines_sql(expr: str) -> str:
    return f"string_split({drop_invisible_sql(expr)}, chr(10))"


def kept_lines_sql(expr: str) -> str:
    return f"list_filter({html_lines_sql(expr)}, y -> {_keep_line_sql('y')})"


def extract_text_sql(expr: str) -> str:
    cleaned = (
        f"list_transform({kept_lines_sql(expr)}, "
        f"y -> trim({decode_entities_sql(strip_tags_sql('y'))}))"
    )
    return f"coalesce(array_to_string({cleaned}, chr(10)), '')"
