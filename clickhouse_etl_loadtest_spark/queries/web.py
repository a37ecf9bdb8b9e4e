"""URL/host-level curation: the pre-text-dedup wave of a web-scale pipeline
(RefinedWeb/Gopher-style; SURVEY.md §7.6 extension — the reference has no
web-curation stage).

The documents fixture carries no URL column, so each query derives one
deterministically from ``(doc_id, source)`` — deliberately messy (mixed-case
schemes and hosts, ``www.`` prefixes, scheme-default ports, tracking params
in both positions, fragments, trailing slashes) — with the IDENTICAL
arithmetic in the DuckDB oracle, so the driver value-checks the
normalization itself, not just counts.

Scale notes (100 TB):
- ``doc_url_normalize``: pure column expressions (functions/urls.py), map-only
  — no shuffle, no UDF; the plan is one scan + project.
- ``doc_host_cap_sample``: ONE shuffle — a row_number window PARTITIONED by
  host (host cardinality ~ domains; per-host sort bounded by docs-per-host,
  AQE skew-split covers megahosts).
- ``doc_host_mixture_weights``: per-host rollup (one shuffle on host) + a
  1-row grand-total broadcast — the ``source_mixing_weights`` shape at host
  granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import TRACKING_PARAM_RE, url_host, url_normalize
from ..operators.robots import robots_verdict
from . import register
from .text import _docs

__all__ = ["robots_verdict"]  # re-export: the decision op lives in operators/

# --- deterministic messy-URL derivation (Spark + SQL twins) --------------------------


def _raw_url() -> Column:
    d = F.col("doc_id")
    scheme = F.when(d % 7 == 0, "HTTPS").when(d % 7 == 1, "Http").otherwise("http")
    host = (
        F.when(d % 3 == 0, F.concat(F.lit("WWW."), F.col("source"), F.lit(".Example.COM")))
        .when(d % 3 == 1, F.concat(F.col("source"), F.lit(".example.com")))
        .otherwise(F.concat(F.lit("www."), F.col("source"), F.lit(".EXAMPLE.com")))
    )
    port = F.when(
        d % 5 == 0, F.when(d % 7 == 0, F.lit(":443")).otherwise(F.lit(":80"))
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/d/"),
        (d % 40).cast("string"),
        F.when(d % 6 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    qs = (
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("?utm_source=s"),
                (d % 4).cast("string"),
                F.lit("&id="),
                (d % 10).cast("string"),
            ),
        )
        .when(
            d % 11 == 0,
            F.concat(
                F.lit("?id="),
                (d % 10).cast("string"),
                F.lit("&utm_medium=m&ref="),
                (d % 3).cast("string"),
            ),
        )
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 4 == 1, F.concat(F.lit("#s"), (d % 3).cast("string"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), host, port, path, qs, frag)


_RAW_URL_SQL = """
    (CASE WHEN doc_id % 7 = 0 THEN 'HTTPS' WHEN doc_id % 7 = 1 THEN 'Http' ELSE 'http' END)
    || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || source || '.Example.COM'
             WHEN doc_id % 3 = 1 THEN source || '.example.com'
             ELSE 'www.' || source || '.EXAMPLE.com' END)
    || (CASE WHEN doc_id % 5 = 0 THEN (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE ':80' END) ELSE '' END)
    || '/d/' || CAST(doc_id % 40 AS VARCHAR)
    || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=s' || CAST(doc_id % 4 AS VARCHAR) || '&id=' || CAST(doc_id % 10 AS VARCHAR)
             WHEN doc_id % 11 = 0 THEN '?id=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_medium=m&ref=' || CAST(doc_id % 3 AS VARCHAR)
             ELSE '' END)
    || (CASE WHEN doc_id % 4 = 1 THEN '#s' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END)
"""

# DuckDB twin of functions/urls.py (regexp_replace needs the explicit 'g'
# flag where Spark's is always-global; anchored patterns match once so the
# flag is only needed on the tracking-param strip)
_URL_CTES = f"""
raw AS (
    SELECT doc_id, source, n_chars, {_RAW_URL_SQL} AS raw_url FROM documents
),
norm AS (
    SELECT *,
        lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
        lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
        regexp_replace(regexp_replace(raw_url, '#.*$', ''), '^[A-Za-z]+://[^/?#]+', '') AS pq
    FROM raw
),
parts AS (
    SELECT *,
        CASE WHEN scheme = 'http'  THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':443$', '')
             ELSE regexp_replace(hostport, '^www\\.', '') END AS host,
        regexp_replace(regexp_extract(pq, '^([^?]*)', 1), '/+$', '') AS path_norm,
        regexp_extract(pq, '\\?(.*)$', 1) AS q0
    FROM norm
),
cleaned AS (
    SELECT *,
        regexp_replace(regexp_replace(q0, '(^|&){TRACKING_PARAM_RE}=[^&]*', '', 'g'), '^&+', '') AS q1
    FROM parts
),
urls AS (
    SELECT doc_id, source, n_chars, raw_url, host,
        scheme || '://' || host || path_norm
          || (CASE WHEN array_to_string(list_sort(string_split(q1, '&')), '&') <> ''
                   THEN '?' || array_to_string(list_sort(string_split(q1, '&')), '&')
                   ELSE '' END) AS url_norm
    FROM cleaned
)
"""

_URL_NORMALIZE_ORACLE = f"""
WITH {_URL_CTES}
SELECT doc_id, raw_url, url_norm, host FROM urls ORDER BY doc_id
"""


@register("doc_url_normalize", _URL_NORMALIZE_ORACLE, extra=True)
def doc_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL per document: lowercased scheme/host, no ``www.``, no
    default port, no fragment, tracking params stripped, surviving params
    sorted, trailing slash trimmed (functions/urls.py::url_normalize).

    Map-only: one scan, one projection of string/regexp expressions — the
    whole operator runs inside WholeStageCodegen with zero exchanges, so at
    100 TB it is scan-bound.
    """
    d = _docs(spark, sf_dir).select("doc_id", _raw_url().alias("raw_url"))
    return d.select(
        "doc_id",
        "raw_url",
        url_normalize(F.col("raw_url")).alias("url_norm"),
        url_host(F.col("raw_url")).alias("host"),
    ).orderBy("doc_id")


# --- per-host document cap (RefinedWeb-style) ----------------------------------------

_HOST_CAP = 5  # keep at most this many docs per canonical host

_HOST_CAP_ORACLE = f"""
WITH {_URL_CTES},
ranked AS (
    SELECT doc_id, host,
           ROW_NUMBER() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id) AS host_rank
    FROM urls
)
SELECT doc_id, host, CAST(host_rank AS BIGINT) AS host_rank
FROM ranked WHERE host_rank <= {_HOST_CAP}
ORDER BY doc_id
"""


@register("doc_host_cap_sample", _HOST_CAP_ORACLE, extra=True)
def doc_host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap: keep the top ``_HOST_CAP`` docs per canonical
    host, ranked by length (quality proxy) with doc_id as the deterministic
    tiebreak — the RefinedWeb-style guard against one domain dominating the
    corpus.

    ONE shuffle: a row_number window PARTITIONED by host. Host cardinality is
    domains (millions, not billions), per-host work is bounded by
    docs-per-host, and AQE's skew handling splits the rare megahost. No
    global sort, no collect.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select("doc_id", "n_chars", _raw_url().alias("raw_url"))
    w = Window.partitionBy("host").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select("doc_id", "n_chars", url_host(F.col("raw_url")).alias("host"))
        .withColumn("host_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("host_rank") <= _HOST_CAP)
        .select("doc_id", "host", "host_rank")
        .orderBy("doc_id")
    )


# --- host-level mixture weights -------------------------------------------------------

_HOST_ALPHA = 0.5  # temperature exponent: upweight tail hosts, cap head hosts

_HOST_MIX_ORACLE = f"""
WITH {_URL_CTES},
hosts AS (
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs FROM urls GROUP BY host
)
SELECT host, n_docs,
       pow(n_docs, {_HOST_ALPHA}) / SUM(pow(n_docs, {_HOST_ALPHA})) OVER () AS mix_weight
FROM hosts
ORDER BY host
"""


@register("doc_host_mixture_weights", _HOST_MIX_ORACLE, extra=True)
def doc_host_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened host mixing weights
    (``w_h = n_h^alpha / sum(n^alpha)``, alpha=0.5): the sampling
    distribution that keeps head domains from dominating while still
    favoring them — the host-level analogue of ``source_mixing_weights``.

    One shuffle (host rollup); the grand total is a 1-row aggregate joined
    back by broadcast, never a single-partition window.
    """
    d = _docs(spark, sf_dir).select(_raw_url().alias("raw_url"))
    hosts = (
        d.select(url_host(F.col("raw_url")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = hosts.agg(F.sum(F.pow("n_docs", F.lit(_HOST_ALPHA))).alias("denom"))
    return (
        hosts.crossJoin(F.broadcast(total))
        .select(
            "host",
            "n_docs",
            (F.pow("n_docs", F.lit(_HOST_ALPHA)) / F.col("denom")).alias("mix_weight"),
        )
        .orderBy("host")
    )


# --- URL-exact dedup (the first dedup pass of a crawl pipeline) ----------------------

_URL_DEDUP_ORACLE = f"""
WITH {_URL_CTES},
groups AS (
    SELECT url_norm,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM urls GROUP BY url_norm
)
SELECT url_norm, keep_doc_id, n_docs
FROM groups WHERE n_docs >= 2
ORDER BY url_norm
"""


@register("doc_url_dedup", _URL_DEDUP_ORACLE)
def doc_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-exact dedup decisions: canonical URLs claimed by >= 2 documents,
    with the kept doc (smallest doc_id) — the first dedup pass of every
    crawl pipeline, run BEFORE text-level dedup because it is free: one
    groupBy on the normalized URL (map-side combinable; at 100 TB hash the
    url_norm to a 60-bit key first if string shuffle volume matters —
    deliberately kept as the string here so the oracle checks the
    normalized URL text itself)."""
    d = _docs(spark, sf_dir).select("doc_id", _raw_url().alias("raw_url"))
    return (
        d.select("doc_id", url_normalize(F.col("raw_url")).alias("url_norm"))
        .groupBy("url_norm")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy("url_norm")
    )


# --- domain blocklist filtering (RefinedWeb §3.1 / UT1-style) -------------------------
# Blocking happens at the REGISTRABLE-DOMAIN level: an entry `srcK.example.com`
# must also block `cdn.srcK.example.com`, so matching is host == entry OR
# host endswith '.' + entry — implemented as a dotted-suffix expansion (at
# most #labels-1 candidates per host) joined against the broadcast blocklist.
# This query derives its OWN host variant (1 in 9 docs get a cdn. subdomain)
# so the suffix path is exercised; the shared _URL_CTES derivation is
# untouched. The blocklist itself is derived from the corpus' source list
# (every srcK with odd K is "listed"), identically in both engines.

_BLOCK_HOST_SQL = """
    (CASE WHEN doc_id % 9 = 5 THEN 'cdn.' || source || '.example.com'
          ELSE source || '.example.com' END)
"""

_BLOCKLIST_SQL = """
    SELECT DISTINCT source || '.example.com' AS entry
    FROM documents
    WHERE TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 2 = 1
"""

_URL_BLOCKLIST_ORACLE = f"""
WITH hosts AS (
    SELECT doc_id, {_BLOCK_HOST_SQL} AS host FROM documents
),
blocklist AS ({_BLOCKLIST_SQL}),
expanded AS (
    SELECT doc_id, host,
           unnest(list_transform(generate_series(1, len(string_split(host, '.')) - 1),
                                 i -> array_to_string(string_split(host, '.')[i : len(string_split(host, '.'))], '.')))
               AS suffix
    FROM hosts
),
matched AS (
    SELECT e.doc_id, MIN(e.suffix) AS matched_entry
    FROM expanded e JOIN blocklist b ON e.suffix = b.entry
    GROUP BY e.doc_id
)
SELECT h.doc_id, h.host,
       matched_entry IS NOT NULL AS blocked,
       COALESCE(matched_entry, '') AS matched_entry
FROM hosts h LEFT JOIN matched USING (doc_id)
ORDER BY doc_id
"""


@register("doc_url_blocklist_filter", _URL_BLOCKLIST_ORACLE)
def doc_url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filtering with registrable-domain suffix semantics:
    a listed domain blocks itself AND every subdomain (the UT1/RefinedWeb
    §3.1 stage). Matching expands each host into its dotted suffixes
    (bounded by label count) and joins the BROADCAST blocklist — at 100 TB
    the blocklist (UT1 is ~4M entries) broadcasts while the corpus side
    shuffles only (doc_id, suffix) short keys for the per-doc rollup;
    plan-gated: blocklist side BroadcastExchange, no text across exchanges.
    """
    d = _docs(spark, sf_dir)
    host = F.when(
        F.col("doc_id") % 9 == 5,
        F.concat(F.lit("cdn."), F.col("source"), F.lit(".example.com")),
    ).otherwise(F.concat(F.col("source"), F.lit(".example.com")))
    hosts = d.select("doc_id", host.alias("host"))
    blocklist = (
        d.select(F.col("source"))
        .where(F.regexp_extract("source", r"([0-9]+)$", 1).cast("bigint") % 2 == 1)
        .distinct()
        .select(F.concat(F.col("source"), F.lit(".example.com")).alias("entry"))
    )
    suffixes = F.expr(
        "transform(sequence(1, size(split(host, '\\\\.')) - 1),"
        " i -> array_join(slice(split(host, '\\\\.'), i, size(split(host, '\\\\.')) - i + 1), '.'))"
    )
    expanded = hosts.select(
        "doc_id", F.explode(suffixes).alias("suffix")
    )
    matched = (
        expanded.join(F.broadcast(blocklist), expanded.suffix == F.col("entry"))
        .groupBy("doc_id")
        .agg(F.min("suffix").alias("matched_entry"))
    )
    return (
        hosts.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            F.col("matched_entry").isNotNull().alias("blocked"),
            F.coalesce("matched_entry", F.lit("")).alias("matched_entry"),
        )
        .orderBy("doc_id")
    )


# --- robots.txt-style politeness filter (RFC 9309 longest-match) ----------------------
# Crawl pipelines honor per-host robots rules BEFORE any content stage (C4,
# CCNet, RefinedWeb all start from robots-respecting crawls). The decision
# rule is RFC 9309 §2.2.2: collect every rule whose path-prefix matches the
# URL path, pick the LONGEST match, and on a length tie the least
# restrictive (Allow) wins; a URL matching no rule is allowed. Rules are
# derived per host from the corpus source list — identically in both
# engines — with shapes that force every precedence branch: a blanket
# '/private/' Disallow, a LONGER '/private/doc/' Allow on K%3==0 hosts
# (longest-match overrides the blanket), a '/doc/1' Disallow on odd-K hosts
# (prefix matching on digits: blocks doc 1, 1x, 1xx), and a '/doc/' Allow
# everywhere.

_ROBOTS_K_SQL = "COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT), 0)"

_ROBOTS_ORACLE = f"""
WITH srcs AS (
    SELECT DISTINCT source, source || '.example.com' AS host,
           {_ROBOTS_K_SQL} AS k
    FROM documents
),
rules AS (
    SELECT host, 'disallow' AS rule_type, '/private/' AS prefix FROM srcs
    UNION ALL
    SELECT host, 'allow', '/private/doc/' FROM srcs WHERE k % 3 = 0
    UNION ALL
    SELECT host, 'disallow', '/doc/1' FROM srcs WHERE k % 2 = 1
    UNION ALL
    SELECT host, 'allow', '/doc/' FROM srcs
),
pages AS (
    SELECT doc_id, source || '.example.com' AS host,
           (CASE WHEN doc_id % 7 = 3 THEN '/private/doc/' ELSE '/doc/' END)
               || CAST(doc_id AS VARCHAR) AS path
    FROM documents
),
matched AS (
    SELECT p.doc_id, r.rule_type, r.prefix,
           ROW_NUMBER() OVER (
               PARTITION BY p.doc_id
               ORDER BY length(r.prefix) DESC,
                        (r.rule_type = 'allow') DESC, r.prefix, r.rule_type
           ) AS rnk
    FROM pages p JOIN rules r ON p.host = r.host
    WHERE starts_with(p.path, r.prefix)
)
SELECT p.doc_id, p.host, p.path,
       COALESCE(m.rule_type, 'none') AS matched_rule,
       COALESCE(m.prefix, '') AS matched_prefix,
       (m.rule_type IS NULL OR m.rule_type = 'allow') AS allowed
FROM pages p LEFT JOIN (SELECT * FROM matched WHERE rnk = 1) m USING (doc_id)
ORDER BY p.doc_id
"""


@register("doc_robots_filter", _ROBOTS_ORACLE)
def doc_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style politeness filtering with RFC 9309 precedence:
    longest matching path-prefix wins, Allow beats Disallow on a length
    tie, no match means allowed. Per-host rule sets and per-doc paths are
    derived from the corpus identically in both engines (see the block
    comment — the shapes force every precedence branch, including the
    longer-Allow-overrides-blanket-Disallow case).

    Scale: the rules side is robots-file-sized (a few rules per host) and
    BROADCASTS — the corpus side never shuffles for the match; the winner
    resolution is a doc-keyed window over matched (doc, rule) rows (a few
    per doc, bounded by rules-per-host), then one doc-keyed join back to
    carry no-match pages through. Prefix matching is ``startswith`` —
    sargable, codegen'd, no regex.
    """
    d = _docs(spark, sf_dir)
    host = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.concat(
        F.when(F.col("doc_id") % 7 == 3, F.lit("/private/doc/")).otherwise(
            F.lit("/doc/")
        ),
        F.col("doc_id").cast("string"),
    )
    pages = d.select("doc_id", host.alias("host"), path.alias("path"))
    srcs = (
        d.select("source")
        .distinct()
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            F.coalesce(
                F.regexp_extract("source", r"([0-9]+)$", 1).cast("bigint"), F.lit(0)
            ).alias("k"),
        )
    )
    # one rule-array per host, exploded — NOT a 4-way union of selects over
    # srcs, which would recompute the distinct-sources aggregate (and its
    # corpus scan) once per branch
    def _rule(t: str, p: str) -> Column:
        return F.struct(F.lit(t).alias("rule_type"), F.lit(p).alias("prefix"))

    rule_arr = F.filter(
        F.array(
            _rule("disallow", "/private/"),
            F.when(F.col("k") % 3 == 0, _rule("allow", "/private/doc/")),
            F.when(F.col("k") % 2 == 1, _rule("disallow", "/doc/1")),
            _rule("allow", "/doc/"),
        ),
        lambda r: r.isNotNull(),
    )
    rules = srcs.select("host", F.explode(rule_arr).alias("r")).select(
        "host", F.col("r.rule_type").alias("rule_type"), F.col("r.prefix").alias("prefix")
    )
    return robots_verdict(pages, rules).orderBy("doc_id")
