"""robots.txt politeness decisions (RFC 9309 §2.2.2 longest-match
precedence), shared by the batch query (``queries/web.py::doc_robots_filter``)
and the incremental WET ingestion path (``operators/wetstream.py``) — crawl
pipelines honor per-host robots rules BEFORE any content stage (C4, CCNet,
RefinedWeb all start from robots-respecting crawls).

Reference scope: the reference repo has no web stage (its sources are
Kafka/ClickHouse, ``src/utils/kafka.py`` / ``src/utils/clickhouse.py``); this
is part of the LLM-pipeline extension.

Scale: the rules side is robots-file-sized (a few rules per host) and
BROADCASTS — the corpus side never shuffles for the match; the winner
resolution is a doc-keyed window over matched (doc, rule) rows (a few per
doc, bounded by rules-per-host), then one doc-keyed join back to carry
no-match pages through. Prefix matching is ``startswith`` — sargable,
codegen'd, no regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_verdict(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """The reusable RFC 9309 decision: pages ``(doc_id, host, path)`` ×
    rules ``(host, rule_type ∈ {allow, disallow}, prefix)`` →
    ``(doc_id, host, path, matched_rule, matched_prefix, allowed)``.
    Longest matching prefix wins; Allow beats Disallow on a length tie; a
    page matching no rule is allowed. Fuzz-pinned against a pure-Python
    reference on random rule sets in ``tests/test_robots.py``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.length("prefix").desc(),
        (F.col("rule_type") == "allow").desc(),
        "prefix",
        "rule_type",
    )
    winners = (
        pages.join(F.broadcast(rules), "host")
        .where(F.col("path").startswith(F.col("prefix")))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("doc_id", "rule_type", "prefix")
    )
    return pages.join(winners, "doc_id", "left").select(
        "doc_id",
        "host",
        "path",
        F.coalesce("rule_type", F.lit("none")).alias("matched_rule"),
        F.coalesce("prefix", F.lit("")).alias("matched_prefix"),
        (F.col("rule_type").isNull() | (F.col("rule_type") == "allow")).alias(
            "allowed"
        ),
    )
