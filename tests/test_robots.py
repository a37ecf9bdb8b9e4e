"""RFC 9309 precedence fuzz: queries/web.py::robots_verdict against a
pure-Python reference on random rule sets — the same third-engine
discipline the HTML extraction and PII waves carry. The registry query's
derived rules exercise the precedence branches on fixed shapes; this file
proves the decision logic on ADVERSARIAL shapes (duplicate prefixes, empty
prefixes, allow/disallow ties at every length, multi-host collisions).
"""

from __future__ import annotations

import random

from clickhouse_etl_loadtest_spark.queries.web import robots_verdict


def _py_verdict(path: str, rules: list[tuple[str, str]]) -> tuple[str, str, bool]:
    """(matched_rule, matched_prefix, allowed) per RFC 9309 §2.2.2: longest
    matching prefix wins, allow beats disallow on a tie, no match allows."""
    matches = [(t, p) for t, p in rules if path.startswith(p)]
    if not matches:
        return "none", "", True
    # longest first; on equal length allow first; then the query's
    # deterministic tiebreaks (prefix, rule_type ascending)
    best = sorted(matches, key=lambda m: (-len(m[1]), m[0] != "allow", m[1], m[0]))[0]
    return best[0], best[1], best[0] == "allow"


def test_precedence_fuzz_vs_python_reference(spark):
    rng = random.Random(99)
    segs = ["", "/a", "/ab", "/a/b", "/b", "/doc", "/doc/1", "/doc/12", "/private"]
    pages, rules, expected = [], [], {}
    doc_id = 0
    for host_i in range(12):
        host = f"h{host_i}.example.com"
        host_rules = [
            (rng.choice(["allow", "disallow"]), rng.choice(segs) + rng.choice(segs))
            for _ in range(rng.randrange(0, 6))
        ]
        # force tie shapes: same prefix under both verdicts sometimes
        if host_i % 3 == 0 and host_rules:
            t, p = host_rules[0]
            host_rules.append(("allow" if t == "disallow" else "disallow", p))
        rules.extend((host, t, p) for t, p in host_rules)
        for _ in range(8):
            path = rng.choice(segs) + rng.choice(segs) + f"/{rng.randrange(100)}"
            pages.append((doc_id, host, path))
            expected[doc_id] = _py_verdict(path, host_rules)
            doc_id += 1

    pages_df = spark.createDataFrame(pages, "doc_id long, host string, path string")
    rules_df = spark.createDataFrame(rules, "host string, rule_type string, prefix string")
    got = {
        r["doc_id"]: (r["matched_rule"], r["matched_prefix"], r["allowed"])
        for r in robots_verdict(pages_df, rules_df).collect()
    }
    assert got == expected


def test_empty_rules_allow_everything(spark):
    pages_df = spark.createDataFrame(
        [(1, "h.example.com", "/doc/1")], "doc_id long, host string, path string"
    )
    rules_df = spark.createDataFrame([], "host string, rule_type string, prefix string")
    (row,) = robots_verdict(pages_df, rules_df).collect()
    assert (row["matched_rule"], row["matched_prefix"], row["allowed"]) == (
        "none",
        "",
        True,
    )


def test_empty_prefix_matches_everything_but_loses_to_specific(spark):
    """'' is a valid prefix (Disallow: matches nothing per robots.txt, but
    as a PREFIX rule it matches every path at length 0) — any non-empty
    match must beat it; alone it decides."""
    pages_df = spark.createDataFrame(
        [(1, "h", "/doc/9"), (2, "h", "/x")], "doc_id long, host string, path string"
    )
    rules_df = spark.createDataFrame(
        [("h", "disallow", ""), ("h", "allow", "/doc/")],
        "host string, rule_type string, prefix string",
    )
    rows = {r["doc_id"]: r for r in robots_verdict(pages_df, rules_df).collect()}
    assert rows[1]["allowed"] and rows[1]["matched_prefix"] == "/doc/"
    assert not rows[2]["allowed"] and rows[2]["matched_prefix"] == ""
