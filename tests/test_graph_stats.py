"""Independent twins for the round-7 corpus/graph statistics whose Spark
and DuckDB sides share one formula: a shared-formula oracle cannot catch an
algebra error, so these tests recompute the statistic from first principles
in pure Python — full-vocabulary Jensen-Shannon (no inner-join identity)
and direct endpoint-degree Pearson — on synthetic inputs, then compare."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries import load_all

REGISTRY = load_all()


def _write_docs(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _tokens(text: str) -> list[str]:
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _brute_js(corpus_a: list[str], corpus_b: list[str]) -> float:
    # full-union JS, no analytic shortcut: 0.5*KL(p||m) + 0.5*KL(q||m)
    from collections import Counter

    ca = Counter(t for s in corpus_a for t in _tokens(s))
    cb = Counter(t for s in corpus_b for t in _tokens(s))
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for tok in set(ca) | set(cb):
        p, q = ca.get(tok, 0) / na, cb.get(tok, 0) / nb
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log(p / m)
        if q:
            js += 0.5 * q * math.log(q / m)
    return js


def test_js_divergence_matches_full_union_brute_force(tmp_path, spark):
    # disjoint + overlapping vocabulary across sources, so the one-sided
    # mass terms of the inner-join identity actually carry weight
    a = ["alpha beta gamma alpha", "beta beta delta", "alpha zeta"]
    b = ["gamma gamma epsilon", "epsilon theta theta beta", "iota"]
    rows = [(i, t, "en", "srcA", len(t)) for i, t in enumerate(a)]
    rows += [(100 + i, t, "en", "srcB", len(t)) for i, t in enumerate(b)]
    _write_docs(spark, str(tmp_path), rows)
    got = REGISTRY["doc_source_js_divergence"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].source_a == "srcA" and got[0].source_b == "srcB"
    assert abs(got[0].js_divergence - round(_brute_js(a, b), 6)) <= 1e-6


def test_js_divergence_is_zero_for_identical_sources(tmp_path, spark):
    a = ["one two three two", "four five one"]
    rows = [(i, t, "en", "srcA", len(t)) for i, t in enumerate(a)]
    rows += [(50 + i, t, "en", "srcB", len(t)) for i, t in enumerate(a)]
    _write_docs(spark, str(tmp_path), rows)
    got = REGISTRY["doc_source_js_divergence"].fn(spark, str(tmp_path)).collect()
    assert got[0].js_divergence == 0.0


def test_assortativity_matches_direct_pearson(spark, sf_dir):
    # recompute endpoint-degree Pearson from the raw pair list, no moment
    # algebra: statistics.correlation over the directed edge degree pairs
    from statistics import correlation

    from clickhouse_etl_loadtest_spark.queries.text import _verified_pairs

    pairs = [(r.doc_a, r.doc_b) for r in _verified_pairs(spark, sf_dir).collect()]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in pairs] + [deg[b] for a, b in pairs]
    ys = [deg[b] for a, b in pairs] + [deg[a] for a, b in pairs]
    got = REGISTRY["doc_dup_graph_assortativity"].fn(spark, sf_dir).collect()[0]
    assert got.n_edges == len(pairs)
    if len(set(xs)) > 1 and len(set(ys)) > 1:
        assert abs(got.assortativity - round(correlation(xs, ys), 6)) <= 1e-6
    else:
        assert got.assortativity is None
