"""Independent differential test for doc_kneser_ney_logprob: a pure-Python
interpolated-KN bigram model built from scratch (no shared code, no shared
formula string) must reproduce the Spark query's per-document cross-entropy
on a constructed corpus — a misconception shared by the Spark expression and
its same-formula DuckDB oracle cannot pass here. Also pins the semantic KN
property that separates it from raw frequency back-off."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries import load_all
from clickhouse_etl_loadtest_spark.queries.curation import _KN_D

REG = load_all()

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog and a bird"),
    (4, "san francisco san francisco san diego"),
    (5, "the the the the"),
]


def _write(spark, tmp_path):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in DOCS],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _py_kn():
    """Reference interpolated KN bigram model over DOCS, d fixed."""
    bigrams = []
    per_doc = {}
    for doc_id, text in DOCS:
        toks = text.split()
        bs = list(zip(toks, toks[1:]))
        per_doc[doc_id] = bs
        bigrams.extend(bs)
    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    n1p_fwd = Counter(w1 for (w1, _w2) in c12)
    n1p_bwd = Counter(w2 for (_w1, w2) in c12)
    n_types = len(c12)

    def p(w1, w2):
        cont = n1p_bwd[w2] / n_types
        lam = _KN_D * n1p_fwd[w1] / c1[w1]
        return max(c12[(w1, w2)] - _KN_D, 0.0) / c1[w1] + lam * cont

    return per_doc, p


def test_matches_pure_python_reference(spark, tmp_path):
    sf = _write(spark, tmp_path)
    rows = {r["doc_id"]: r for r in REG["doc_kneser_ney_logprob"].fn(spark, sf).collect()}
    per_doc, p = _py_kn()
    assert set(rows) == set(per_doc)
    for doc_id, bs in per_doc.items():
        expected = sum(-math.log(p(w1, w2)) for w1, w2 in bs) / len(bs)
        assert rows[doc_id]["n_bigrams"] == len(bs)
        assert rows[doc_id]["cross_entropy_nats"] == pytest.approx(expected, rel=1e-9)


def test_continuation_counts_not_raw_frequency(spark, tmp_path):
    """The KN signature (the 'san francisco' example): 'francisco' is
    frequent but follows exactly ONE context, so its continuation count —
    what KN backs off to — must be minimal despite its raw frequency, while
    'the' follows several distinct contexts."""
    per_doc, _p = _py_kn()
    bigrams = [b for bs in per_doc.values() for b in bs]
    c12 = Counter(bigrams)
    n1p_bwd = Counter(w2 for (_w1, w2) in c12)
    assert n1p_bwd["francisco"] == 1
    assert n1p_bwd["the"] >= 2
    # and the Spark scores respect predictability: doc 5 (one bigram type
    # repeated) must come out more predictable than the varied doc 3
    sf = _write(spark, tmp_path)
    out = {
        r["doc_id"]: r["cross_entropy_nats"]
        for r in REG["doc_kneser_ney_logprob"].fn(spark, sf).collect()
    }
    assert out[5] < out[3]
