"""Known-answer tests for the search family (queries/text.py:
doc_inverted_index / doc_bm25_scores / doc_phrase_search) and the
temperature mixture (queries/curation.py: doc_temperature_mixture).

The DuckDB oracles in the registry are same-formula twins; these cases are
computed BY HAND on constructed corpora, so a misconception shared by both
engine expressions (wrong idf form, off-by-one phrase adjacency, inverted
temperature direction) cannot pass here."""

import math

import pytest

from clickhouse_etl_loadtest_spark.queries import load_all
from clickhouse_etl_loadtest_spark.queries.curation import (
    _MIX_ALPHA,
    _MIX_TEMPERATURE,
)
from clickhouse_etl_loadtest_spark.queries.text import _BM25_B, _BM25_K1, _BM25_QUERY

REG = load_all()


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i + 1, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


# --- inverted index ------------------------------------------------------------------


def test_inverted_index_positions_counts(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, ["alpha beta alpha", "beta"])
    rows = {
        (r["token"], r["doc_id"]): r
        for r in REG["doc_inverted_index"].fn(spark, sf).collect()
    }
    assert set(rows) == {("alpha", 1), ("beta", 1), ("beta", 2)}
    a1 = rows[("alpha", 1)]
    assert (a1["n_occurrences"], a1["first_pos"], a1["last_pos"]) == (2, 1, 3)
    assert a1["positions_csv"] == "1,3"
    assert rows[("beta", 1)]["positions_csv"] == "2"
    assert rows[("beta", 2)]["positions_csv"] == "1"


# --- BM25 ---------------------------------------------------------------------------


def _bm25_term(tf, df, n_docs, dl, avgdl):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (_BM25_K1 + 1.0) / (
        tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
    )


def test_bm25_hand_computed_scores(spark, tmp_path):
    # _BM25_QUERY == ("fast", "table", "merge"); corpus built so that
    # N=4, avgdl=6, df(fast)=2, df(table)=2, df(merge)=1 — all hand-checked
    assert _BM25_QUERY == ("fast", "table", "merge")
    sf = _write_docs(
        spark,
        tmp_path,
        [
            "fast fast table x1 x2 x3",  # dl=6: tf fast=2, table=1
            "fast y1 y2 y3 y4 y5 y6 y7 y8 y9",  # dl=10: tf fast=1
            "z1 z2 z3 z4",  # dl=4: no query terms -> excluded
            "merge table w1 w2",  # dl=4: tf merge=1, table=1
        ],
    )
    rows = {r["doc_id"]: r for r in REG["doc_bm25_scores"].fn(spark, sf).collect()}
    assert set(rows) == {1, 2, 4}  # doc 3 matches nothing
    assert rows[1]["n_query_terms"] == 2
    assert rows[2]["n_query_terms"] == 1
    assert rows[4]["n_query_terms"] == 2
    n, avgdl = 4, 6.0
    exp1 = _bm25_term(2, 2, n, 6, avgdl) + _bm25_term(1, 2, n, 6, avgdl)
    exp2 = _bm25_term(1, 2, n, 10, avgdl)
    exp4 = _bm25_term(1, 1, n, 4, avgdl) + _bm25_term(1, 2, n, 4, avgdl)
    assert rows[1]["bm25"] == pytest.approx(exp1, rel=1e-12)
    assert rows[2]["bm25"] == pytest.approx(exp2, rel=1e-12)
    assert rows[4]["bm25"] == pytest.approx(exp4, rel=1e-12)
    # semantic: the rare term dominates — doc 4's single `merge` hit
    # (df=1, idf ln(10/3)) in a short doc outranks doc 1's two common-term
    # hits (both df=2, idf ln 2); both far outrank the long single-hit doc
    assert rows[4]["bm25"] > rows[1]["bm25"] > rows[2]["bm25"]


def test_bm25_rarer_term_scores_higher_at_equal_tf(spark, tmp_path):
    # same dl and tf, different df: the merge-only doc must outrank the
    # fast-only doc because merge is rarer (df 1 vs 3)
    sf = _write_docs(
        spark,
        tmp_path,
        ["merge a b c", "fast a b c", "fast d e f", "fast g h i"],
    )
    rows = {r["doc_id"]: r["bm25"] for r in REG["doc_bm25_scores"].fn(spark, sf).collect()}
    assert rows[1] > rows[2] == pytest.approx(rows[3], rel=1e-12)


# --- phrase search ------------------------------------------------------------------


def test_phrase_search_adjacency_only(spark, tmp_path):
    # _PHRASE == ("fast", "table"): only ADJACENT, ordered occurrences count
    sf = _write_docs(
        spark,
        tmp_path,
        [
            "fast table a fast table",  # hits at pos 1 and 4
            "fast x table fast",  # gap -> no hit
            "table fast",  # reversed -> no hit
            "b fast fast table",  # overlapping firsts: hit only at pos 3
        ],
    )
    rows = {r["doc_id"]: r for r in REG["doc_phrase_search"].fn(spark, sf).collect()}
    assert set(rows) == {1, 4}
    assert (rows[1]["n_hits"], rows[1]["first_hit"]) == (2, 1)
    assert (rows[4]["n_hits"], rows[4]["first_hit"]) == (1, 3)


# --- temperature mixture ------------------------------------------------------------


def test_temperature_flattens_toward_uniform(spark, tmp_path):
    # source src0 gets docs 1,3 (even idx), src1 gets 2,4 — build a corpus
    # where src0 dominates tokens; with T>1 the tempered sample_prob must
    # sit strictly BETWEEN the natural share and uniform (the flattening
    # direction round 5 initially had backwards).
    assert _MIX_TEMPERATURE > 1.0 and _MIX_ALPHA == 1.0 / _MIX_TEMPERATURE
    sf = _write_docs(
        spark,
        tmp_path,
        [
            " ".join(f"a{i}" for i in range(90)),  # src0: 90 tokens
            "b1 b2 b3 b4 b5",  # src1: 5 tokens
            " ".join(f"c{i}" for i in range(90)),  # src0: 90 tokens
            "d1 d2 d3 d4 d5",  # src1: 5 tokens
        ],
    )
    rows = {r["source"]: r for r in REG["doc_temperature_mixture"].fn(spark, sf).collect()}
    big, small = rows["src0"], rows["src1"]
    assert big["n_tokens"] == 180 and small["n_tokens"] == 10
    # probabilities normalize and preserve order
    assert big["sample_prob"] + small["sample_prob"] == pytest.approx(1.0, rel=1e-12)
    assert big["sample_prob"] > small["sample_prob"]
    # flattening: tail source up-sampled above its share, head below, neither
    # crossing uniform (0.5)
    assert small["token_share"] < small["sample_prob"] < 0.5
    assert big["token_share"] > big["sample_prob"] > 0.5
    # epochs_at_budget: tail source repeats more often per token held
    assert small["epochs_at_budget"] > big["epochs_at_budget"]
    # exact closed form: q = p^alpha / Z
    pa_big, pa_small = big["token_share"] ** _MIX_ALPHA, small["token_share"] ** _MIX_ALPHA
    assert big["sample_prob"] == pytest.approx(pa_big / (pa_big + pa_small), rel=1e-12)


# --- hybrid RRF ---------------------------------------------------------------------


def _write_embeddings(spark, tmp_path, vecs):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        schema="vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


def test_hybrid_rrf_hand_computed(spark, tmp_path):
    # text side: doc 1 matches 'merge' (rare) + short -> text_rank 1;
    # doc 2 matches 'fast' twice -> rank 2; doc 3 matches 'fast' once,
    # longer -> rank 3; doc 4 matches nothing -> no text rank.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            "merge a b c",
            "fast fast b c",
            "fast c d e f g",
            "x y z",
        ],
    )
    # vector side: query is vec 0 = e1. cosines against it: vec 1 = e1
    # (cos 1.0), vec 2 = (1,1,0,...)/sqrt2 (cos ~0.707), vec 3 = e2 (cos 0),
    # vec 4 = -e1 (cos -1). doc_id/vec_id share the id space; doc 4 has the
    # worst vector rank but still gets one (top-50 keeps all 4 candidates).
    dim = 64
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    diag = [1.0, 1.0] + [0.0] * (dim - 2)
    neg = [-1.0] + [0.0] * (dim - 1)
    _write_embeddings(spark, tmp_path, [e1, e1, diag, e2, neg])
    rows = {r["item_id"]: r for r in REG["hybrid_search_rrf"].fn(spark, sf).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert [rows[i]["text_rank"] for i in (1, 2, 3)] == [1, 2, 3]
    assert rows[4]["text_rank"] is None
    assert [rows[i]["vec_rank"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    for i in (1, 2, 3, 4):
        expected = (
            1.0 / (60 + rows[i]["text_rank"]) if rows[i]["text_rank"] else 0.0
        ) + 1.0 / (60 + rows[i]["vec_rank"])
        assert rows[i]["rrf"] == pytest.approx(expected, rel=1e-12)
    # fusion semantics: the item strong in BOTH modalities wins overall
    assert rows[1]["rrf"] == max(r["rrf"] for r in rows.values())


# --- feature-hashing embeddings -----------------------------------------------------


def test_hashed_embeddings_separate_near_dups_from_strangers(spark, tmp_path):
    import numpy as np

    base = "spark table scan merge batch window filter join group value " * 5
    near = base.replace("window", "pane", 1)  # one-token mutation
    other = " ".join(f"w{i}" for i in range(50))
    sf = _write_docs(spark, tmp_path, [base, near, other])
    rows = {r["doc_id"]: np.array(r["embedding"]) for r in REG["doc_embedding_hashed"].fn(spark, sf).collect()}
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-9 for v in rows.values())
    cos = lambda a, b: float(a @ b)
    assert cos(rows[1], rows[2]) > 0.95  # near-dup pair
    assert cos(rows[1], rows[3]) < 0.5  # unrelated doc
