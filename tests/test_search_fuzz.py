"""Randomized differentials for the search family: postings and phrase hits
computed by brute force in Python over hundreds of random small-alphabet
documents (dense phrase collisions, repeated tokens, empty docs) must match
the Spark operators row for row."""

import random

from clickhouse_etl_loadtest_spark.queries import load_all
from clickhouse_etl_loadtest_spark.queries.text import _PHRASE

REG = load_all()

ALPHABET = ["fast", "table", "merge", "scan", "fast1", "t"]


def _corpus(rng, n_docs=250):
    docs = []
    for i in range(1, n_docs + 1):
        n = rng.randint(0, 12)
        docs.append((i, " ".join(rng.choice(ALPHABET) for _ in range(n))))
    return docs


def _write(spark, tmp_path, docs):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_inverted_index_matches_brute_force(spark, tmp_path):
    rng = random.Random(77)
    docs = _corpus(rng)
    sf = _write(spark, tmp_path, docs)
    expected = {}
    for doc_id, text in docs:
        for pos, tok in enumerate(text.split(), start=1):
            expected.setdefault((tok, doc_id), []).append(pos)
    got = {
        (r["token"], r["doc_id"]): r
        for r in REG["doc_inverted_index"].fn(spark, sf).collect()
    }
    assert set(got) == set(expected)
    for key, positions in expected.items():
        r = got[key]
        assert r["n_occurrences"] == len(positions)
        assert (r["first_pos"], r["last_pos"]) == (positions[0], positions[-1])
        assert r["positions_csv"] == ",".join(map(str, positions))


def test_phrase_search_matches_brute_force(spark, tmp_path):
    rng = random.Random(78)
    docs = _corpus(rng)
    sf = _write(spark, tmp_path, docs)
    w1, w2 = _PHRASE
    expected = {}
    for doc_id, text in docs:
        toks = text.split()
        hits = [i + 1 for i in range(len(toks) - 1) if toks[i] == w1 and toks[i + 1] == w2]
        if hits:
            expected[doc_id] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_hits"], r["first_hit"])
        for r in REG["doc_phrase_search"].fn(spark, sf).collect()
    }
    assert got == expected
    assert expected, "fuzz corpus must actually contain phrase hits"
