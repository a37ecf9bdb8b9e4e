"""Randomized ground-truth fuzzing for the repeated-span family: corpora are
CONSTRUCTED (seeded) with known shared runs, so expected spans/coverage come
from the construction, not from any re-implementation of the algorithm —
the randomized complement of the hand-computed cases in test_span_ops.py.

Construction invariants that make the ground truth exact:
- every base token is globally unique (doc-prefixed), so the ONLY repeated
  >= W-token windows are the inserted shared runs;
- each document receives at most one run instance, so spans never merge
  across runs within a doc;
- each run goes to >= 2 documents (cross-doc by construction) and run
  lengths are >= W (detectable by contract).
"""

import random

import pytest

from clickhouse_etl_loadtest_spark.queries import load_all
from clickhouse_etl_loadtest_spark.queries.curation import _SPAN_W

REG = load_all()


def _build_corpus(rng: random.Random, n_docs: int, n_runs: int):
    """Returns (rows, expected) where expected maps doc_id -> (start, end)
    of its single shared span (1-based token positions), absent if clean."""
    base_len = {d: rng.randint(_SPAN_W, 60) for d in range(n_docs)}
    docs = {d: [f"d{d}tok{i}" for i in range(base_len[d])] for d in range(n_docs)}
    expected: dict[int, tuple[int, int]] = {}
    free = list(range(n_docs))
    rng.shuffle(free)
    for r in range(n_runs):
        if len(free) < 2:
            break
        share = [free.pop() for _ in range(rng.randint(2, min(3, len(free))))]
        run_len = rng.randint(_SPAN_W, _SPAN_W + 12)
        run = [f"run{r}tok{i}" for i in range(run_len)]
        for d in share:
            at = rng.randint(0, len(docs[d]))  # insertion point in the base
            docs[d] = docs[d][:at] + run + docs[d][at:]
            expected[d] = (at + 1, at + run_len)
    rows = [(d, " ".join(docs[d]), "en", "src", 0) for d in range(n_docs)]
    return rows, expected


@pytest.mark.parametrize("seed", range(12))
def test_spans_and_coverage_match_construction(spark, tmp_path, seed):
    rng = random.Random(7000 + seed)
    rows, expected = _build_corpus(rng, n_docs=rng.randint(4, 10), n_runs=rng.randint(1, 3))
    sf = str(tmp_path / f"c{seed}")
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in REG["doc_repeated_spans"].fn(spark, sf).collect()
    }
    assert got == expected

    cov = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in REG["doc_span_dup_coverage"].fn(spark, sf).collect()
    }
    for d, text, *_ in rows:
        n_tokens = len(text.split())
        want_dup = (expected[d][1] - expected[d][0] + 1) if d in expected else 0
        assert cov[d] == (n_tokens, want_dup), (d, cov[d])

    scrub = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"])
        for r in REG["doc_span_scrub"].fn(spark, sf).collect()
    }
    for d in cov:
        n_tokens, dup = cov[d]
        assert scrub[d] == (n_tokens, n_tokens - dup)
