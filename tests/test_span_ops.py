"""Known-answer tests for the repeated-span family (queries/curation.py:
doc_repeated_spans / doc_span_dup_coverage / doc_span_scrub).

The DuckDB oracles in the registry are same-algorithm twins; these cases are
computed BY HAND on a synthetic corpus with an exactly known shared run, so
a misconception shared by both sides (off-by-one in window coverage, wrong
island merge rule, scrubbing the keeper too) cannot pass here."""

import hashlib

from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()

# docA and docB share a VERBATIM 12-token run; every other token is unique.
# With W=8 the run yields 5 windows per doc (12-8+1) that merge to one span
# covering exactly the shared tokens.
SHARED = " ".join(f"shared{i}" for i in range(12))
DOC_A = " ".join(f"pa{i}" for i in range(10)) + " " + SHARED + " " + " ".join(
    f"qa{i}" for i in range(5)
)  # 27 tokens, shared at 1-based positions 11..22
DOC_B = " ".join(f"rb{i}" for i in range(3)) + " " + SHARED + " " + " ".join(
    f"sb{i}" for i in range(8)
)  # 23 tokens, shared at positions 4..15
DOC_C = " ".join(f"uc{i}" for i in range(20))  # 20 unique tokens, untouched


def h60_py(s: str) -> int:
    """Python twin of functions/hashing.py::h60 for expected values."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _corpus(spark, tmp_path) -> str:
    spark.createDataFrame(
        [(1, DOC_A, "en", "src", len(DOC_A)), (2, DOC_B, "en", "src", len(DOC_B)),
         (3, DOC_C, "en", "src", len(DOC_C))],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_repeated_spans_exact_boundaries(spark, tmp_path):
    rows = [tuple(r) for r in REG["doc_repeated_spans"].fn(spark, _corpus(spark, tmp_path)).collect()]
    # (doc_id, span_start, span_end, span_tokens, n_windows)
    assert rows == [(1, 11, 22, 12, 5), (2, 4, 15, 12, 5)]


def test_span_coverage_exact_ratios(spark, tmp_path):
    rows = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_token_ratio"])
        for r in REG["doc_span_dup_coverage"].fn(spark, _corpus(spark, tmp_path)).collect()
    }
    assert rows[1] == (27, 12, 12 / 27)
    assert rows[2] == (23, 12, 12 / 23)
    assert rows[3] == (20, 0, 0.0)


def test_span_scrub_cuts_exactly_the_shared_run(spark, tmp_path):
    rows = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["scrubbed_hash"])
        for r in REG["doc_span_scrub"].fn(spark, _corpus(spark, tmp_path)).collect()
    }
    kept_a = " ".join(f"pa{i}" for i in range(10)) + " " + " ".join(f"qa{i}" for i in range(5))
    kept_b = " ".join(f"rb{i}" for i in range(3)) + " " + " ".join(f"sb{i}" for i in range(8))
    assert rows[1] == (27, 15, h60_py(kept_a))
    assert rows[2] == (23, 11, h60_py(kept_b))
    assert rows[3] == (20, 20, h60_py(DOC_C))  # untouched doc: identity hash
