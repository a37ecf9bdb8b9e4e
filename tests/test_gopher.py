"""Regression tests for doc_gopher_repetition's short-document handling.

The gram builder historically crashed on any document with fewer than n
tokens: two-arg ``sequence(1, 0)`` DESCENDS to ``[1, 0]`` (step defaults to
-1 when start > stop) and ``slice(toks, 0, n)`` raises
INVALID_PARAMETER_VALUE.START. The registry fixtures never carried a <5-token
document, so the oracle sweep could not catch it — this file plants short
docs (0..4 tokens) next to normal ones and requires (a) no crash and (b)
full value parity with the DuckDB oracle, whose ``WHERE len(toks) >= n.n``
is the exclusion the Spark guard must mirror.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from clickhouse_etl_loadtest_spark.queries import load_all

from .oracle_harness import TABLES, compare_query

REG = load_all()

# 0..4 tokens (all below the 5-gram floor), plus docs long enough to produce
# every signal, including one repetitive enough to fail the keep verdict.
DOCS = [
    (0, ""),
    (1, "lone"),
    (2, "two words"),
    (3, "three little words"),
    (4, "exactly four word tokens"),
    (5, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
    (6, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (
        7,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two "
        "three four five six seven eight nine ten eleven twelve thirteen "
        "fourteen fifteen sixteen seventeen eighteen nineteen twenty",
    ),
]


def _fixture_dir(tmp_path, sf_dir) -> str:
    """A full 10-table dir: custom documents.parquet + symlinks for the rest
    (duck_con binds every view eagerly, so all files must exist)."""
    d = tmp_path / "short_docs"
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
            "text": pa.array([r[1] for r in DOCS], pa.string()),
            "lang": pa.array(["en"] * len(DOCS), pa.string()),
            "source": pa.array([f"src{r[0] % 3}" for r in DOCS], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def test_gopher_repetition_short_docs_match_oracle(spark, tmp_path, sf_dir):
    """Short docs must be EXCLUDED (no 5-gram mass), not crash the query;
    long docs keep full value parity on the same run."""
    q = REG["doc_gopher_repetition"]
    fixture = _fixture_dir(tmp_path, sf_dir)
    ok, msg = compare_query(spark, fixture, q.fn, q.oracle)
    assert ok, msg
    rows = {r["doc_id"]: r for r in q.fn(spark, fixture).collect()}
    assert set(rows) == {5, 6, 7}, "docs with <5 tokens must be excluded"
    assert rows[6]["keep"] is False  # pure repetition fails every threshold
    assert rows[7]["keep"] is True  # all-distinct tokens pass every threshold
