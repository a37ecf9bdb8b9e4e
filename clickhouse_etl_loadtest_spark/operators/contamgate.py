"""Streaming decontamination gate: flag documents overlapping a held-out
eval suite AT INGEST, with zero streaming state.

The batch query (queries/text.py::doc_contamination_check) screens a
complete corpus against the eval suite with a broadcast semi-join + per-doc
aggregation. A continuously-ingesting pipeline wants the same decision per
arriving document — and the aggregation-shaped plan is the wrong tool
there (a streaming groupBy needs watermarks and update-mode sinks for what
is logically a PER-ROW decision: a document's overlap count depends only on
its own text and the fixed eval set).

This operator keeps the decision in-row, so it is a stateless map that runs
identically under batch and append-mode Structured Streaming:

1. the eval suite reduces to a sorted int64 array of distinct word-3-gram
   ``h60`` hashes ONCE (driver-side; eval suites are MBs by definition —
   same broadcastability argument as the batch query and the Bloom gate in
   ``operators/bloom.py``),
2. each document's shingle hashes are computed JVM-side (the same
   ``zip_with`` slice chain as the batch query — codegen, no UDF), and
3. a vectorized Arrow-batched probe (``np.isin`` against the broadcast
   sorted array — the exact-membership cousin of the Bloom probe) counts
   the overlap per row.

Per-row output equals the batch query exactly (differential-tested at two
SFs), and the only Python in the plan is the membership probe over int64
arrays — no text crosses the Arrow boundary, nothing shuffles at all.

Reference: no counterpart; LLM-pipeline extension (SURVEY.md §7.6), the
streaming face of the decontamination pass.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60

_SHINGLE_K = 3
TOKEN_RE = "[a-z0-9]+"


def shingle_hashes(text_col: Column) -> Column:
    """Distinct word-3-gram ``h60`` hashes of ``text_col`` as
    ``array<long>`` — the in-row twin of queries/text.py::_shingles_df
    (same tokenization, same shingle construction, same hash, so overlap
    counts agree with the batch contamination query by construction)."""
    toks = F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)
    n = F.size(toks) - (_SHINGLE_K - 1)
    first_two = F.zip_with(
        F.slice(toks, 1, n), F.slice(toks, 2, n), lambda a, b: F.concat_ws(" ", a, b)
    )
    shingles = F.array_distinct(
        F.zip_with(first_two, F.slice(toks, 3, n), lambda ab, c: F.concat_ws(" ", ab, c))
    )
    return F.when(F.size(toks) >= _SHINGLE_K, F.transform(shingles, h60)).otherwise(
        F.array().cast("array<bigint>")
    )


def eval_hash_set(eval_df: DataFrame, text_col: str = "text") -> np.ndarray:
    """The eval suite as a sorted int64 array of distinct shingle hashes.

    Driver-side by design: eval suites are small (the batch query broadcasts
    the same set), and the array re-broadcasts to executors inside the gate.
    The reduction itself is distributed (explode + distinct) before the
    KB/MB-scale collect."""
    rows = (
        eval_df.select(F.explode(shingle_hashes(F.col(text_col))).alias("sh"))
        .distinct()
        .collect()
    )
    return np.sort(np.array([r["sh"] for r in rows], dtype=np.int64))


def contamination_gate(
    df: DataFrame,
    eval_hashes: np.ndarray,
    min_overlap: int,
    text_col: str = "text",
) -> DataFrame:
    """Append ``n_overlap`` (distinct shingles shared with the eval set) and
    ``contaminated`` (n_overlap >= min_overlap) to every row. Stateless and
    shuffle-free: works on batch DataFrames and append-mode streams alike;
    compose with ``.where(~contaminated)`` to drop flagged docs at ingest.
    """
    ev = np.sort(np.asarray(eval_hashes, dtype=np.int64))

    @F.pandas_udf("long")
    def _overlap(hash_arrays: pd.Series) -> pd.Series:
        return hash_arrays.map(
            lambda hs: int(np.isin(np.asarray(hs, dtype=np.int64), ev).sum())
        )

    n_ov = _overlap(shingle_hashes(F.col(text_col)))
    return df.withColumn("n_overlap", n_ov).withColumn(
        "contaminated", F.col("n_overlap") >= F.lit(min_overlap)
    )
