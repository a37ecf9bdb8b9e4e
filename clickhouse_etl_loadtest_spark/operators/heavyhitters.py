"""Exact distributed heavy hitters via mergeable Misra-Gries candidates.

Extension beyond the reference surface (its dedup service never profiles key
frequency) — this is the operator that DECIDES when the skew mitigations in
``operators/scale.py`` (salting, AQE skew splits) are needed: find every key
whose frequency exceeds a fraction ``phi`` of the corpus, exactly, without
ever shuffling the full key column.

Two passes:

1. **Candidates** — per-partition Misra-Gries summaries (k counters each)
   built in ``mapInPandas``, merged by a keywise SUM. Summaries of this form
   are mergeable (Agarwal et al., "Mergeable summaries", PODS'12): each
   truncation to k counters subtracts mass uniformly, so across the whole
   corpus the estimate undershoots the true count by at most n/(k+1). With
   k >= 2/phi, every true phi-heavy key therefore keeps an estimate above
   phi*n - n/(k+1) >= phi*n/2 — recall 1.0 by construction. The summary
   shuffle is at most k rows per partition, independent of n.
2. **Exact confirm** — the candidate keys (<= k per partition pre-merge,
   typically << that after) broadcast back; only their rows re-aggregate
   (partial map-side combine, shuffle carries candidate keys only). False
   candidates fall out; the surviving counts are exact.

Output is EXACTLY ``GROUP BY key HAVING count > phi*n`` — hash-verifiable
against a SQL oracle — at a shuffle cost of O(k * partitions + hot-key rows)
instead of O(distinct keys). At 100 TB with phi=1e-3 that is ~2000 counters
a partition versus re-shuffling billions of distinct keys.

Spark's built-in ``df.stat.freqItems`` is the same sketch family but stops
at pass 1: it returns candidate VALUES only (no counts, false positives
included, single column list result) — unusable as a skew detector that
must rank keys by exact frequency. Hence the confirm pass here.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_truncate(counts: dict, k: int) -> dict:
    """Misra-Gries truncation: keep the k largest counters, subtracting the
    (k+1)-th largest from each survivor (the uniform-decrement step batched).
    Removes at most (k+1)*pivot total mass for a pivot that was exceeded by
    at most n/(k+1) cumulative over all truncations."""
    if len(counts) <= k:
        return counts
    by_count = sorted(counts.values(), reverse=True)
    pivot = by_count[k]
    return {key: c - pivot for key, c in counts.items() if c > pivot}


def misra_gries_summaries(df: DataFrame, key: str, k: int) -> DataFrame:
    """Per-partition MG summaries: <= k rows of (key, est_count) each.

    Arrow batches aggregate exactly (vectorized ``value_counts``) into the
    partition's counter dict; the dict truncates back to k whenever it
    exceeds 4k, so partition memory is O(k) regardless of partition size.
    """
    buffer_cap = 4 * k

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for b in batches:
            if not len(b):
                continue
            for key_val, c in b[key].value_counts().items():
                counts[key_val] = counts.get(key_val, 0) + int(c)
            if len(counts) > buffer_cap:
                counts = _mg_truncate(counts, k)
        counts = _mg_truncate(counts, k)
        if counts:
            yield pd.DataFrame({key: list(counts), "est_count": list(counts.values())})

    return df.select(key).mapInPandas(
        _summarize, schema=f"{key} {dict(df.dtypes)[key]}, est_count bigint"
    )


def heavy_hitters(df: DataFrame, key: str, phi: float) -> DataFrame:
    """All keys with frequency strictly greater than ``phi * count(df)``,
    with their EXACT counts — columns (key, ``n_rows``).

    Equivalent to ``df.groupBy(key).count().where(count > phi*n)`` but the
    full-key shuffle is replaced by the two-pass plan in the module
    docstring. ``phi`` must be in (0, 1); k is derived as ceil(2/phi) so the
    candidate pass has guaranteed recall 1.0.
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0,1), got {phi}")
    k = math.ceil(2.0 / phi)
    n = df.count()
    threshold = phi * n

    merged = (
        misra_gries_summaries(df, key, k)
        .groupBy(key)
        .agg(F.sum("est_count").alias("est_count"))
        # true_count - est <= n/(k+1) <= phi*n/2, so every true heavy
        # hitter's estimate clears threshold - n/(k+1)
        .where(F.col("est_count") > F.lit(threshold - n / (k + 1)))
        .select(key)
    )
    return (
        df.join(F.broadcast(merged), key)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > F.lit(threshold))
    )
