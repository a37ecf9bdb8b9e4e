"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public).

The classic trainer loop — count adjacent symbol pairs, merge the most
frequent pair everywhere, repeat — re-expressed Spark-first with the same
decomposition real tokenizer trainers use: BPE merges never cross
pre-token (word) boundaries, so the corpus collapses to a WORD-COUNT table
first and every subsequent iteration runs on that vocab-scale table, never
on documents.

Scale (100 TB / 1000 executors):
- One corpus-scale shuffle TOTAL: the ``groupBy(word)`` count. Everything
  after operates on distinct pre-tokens (tens of millions of rows at web
  scale — vocab-scale, not corpus-scale).
- Per merge iteration: one pair-count aggregation (pairs explode from the
  symbol arrays with the word's count as weight; partial map-side combine),
  one top-1 ``TakeOrderedAndProject``, one map-only fold applying the merge.
  No joins, no windows, no driver data besides the single winning pair.
- The merge application is a JVM-side ``aggregate`` (fold) over each word's
  symbol array — leftmost-first non-overlapping, the reference semantics —
  so no Python runs inside the loop.
- ``localCheckpoint()`` per iteration truncates lineage; without it the
  plan tree doubles every merge and analysis time explodes by ~iteration 15
  (same discipline as operators/graph.py's label propagation).
- Segmenting a corpus with the learned merges (``bpe_segment_words``)
  again runs on DISTINCT words (Arrow-batched pandas UDF — the per-word
  merge loop is data-dependent and genuinely imperative), which then
  broadcast-join back to the corpus; the UDF cost is O(vocab), not
  O(corpus).

Pair counting convention: every adjacent position counts (overlapping
included — ``aaaa`` contributes 3 to pair (a,a)), and merges apply
leftmost-first non-overlapping, matching the reference implementation's
``get_stats``/``merge_vocab``. Ties on count break to the lexicographically
smallest (left, right) pair so training is deterministic across engines,
partitionings, and runs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word marker, appended as a distinct final symbol so merges can learn
# word-final units (Sennrich's </w>) without colliding with real characters
EOW = "▁"


def words_with_counts(docs: DataFrame, text_col: str = "text", pattern: str = r"[a-z0-9]+") -> DataFrame:
    """Corpus -> (word, cnt) table: the single corpus-scale shuffle of the
    trainer. ``pattern`` is the pre-tokenizer (merges never cross its
    boundaries)."""
    return (
        docs.select(
            F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the EOW marker.
    The split pattern matches interior positions only — Spark's ``split``
    keeps trailing empty strings (limit -1), so a plain ``(?!^)`` would
    leave a phantom "" symbol before the marker."""
    return words.select(
        F.concat(F.split(F.col("word"), "(?!^)(?=.)"), F.array(F.lit(EOW))).alias("syms"),
        "cnt",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol table (overlapping
    positions count; map-side partial aggregation keeps the shuffle at
    distinct-pair scale)."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s AS l, syms[i + 1] AS r))"
    )
    return (
        syms.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _apply_merge(syms_col, left: str, right: str):
    """JVM-side fold merging every leftmost non-overlapping (left, right)
    occurrence in a symbol array. The accumulator rebuilds the array; a
    just-merged element can itself be the LEFT of the next match (fold order
    gives the reference's left-to-right semantics)."""
    la, lb, lm = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lm)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    pattern: str = r"[a-z0-9]+",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from a document corpus. Returns the
    ordered merge table ``[(left, right, pair_count), ...]`` — the entire
    trained tokenizer state (KBs on the driver, like the k-means codebook).

    Stops early when no pair reaches ``min_pair_count`` (merging singleton
    pairs just memorizes words)."""
    syms = _initial_symbols(words_with_counts(docs, text_col, pattern)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("pair_count").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["pair_count"])
        merges.append((left, right, cnt))
        syms = syms.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "cnt"
        ).localCheckpoint()
    return merges


def bpe_segment_words(words: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Segment DISTINCT words with a learned merge table: adds a ``pieces``
    array column. Arrow-batched (the per-word merge loop is data-dependent);
    cost is O(vocab) — join the result back to the corpus by word, never run
    this over documents directly."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def segment(w: pd.Series) -> pd.Series:
        out = []
        for word in w:
            syms = list(word) + [EOW]
            while len(syms) >= 2:
                best, best_rank = None, None
                for i in range(len(syms) - 1):
                    rk = ranks.get((syms[i], syms[i + 1]))
                    if rk is not None and (best_rank is None or rk < best_rank):
                        best, best_rank = i, rk
                if best is None:
                    break
                l, r = merges[best_rank][0], merges[best_rank][1]
                merged = []
                i = 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            out.append(syms)
        return pd.Series(out)

    return words.withColumn("pieces", segment(F.col("word")))
