"""Incremental corpus data-card: the streaming twin of
``queries/text.py::doc_corpus_profile``.

A corpus that lands in waves should not re-scan its whole history to refresh
the dataset card. Each batch folds to a ONE-ROW partial — counts, token
totals and extrema as exact integers, the duplicate signal as a mergeable
HLL sketch of 60-bit content hashes, language/source sets as small distinct
lists — written to its own ``batch=b<id>`` partition (overwrite on replay:
the same recovery contract as ``fuzzydedup.admit_batch`` / ``streamhh`` /
``searchindex``). The read side folds partials with plain aggregates plus
``hll_union_agg``; sums/min/max/counts are exactly associative and HLL
unions carry no penalty, so the folded card matches a one-shot profile over
the full history — exactly for every integer field, within sketch error for
the distinct-content estimate (both pinned in tests/test_streamprofile.py).

Scale: state is ONE row (~KBs, dominated by the sketch) per batch — reading
the card scans partials, never documents. Language/source sets are
domain-cardinality by assumption (a data card lists them); a source column
with unbounded cardinality belongs in the HLL, not the list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..functions.hashing import h60
from .cardsketch import DEFAULT_LG_K

TOKEN_RE = "[a-z0-9]+"  # same token grammar as queries/text.py


def profile_batch(
    batch_df: DataFrame,
    state_path: str,
    batch_id: int | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> None:
    """``foreachBatch`` body: fold one documents batch to a one-row partial
    and land it in the profile state dir (idempotent per ``batch_id``)."""
    toks = F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
    n_tokens = F.size(toks)
    partial = batch_df.select(
        "lang",
        "source",
        h60(F.col("text")).alias("content_hash"),
        n_tokens.alias("n_tokens"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("n_tokens").cast("bigint").alias("tokens_min"),
        F.max("n_tokens").cast("bigint").alias("tokens_max"),
        F.sum(F.when(F.col("n_tokens") == 0, 1).otherwise(0)).cast("bigint").alias("n_empty"),
        F.hll_sketch_agg("content_hash", F.lit(lg_k)).alias("content_sketch"),
        F.array_sort(F.collect_set("lang")).alias("langs"),
        F.array_sort(F.collect_set("source")).alias("sources"),
    )
    part = f"b{batch_id}" if batch_id is not None else "adhoc"
    mode = "overwrite" if batch_id is not None else "append"
    partial.write.mode(mode).parquet(f"{state_path}/batch={part}")


def read_corpus_profile(spark: SparkSession, state_path: str) -> DataFrame:
    """The folded card: one row with exact integer totals/extrema, distinct
    language/source counts, and the HLL distinct-content estimate."""
    try:
        partials = spark.read.parquet(state_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame(
                [],
                schema=(
                    "n_docs bigint, total_tokens bigint, tokens_min bigint,"
                    " tokens_max bigint, n_empty bigint, lang_distinct bigint,"
                    " source_distinct bigint, approx_distinct_content bigint"
                ),
            )
        raise
    return partials.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("total_tokens").cast("bigint").alias("total_tokens"),
        F.min("tokens_min").cast("bigint").alias("tokens_min"),
        F.max("tokens_max").cast("bigint").alias("tokens_max"),
        F.sum("n_empty").cast("bigint").alias("n_empty"),
        F.size(F.array_distinct(F.flatten(F.collect_list("langs")))).cast("bigint").alias("lang_distinct"),
        F.size(F.array_distinct(F.flatten(F.collect_list("sources")))).cast("bigint").alias("source_distinct"),
        F.hll_sketch_estimate(F.hll_union_agg("content_sketch")).cast("bigint").alias(
            "approx_distinct_content"
        ),
    )
