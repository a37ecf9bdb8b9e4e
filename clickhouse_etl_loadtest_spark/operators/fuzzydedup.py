"""Incremental MinHash-LSH fuzzy dedup against a persistent band index.

The batch fuzzy-dedup queries (queries/text.py: doc_minhash_lsh_pairs →
doc_fuzzy_dedup_keep) decide near-duplicates WITHIN one corpus snapshot.
A continuously-ingesting pipeline needs the other shape: does this new
document fuzzily duplicate anything the corpus ALREADY accepted? This
module keeps the accepted corpus's LSH band buckets ``(band, sig)`` as a
persistent parquet index (hashes only — document text never lands in the
index) and admits a new batch in three steps:

1. drop batch docs whose band set collides with the index (near-dup of an
   accepted doc — candidate-level decision, the same recall-oriented
   banding contract as ``doc_minhash_lsh_pairs``; compose an exact-verify
   rerank on the collision pairs when precision matters),
2. first-wins dedup WITHIN the batch (lowest id per colliding bucket),
3. append the admitted docs' bands to the index.

This is the fuzzy twin of ``dedup.streaming_dedup_against_snapshot`` /
``scale.snapshot_dedup_index``, and is shaped to be a ``foreachBatch``
body: each micro-batch is one ``admit_batch`` call. Scale: per batch the
stream side computes signatures (map + one groupBy(doc) with k MIN
aggregates), the index join moves only (band, sig) longs, and the index
append is hash-rows only. The same snapshot-refresh caveat as the exact
path applies: a parquet index read in the SAME streaming query is
resolved at query start — re-read it per batch (as ``admit_batch`` does)
or back it with a transactional format.

Reference: the reference has no fuzzy dedup at all (its closed service
dedups on exact keys); this is part of the LLM-pipeline extension
(SURVEY.md §7.6, Broder 1997 + banding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h32, minhash_params32, perm_hash32

TOKEN_RE = "[a-z0-9]+"
_SHINGLE_K = 3


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    band_size: int = 4,
    seed: int = 42,
) -> DataFrame:
    """``(id, band, sig)`` LSH band rows for every document.

    Same signature pipeline as the registered queries (tokenize → 3-shingle
    → h32 inside the array → one groupBy with ``num_perms`` MIN aggregates →
    stack into bands), so index entries built here collide exactly with the
    pairs doc_minhash_lsh_pairs reports for the same constants.
    """
    perms = minhash_params32(num_perms, seed=seed)
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    with_toks = df.select(F.col(id_col).alias("id"), toks.alias("toks")).where(
        F.size("toks") >= _SHINGLE_K
    )
    n = F.size("toks") - (_SHINGLE_K - 1)
    first_two = F.zip_with(
        F.slice("toks", 1, n), F.slice(F.col("toks"), 2, n), lambda a, b: F.concat_ws(" ", a, b)
    )
    shingles = F.array_distinct(
        F.zip_with(first_two, F.slice(F.col("toks"), 3, n), lambda ab, c: F.concat_ws(" ", ab, c))
    )
    hashed = with_toks.select(
        "id", F.explode(F.transform(shingles, lambda s: h32(s))).alias("sh")
    )
    mins = hashed.groupBy("id").agg(
        *[F.min(perm_hash32(F.col("sh"), a, b)).alias(f"mh{k}") for k, (a, b) in enumerate(perms)]
    )
    n_bands = num_perms // band_size
    stack_expr = ", ".join(
        f"{band}, concat_ws('_', {', '.join(f'mh{band * band_size + r}' for r in range(band_size))})"
        for band in range(n_bands)
    )
    return mins.selectExpr("id", f"stack({n_bands}, {stack_expr}) AS (band, sig)")


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Admit a batch against the persistent band index; returns the admitted
    rows (batch columns unchanged) and appends their bands to the index.

    Drop rules: (a) any band collides with the index → near-dup of an
    accepted doc; (b) within the batch, a band bucket admits only its
    lowest id (first-wins, deterministic).
    """
    bands = minhash_band_table(
        batch_df, id_col=id_col, text_col=text_col, num_perms=num_perms, band_size=band_size
    )

    try:
        index = spark.read.parquet(index_path)
        have_index = True
    except Exception:  # first batch: no index yet
        have_index = False

    if have_index:
        hit_ids = (
            bands.join(index, on=["band", "sig"], how="left_semi").select("id").distinct()
        )
        bands = bands.join(hit_ids, on="id", how="left_anti")

    # intra-batch first-wins: a bucket admits its lowest id; every other
    # member of the bucket is a near-dup of it
    bucket_min = bands.groupBy("band", "sig").agg(F.min("id").alias("keep_id"))
    dropped_in_batch = (
        bands.join(bucket_min, on=["band", "sig"])
        .where(F.col("id") != F.col("keep_id"))
        .select("id")
        .distinct()
    )
    admitted_bands = bands.join(dropped_in_batch, on="id", how="left_anti")

    admitted_bands.select("band", "sig").distinct().write.mode("append").parquet(index_path)
    admitted_ids = admitted_bands.select("id").distinct()
    return batch_df.join(
        admitted_ids.withColumnRenamed("id", id_col), on=id_col, how="left_semi"
    )
