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
2. cluster-resolve collisions WITHIN the batch (connected components over
   shared buckets; each cluster admits its lowest id),
3. append the admitted docs' bands to the index (idempotently per
   ``batch_id`` — see :func:`admit_batch`).

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
from .graph import connected_components

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


def _read_index(spark: SparkSession, index_path: str) -> DataFrame | None:
    """Read the band index, or None if it does not exist yet (first batch).

    ONLY a missing/empty path means "no index": corrupt parquet, transient
    FS errors, and permission failures must propagate — swallowing them
    would silently reset dedup state and re-admit duplicates of the whole
    accepted corpus.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(index_path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise


def _index_floor(index_path: str) -> int | None:
    """Highest batch id folded into a compacted partition, or None; runs
    ``storemaint.recover`` UNCONDITIONALLY (the round-13 convention shared
    by wetstream/packstream/semstream) so every interrupted compaction
    step — pending deletes AND the rename-without-marker orphan — heals at
    the next admit."""
    from . import storemaint

    storemaint.recover(index_path, [""])
    return storemaint.read_floor(index_path)


def compact_band_index(spark: SparkSession, index_path: str, upto_batch_id: int) -> dict:
    """Fold every per-batch band partition with id <= ``upto_batch_id``
    into ONE consolidated partition (``batch=c<upto>``) — the fuzzy-dedup
    twin of ``semstream.compact_sem_store``, bounding the listing/footer
    cost of an index that admits for months.

    The fold is pure concatenation and exact: an admitted doc shares NO
    band with the index (any collision drops the whole doc) and in-batch
    cluster resolution admits one doc per bucket-overlap component, so
    ``(band, sig)`` rows are globally distinct across partitions — every
    reader sees the identical set afterwards. The self-exclusion replay
    filter (``batch != b<id>``) is untouched for live batches: their ids
    sit ABOVE the floor, and the floor guard in :func:`admit_batch` fails
    a (re)admit at or below it loud (its own partition no longer exists to
    exclude — replayed rows would collide against themselves). The
    ``batch=adhoc`` partition (no-batch-id mode) never matches the
    ``batch=[bc]<digits>`` fold pattern and is left alone. Crash-safe
    under ``operators/storemaint.py``'s commit-marker protocol."""
    import os

    from . import storemaint

    storemaint.recover(index_path, [""])
    floor = storemaint.read_floor(index_path)
    if floor is not None and upto_batch_id <= floor:
        raise ValueError(
            f"band index at {index_path} is already compacted through "
            f"{floor}; re-compacting at {upto_batch_id} would step backwards"
        )
    parts = storemaint.list_parts(index_path, upto_batch_id)
    if not parts:
        raise ValueError(f"no partitions at or below {upto_batch_id} to compact")
    merged = spark.read.parquet(*[f"{index_path}/{d}" for d in parts])
    out = f"{index_path}/batch=c{upto_batch_id}"
    tmp = f"{index_path}/_compacting_c{upto_batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    os.rename(tmp, out)
    storemaint.commit_fold(index_path, upto_batch_id, {"": parts})
    return {
        "floor": int(upto_batch_id),
        "merged_partitions": len(parts),
        "rows": int(rows),
    }


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    band_size: int = 4,
    batch_id: int | None = None,
) -> DataFrame:
    """Admit a batch against the persistent band index; returns the admitted
    rows (batch columns unchanged) and appends their bands to the index.

    Drop rules: (a) any band collides with the index → near-dup of an
    accepted doc; (b) WITHIN the batch, colliding docs are resolved as
    duplicate CLUSTERS (connected components over shared buckets, same
    semantics as ``doc_dup_clusters``): each cluster admits its lowest id.
    Bucket-local first-wins would over-drop — if B shares bucket X with
    keeper A and bucket Y with C, C would lose its only near-dup (B) yet
    still be dropped; transitive resolution keeps one representative per
    actual cluster.

    Idempotency: pass ``batch_id`` (the ``foreachBatch`` argument) and each
    batch's bands land in their own ``batch=b<id>`` partition subdir with
    overwrite — a checkpoint-recovery REPLAY overwrites its own partial
    append and the collision read excludes the batch's own partition, so
    replayed rows are never dropped against themselves (mirrors
    ``streaming/sink.py::idempotent_parquet_chunk_writer``). Without
    ``batch_id`` the append goes to a shared ``batch=adhoc`` partition and
    is at-least-once: a crash between append and downstream materialization
    can leave bands whose rows were never persisted. Admitted ids are
    materialized eagerly (``localCheckpoint``) BEFORE the append either
    way, so the returned DataFrame does not depend on a re-listing of the
    index it just extended.
    """
    # compaction floor: a (re)admit at or below it can no longer exclude
    # its own folded partition — replayed rows would collide against
    # themselves — so fail loud (the storemaint contract); the check also
    # heals any interrupted compaction before the index is read
    floor = _index_floor(index_path)
    if batch_id is not None and floor is not None and batch_id <= floor:
        raise ValueError(
            f"band index at {index_path} is compacted through batch {floor}; "
            f"batch {batch_id} cannot (re)admit below the compaction floor"
        )
    bands = minhash_band_table(
        batch_df, id_col=id_col, text_col=text_col, num_perms=num_perms, band_size=band_size
    )

    index = _read_index(spark, index_path)
    if index is not None:
        if batch_id is not None:
            index = index.where(F.col("batch") != f"b{batch_id}")
        hit_ids = (
            bands.join(index, on=["band", "sig"], how="left_semi").select("id").distinct()
        )
        bands = bands.join(hit_ids, on="id", how="left_anti")

    # intra-batch cluster resolution on the collision graph: star edges
    # (bucket-min -> member) connect exactly the docs sharing a bucket, so
    # components equal the bucket-overlap clusters; admit each component's
    # minimum. The graph holds only INTRA-BATCH colliders — tiny next to
    # the batch — and the iteration is O(log diameter) long-only shuffles.
    bucket_min = bands.groupBy("band", "sig").agg(F.min("id").alias("keep_id"))
    edges = (
        bands.join(bucket_min, on=["band", "sig"])
        .where(F.col("id") != F.col("keep_id"))
        .select("keep_id", "id")
        .distinct()
    )
    if edges.limit(1).count() > 0:
        comp = connected_components(edges, "keep_id", "id")
        dropped_in_batch = comp.where(F.col("id") != F.col("label")).select("id")
        admitted_bands = bands.join(dropped_in_batch, on="id", how="left_anti")
    else:
        admitted_bands = bands

    # materialize before touching the index: the result must not re-list
    # the files this call is about to write
    admitted_bands = admitted_bands.localCheckpoint()
    part = f"b{batch_id}" if batch_id is not None else "adhoc"
    mode = "overwrite" if batch_id is not None else "append"
    admitted_bands.select("band", "sig").distinct().write.mode(mode).parquet(
        f"{index_path}/batch={part}"
    )
    admitted_ids = admitted_bands.select("id").distinct()
    return batch_df.join(
        admitted_ids.withColumnRenamed("id", id_col), on=id_col, how="left_semi"
    )
