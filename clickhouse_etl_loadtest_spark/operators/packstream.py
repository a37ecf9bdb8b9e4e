"""Streaming incremental context packing: the training-context manifest
maintained across micro-batches with an exact persistent token cursor.

The batch operator (``doc_context_packing``) maps a COMPLETE corpus to
absolute token offsets and chunk spans. A continuously-ingesting pipeline
needs the streaming shape: documents arrive in waves, and each wave must be
appended to the SAME conceptual token stream — offsets continuing exactly
where the previous wave stopped — so the manifest the trainer reads is
identical to a one-shot pack of everything ingested so far (asserted by the
streamed==batch parity test, which also pins the tokenizer/context-length
literals against any drift from the batch query).

Design: one parquet-backed state dir, the ``streamhh`` snapshot recipe:

- ``manifest/batch=b<id>``: the manifest rows this wave appended.
- ``cursor/batch=b<id>``: one row — where the token stream stood AFTER this
  wave (plus where it started, for audit).

Each ``pack_batch`` call reads the newest cursor EXCLUDING its own
``batch_id`` partition, so a checkpoint-recovery REPLAY recomputes from the
pre-batch cursor and overwrites its own manifest/cursor partitions —
idempotent, the same recipe as ``fuzzydedup.admit_batch`` /
``streamhh.update_summary``. Within the wave, offsets come from the exact
histogram-first prefix sum (``operators/ranking.py::global_prefix_sum`` —
never a corpus-scale ``Exchange SinglePartition``), shifted by the
persistent cursor; only the 1-row cursor and the bucket histogram touch the
driver/single-partition path.

Ordering contract: within a wave, documents pack in doc_id order (the
deterministic stand-in for arrival order — replays must not reshuffle);
across waves, arrival order IS the pack order, exactly like a real
GPT-style ingest. Upstream dedup is the caller's duty (compose with
``operators/wetstream.py`` / ``fuzzydedup`` — a re-ingested doc_id would
pack twice, as it would in any append-only token stream).

Reference: no counterpart (the reference has no packing notion at all);
LLM-pipeline extension beside ``doc_context_packing``, SURVEY.md §7.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .streamhh import _batch_part, _read_latest
from .wetstream import _TOKEN_RE

# must equal queries/text.py::CTX_LEN — the streamed==batch parity test in
# tests/test_packstream.py breaks on any drift (the _LANG_MARKERS lesson)
_CTX_LEN = 512
_PACK_BUCKET = 64  # doc_ids per prefix-sum histogram bucket (matches batch)

_MANIFEST_SCHEMA = (
    "doc_id bigint, len_tokens bigint, start_offset bigint, chunk_first bigint, "
    "chunk_last bigint, n_chunks bigint, crosses_boundary boolean"
)


def pack_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int,
) -> dict:
    """Fold one wave of documents (``doc_id``, ``text`` columns) into the
    persistent packing manifest; returns ``{"start": ..., "end": ...,
    "n_docs": ...}`` for the wave. Shaped to be a ``foreachBatch`` body."""
    from .ranking import global_prefix_sum

    prev_cursor, _ = _read_latest(spark, f"{state_path}/cursor", batch_id)
    start = 0
    if prev_cursor is not None:
        start = int(prev_cursor.first()["end_offset"])

    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOKEN_RE), F.lit(0))
    t = batch_df.select(
        "doc_id",
        (F.size(toks) + 1).cast("bigint").alias("len_tokens"),
        (F.col("doc_id") - F.col("doc_id") % _PACK_BUCKET).alias("_pb"),
    )
    c = global_prefix_sum(
        t,
        bucket_order=[F.col("_pb").asc()],
        bucket_cols=["_pb"],
        tiebreaker="doc_id",
        value_col="len_tokens",
        out_col="_local_offset",
    )
    abs_off = (F.col("_local_offset") + F.lit(start)).cast("bigint")
    end_tok = abs_off + F.col("len_tokens") - 1
    chunk_first = F.floor(abs_off / _CTX_LEN).cast("bigint")
    chunk_last = F.floor(end_tok / _CTX_LEN).cast("bigint")
    manifest = c.select(
        "doc_id",
        "len_tokens",
        abs_off.alias("start_offset"),
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        (chunk_last - chunk_first + 1).cast("bigint").alias("n_chunks"),
        (chunk_last > chunk_first).alias("crosses_boundary"),
    )

    part = _batch_part(batch_id)
    manifest.write.mode("overwrite").parquet(f"{state_path}/manifest/batch={part}")
    # totals read back from the WRITTEN manifest: the cursor must advance by
    # exactly what landed, never by a separately-recomputed figure
    landed = spark.read.parquet(f"{state_path}/manifest/batch={part}")
    agg = landed.agg(
        F.count(F.lit(1)).alias("n"), F.sum("len_tokens").alias("tok")
    ).first()
    n_docs, batch_tokens = int(agg["n"]), int(agg["tok"] or 0)
    spark.createDataFrame(
        [(start, start + batch_tokens, n_docs)],
        schema="start_offset bigint, end_offset bigint, n_docs bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{state_path}/cursor/batch={part}")
    return {"start": start, "end": start + batch_tokens, "n_docs": n_docs}


def read_manifest(spark: SparkSession, state_path: str) -> DataFrame:
    """Everything packed so far, across all waves — the manifest a loader
    reads. Returns an EMPTY correctly-typed frame before the first wave."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(f"{state_path}/manifest")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame([], schema=_MANIFEST_SCHEMA)
        raise
    return df.drop("batch")


def cursor(spark: SparkSession, state_path: str) -> int:
    """Current end of the packed token stream (0 before the first wave)."""
    latest, _ = _read_latest(spark, f"{state_path}/cursor", None)
    return 0 if latest is None else int(latest.first()["end_offset"])
