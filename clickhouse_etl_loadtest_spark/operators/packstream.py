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

from ..textconst import CTX_LEN as _CTX_LEN
from .streamhh import _batch_part, _read_latest
from .wetstream import _TOKEN_RE
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
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOKEN_RE), F.lit(0))
    return pack_lengths_batch(
        spark,
        batch_df.select(
            "doc_id", (F.size(toks) + 1).cast("bigint").alias("len_tokens")
        ),
        state_path,
        batch_id,
    )


def _pack_floor(state_path: str) -> int | None:
    """Highest batch id folded into a compacted partition, or None; runs
    ``storemaint.recover`` UNCONDITIONALLY so every crash state — pending
    deletes AND the rename-without-marker case (an uncommitted
    ``batch=c*`` dir the marker can't see) — is repaired at the next
    ingest wave, as the storemaint crash matrix promises."""
    from . import storemaint

    storemaint.recover(state_path, ["manifest", "cursor"])
    return storemaint.read_floor(state_path)


def compact_pack_state(
    spark: SparkSession, state_path: str, upto_batch_id: int
) -> dict:
    """Fold every per-wave partition with id <= ``upto_batch_id`` into one
    consolidated partition each — the pack-state twin of
    ``wetstream.compact_wet_store``, bounding listing/footer cost on a
    store that ingests for months:

    - ``manifest/batch=c<upto>``: the manifests are append-only content,
      so compaction is pure concatenation (every row survives — a loader
      reads the identical manifest);
    - ``cursor/batch=c<upto>``: only the NEWEST cursor at or below the
      floor matters to any later batch, so exactly that one row survives.

    The floor then guards replays: ``pack_lengths_batch`` at or below it
    fails loud instead of recomputing offsets from history the
    consolidated cursor now owns (compact only past the streaming
    checkpoint's replay window — the standard contract). The whole fold
    runs under the crash-safe commit protocol of ``operators/storemaint``
    (both subdirs rename first, ONE marker write commits both, deletes
    follow; every interrupted step is repaired on the next compaction or
    ingest wave)."""
    import os

    from . import storemaint

    storemaint.recover(state_path, ["manifest", "cursor"])
    floor = storemaint.read_floor(state_path)
    if floor is not None and upto_batch_id <= floor:
        raise ValueError(
            f"pack state at {state_path} is already compacted through {floor}; "
            f"re-compacting at {upto_batch_id} would step backwards"
        )

    counts: dict[str, int] = {}
    renamed: dict[str, list[str]] = {}

    def fold(sub: str, keep_latest_only: bool) -> None:
        root = f"{state_path}/{sub}"
        parts = storemaint.list_parts(root, upto_batch_id)
        if not parts:
            raise ValueError(
                f"no {sub} partitions at or below {upto_batch_id} to compact"
            )
        if keep_latest_only:
            merged = spark.read.parquet(f"{root}/{parts[-1]}")
        else:
            merged = spark.read.parquet(*[f"{root}/{d}" for d in parts])
        out = f"{root}/batch=c{upto_batch_id}"
        tmp = f"{root}/_compacting_c{upto_batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        counts[sub] = int(spark.read.parquet(tmp).count())
        os.rename(tmp, out)
        renamed[sub] = parts

    fold("manifest", keep_latest_only=False)
    fold("cursor", keep_latest_only=True)
    storemaint.commit_fold(state_path, upto_batch_id, renamed)
    return {
        "floor": int(upto_batch_id),
        "manifest_rows": counts["manifest"],
        "cursor_rows": counts["cursor"],
    }


def pack_lengths_batch(
    spark: SparkSession,
    lengths_df: DataFrame,
    state_path: str,
    batch_id: int,
) -> dict:
    """Core fold over precomputed (``doc_id``, ``len_tokens``) rows — what
    curated pipelines call when the store already measured the text (the
    wet store's ``n_tokens``); :func:`pack_batch` is the tokenizing skin."""
    from .ranking import global_prefix_sum

    # compaction floor: a (re)delivery at or below it would recompute
    # offsets from history the consolidated cursor now owns — fail loud
    floor = _pack_floor(state_path)
    if floor is not None and batch_id <= floor:
        raise ValueError(
            f"pack state at {state_path} is compacted through batch {floor}; "
            f"batch {batch_id} cannot (re)land below the compaction floor"
        )
    prev_cursor, prev_id = _read_latest(spark, f"{state_path}/cursor", batch_id)
    # "replay recomputes from the pre-batch cursor" assumes foreachBatch's
    # monotonic batch ids: replaying an OLDER batch after a newer one landed
    # would read the newer cursor and silently corrupt the stream — fail loud
    if prev_id is not None and prev_id > batch_id:
        raise ValueError(
            f"pack state at {state_path} already holds cursor batch {prev_id} "
            f"> {batch_id}; out-of-order re-delivery would corrupt offsets"
        )
    start = 0
    if prev_cursor is not None:
        start = int(prev_cursor.first()["end_offset"])

    t = lengths_df.select(
        "doc_id",
        F.col("len_tokens").cast("bigint").alias("len_tokens"),
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


def read_manifest(
    spark: SparkSession, state_path: str, exclude_batch_id: int | None = None
) -> DataFrame:
    """Everything packed so far, across all waves — the manifest a loader
    reads. Returns an EMPTY correctly-typed frame before the first wave.
    ``exclude_batch_id`` drops one wave's partition — a replaying batch must
    anti-join against the PRE-batch manifest, never its own crashed
    output."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(f"{state_path}/manifest")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame([], schema=_MANIFEST_SCHEMA)
        raise
    if exclude_batch_id is not None:
        df = df.where(
            F.substring("batch", 2, 18).cast("long") != int(exclude_batch_id)
        )
    return df.drop("batch")


def cursor(spark: SparkSession, state_path: str) -> int:
    """Current end of the packed token stream (0 before the first wave)."""
    latest, _ = _read_latest(spark, f"{state_path}/cursor", None)
    return 0 if latest is None else int(latest.first()["end_offset"])


def curate_and_pack_batch(
    spark: SparkSession,
    wave_df: DataFrame,
    wet_store: str,
    pack_state: str,
    batch_id: int,
    id_col: str = "doc_id",
    warc_col: str = "warc",
    blocklist: list | None = None,
    cap_per_host: int | None = None,
    robots_rules: DataFrame | None = None,
) -> dict:
    """The incremental shards→trainer path in ONE ``foreachBatch`` body:
    land this wave's archives through the WET curation store
    (``wetstream.wet_batch`` — robots/blocklist/host-cap applied per wave,
    quality + langid scored), then append the wave's NEWLY-KEPT documents to
    the packed token stream.

    "Newly kept" is streaming-dedup semantics — keep FIRST ARRIVAL:
    quality-passing docs of THIS wave whose fingerprint no earlier wave
    carried (within the wave, lowest doc_id wins the fingerprint), minus any
    doc_id already packed (covers re-crawls: a later re-crawl of a packed
    doc updates its store verdict but cannot re-pack — the token stream is
    append-only, exactly like a real pretraining ingest). When waves arrive
    in doc_id order this equals the batch keep-first rule, which is what the
    streamed==batch test pins.

    Replay idempotence: ``wet_batch`` overwrites its own store partition;
    the fingerprint-novelty check reads only EARLIER batches; the
    already-packed check excludes the replaying batch's own manifest
    partition; and ``pack_lengths_batch`` recomputes from the pre-batch
    cursor. A post-crash re-delivery therefore reproduces identical
    partitions everywhere.

    Scale: the store reads are verdict rows (fixed-width, no text); the
    novelty/packed checks are two hash anti-joins on 8-byte keys; packing is
    the histogram-first prefix sum. Nothing here rescans document bodies.
    """
    from .wetstream import wet_batch

    wet_batch(
        wave_df,
        wet_store,
        batch_id,
        id_col=id_col,
        warc_col=warc_col,
        blocklist=blocklist,
        cap_per_host=cap_per_host,
        robots_rules=robots_rules,
    )
    raw = spark.read.parquet(wet_store)
    # latest-wins per doc (re-crawls replace their verdict), as in
    # wetstream.read_wet_store — recomputed here because the packed-stream
    # decision needs the fingerprint column that reader projects away
    latest = raw.groupBy("doc_id").agg(F.max("batch_seq").alias("batch_seq"))
    cur = raw.join(latest, ["doc_id", "batch_seq"])
    # novelty reads RAW sightings, not latest-wins verdicts: a doc re-crawled
    # in THIS wave would otherwise vanish from the prior set, letting a new
    # same-fingerprint doc re-pack content the stream already carries. Any
    # earlier arrival of a fingerprint blocks re-packing; the replaying
    # batch's own rows stay excluded, so replays are unchanged.
    prior_fp = (
        raw.where(F.col("batch_seq") < batch_id).select("fingerprint").distinct()
    )
    from pyspark.sql.window import Window

    wave = cur.where(F.col("keep_quality") & (F.col("batch_seq") == batch_id))
    wave_canon = (
        wave.withColumn(
            "_fp_min", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .where(F.col("doc_id") == F.col("_fp_min"))
        .drop("_fp_min")
    )
    already = read_manifest(spark, pack_state, exclude_batch_id=batch_id).select(
        "doc_id"
    )
    fresh = wave_canon.join(prior_fp, "fingerprint", "left_anti").join(
        already, "doc_id", "left_anti"
    )
    return pack_lengths_batch(
        spark,
        fresh.select(
            "doc_id", (F.col("n_tokens") + 1).cast("bigint").alias("len_tokens")
        ),
        pack_state,
        batch_id,
    )
