"""Streaming heavy hitters: a persistent mergeable Misra-Gries summary
maintained across micro-batches.

The batch operator (``operators/heavyhitters.py``, driver-visible as
``events_heavy_hitters``) answers "which keys exceed phi of the corpus" with
two passes over a complete dataset. A continuously-ingesting pipeline needs
the streaming shape: keep a bounded sketch of everything seen SO FAR and ask
at any time for the current candidate hot keys — the continuous version of
the skew detector that decides when ``operators/scale.py``'s mitigations
(salting, AQE skew splits) are warranted.

Design: one parquet-backed state dir holds per-batch SNAPSHOTS of the merged
summary (`summary/batch=b<id>`) plus a one-row meta table
(`meta/batch=b<id>`: n_seen, k). Each ``update_summary`` call

1. reads the latest prior snapshot (excluding its own ``batch_id`` partition,
   so a checkpoint-recovery REPLAY merges against the pre-batch state and
   overwrites its own output — idempotent, the same recipe as
   ``fuzzydedup.admit_batch`` / ``streaming/sink.py``),
2. sketches the incoming batch with the per-partition Misra-Gries
   ``mapInPandas`` pass (<= k rows per partition shuffle, independent of
   batch size),
3. merges and re-truncates to k counters. Misra-Gries summaries are
   mergeable (Agarwal et al., "Mergeable summaries", PODS'12): the chained
   truncations undershoot every true count by at most n_seen/(k+1)
   cumulatively, so with k >= 2/phi the candidate read below keeps recall
   1.0 over the entire stream history — no false negatives, ever.

The merge itself is driver-side over O(k + k*partitions) rows (KB-scale —
the whole point of the sketch is that this never grows with n); the batch
sketch pass stays distributed. Exact confirmation needs a second pass over
re-readable data by construction (a sketch cannot un-merge), so
``confirm_exact`` runs the broadcast-gated confirm against whatever complete
table the pipeline's sink holds — the same split as the batch operator,
stretched across time.

State growth: only the LATEST snapshot is ever read; old `batch=b*`
partitions exist purely so replays land on their own overwrite target.
``prune_state`` drops all but the newest — run it from the same foreachBatch
after the sink write, or as periodic maintenance (like ``compact_sink``).

Reference: no counterpart (the reference never profiles key frequency);
LLM-pipeline extension alongside the batch op, SURVEY.md §7.6.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .heavyhitters import _mg_truncate, misra_gries_summaries


def _batch_part(batch_id: int) -> str:
    return f"b{batch_id}"


def _read_latest(
    spark: SparkSession, path: str, exclude_batch_id: int | None
) -> tuple[DataFrame | None, int | None]:
    """(rows of the newest snapshot, its numeric batch id), or (None, None).

    Only a missing path means "no state yet"; other read failures propagate
    (swallowing them would silently reset the sketch — same contract as
    ``fuzzydedup._read_index``)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return None, None
        raise
    ids = F.substring("batch", 2, 18).cast("long")
    df = df.withColumn("_bid", ids)
    if exclude_batch_id is not None:
        df = df.where(F.col("_bid") != exclude_batch_id)
    top = df.agg(F.max("_bid").alias("m")).first()["m"]
    if top is None:
        return None, None
    return df.where(F.col("_bid") == top).drop("batch", "_bid"), int(top)


def update_summary(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    key: str,
    k: int,
    batch_id: int,
) -> dict:
    """Fold one micro-batch into the persistent summary; returns
    ``{"n_seen": ..., "summary_rows": ...}`` for the new snapshot.

    Shaped to be a ``foreachBatch`` body (``batch_id`` is the foreachBatch
    argument); see the module docstring for the replay-idempotency recipe.
    """
    prev_summary, _ = _read_latest(spark, f"{state_path}/summary", batch_id)
    prev_meta, _ = _read_latest(spark, f"{state_path}/meta", batch_id)
    n_prev = 0
    if prev_meta is not None:
        row = prev_meta.first()
        n_prev = int(row["n_seen"])
        if int(row["k"]) != k:
            raise ValueError(
                f"summary at {state_path} was built with k={row['k']}; "
                f"merging with k={k} would void the error bound"
            )

    n_batch = batch_df.count()
    batch_pdf = misra_gries_summaries(batch_df, key, k).toPandas()

    counts: dict = {}
    if prev_summary is not None:
        for r in prev_summary.toPandas().itertuples(index=False):
            counts[getattr(r, key)] = counts.get(getattr(r, key), 0) + int(r.est_count)
    for r in batch_pdf.itertuples(index=False):
        counts[getattr(r, key)] = counts.get(getattr(r, key), 0) + int(r.est_count)
    counts = _mg_truncate(counts, k)

    part = _batch_part(batch_id)
    key_type = dict(batch_df.dtypes)[key]
    summary_df = spark.createDataFrame(
        [(key_val, int(c)) for key_val, c in counts.items()],
        schema=f"{key} {key_type}, est_count bigint",
    )
    summary_df.coalesce(1).write.mode("overwrite").parquet(
        f"{state_path}/summary/batch={part}"
    )
    spark.createDataFrame(
        [(n_prev + n_batch, k)], schema="n_seen bigint, k int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{state_path}/meta/batch={part}")
    return {"n_seen": n_prev + n_batch, "summary_rows": len(counts)}


def candidates(spark: SparkSession, state_path: str, phi: float) -> DataFrame:
    """Current candidate heavy hitters over everything folded in so far:
    every key whose summary estimate clears ``phi*n_seen - n_seen/(k+1)``
    — a superset of the true phi-heavy keys (recall 1.0; estimates
    undershoot true counts by at most n_seen/(k+1)). Columns
    (key, est_count, n_seen); precision comes from :func:`confirm_exact`.
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0,1), got {phi}")
    summary, _ = _read_latest(spark, f"{state_path}/summary", None)
    meta, _ = _read_latest(spark, f"{state_path}/meta", None)
    if summary is None or meta is None:
        raise FileNotFoundError(f"no summary state at {state_path}")
    row = meta.first()
    n_seen, k = int(row["n_seen"]), int(row["k"])
    if k < math.ceil(2.0 / phi):
        raise ValueError(
            f"summary was built with k={k} < 2/phi={2.0 / phi:.0f}: "
            "recall 1.0 is not guaranteed at this phi"
        )
    floor = phi * n_seen - n_seen / (k + 1)
    return summary.where(F.col("est_count") > F.lit(floor)).withColumn(
        "n_seen", F.lit(n_seen).cast("bigint")
    )


def confirm_exact(full_df: DataFrame, cands: DataFrame, key: str, phi: float) -> DataFrame:
    """Exact confirm of :func:`candidates` against a complete, re-readable
    table (the pipeline's sink): broadcast the candidate keys, aggregate only
    their rows (map-side combine; the shuffle carries candidate keys only),
    keep those strictly above ``phi * count``. Output equals
    ``GROUP BY key HAVING count > phi*n`` exactly — same contract as the
    batch operator's second pass."""
    n = full_df.count()
    return (
        full_df.join(F.broadcast(cands.select(key)), key)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > F.lit(phi * n))
    )


def prune_state(
    spark: SparkSession, state_path: str, subdirs: tuple = ("summary", "meta")
) -> int:
    """Drop every snapshot except the newest; returns how many batch
    partitions were removed. Safe once the batch that wrote the newest
    snapshot has committed (i.e. from the NEXT foreachBatch call or a
    maintenance pass) — a replay only ever targets the latest batch id.

    Unlike the content stores (wet/pack/sem/band-index), latest-only
    snapshot stores need NO commit-marker protocol: pruning is
    delete-only, each whole-partition delete is idempotent, and a crash
    mid-prune just leaves some obsolete snapshots for the next pass —
    there is no partial state to repair. ``subdirs`` makes this the shared
    maintenance pass for every snapshot store (``pca.prune_state``,
    ``cardsketch.prune_state`` delegate here)."""
    import shutil
    from pathlib import Path

    removed = 0
    for sub in subdirs:
        root = Path(state_path) / sub
        if not root.exists():
            continue
        parts = sorted(
            (p for p in root.iterdir() if p.name.startswith("batch=b")),
            key=lambda p: int(p.name.split("=b")[1]),
        )
        for p in parts[:-1]:
            shutil.rmtree(p)
            removed += 1
    return removed
