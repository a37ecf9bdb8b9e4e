"""Incremental SemDeDup: the streaming-maintenance twin of
``queries/vector.py::embedding_semdedup``.

An embedding corpus arrives in waves; re-running the cluster-bounded
pairwise pass over everything per wave is a full-corpus rescan.
``semdedup_batch`` is a ``foreachBatch`` body: assign the wave to a FIXED
pinned codebook (map-only — the centroids ride in the assignment UDF's
closure; training the codebook is a one-time setup step, exactly like the
trained langid weights), compare each wave vector against (a) every
previously SEEN vector of the same cluster and (b) every lower-vec_id
vector of its own wave, and land the wave's verdict rows in a per-batch
partition of a persistent parquet store.

The store keeps every SEEN vector, not just admitted ones — the batch
pairwise rule (``a < b`` and cosine ≥ threshold drops ``b`` even when ``a``
was itself dropped) requires it: a newcomer near an already-dropped vector
must still drop. Waves arriving in vec_id order therefore converge to the
batch query's exact keep set (the streamed==batch parity test in
``tests/test_semstream.py``); under arbitrary arrival the rule is
arrival-first — the same ordering contract as ``operators/packstream.py``.

That exactness has a measured price: the prior-compare term is
O(wave x ALL same-cluster history), so the per-wave wall grows linearly
with the stream's lifetime (``BENCH_PROFILE.json::semstream_wave_sf1``:
3.2→15.9 s over 16 waves) — quadratic total over a months-long stream.
``compare="kept"`` is the standard production relaxation: compare each
wave only against SURVIVING (kept) prior vectors, the set batch SemDeDup
would publish anyway. Cost becomes O(wave x kept history) — bounded by
the post-dedup corpus, which in a dup-heavy stream is a small fraction of
seen — at a measured recall delta: a newcomer whose only near neighbor
was itself dropped now survives (transitive-chain misses only; the
first-arrival representative of every neighborhood is always kept, so
pairs adjacent to a survivor are still caught). The delta is a dial like
``embedding_semdedup_recall``'s k — see SCALING.md and the floor tests in
``tests/test_semstream.py``. The within-wave half keeps the exact
pairwise rule in both modes (wave-bounded cost; only the history term
scales with stream lifetime).

Replay idempotence: a batch reads only EARLIER batches' partitions and
overwrites its own, so a post-crash re-delivery reproduces identical
partitions (the ``fuzzydedup.admit_batch`` / ``wetstream.wet_batch``
recipe); an out-of-order re-delivery of an older batch after a newer one
landed fails loud (the packstream cursor guard).

Store lifecycle: per-batch partitions accumulate forever on a long
stream — the listing/footer growth ``wetstream.compact_wet_store``'s
docstring warns about. :func:`compact_sem_store` folds every partition
at or below a floor into one consolidated ``batch=c<upto>`` partition
under the shared crash-safe commit protocol of ``operators/storemaint``;
verdict rows are append-only content (a replayed batch overwrites its
own partition, never another's), so the fold is pure concatenation —
readers and the prior-compare see the identical row set. The floor then
guards replays: a (re)delivery at or below it fails loud, and every
ingest wave runs ``storemaint.recover`` so any interrupted compaction
step is repaired at the next operation.

Scale: assignment is map-side (k x dim codebook in the closure); the only
joins are keyed by cluster — the SemDeDup bound (Σ n_c² pairwise work, not
n²); vectors shuffle once per wave for cluster co-location and their norms
are stored so re-ingested state never recomputes them.

Reference: no counterpart (the reference has no vector notion); the
streaming tier of the LLM-pipeline extension, SURVEY.md §7.6. SemDeDup:
Abbas et al. 2023 (public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .clustering import _assign
from .streamhh import _batch_part

_STORE_SCHEMA = (
    "vec_id bigint, cluster int, embedding array<double>, nrm double, keep boolean"
)


def _norm(col):
    # identical fold to queries/vector.py::_norm — the parity tests compare
    # cosines computed on both sides bit-for-bit
    return F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def semdedup_dropped(n: DataFrame, threshold: float) -> DataFrame:
    """Distinct ``vec_id``s dropped by the within-cluster pairwise
    keep-first rule over ``n`` (``vec_id``, ``cluster``, ``embedding``,
    ``nrm``): of every same-cluster pair at cosine ≥ ``threshold`` the
    higher vec_id drops. The shared core of the batch query and the
    streaming operator's within-wave half."""
    a = n.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = n.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cosine >= threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )


def semdedup_bounded_verdicts(
    n: DataFrame, threshold: float, n_waves: int, wave_col: str = "wave"
) -> DataFrame:
    """Batch twin of the ``compare="kept"`` streamed mode: fold ``n``
    (``vec_id``, ``cluster``, ``embedding``, ``nrm``, ``wave_col`` in
    0..n_waves-1) wave by wave, comparing each wave only against the
    SURVIVORS of earlier waves plus the exact pairwise rule within its own
    wave; returns (vec_id, cluster, wave, keep). Waves fold sequentially
    (n_waves is small and fixed); each round's survivor set localCheckpoints
    so the plan stays wave-bounded — the same parity contract
    ``semdedup_dropped`` gives the exact mode, pinned by
    ``tests/test_semstream.py``."""
    kept_acc = None
    verdicts = []
    for w in range(n_waves):
        wave = n.where(F.col(wave_col) == w).drop(wave_col)
        dropped_w = semdedup_dropped(wave, threshold)
        if kept_acc is not None:
            p = kept_acc.select(
                "cluster",
                F.col("embedding").alias("emb_p"),
                F.col("nrm").alias("nrm_p"),
            )
            cos = _dot(F.col("embedding"), F.col("emb_p")) / (
                F.col("nrm") * F.col("nrm_p")
            )
            vs_kept = (
                wave.join(p, "cluster").where(cos >= threshold)
                .select("vec_id").distinct()
            )
            dropped_w = dropped_w.union(vs_kept).distinct()
        verdict_w = (
            wave.join(dropped_w.withColumn("_d", F.lit(True)), "vec_id", "left")
            .select(
                "vec_id",
                "cluster",
                "embedding",
                "nrm",
                F.lit(w).cast("int").alias("wave"),
                F.coalesce(~F.col("_d"), F.lit(True)).alias("keep"),
            )
            .localCheckpoint()
        )
        kept_w = verdict_w.where("keep").drop("wave", "keep")
        kept_acc = kept_w if kept_acc is None else kept_acc.unionByName(kept_w)
        verdicts.append(verdict_w.select("vec_id", "cluster", "wave", "keep"))
    out = verdicts[0]
    for v in verdicts[1:]:
        out = out.unionByName(v)
    return out


def _read_store(
    spark: SparkSession, state_path: str, before_batch_id: int | None
) -> DataFrame:
    """All store rows (empty, correctly-typed frame when the store doesn't
    exist yet); ``before_batch_id`` keeps only strictly EARLIER batches —
    what a (re)playing batch must compare against."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(state_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame([], schema=_STORE_SCHEMA)
        raise
    ids = F.substring("batch", 2, 18).cast("long")
    if before_batch_id is not None:
        df = df.where(ids < int(before_batch_id))
    return df.drop("batch")


def codebook_ref_stats(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> dict:
    """Training-time assignment-distance distribution of a codebook over its
    seed sample: ``{"mean_dist2": ..., "p95_dist2": ...}``. Persist this
    beside the pinned codebook and pass it to every :func:`semdedup_batch`
    as ``ref_stats`` — the yardstick the per-wave drift check compares
    against."""
    r = _assign(df, centroids, vec_col).agg(
        F.avg("dist2").alias("mean_dist2"),
        F.percentile("dist2", 0.95).alias("p95_dist2"),
    ).first()
    return {"mean_dist2": float(r["mean_dist2"]), "p95_dist2": float(r["p95_dist2"])}


def _sem_floor(state_path: str) -> int | None:
    """Highest batch id folded into a compacted partition, or None; runs
    ``storemaint.recover`` UNCONDITIONALLY (the wetstream/packstream
    convention) so every crash state — pending deletes and the
    rename-without-marker orphan the marker can't see — is repaired at
    the next ingest wave."""
    from . import storemaint

    storemaint.recover(state_path, [""])
    return storemaint.read_floor(state_path)


def semdedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ref_stats: dict | None = None,
    drift_factor: float = 1.5,
    compare: str = "all",
) -> dict:
    """Fold one wave of vectors into the persistent semantic-dedup store;
    returns ``{"n": ..., "kept": ..., "mean_dist2": ..., "p95_dist2": ...,
    "drift_flagged": ...}``. Shaped to be a ``foreachBatch`` body.
    ``centroids`` is the PINNED codebook (train once on a seed sample,
    reuse every wave — re-fitting per wave would silently reshard history's
    clusters).

    Staleness signal: embeddings drift where langid alphabets don't, and a
    drifted wave degrades the cluster-bounded recall SILENTLY (vectors land
    in clusters that no longer describe them, so true near-dups stop
    meeting). Every wave therefore reports its assignment-distance
    distribution (mean/p95 ``dist2`` — one extra tiny agg over the already-
    materialized wave); when ``ref_stats`` (the training-time distribution
    from :func:`codebook_ref_stats`) is supplied, ``drift_flagged`` goes
    True as soon as either statistic exceeds ``drift_factor`` x its
    reference — the operator keeps folding (the verdict rows are still
    exact for what WAS compared), the flag tells the pipeline owner to
    re-train and re-seed before recall decays further.

    ``compare`` picks the prior-compare set: ``"all"`` (default) is the
    exact-parity form — every SEEN same-cluster vector, O(history) per
    wave; ``"kept"`` is the bounded production form — SURVIVORS only,
    O(post-dedup corpus) per wave, at the transitive-chain recall delta
    measured in SCALING.md (module docstring has the semantics)."""
    from pyspark.errors import AnalysisException

    if compare not in ("all", "kept"):
        raise ValueError(f"unknown compare mode: {compare!r}")
    # compaction floor: a (re)delivery at or below it would land a b-
    # partition alongside the consolidated partition that now owns those
    # rows — fail loud (the wetstream/packstream contract)
    floor = _sem_floor(state_path)
    if floor is not None and batch_id <= floor:
        raise ValueError(
            f"semdedup store at {state_path} is compacted through batch "
            f"{floor}; batch {batch_id} cannot (re)land below the "
            f"compaction floor"
        )
    # out-of-order guard (the packstream contract): an older batch replayed
    # after a newer one landed would compare against the future
    try:
        existing = spark.read.parquet(state_path)
    except AnalysisException as e:
        # only a missing/empty store means "no state" — any other analysis
        # failure must not silently skip the ordering guard (the same
        # discriminating handler as _read_store)
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            existing = None
        else:
            raise
    if existing is not None:
        top = existing.select(
            F.max(F.substring("batch", 2, 18).cast("long")).alias("m")
        ).first()["m"]
        if top is not None and int(top) > batch_id:
            raise ValueError(
                f"semdedup store at {state_path} already holds batch {top} "
                f"> {batch_id}; out-of-order re-delivery would compare "
                f"against the future"
            )

    wave = (
        _assign(
            batch_df.select(
                F.col(id_col).cast("long").alias("vec_id"),
                F.col(vec_col).alias("embedding"),
            ),
            centroids,
            "embedding",
        )
        .select(
            "vec_id",
            "cluster",
            "dist2",
            F.col("embedding").cast("array<double>").alias("embedding"),
            _norm(F.col("embedding")).alias("nrm"),
        )
        .localCheckpoint()  # four consumers below; never re-run the assign
    )
    ws = wave.agg(
        F.avg("dist2").alias("mean_dist2"),
        F.percentile("dist2", 0.95).alias("p95_dist2"),
    ).first()
    mean_d = None if ws["mean_dist2"] is None else float(ws["mean_dist2"])
    p95_d = None if ws["p95_dist2"] is None else float(ws["p95_dist2"])
    drift = None
    if ref_stats is not None:
        drift = bool(
            mean_d is not None
            and (
                mean_d > drift_factor * float(ref_stats["mean_dist2"])
                or p95_d > drift_factor * float(ref_stats["p95_dist2"])
            )
        )
    wave = wave.drop("dist2")
    prior = _read_store(spark, state_path, before_batch_id=batch_id)
    if compare == "kept":
        # bounded mode: only survivors join the compare — the history term
        # stops growing with drops, at the documented recall delta
        prior = prior.where(F.col("keep"))
    p = prior.select(
        "cluster",
        F.col("embedding").alias("emb_p"),
        F.col("nrm").alias("nrm_p"),
    )
    cosine = _dot(F.col("embedding"), F.col("emb_p")) / (F.col("nrm") * F.col("nrm_p"))
    dropped_prior = (
        wave.join(p, "cluster").where(cosine >= threshold).select("vec_id").distinct()
    )
    dropped = dropped_prior.union(semdedup_dropped(wave, threshold)).distinct()
    verdict = (
        wave.join(dropped.withColumn("_d", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "embedding",
            "nrm",
            F.coalesce(~F.col("_d"), F.lit(True)).alias("keep"),
        )
    )
    part = _batch_part(batch_id)
    verdict.write.mode("overwrite").parquet(f"{state_path}/batch={part}")
    landed = spark.read.parquet(f"{state_path}/batch={part}")
    agg = landed.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("keep"), 1)).alias("kept"),
    ).first()
    return {
        "n": int(agg["n"]),
        "kept": int(agg["kept"]),
        "mean_dist2": mean_d,
        "p95_dist2": p95_d,
        "drift_flagged": drift,
    }


def compact_sem_store(spark: SparkSession, state_path: str, upto_batch_id: int) -> dict:
    """Fold every per-batch partition with id <= ``upto_batch_id`` into ONE
    consolidated partition (``batch=c<upto>``) — the semstream twin of
    ``wetstream.compact_wet_store``, bounding the listing/footer cost of a
    store that ingests for months.

    Verdict rows are append-only content: each batch writes only its own
    partition (replays overwrite it, never another's), so the fold is pure
    concatenation — every row survives, and both consumers see the
    IDENTICAL set afterwards (``read_semdedup_store``'s full read, and the
    prior-compare's ``< batch_id`` filter: ``c<upto>`` parses as id
    ``upto``, and the floor guard keeps every later batch id above it).

    The whole fold runs under the crash-safe commit protocol of
    ``operators/storemaint`` (write to a ``_compacting_`` temp, rename,
    ONE marker write commits, deletes follow); every interrupted step is
    repaired by the recovery pass at the start of each compaction AND each
    ingest wave (:func:`_sem_floor`). Compact only batches past the
    streaming checkpoint's replay window — the standard contract, enforced
    loud by the floor guard in :func:`semdedup_batch`."""
    import os

    from . import storemaint

    storemaint.recover(state_path, [""])
    floor = storemaint.read_floor(state_path)
    if floor is not None and upto_batch_id <= floor:
        raise ValueError(
            f"semdedup store at {state_path} is already compacted through "
            f"{floor}; re-compacting at {upto_batch_id} would step backwards"
        )
    parts = storemaint.list_parts(state_path, upto_batch_id)
    if not parts:
        raise ValueError(f"no partitions at or below {upto_batch_id} to compact")
    merged = spark.read.parquet(*[f"{state_path}/{d}" for d in parts])
    out = f"{state_path}/batch=c{upto_batch_id}"
    tmp = f"{state_path}/_compacting_c{upto_batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    os.rename(tmp, out)
    storemaint.commit_fold(state_path, upto_batch_id, {"": parts})
    return {
        "floor": int(upto_batch_id),
        "merged_partitions": len(parts),
        "rows": int(rows),
    }


def read_semdedup_store(spark: SparkSession, state_path: str) -> DataFrame:
    """Every seen vector's verdict, across all waves:
    (vec_id, cluster, keep)."""
    return _read_store(spark, state_path, None).select("vec_id", "cluster", "keep")
