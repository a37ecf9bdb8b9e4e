"""Incremental SemDeDup (operators/semstream.py): streamed waves against a
pinned codebook must converge to the batch pairwise keep set, a vector
near an already-DROPPED vector must still drop (the store keeps every
SEEN vector for exactly this), replays must be no-ops, and out-of-order
re-delivery must fail loud."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.semstream import (
    read_semdedup_store,
    semdedup_batch,
    semdedup_dropped,
)

DIM = 8
THRESHOLD = 0.9


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return (v / np.linalg.norm(v)).tolist()


def _corpus(n=60, n_dups=12, seed=5):
    """Unit vectors with planted near-dups: vector n_base+i is a tiny
    perturbation of vector i (cosine ~0.995 >> THRESHOLD)."""
    rng = np.random.default_rng(seed)
    base = [rng.normal(size=DIM) for _ in range(n)]
    vecs = [(i, _unit(b)) for i, b in enumerate(base)]
    for i in range(n_dups):
        vecs.append((n + i, _unit(base[i] + 0.02 * rng.normal(size=DIM))))
    return vecs


def _centroids(vecs, k=4):
    return [v for _, v in sorted(vecs)[:k]]


def _batch_twin(spark, vecs, centroids):
    """The one-shot batch keep set under the SAME pinned codebook: assign +
    the shared pairwise rule."""
    from clickhouse_etl_loadtest_spark.operators.clustering import _assign
    from clickhouse_etl_loadtest_spark.operators.semstream import _norm

    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    n = _assign(df, centroids, "embedding").select(
        "vec_id", "cluster", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    dropped = {r["vec_id"] for r in semdedup_dropped(n, THRESHOLD).collect()}
    return {
        r["vec_id"]: (r["cluster"], r["vec_id"] not in dropped) for r in n.collect()
    }


def _waves(vecs, n_waves=3):
    s = sorted(vecs)
    per = (len(s) + n_waves - 1) // n_waves
    return [s[i * per : (i + 1) * per] for i in range(n_waves)]


def test_streamed_waves_equal_batch_keep_set(spark, tmp_path):
    vecs = _corpus()
    cents = _centroids(vecs)
    state = str(tmp_path / "sem_state")
    for bid, wave in enumerate(_waves(vecs)):
        df = spark.createDataFrame(wave, "vec_id long, embedding array<double>")
        semdedup_batch(spark, df, state, bid, cents, THRESHOLD)
    got = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in read_semdedup_store(spark, state).collect()
    }
    want = _batch_twin(spark, vecs, cents)
    assert got == want
    # the planted near-dups actually exercised the drop path
    assert sum(1 for _, k in got.values() if not k) >= 10


def test_real_availablenow_stream(spark, tmp_path):
    """Drive semdedup_batch as a real foreachBatch body over a file stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = _corpus(n=30, n_dups=8)
    cents = _centroids(vecs)
    src = tmp_path / "incoming"
    src.mkdir()
    state = str(tmp_path / "sem_state")
    for w, wave in enumerate(_waves(vecs, 3)):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([v for v, _ in wave], pa.int64()),
                    "embedding": pa.array(
                        [e for _, e in wave], pa.list_(pa.float64())
                    ),
                }
            ),
            str(src / f"wave{w}.parquet"),
        )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: semdedup_batch(
                bdf.sparkSession, bdf, state, bid, cents, THRESHOLD
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in read_semdedup_store(spark, state).collect()
    }
    assert got == _batch_twin(spark, vecs, cents)


def test_dropped_vector_still_blocks_newcomers(spark, tmp_path):
    """v1 duplicates v0 (dropped); v2 arrives LATER near v1 but not v0 —
    the batch pairwise rule drops v2 via the (v1, v2) pair, so the store
    must keep comparing against SEEN (not just admitted) vectors."""
    e0 = _unit([1.0] + [0.0] * (DIM - 1))
    # rotate slightly twice in the same plane: cos(e0,e1)=cos(e1,e2)~0.995,
    # cos(e0,e2)~0.98 — pick angles so e0-e2 falls BELOW the threshold
    import math

    def rot(theta):
        return _unit(
            [math.cos(theta), math.sin(theta)] + [0.0] * (DIM - 2)
        )

    t = math.acos(THRESHOLD) * 0.9  # each step safely above threshold
    e1, e2 = rot(t), rot(2 * t)  # e0·e2 = cos(2t) < THRESHOLD
    assert np.dot(e0, e2) < THRESHOLD < np.dot(e0, e1)
    cents = [e0, _unit([0.0, 0.0, 1.0] + [0.0] * (DIM - 3))]
    state = str(tmp_path / "sem_state")
    df0 = spark.createDataFrame([(0, e0), (1, e1)], "vec_id long, embedding array<double>")
    semdedup_batch(spark, df0, state, 0, cents, THRESHOLD)
    df1 = spark.createDataFrame([(2, e2)], "vec_id long, embedding array<double>")
    semdedup_batch(spark, df1, state, 1, cents, THRESHOLD)
    got = {r["vec_id"]: r["keep"] for r in read_semdedup_store(spark, state).collect()}
    assert got == {0: True, 1: False, 2: False}


def test_replay_is_idempotent(spark, tmp_path):
    vecs = _corpus(n=30, n_dups=6)
    cents = _centroids(vecs)
    state = str(tmp_path / "sem_state")
    waves = _waves(vecs, 3)
    infos = []
    for bid, wave in enumerate(waves):
        df = spark.createDataFrame(wave, "vec_id long, embedding array<double>")
        infos.append(semdedup_batch(spark, df, state, bid, cents, THRESHOLD))
    before = sorted(
        tuple(r) for r in read_semdedup_store(spark, state).collect()
    )
    # post-crash re-delivery of the LAST wave
    df = spark.createDataFrame(waves[-1], "vec_id long, embedding array<double>")
    replay = semdedup_batch(spark, df, state, len(waves) - 1, cents, THRESHOLD)
    assert replay == infos[-1]
    assert sorted(tuple(r) for r in read_semdedup_store(spark, state).collect()) == before


def test_out_of_order_redelivery_fails_loud(spark, tmp_path):
    vecs = _corpus(n=20, n_dups=0)
    cents = _centroids(vecs)
    state = str(tmp_path / "sem_state")
    waves = _waves(vecs, 2)
    for bid, wave in enumerate(waves):
        df = spark.createDataFrame(wave, "vec_id long, embedding array<double>")
        semdedup_batch(spark, df, state, bid, cents, THRESHOLD)
    df = spark.createDataFrame(waves[0], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="out-of-order"):
        semdedup_batch(spark, df, state, 0, cents, THRESHOLD)


def test_wave_reports_codebook_drift(spark, tmp_path):
    """The pinned-codebook staleness signal: an in-distribution wave stays
    unflagged; a deliberately shifted wave (embeddings drift, the codebook
    doesn't) reports assignment distances past the training-time yardstick
    and flags. The fold itself still lands either way — the flag is a
    re-train signal, not a gate."""
    from clickhouse_etl_loadtest_spark.operators.semstream import codebook_ref_stats

    vecs = _corpus(n=40, n_dups=8)
    cents = _centroids(vecs)
    state = str(tmp_path / "sem_state")
    seed_df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    ref = codebook_ref_stats(seed_df, cents)
    assert ref["mean_dist2"] > 0 and ref["p95_dist2"] >= ref["mean_dist2"]

    # wave 0: same distribution as the seed sample -> no flag
    info0 = semdedup_batch(
        spark, seed_df, state, 0, cents, THRESHOLD, ref_stats=ref
    )
    assert info0["drift_flagged"] is False
    assert info0["mean_dist2"] > 0 and info0["p95_dist2"] > 0

    # wave 1: drifted embedding space (constant offset, re-normalized) ->
    # assignment distances blow past the yardstick and the wave flags
    import numpy as np

    shift = np.ones(DIM) / np.sqrt(DIM)
    drifted = [
        (100 + i, _unit(np.asarray(v) + 3.0 * shift)) for i, (_, v) in enumerate(vecs)
    ]
    df1 = spark.createDataFrame(drifted, "vec_id long, embedding array<double>")
    info1 = semdedup_batch(spark, df1, state, 1, cents, THRESHOLD, ref_stats=ref)
    assert info1["drift_flagged"] is True
    assert info1["mean_dist2"] > 1.5 * ref["mean_dist2"]

    # without a reference the metric still reports, the flag stays None
    df2 = spark.createDataFrame(
        [(200 + i, v) for i, (_, v) in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    info2 = semdedup_batch(spark, df2, state, 2, cents, THRESHOLD)
    assert info2["drift_flagged"] is None and info2["mean_dist2"] > 0
