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


# --- bounded (kept-representatives) compare mode --------------------------------------


def _drive(spark, state, vecs, cents, n_waves=3, compare="all"):
    for bid, wave in enumerate(_waves(vecs, n_waves)):
        df = spark.createDataFrame(wave, "vec_id long, embedding array<double>")
        semdedup_batch(spark, df, state, bid, cents, THRESHOLD, compare=compare)
    return {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in read_semdedup_store(spark, state).collect()
    }


def _bounded_twin(spark, vecs, cents, n_waves=3):
    """semdedup_bounded_verdicts over the SAME contiguous wave split the
    streamed drive uses."""
    from clickhouse_etl_loadtest_spark.operators.clustering import _assign
    from clickhouse_etl_loadtest_spark.operators.semstream import (
        _norm,
        semdedup_bounded_verdicts,
    )

    waves = _waves(vecs, n_waves)
    tagged = [(v, e, w) for w, wave in enumerate(waves) for v, e in wave]
    df = spark.createDataFrame(
        tagged, "vec_id long, embedding array<double>, wave int"
    )
    n = _assign(df, cents, "embedding").select(
        "vec_id", "cluster", "embedding", _norm(F.col("embedding")).alias("nrm"), "wave"
    )
    return {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semdedup_bounded_verdicts(n, THRESHOLD, n_waves).collect()
    }


def test_bounded_mode_matches_batch_twin(spark, tmp_path):
    """compare="kept" streamed over waves == the batch wave-greedy twin."""
    vecs = _corpus(n=60, n_dups=12)
    cents = _centroids(vecs)
    got = _drive(spark, str(tmp_path / "sem_b"), vecs, cents, compare="kept")
    assert got == _bounded_twin(spark, vecs, cents)


def test_bounded_mode_transitive_chain_is_the_delta(spark, tmp_path):
    """The documented relaxation, pinned: e1 duplicates e0 (dropped in both
    modes); e2 is near only the DROPPED e1 — exact mode drops it via the
    seen-store compare, bounded mode keeps it (its only neighbor is not a
    survivor). The first-arrival representative e0 is kept in both."""
    import math

    e0 = _unit([1.0] + [0.0] * (DIM - 1))

    def rot(theta):
        return _unit([math.cos(theta), math.sin(theta)] + [0.0] * (DIM - 2))

    t = math.acos(THRESHOLD) * 0.9
    e1, e2 = rot(t), rot(2 * t)
    cents = [e0, _unit([0.0, 0.0, 1.0] + [0.0] * (DIM - 3))]

    def run(compare):
        state = str(tmp_path / f"sem_{compare}")
        df0 = spark.createDataFrame(
            [(0, e0), (1, e1)], "vec_id long, embedding array<double>"
        )
        semdedup_batch(spark, df0, state, 0, cents, THRESHOLD, compare=compare)
        df1 = spark.createDataFrame([(2, e2)], "vec_id long, embedding array<double>")
        semdedup_batch(spark, df1, state, 1, cents, THRESHOLD, compare=compare)
        return {
            r["vec_id"]: r["keep"]
            for r in read_semdedup_store(spark, state).collect()
        }

    assert run("all") == {0: True, 1: False, 2: False}
    assert run("kept") == {0: True, 1: False, 2: True}


def test_bounded_drop_set_is_subset_with_recall_floor(spark, tmp_path):
    """With contiguous (vec_id-ordered) waves the bounded drop set is a
    SUBSET of the exact one (a kept earlier survivor is an earlier seen
    vector), and on the clustered planted-dup regime — every dup adjacent
    to its kept first-arrival base — recall stays at 1.0; assert a >=0.9
    floor to leave room for base-base collisions under reseeding."""
    vecs = _corpus(n=80, n_dups=16, seed=11)
    cents = _centroids(vecs)
    exact = _drive(spark, str(tmp_path / "sx"), vecs, cents, compare="all")
    bounded = _drive(spark, str(tmp_path / "sb"), vecs, cents, compare="kept")
    dropped_exact = {v for v, (_, k) in exact.items() if not k}
    dropped_bounded = {v for v, (_, k) in bounded.items() if not k}
    assert dropped_bounded <= dropped_exact
    assert len(dropped_exact) >= 12
    assert len(dropped_bounded) / len(dropped_exact) >= 0.9


def test_bad_compare_mode_fails_loud(spark, tmp_path):
    df = spark.createDataFrame([(0, _unit([1.0] * DIM))], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="compare mode"):
        semdedup_batch(
            spark, df, str(tmp_path / "s"), 0, [_unit([1.0] * DIM)], 0.9, compare="x"
        )


# --- store compaction ------------------------------------------------------------------


def test_compact_sem_store_preserves_reads_and_later_waves(spark, tmp_path):
    """Fold waves 0..1, keep driving: the store read AND every later wave's
    verdicts must equal an uncompacted twin drive row-for-row."""
    from clickhouse_etl_loadtest_spark.operators.semstream import compact_sem_store

    vecs = _corpus(n=60, n_dups=12, seed=7)
    cents = _centroids(vecs)
    waves = _waves(vecs, 4)

    def drive(tag, compact_after=None):
        state = str(tmp_path / f"sem_{tag}")
        for bid, wave in enumerate(waves):
            df = spark.createDataFrame(wave, "vec_id long, embedding array<double>")
            semdedup_batch(spark, df, state, bid, cents, THRESHOLD)
            if compact_after is not None and bid == compact_after:
                info = compact_sem_store(spark, state, upto_batch_id=bid)
                assert info["floor"] == bid and info["merged_partitions"] == bid + 1
        return state

    plain = drive("plain")
    folded = drive("folded", compact_after=1)
    want = sorted(tuple(r) for r in read_semdedup_store(spark, plain).collect())
    got = sorted(tuple(r) for r in read_semdedup_store(spark, folded).collect())
    assert got == want
    import os

    names = sorted(d for d in os.listdir(folded) if d.startswith("batch="))
    assert names == ["batch=b2", "batch=b3", "batch=c1"]


def test_compact_floor_guards_replay_and_backsteps(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.semstream import compact_sem_store

    vecs = _corpus(n=30, n_dups=6)
    cents = _centroids(vecs)
    state = str(tmp_path / "sem")
    waves = _waves(vecs, 3)
    for bid, wave in enumerate(waves):
        df = spark.createDataFrame(wave, "vec_id long, embedding array<double>")
        semdedup_batch(spark, df, state, bid, cents, THRESHOLD)
    compact_sem_store(spark, state, upto_batch_id=2)
    # replay at/below the floor fails loud
    df = spark.createDataFrame(waves[-1], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="compaction floor"):
        semdedup_batch(spark, df, state, 2, cents, THRESHOLD)
    # re-compacting backwards fails loud
    with pytest.raises(ValueError, match="step backwards"):
        compact_sem_store(spark, state, upto_batch_id=1)
    # a NEW batch above the floor lands fine
    df = spark.createDataFrame(
        [(900, _unit(np.ones(DIM)))], "vec_id long, embedding array<double>"
    )
    info = semdedup_batch(spark, df, state, 3, cents, THRESHOLD)
    assert info["n"] == 1


def test_sem_compaction_crash_states_are_repaired(spark, tmp_path):
    """The storemaint crash matrix on the semstream store: (A) fold renamed
    but no marker — the orphan c-partition double-counts until the NEXT
    INGEST WAVE's unconditional recovery removes it (the round-13
    hardening); (B) marker committed, deletes unfinished — the next ingest
    wave finishes them."""
    import shutil

    from clickhouse_etl_loadtest_spark.operators import storemaint
    from clickhouse_etl_loadtest_spark.operators.semstream import compact_sem_store

    vecs = _corpus(n=40, n_dups=8, seed=3)
    cents = _centroids(vecs)
    waves = _waves(vecs, 3)

    def build(tag):
        state = str(tmp_path / f"sem_{tag}")
        for bid, wave in enumerate(waves):
            df = spark.createDataFrame(wave, "vec_id long, embedding array<double>")
            semdedup_batch(spark, df, state, bid, cents, THRESHOLD)
        return state

    clean = build("clean")
    compact_sem_store(spark, clean, upto_batch_id=1)
    want_raw = sorted(
        tuple(r) for r in spark.read.parquet(clean).drop("batch").collect()
    )

    extra = spark.createDataFrame(
        [(901, _unit(np.ones(DIM)))], "vec_id long, embedding array<double>"
    )

    # --- case A: renamed fold, no marker; healed by the next ingest wave ---
    a = build("crash_a")
    shutil.copytree(f"{clean}/batch=c1", f"{a}/batch=c1")  # b0,b1 still present
    assert spark.read.parquet(a).count() > len(want_raw)  # dirty window
    semdedup_batch(spark, extra, a, 3, cents, THRESHOLD)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(a)
        .drop("batch")
        .where("vec_id < 900")
        .collect()
    )
    assert got == want_raw

    # --- case B: marker committed, deletes unfinished ---
    b = build("crash_b")
    compact_sem_store(spark, b, upto_batch_id=1)
    src = str(tmp_path / "sem_pristine")
    df0 = spark.createDataFrame(waves[0], "vec_id long, embedding array<double>")
    semdedup_batch(spark, df0, src, 0, cents, THRESHOLD)
    shutil.copytree(f"{src}/batch=b0", f"{b}/batch=b0")
    storemaint.write_marker(b, 1, ["batch=b0"])
    assert spark.read.parquet(b).count() > len(want_raw)  # dirty window
    semdedup_batch(spark, extra, b, 3, cents, THRESHOLD)
    assert storemaint.read_marker(b)["pending_delete"] == []
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(b)
        .drop("batch")
        .where("vec_id < 900")
        .collect()
    )
    assert got == want_raw
