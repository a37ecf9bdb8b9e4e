"""Streaming heavy hitters (operators/streamhh.py): recall-1.0 candidates
across micro-batch waves, exact confirm parity with the batch operator,
replay idempotency, and a real foreachBatch drive."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.heavyhitters import heavy_hitters
from clickhouse_etl_loadtest_spark.operators.streamhh import (
    candidates,
    confirm_exact,
    prune_state,
    update_summary,
)

PHI = 0.05
K = 40  # ceil(2/phi)


def _skewed(spark, n=20_000, seed=0):
    """Zipf-ish key column: a few hot users over a long uniform tail."""
    return spark.range(n).select(
        F.col("id"),
        F.when(F.xxhash64("id", F.lit(seed)) % 100 < 30, F.concat(F.lit("hot"), (F.xxhash64("id", F.lit(seed + 1)) % 3).cast("string")))
        .otherwise(F.concat(F.lit("u"), (F.xxhash64("id", F.lit(seed + 2)) % 5000).cast("string")))
        .alias("user"),
    )


def _exact_hh(df, phi):
    n = df.count()
    return {
        r["user"]: r["c"]
        for r in df.groupBy("user").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") > phi * n).collect()
    }


def test_candidates_keep_recall_and_confirm_is_exact(spark, tmp_path):
    state = str(tmp_path / "hh-state")
    full = _skewed(spark)
    waves = [full.where(F.col("id") % 3 == w) for w in range(3)]
    for bid, w in enumerate(waves):
        info = update_summary(spark, w, state, "user", K, batch_id=bid)
    assert info["n_seen"] == full.count()
    assert info["summary_rows"] <= K

    truth = _exact_hh(full, PHI)
    assert truth  # fixture must actually contain heavy keys
    cand = candidates(spark, state, PHI)
    cand_rows = {r["user"]: r["est_count"] for r in cand.collect()}
    # recall 1.0: every true heavy hitter is a candidate...
    assert set(truth) <= set(cand_rows)
    # ...with estimates inside the Misra-Gries error band
    n = full.count()
    for key_val, true_count in truth.items():
        assert true_count - n / (K + 1) <= cand_rows[key_val] <= true_count

    confirmed = confirm_exact(full, cand, "user", PHI)
    got = {r["user"]: r["n_rows"] for r in confirmed.collect()}
    assert got == truth
    # and the whole streaming path agrees with the one-shot batch operator
    batch = {r["user"]: r["n_rows"] for r in heavy_hitters(full, "user", PHI).collect()}
    assert got == batch


def test_replay_overwrites_its_own_snapshot(spark, tmp_path):
    state = str(tmp_path / "hh-state")
    full = _skewed(spark, n=6000, seed=5)
    w1 = full.where(F.col("id") % 2 == 0)
    w2 = full.where(F.col("id") % 2 == 1)
    update_summary(spark, w1, state, "user", K, batch_id=0)
    first = update_summary(spark, w2, state, "user", K, batch_id=1)
    snap = spark.read.parquet(f"{state}/summary/batch=b1").toPandas()
    # checkpoint-recovery replay of batch 1: same inputs, same batch_id
    replay = update_summary(spark, w2, state, "user", K, batch_id=1)
    assert replay == first  # n_seen did NOT double-count
    snap2 = spark.read.parquet(f"{state}/summary/batch=b1").toPandas()
    pd.testing.assert_frame_equal(
        snap.sort_values("user").reset_index(drop=True),
        snap2.sort_values("user").reset_index(drop=True),
    )


def test_mismatched_k_is_rejected(spark, tmp_path):
    state = str(tmp_path / "hh-state")
    update_summary(spark, _skewed(spark, n=1000), state, "user", K, batch_id=0)
    with pytest.raises(ValueError, match="k="):
        update_summary(spark, _skewed(spark, n=1000), state, "user", K + 1, batch_id=1)
    with pytest.raises(ValueError, match="recall"):
        candidates(spark, state, phi=0.01)  # needs k >= 200


def test_prune_keeps_only_latest_snapshot(spark, tmp_path):
    state = str(tmp_path / "hh-state")
    full = _skewed(spark, n=9000, seed=9)
    for bid in range(3):
        update_summary(spark, full.where(F.col("id") % 3 == bid), state, "user", K, batch_id=bid)
    before = candidates(spark, state, PHI).toPandas()
    assert prune_state(spark, state) == 4  # 2 old summary + 2 old meta parts
    after = candidates(spark, state, PHI).toPandas()
    pd.testing.assert_frame_equal(
        before.sort_values("user").reset_index(drop=True),
        after.sort_values("user").reset_index(drop=True),
    )


def test_foreachbatch_drive_matches_batch_operator(spark, tmp_path):
    """Drive the operator as an actual Structured Streaming foreachBatch body
    (file stream, availableNow), sink + sketch updated per micro-batch; the
    post-drain candidates->confirm path must equal the batch operator."""
    full = _skewed(spark, n=12_000, seed=3)
    staging = str(tmp_path / "staging")
    # several files so availableNow + maxFilesPerTrigger yields >1 micro-batch
    full.repartition(4).write.parquet(staging)
    state = str(tmp_path / "hh-state")
    sink = str(tmp_path / "sink")

    def _fold(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)
        update_summary(batch_df.sparkSession, batch_df, state, "user", K, batch_id=batch_id)

    stream = (
        spark.readStream.schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = stream.writeStream.foreachBatch(_fold).trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    assert q.awaitTermination(300)

    seen = spark.read.parquet(sink)
    assert seen.count() == full.count()
    cand = candidates(spark, state, PHI)
    got = {r["user"]: r["n_rows"] for r in confirm_exact(seen, cand, "user", PHI).collect()}
    want = {r["user"]: r["n_rows"] for r in heavy_hitters(full, "user", PHI).collect()}
    assert got == want and want
