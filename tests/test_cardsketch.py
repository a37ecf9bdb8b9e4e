"""Incremental HLL cardinality state (operators/cardsketch.py): streaming
fold equals one-shot sketch bit-for-bit, estimates stay inside the HLL
error band, replays don't double-merge."""

import pandas as pd
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.cardsketch import (
    estimates,
    sketch_batch,
    update_sketches,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_incremental_fold_equals_one_shot_sketch(spark, sf_dir, tmp_path):
    """HLL union has no merge penalty: folding three waves must produce the
    SAME estimate as sketching the full table once — and both inside ~3
    standard errors (0.8% at lg_k=12) of the exact distinct count."""
    state = str(tmp_path / "card-state")
    ev = _events(spark, sf_dir)
    for bid in range(3):
        update_sketches(
            spark, ev.where(F.col("event_id") % 3 == bid), state, "event_type", "user_id", bid
        )
    folded = {
        r["event_type"]: r["approx_distinct"]
        for r in estimates(spark, state, "event_type").collect()
    }
    one_shot = {
        r["event_type"]: r["est"]
        for r in sketch_batch(ev, "event_type", "user_id")
        .select("event_type", F.hll_sketch_estimate("sketch").alias("est"))
        .collect()
    }
    assert folded == one_shot
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("d")).collect()
    }
    assert set(folded) == set(exact)
    for t, d in exact.items():
        assert abs(folded[t] - d) <= max(3, 0.03 * d), (t, folded[t], d)


def test_replay_does_not_double_merge(spark, sf_dir, tmp_path):
    state = str(tmp_path / "card-state")
    ev = _events(spark, sf_dir)
    w1 = ev.where(F.col("event_id") % 2 == 0)
    w2 = ev.where(F.col("event_id") % 2 == 1)
    update_sketches(spark, w1, state, "event_type", "user_id", batch_id=0)
    update_sketches(spark, w2, state, "event_type", "user_id", batch_id=1)
    before = estimates(spark, state, "event_type").toPandas()
    # checkpoint-recovery replay of batch 1 (same inputs, same batch_id):
    # idempotent overwrite, NOT a second union of wave 2 into the state
    update_sketches(spark, w2, state, "event_type", "user_id", batch_id=1)
    after = estimates(spark, state, "event_type").toPandas()
    pd.testing.assert_frame_equal(
        before.sort_values("event_type").reset_index(drop=True),
        after.sort_values("event_type").reset_index(drop=True),
    )


def test_sketch_shuffle_carries_sketches_not_keys(spark, sf_dir):
    """The aggregate must partially combine map-side: the plan is a
    two-phase ObjectHashAggregate with no raw-key exchange."""
    plan = (
        sketch_batch(_events(spark, sf_dir), "event_type", "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ObjectHashAggregate") >= 2
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "user_id" not in ln, ln


def test_prune_keeps_only_latest_sketch_snapshot(spark, sf_dir, tmp_path):
    """The shared delete-only maintenance pass: after pruning, exactly one
    snapshot remains and the estimates are unchanged."""
    import os

    from clickhouse_etl_loadtest_spark.operators.cardsketch import prune_state

    state = str(tmp_path / "card-state")
    ev = _events(spark, sf_dir)
    for bid in range(3):
        update_sketches(
            spark, ev.where(F.col("event_id") % 3 == bid), state, "event_type", "user_id", bid
        )
    before = {
        r["event_type"]: r["approx_distinct"]
        for r in estimates(spark, state, "event_type").collect()
    }
    assert prune_state(spark, state) == 2  # 2 old sketch parts
    after = {
        r["event_type"]: r["approx_distinct"]
        for r in estimates(spark, state, "event_type").collect()
    }
    assert before == after
    parts = [d for d in os.listdir(f"{state}/sketches") if d.startswith("batch=")]
    assert parts == ["batch=b2"]
