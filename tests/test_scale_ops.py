"""Scale-path join operators: salted skew join equivalence + bucketed
shuffle-free joins (operators/scale.py)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.scale import bucket_table, bucketed_join, salted_join


@pytest.fixture
def skewed(spark):
    # 10k rows of one hot key + a uniform tail, joined against a dim table
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(0)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("w"))
    return left, right


def test_salted_inner_join_equivalence(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").select("k", "v", "w")
    salted = salted_join(left, right, "k", salt_buckets=8).select("k", "v", "w")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_equivalence(spark, skewed):
    left, right = skewed
    # drop some right keys so NULL-extension paths are exercised
    right = right.where(F.col("k") < 25)
    plain = left.join(right, "k", "left").select("k", "v", "w")
    salted = salted_join(left, right, "k", salt_buckets=8, how="left").select("k", "v", "w")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark, skewed):
    """The hot key's rows must land in multiple salt groups (the whole
    point): distinct (k, salt) count for the hot key > 1."""
    left, right = skewed
    salt = (F.rand(seed=7) * 8).cast("int")
    groups = left.withColumn("_salt", salt).where(F.col("k") == 0).select("_salt").distinct().count()
    assert groups >= 4


def test_salted_join_rejects_unsupported_how(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Same-bucketed tables join with zero Exchange operators — the at-rest
    co-partitioning contract that makes repeated 100 TB joins shuffle-free."""
    a = spark.range(1_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    b = spark.range(1_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: at real scale both sides are huge and
        # the planner picks SMJ anyway; here we disable broadcast to see it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucket_table(a, "bkt_a", "k", num_buckets=8, sort_col="k")
        bucket_table(b, "bkt_b", "k", num_buckets=8, sort_col="k")
        joined = bucketed_join(spark, "bkt_a", "bkt_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 1_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_aqe_splits_skewed_join_partitions(spark):
    """session.py claims AQE skew-join splitting handles moderate skew; pin
    it: with one hot key dominating a shuffle join, the adaptive final plan
    must mark the sort-merge join skew=true (split into subpartitions)."""
    confs = {
        # force a shuffle join (no broadcast) and make the test-sized skew
        # cross AQE's thresholds
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # skew on the LEFT only (hot key 0); the right side stays 1 row/key
        # so the join output equals the left size
        left = spark.range(100_000).select(
            F.when(F.col("id") < 95_000, F.lit(0)).otherwise(F.col("id") % 64).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pl"),
        )
        right = spark.range(64).select(F.col("id").alias("k"), F.col("id").alias("w"))
        # no keyed agg downstream: AQE declines to split a skewed join whose
        # output partitioning a later stage would reuse
        joined = left.join(right, "k").select("pl", "w")
        joined.collect()  # adaptive plan finalizes only after execution
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_snapshot_index_anti_join_shuffles_only_the_batch(spark, sf_dir):
    """Incremental dedup against a bucketed snapshot index: the snapshot scan
    is pre-hash-distributed, so the anti-join plan carries exactly ONE
    Exchange (the new batch) — the at-scale shape where only new data
    shuffles per ingest."""
    from clickhouse_etl_loadtest_spark.functions.hashing import h60
    from clickhouse_etl_loadtest_spark.operators.scale import (
        anti_join_snapshot_index,
        snapshot_dedup_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = docs.select("doc_id", h60(F.col("text")).alias("content_hash"))
    snapshot = hashed.where(F.col("doc_id") % 10 < 3)
    batch = hashed.where(F.col("doc_id") % 10 >= 3)
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        snapshot_dedup_index(snapshot, "snap_idx", num_buckets=8)
        kept = anti_join_snapshot_index(spark, batch, "snap_idx")
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan[:2000]
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        # semantics match the plain anti-join
        plain = batch.join(snapshot.select("content_hash"), "content_hash", "left_anti")
        assert kept.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.sql("DROP TABLE IF EXISTS snap_idx")


def test_salted_interval_join_plan_and_equivalence(spark, sf_dir):
    """The registered salted interval-join variant: both shuffle sides key on
    (user_id, _salt) — the hot-key spread — the range predicate stays a
    post-join filter (no nested-loop), and the result set equals the plain
    interval join's."""
    from clickhouse_etl_loadtest_spark.queries import load_all

    reg = load_all()
    salted_df = reg["interval_join_events_orders_salted"].fn(spark, sf_dir)
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    join_lines = [
        ln for ln in plan.splitlines() if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
    ]
    assert len(join_lines) == 1, join_lines
    assert "_salt#" in join_lines[0] and "user_id#" in join_lines[0]
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(exchanges) >= 2  # both join inputs shuffle on the salted key
    for ln in exchanges:
        assert "_salt#" in ln, ln
    plain = reg["interval_join_events_orders"].fn(spark, sf_dir)
    assert salted_df.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted_df).count() == 0


def test_blocked_cosine_pairs_edge_cases(spark):
    """Blocked matmul join edge behavior: single block (pure diagonal),
    empty input, and a threshold above every cosine."""
    from clickhouse_etl_loadtest_spark.operators.blockjoin import blocked_cosine_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in blocked_cosine_pairs(df, threshold=0.9, n_blocks=1).collect()
    }
    assert set(got) == {(1, 2)} and abs(got[(1, 2)] - 1.0) < 1e-12

    # multi-block: same result regardless of block count
    got4 = {
        (r.vec_a, r.vec_b)
        for r in blocked_cosine_pairs(df, threshold=0.9, n_blocks=4).collect()
    }
    assert got4 == {(1, 2)}

    assert blocked_cosine_pairs(df, threshold=1.5, n_blocks=2).count() == 0
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert blocked_cosine_pairs(empty, threshold=0.0, n_blocks=2).count() == 0
