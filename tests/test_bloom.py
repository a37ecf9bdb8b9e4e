"""Bloom-filter membership gating (operators/bloom.py).

Properties under test:
- zero false negatives (the correctness-critical guarantee)
- measured false-positive rate near the requested fpp
- bloom_gated_anti_join == plain left_anti, row for row
- probe stage is map-only (no Exchange before the union's suspect join)
- deterministic build (same data -> same bits)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.bloom import (
    BloomFilter,
    bloom_gated_anti_join,
    bloom_params,
    build_bloom,
    with_bloom_flag,
)


def _range_df(spark, lo, hi, col="k"):
    return spark.range(lo, hi).select(F.col("id").alias(col))


def test_bloom_params_formulas():
    m, k = bloom_params(1000, 0.01)
    # textbook optimum: ~9.585 bits/key, k ~ 7
    assert 9000 <= m <= 10500 and m % 8 == 0
    assert k == 7
    with pytest.raises(ValueError):
        bloom_params(1000, 1.5)
    with pytest.raises(ValueError):
        bloom_params(10**12, 1e-9)  # exceeds the local-mode bit guard


def test_no_false_negatives(spark):
    keys = _range_df(spark, 0, 5000)
    bloom = build_bloom(keys, "k", expected_items=5000, fpp=0.01)
    flagged = with_bloom_flag(keys, "k", bloom)
    assert flagged.where(~F.col("_bloom_maybe")).count() == 0


def test_false_positive_rate_near_target(spark):
    bloom = build_bloom(_range_df(spark, 0, 5000), "k", expected_items=5000, fpp=0.01)
    probes = _range_df(spark, 1_000_000, 1_020_000)  # disjoint from inserted keys
    fp = with_bloom_flag(probes, "k", bloom).where(F.col("_bloom_maybe")).count()
    rate = fp / 20_000
    assert rate < 0.03, f"measured fpp {rate} >> requested 0.01"


def test_gated_anti_join_equals_plain(spark):
    # batch 0..4000, snapshot holds every 3rd key -> ~33% dup rate
    batch = _range_df(spark, 0, 4000).withColumn("payload", F.col("k") * 2)
    snapshot = _range_df(spark, 0, 4000).where(F.col("k") % 3 == 0)
    bloom = build_bloom(snapshot, "k", expected_items=2000, fpp=0.01)
    got = bloom_gated_anti_join(batch, snapshot, "k", bloom)
    want = batch.join(snapshot, "k", "left_anti")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_gated_anti_join_empty_snapshot_passes_everything(spark):
    batch = _range_df(spark, 0, 100)
    snapshot = _range_df(spark, 0, 100).where(F.lit(False))
    bloom = build_bloom(snapshot, "k", expected_items=1, fpp=0.01)
    assert bloom_gated_anti_join(batch, snapshot, "k", bloom).count() == 100


def test_probe_is_map_only_and_definite_new_skips_join(spark):
    """The definite-new branch of the union must contain no join at all, and
    the probe itself no Exchange: only the suspect branch joins."""
    batch = _range_df(spark, 0, 1000)
    snapshot = _range_df(spark, 0, 500)
    bloom = build_bloom(snapshot, "k", expected_items=500)
    plan = bloom_gated_anti_join(batch, snapshot, "k", bloom)._jdf.queryExecution().executedPlan().toString()
    # exactly one anti-join in the whole tree (the suspect branch)
    assert plan.count("LeftAnti") == 1, plan
    flag_plan = with_bloom_flag(batch, "k", bloom)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in flag_plan, flag_plan


def test_build_is_deterministic(spark):
    a = build_bloom(_range_df(spark, 0, 3000), "k", expected_items=3000)
    b = build_bloom(_range_df(spark, 0, 3000).repartition(7), "k", expected_items=3000)
    assert isinstance(a, BloomFilter)
    assert a.bits == b.bits and a.n_bits == b.n_bits and a.n_hashes == b.n_hashes


# --- property-based: randomized key sets ---------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_gated_anti_join_property(data):
    """Random inserted/probe key sets (overlapping, duplicated, negative):
    gated anti-join must equal the plain anti-join exactly, and inserted
    keys must never be bloom-negative."""
    from pyspark.sql import functions as F
    from clickhouse_etl_loadtest_spark.session import get_spark

    spark = get_spark()
    snap_keys = data.draw(st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=60))
    batch_keys = data.draw(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=80))
    # force some overlap so the dup path is exercised
    batch_keys += snap_keys[: len(snap_keys) // 2]
    snapshot = spark.createDataFrame([(k,) for k in snap_keys] or [(0,)], "k long")
    if not snap_keys:
        snapshot = snapshot.where(F.lit(False))
    batch = spark.createDataFrame([(k,) for k in batch_keys], "k long")
    bloom = build_bloom(snapshot, "k", expected_items=max(1, len(snap_keys)), fpp=0.05)
    got = sorted(r.k for r in bloom_gated_anti_join(batch, snapshot, "k", bloom).collect())
    want = sorted(r.k for r in batch.join(snapshot, "k", "left_anti").collect())
    assert got == want
    if snap_keys:
        neg = with_bloom_flag(snapshot, "k", bloom).where(~F.col("_bloom_maybe")).count()
        assert neg == 0


def test_gated_anti_join_as_foreach_batch_body(spark, tmp_path):
    """The advertised deployment shape: a streaming ingest whose foreachBatch
    body bloom-gates each micro-batch against a static snapshot. The union
    of admitted rows across waves must equal the batch anti-join of the
    union of the waves."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    snapshot = _range_df(spark, 0, 300).where(F.col("k") % 3 == 0)
    bloom = build_bloom(snapshot, "k", expected_items=100)

    def admit(batch_df, batch_id):
        out = bloom_gated_anti_join(batch_df, snapshot, "k", bloom)
        out.write.mode("append").parquet(sink)

    def drain():
        stream = spark.readStream.schema("k long").parquet(src)
        q = (
            stream.writeStream.foreachBatch(admit)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    wave1 = _range_df(spark, 0, 150)
    wave2 = _range_df(spark, 150, 300)
    wave1.coalesce(1).write.mode("append").parquet(src)
    drain()
    wave2.coalesce(1).write.mode("append").parquet(src)
    drain()

    got = sorted(r.k for r in spark.read.parquet(sink).collect())
    want = sorted(
        r.k for r in _range_df(spark, 0, 300).join(snapshot, "k", "left_anti").collect()
    )
    assert got == want
