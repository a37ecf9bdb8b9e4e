"""Approximate-sketch accuracy: approx_count_distinct / approx_percentile
stay within their configured error bounds of the exact answers (the rows-only
query approx_events_sketch has no cross-engine oracle by design)."""

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries import load_all


def test_approx_sketch_error_bounds(spark, sf_dir):
    reg = load_all()
    approx = {r["event_type"]: r for r in reg["approx_events_sketch"].fn(spark, sf_dir).collect()}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("pcts"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        x = exact[et]
        # HLL++ at rsd=0.02: allow 3x the nominal relative error
        assert abs(a["approx_users"] - x["users"]) <= max(1, 0.06 * x["users"])
        for got, want in zip((a["value_p50"], a["value_p95"]), x["pcts"]):
            # KLL accuracy=5000 -> rank error ~1/5000; values are in [0, 500]
            assert abs(got - want) <= 0.05 * 500
