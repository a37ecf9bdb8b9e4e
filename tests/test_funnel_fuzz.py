"""Randomized differential for events_window_funnel's core claim: the
greedy earliest-next-step reduction equals TRUE exists-chain semantics
(some t1 < t2 < t3 within [t1, t1+window], steps in order). The brute-force
reference enumerates every chain; the Spark side must match on hundreds of
adversarial random users (dense bursts, boundary-exact gaps, missing
steps)."""

import random

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries.pipeline import (
    _FUNNEL_STEPS,
    _FUNNEL_WINDOW_US,
)


def _brute_force_level(a1, a2, a3, w):
    """Max chain depth by full enumeration (the semantics, not the greedy)."""
    best = 1 if a1 else 0
    for t1 in a1:
        hi = t1 + w
        for t2 in a2:
            if t1 < t2 <= hi:
                best = max(best, 2)
                for t3 in a3:
                    if t2 < t3 <= hi:
                        return 3
    return best


def test_funnel_matches_brute_force_on_random_streams(spark, tmp_path):
    rng = random.Random(1234)
    w = _FUNNEL_WINDOW_US
    rows = []
    expected = {}
    for user in range(300):
        # adversarial mix: cluster timestamps at window-boundary scales so
        # exact <=/> boundary behavior is exercised, include empty steps
        arrs = []
        for _ in range(3):
            n = rng.randint(0, 5)
            base = rng.randint(0, 3) * w
            ts = sorted(
                base + rng.choice([0, 1, w // 2, w - 1, w, w + 1]) + rng.randint(0, w)
                for _ in range(n)
            )
            arrs.append(ts)
        a1, a2, a3 = arrs
        if not (a1 or a2 or a3):
            continue  # a user with zero events has no row to score
        expected[user] = _brute_force_level(a1, a2, a3, w)
        for step, ts_list in zip(_FUNNEL_STEPS, arrs):
            for t in ts_list:
                rows.append((user, step, t))
    # build an events-shaped table (epoch micros -> TIMESTAMP_NTZ)
    df = spark.createDataFrame(rows, "user_id long, event_type string, t long").select(
        "user_id",
        "event_type",
        F.timestamp_micros(F.col("t")).cast("timestamp_ntz").alias("ts"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)

    from clickhouse_etl_loadtest_spark.queries import load_all

    got = {
        r["user_id"]: r["funnel_level"]
        for r in load_all()["events_window_funnel"].fn(spark, str(tmp_path)).collect()
    }
    mismatches = {u: (got.get(u), expected[u]) for u in expected if got.get(u) != expected[u]}
    assert not mismatches, dict(list(mismatches.items())[:5])
