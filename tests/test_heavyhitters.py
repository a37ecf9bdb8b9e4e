"""Exact heavy hitters via Misra-Gries candidates (operators/heavyhitters.py).

Properties:
- result equals the plain groupBy/HAVING form on skewed and uniform data
- the candidate pass has recall 1.0 (derived k >= 2/phi bound)
- summary size stays <= k rows per partition regardless of partition size
- confirm pass joins via broadcast (candidates never shuffle the fact side)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.heavyhitters import (
    _mg_truncate,
    heavy_hitters,
    misra_gries_summaries,
)


def _skewed(spark, n=20_000, hot=5):
    """~half the rows on `hot` hot keys, the rest spread over 2000 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.col("id") % hot)
        .otherwise(F.col("id") % 2000 + 100)
        .alias("k")
    )


def _exact(df, key, phi):
    n = df.count()
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows")).where(F.col("n_rows") > phi * n)


@pytest.mark.parametrize("phi", [0.01, 0.05])
def test_matches_exact_groupby_on_skewed_data(spark, phi):
    df = _skewed(spark)
    got = heavy_hitters(df, "k", phi).orderBy("k").collect()
    want = _exact(df, "k", phi).orderBy("k").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0  # the hot keys must actually qualify


def test_uniform_data_yields_no_heavy_hitters(spark):
    df = spark.range(10_000).select((F.col("id") % 1000).alias("k"))
    assert heavy_hitters(df, "k", 0.05).count() == 0


def test_summary_bounded_per_partition(spark):
    df = _skewed(spark).repartition(4)
    k = 50
    per_part = (
        misra_gries_summaries(df, "k", k)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_part <= k


def test_mg_truncate_keeps_top_k_minus_pivot():
    counts = {i: 100 - i for i in range(10)}
    out = _mg_truncate(dict(counts), 3)
    # pivot = 4th largest (97); survivors are the three larger, less pivot
    assert out == {0: 3, 1: 2, 2: 1}
    assert _mg_truncate({1: 5}, 3) == {1: 5}


def test_confirm_pass_broadcasts_candidates(spark):
    df = _skewed(spark)
    plan = heavy_hitters(df, "k", 0.05)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_phi_validation(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_skewed(spark), "k", 1.5)


# --- property-based: randomized distributions ----------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_heavy_hitters_property(data):
    """Random Zipf-ish key mixes at random phi: two-pass result must equal
    the plain GROUP BY/HAVING on the same data, every time."""
    from clickhouse_etl_loadtest_spark.session import get_spark

    spark = get_spark()
    phi = data.draw(st.sampled_from([0.02, 0.05, 0.1]))
    # a few hot keys with big multiplicities + a uniform tail
    rows = []
    for hot in range(data.draw(st.integers(0, 4))):
        rows += [hot] * data.draw(st.integers(1, 300))
    rows += [100 + i % 50 for i in range(data.draw(st.integers(0, 400)))]
    if not rows:
        rows = [1]
    df = spark.createDataFrame([(k,) for k in rows], "k long").repartition(3)
    got = sorted(tuple(r) for r in heavy_hitters(df, "k", phi).collect())
    want = sorted(tuple(r) for r in _exact(df, "k", phi).collect())
    assert got == want


def test_mg_truncate_never_overestimates():
    """After any truncation chain, est <= true for every surviving key."""
    import random

    rng = random.Random(11)
    true = {}
    counts = {}
    k = 8
    for _ in range(2000):
        key = rng.randrange(40)
        true[key] = true.get(key, 0) + 1
        counts[key] = counts.get(key, 0) + 1
        if len(counts) > 4 * k:
            counts = _mg_truncate(counts, k)
    counts = _mg_truncate(counts, k)
    assert all(counts[key] <= true[key] for key in counts)
    # MG bound: undershoot <= n/(k+1)
    n = sum(true.values())
    assert all(true[key] - counts[key] <= n / (k + 1) + 1e-9 for key in counts)
