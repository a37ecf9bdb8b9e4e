"""Property tests for the histogram-first global rank / prefix sum: on
random data (duplicate bucket keys, empty-ish buckets, zero and large
values) the two-pass decomposition must equal the naive single-window
form computed in plain Python."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.ranking import (
    global_prefix_sum,
    global_rank,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),  # bucket key (heavy duplicates)
        st.integers(min_value=0, max_value=10_000),  # value
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None)
@given(rows_strategy)
def test_prefix_sum_and_rank_equal_naive_window(spark, data):
    rows = [(i, b, v) for i, (b, v) in enumerate(data)]
    df = spark.createDataFrame(rows, "rid long, bucket int, val long")
    ranked = global_rank(
        df,
        bucket_order=[F.col("bucket").asc()],
        bucket_cols=["bucket"],
        tiebreaker="rid",
        rank_col="rnk",
    )
    summed = global_prefix_sum(
        df,
        bucket_order=[F.col("bucket").asc()],
        bucket_cols=["bucket"],
        tiebreaker="rid",
        value_col="val",
        out_col="ps",
    )
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want_rank = {rid: i + 1 for i, (rid, _, _) in enumerate(order)}
    want_ps, acc = {}, 0
    for rid, _, v in order:
        want_ps[rid] = acc
        acc += v
    got_rank = {r["rid"]: r["rnk"] for r in ranked.collect()}
    got_ps = {r["rid"]: r["ps"] for r in summed.collect()}
    assert got_rank == want_rank
    assert got_ps == want_ps
