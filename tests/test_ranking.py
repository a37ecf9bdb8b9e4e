"""Distributed sort-rank (operators/ranking.py): the histogram two-pass
must reproduce the naive global window's row numbers exactly — including
skewed buckets, empty-offset first bucket, and descending order columns —
and stay identical across partitionings. The corpus-level query's values
are the DuckDB oracle's job (tests/test_query_oracles.py::
doc_curriculum_order); the plan shape is pinned in test_plan_quality.py."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.ranking import global_rank


def _frame(spark, partitions):
    # skew: bucket (2, 10) holds half the rows; several singleton buckets
    rows = [(i, 2, 10) for i in range(50)]
    rows += [(100 + i, i % 3, 20 + i % 7) for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, q int, n long").repartition(partitions)


def _naive(df):
    w = Window.orderBy(F.col("q").desc(), F.col("n").asc(), F.col("doc_id").asc())
    return {r.doc_id: r.rk for r in df.withColumn("rk", F.row_number().over(w)).collect()}


def test_matches_naive_global_window_exactly(spark):
    df = _frame(spark, 7)
    got = global_rank(
        df,
        bucket_order=[F.col("q").desc(), F.col("n").asc()],
        bucket_cols=["q", "n"],
        tiebreaker="doc_id",
        rank_col="rk",
    )
    assert {r.doc_id: r.rk for r in got.collect()} == _naive(df)


def test_ranks_invariant_across_partitionings(spark):
    outs = []
    for p in (1, 13):
        df = _frame(spark, p)
        got = global_rank(
            df,
            bucket_order=[F.col("q").desc(), F.col("n").asc()],
            bucket_cols=["q", "n"],
            tiebreaker="doc_id",
            rank_col="rk",
        )
        outs.append(sorted((r.doc_id, r.rk) for r in got.collect()))
    assert outs[0] == outs[1]
