"""connected_components (operators/graph.py): exactness on known graphs,
convergence speed on chains, and degenerate inputs."""

from __future__ import annotations

import pytest

from clickhouse_etl_loadtest_spark.operators.graph import connected_components


def _labels(df) -> dict[int, int]:
    return {r.id: r.label for r in df.collect()}


def test_two_components_with_noise_edges(spark):
    # component {1,2,3,7} via a path, component {5,6}; self-loop and
    # duplicate/reversed edges must not change the answer
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (5, 6), (6, 5), (7, 7), (3, 2)],
        "src bigint, dst bigint",
    )
    got = _labels(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path has diameter 63; pointer jumping must finish well
    # inside 12 rounds (plain propagation would need 63)
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    got = _labels(connected_components(edges, max_iter=12))
    assert got == {i: 0 for i in range(n)}


def test_empty_edges_yield_empty_result(spark):
    edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert connected_components(edges).count() == 0


def test_self_loops_only_yield_no_nodes(spark):
    # self-loops carry no connectivity information; the operator filters
    # them, so a pure-self-loop input has no clustered nodes
    edges = spark.createDataFrame([(4, 4), (9, 9)], "src bigint, dst bigint")
    assert connected_components(edges).count() == 0


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(31)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_leakage_safe_split_never_straddles_near_dup_pairs(spark, sf_dir):
    """The property the query exists for: every verified near-dup pair lands
    entirely in one split (a per-doc hash split violates this on the
    fixture), and the split covers every document exactly once."""
    from clickhouse_etl_loadtest_spark.queries import load_all
    from clickhouse_etl_loadtest_spark.queries.text import _verified_pairs

    out = load_all()["doc_leakage_safe_split"].fn(spark, sf_dir)
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(split_of) == n_docs
    pairs = _verified_pairs(spark, sf_dir).collect()
    assert pairs, "fixture must contain verified near-dup pairs"
    for r in pairs:
        assert split_of[r["doc_a"]] == split_of[r["doc_b"]], (r["doc_a"], r["doc_b"])
    # and the per-doc form (the bug this corrects) DOES straddle on this
    # fixture — proving the distinction is real, not vacuous
    from clickhouse_etl_loadtest_spark.functions.hashing import h60

    from pyspark.sql import functions as F

    naive = {
        r["doc_id"]: r["m"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", (h60(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 10).alias("m"))
        .collect()
    }
    def bucket(m):
        return "train" if m < 8 else ("val" if m == 8 else "test")
    assert any(bucket(naive[r["doc_a"]]) != bucket(naive[r["doc_b"]]) for r in pairs)
