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
