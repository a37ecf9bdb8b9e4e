"""Oriented triangle enumeration (operators/graph.py::triangle_stats):
hand-checked counts on graphs chosen to stress the degree orientation —
a clique (ties everywhere), a star glued onto it (hub has max degree, so
wedges must NOT be enumerated at the hub's corner), and partitioning
invariance. The corpus query's values are the DuckDB oracle's job
(tests/test_query_oracles.py::doc_dup_graph_triangles)."""

from __future__ import annotations

from itertools import combinations

from clickhouse_etl_loadtest_spark.operators.graph import triangle_stats


def _stats(spark, pairs, partitions=5):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long").repartition(partitions)
    return {r.node: (r.degree, r.triangles) for r in triangle_stats(df).collect()}


def test_k4_every_node_on_three_triangles(spark):
    got = _stats(spark, list(combinations(range(4), 2)))
    assert got == {i: (3, 3) for i in range(4)}


def test_star_hub_on_clique_mixed_degrees(spark):
    # K4 over {0,1,2,3} plus pendant leaves 10..14 on node 0: node 0 has
    # max degree (ties broken by id inside the clique), leaves have no
    # triangles, clique triangle counts are unchanged by the star
    pairs = list(combinations(range(4), 2)) + [(0, 10 + i) for i in range(5)]
    got = _stats(spark, pairs)
    assert got[0] == (8, 3)
    assert all(got[i] == (3, 3) for i in (1, 2, 3))
    assert all(got[10 + i] == (1, 0) for i in range(5))


def test_triangle_free_graph_counts_zero(spark):
    # 4-cycle: every node degree 2, no triangles
    got = _stats(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    assert got == {i: (2, 0) for i in range(4)}


def test_counts_invariant_across_partitionings(spark):
    pairs = list(combinations(range(7), 2))[:15] + [(0, 20 + i) for i in range(6)]
    assert _stats(spark, pairs, partitions=1) == _stats(spark, pairs, partitions=11)


def test_random_graphs_match_brute_force(spark):
    # differential: 4 seeded G(n, p) graphs vs a pure-Python triangle count
    import random

    for seed in range(4):
        rng = random.Random(seed)
        pairs = [(a, b) for a, b in combinations(range(12), 2) if rng.random() < 0.4]
        nbrs = {}
        for a, b in pairs:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        expect = {
            n: (
                len(nbrs[n]),
                sum(1 for v, w in combinations(sorted(nbrs[n]), 2) if w in nbrs.get(v, ())),
            )
            for n in nbrs
        }
        assert _stats(spark, pairs) == expect, f"seed={seed}"
