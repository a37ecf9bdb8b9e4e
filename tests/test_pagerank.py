"""Fixed-point PageRank (operators/pagerank.py): hand-checked values on a
path graph, the mass-conservation bound the integer truncation guarantees,
and exact partition-count invariance (the bit-stability claim, tested rather
than asserted). The corpus-level query's value correctness is the DuckDB
oracle's job (tests/test_query_oracles.py::doc_dup_graph_pagerank)."""

from __future__ import annotations

from clickhouse_etl_loadtest_spark.operators.pagerank import SCALE, pagerank_fixed_point


def _edges(spark, pairs, partitions=None):
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs], "src long, dst long"
    )
    return df.repartition(partitions) if partitions else df


def test_path_graph_first_iteration_by_hand(spark):
    # Path 1-2-3: N=3, r0 = SCALE//3, deg = {1:1, 2:2, 3:1}, base = (15e10)//3.
    r0, base = SCALE // 3, 150_000_000_000 // 3
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(_edges(spark, [(1, 2), (2, 3)]), iterations=1).collect()
    }
    assert got[1] == got[3] == base + (85 * (r0 // 2)) // 100
    assert got[2] == base + (85 * (r0 // 1 + r0 // 1)) // 100


def test_center_of_star_outranks_leaves_and_mass_is_conserved(spark):
    res = pagerank_fixed_point(
        _edges(spark, [(0, i) for i in range(1, 6)]), iterations=4
    ).collect()
    ranks = {r.node: r.rank_fp for r in res}
    assert all(ranks[0] > ranks[i] for i in range(1, 6))
    # truncation loses < 1 unit per div: total mass stays within
    # (edges + 2*nodes) units of SCALE per iteration — far inside 1%
    assert 0.99 * SCALE <= sum(ranks.values()) <= SCALE


def test_ranks_are_bit_identical_across_partitionings(spark):
    pairs = [(i, (i * 7 + 1) % 23) for i in range(23) if i != (i * 7 + 1) % 23]
    a = pagerank_fixed_point(_edges(spark, pairs, partitions=1), iterations=4)
    b = pagerank_fixed_point(_edges(spark, pairs, partitions=13), iterations=4)
    assert sorted((r.node, r.rank_fp) for r in a.collect()) == sorted(
        (r.node, r.rank_fp) for r in b.collect()
    )


def test_empty_graph_yields_empty_result_with_schema(spark):
    out = pagerank_fixed_point(_edges(spark, []), iterations=4)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank_fp", "rank"]
