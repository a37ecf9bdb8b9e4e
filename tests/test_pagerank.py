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


def test_random_graphs_match_python_fixed_point(spark):
    # differential: seeded G(n, p) graphs vs a pure-Python integer twin of
    # the exact recurrence (same div order, same constants)
    import random
    from itertools import combinations

    for seed in range(3):
        rng = random.Random(100 + seed)
        pairs = [(a, b) for a, b in combinations(range(10), 2) if rng.random() < 0.35]
        sym = pairs + [(b, a) for a, b in pairs]
        nodes = sorted({n for e in sym for n in e})
        deg = {n: sum(1 for s, _ in sym if s == n) for n in nodes}
        n = len(nodes)
        if n == 0:
            continue
        base = 15 * (SCALE // 100) // n
        r = {v: SCALE // n for v in nodes}
        for _ in range(4):
            incoming = {v: 0 for v in nodes}
            for s, d in sym:
                incoming[d] += r[s] // deg[s]
            r = {v: base + (85 * incoming[v]) // 100 for v in nodes}
        got = {
            row.node: row.rank_fp
            for row in pagerank_fixed_point(_edges(spark, pairs), iterations=4).collect()
        }
        assert got == r, f"seed={seed}"


def test_weighted_random_graphs_match_python_fixed_point(spark):
    # weighted differential: seeded weighted graphs vs the pure-Python
    # integer twin of the strength-normalized recurrence
    import random
    from itertools import combinations

    for seed in range(3):
        rng = random.Random(200 + seed)
        pairs = [
            (a, b, rng.randrange(500, 1001))
            for a, b in combinations(range(9), 2)
            if rng.random() < 0.4
        ]
        sym = [(a, b, w) for a, b, w in pairs] + [(b, a, w) for a, b, w in pairs]
        nodes = sorted({n for s, d, _ in sym for n in (s, d)})
        wsum = {v: sum(w for s, _, w in sym if s == v) for v in nodes}
        n = len(nodes)
        if n == 0:
            continue
        base = 15 * (SCALE // 100) // n
        r = {v: SCALE // n for v in nodes}
        for _ in range(4):
            incoming = {v: 0 for v in nodes}
            for s, d, w in sym:
                incoming[d] += (r[s] * w) // wsum[s]
            r = {v: base + (85 * incoming[v]) // 100 for v in nodes}
        df = spark.createDataFrame(sym, "src long, dst long, w long").repartition(5)
        got = {
            row.node: row.rank_fp
            for row in pagerank_fixed_point(df, iterations=4, weight="w").collect()
        }
        assert got == r, f"seed={seed}"
