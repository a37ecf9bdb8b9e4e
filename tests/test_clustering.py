"""k-means operator tests: determinism, coverage, and the Lloyd guarantee
(cost is non-increasing over iterations)."""

from clickhouse_etl_loadtest_spark.operators.clustering import kmeans_cost, kmeans_fit_assign


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_assigns_every_vector_once(spark, sf_dir):
    e = _emb(spark, sf_dir)
    out = kmeans_fit_assign(e, k=4, iterations=2)
    assert out.count() == e.count()
    assert out.select("vec_id").distinct().count() == e.count()
    clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    assert clusters <= set(range(4)) and len(clusters) >= 2


def test_kmeans_deterministic(spark, sf_dir):
    e = _emb(spark, sf_dir)
    a = kmeans_fit_assign(e, k=4, iterations=2).orderBy("vec_id").collect()
    b = kmeans_fit_assign(e, k=4, iterations=2).orderBy("vec_id").collect()
    assert [(r["vec_id"], r["cluster"]) for r in a] == [(r["vec_id"], r["cluster"]) for r in b]


def test_kmeans_cost_non_increasing(spark, sf_dir):
    e = _emb(spark, sf_dir)
    costs = [
        kmeans_cost(kmeans_fit_assign(e, k=4, iterations=i)) for i in (0, 1, 3)
    ]
    assert costs[1] <= costs[0] + 1e-6
    assert costs[2] <= costs[1] + 1e-6


def test_semdedup_recall_floor_on_clustered_corpus(spark):
    """embedding_semdedup_recall measures the near-orthogonal WORST case on
    the driver fixture; this is the regime SemDeDup assumes — a corpus with
    real cluster structure, near-dups planted within modes. There the
    cluster-bounded drop-set must reproduce >= 0.95 of the exact one for
    every k up to the true mode count (k <= modes only merges modes, never
    splits a near-dup pair across clusters)."""
    import numpy as np

    from clickhouse_etl_loadtest_spark.operators.semstream import semdedup_dropped
    from clickhouse_etl_loadtest_spark.operators.clustering import _assign
    from pyspark.sql import functions as F

    DIM, MODES, THRESHOLD = 16, 4, 0.9
    rng = np.random.default_rng(7)
    centers = [c / np.linalg.norm(c) for c in rng.normal(size=(MODES, DIM))]

    def unit(v):
        return (v / np.linalg.norm(v)).tolist()

    # vec_id i -> mode i % MODES, so the lowest-vec_id k-means init spans modes
    vecs = [
        (i, unit(centers[i % MODES] + 0.15 * rng.normal(size=DIM))) for i in range(48)
    ]
    vecs += [
        (48 + i, unit(np.asarray(vecs[i][1]) + 0.02 * rng.normal(size=DIM)))
        for i in range(12)
    ]

    # exact pair set, brute force (60 vectors)
    m = np.asarray([v for _, v in vecs])
    cos = m @ m.T
    ids = [i for i, _ in vecs]
    exact_pairs = [
        (ids[a], ids[b])
        for a in range(len(ids))
        for b in range(a + 1, len(ids))
        if cos[a, b] >= THRESHOLD
    ]
    drop_exact = {b for _, b in exact_pairs}
    assert len(drop_exact) >= 12  # the planted dups are all in it

    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    recalls = {}
    for k in (2, 4):
        assigned = kmeans_fit_assign(df, k=k, iterations=3)
        cl = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
        drop_within = {b for a, b in exact_pairs if cl[a] == cl[b]}
        recalls[k] = len(drop_within) / len(drop_exact)
        assert recalls[k] >= 0.95, f"k={k}: recall {recalls[k]}"
