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
