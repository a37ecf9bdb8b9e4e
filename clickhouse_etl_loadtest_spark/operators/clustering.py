"""Iterative clustering over embedding columns — Lloyd's k-means expressed as
a driver-side loop of DataFrame operations (the "iterative algorithms" tier
of the driver contract: genuinely non-SQL-expressible, rows-only checked).

Per iteration: assign each vector to its nearest centroid (map-only — the
codebook enters the plan as literals, exactly a broadcast), then recompute
centroids with posexplode + groupBy(cluster, dim): partial aggregation makes
the shuffle O(k x dim) rows, never O(corpus). Only the k x dim centroid
table (8 x 64 doubles here) ever reaches the driver between iterations —
the same contract as ``spark.ml`` KMeans, and the only non-distributed data
movement in the loop.

Initialization is deterministic (the k lowest ``id_col`` vectors) and
nearest-centroid ties resolve to the lowest cluster id, so runs are
reproducible across restarts and cluster sizes."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vectors: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """Map-only nearest-centroid assignment against a literal codebook."""
    dists = F.array(
        *[_sq_dist(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])) for c in centroids]
    )
    return vectors.withColumn("_dists", dists).select(
        *vectors.columns,
        (F.array_position(F.col("_dists"), F.array_min(F.col("_dists"))) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(F.col("_dists")).alias("dist2"),
    )


def kmeans_fit_assign(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit k-means with ``iterations`` Lloyd steps; return (id, cluster,
    dist2) assignments. Empty clusters keep their previous centroid."""
    centroids = [
        [float(x) for x in r[vec_col]]
        for r in vectors.orderBy(id_col).limit(k).collect()
    ]
    if not centroids:
        raise ValueError("kmeans_fit_assign: empty input")
    k = len(centroids)  # corpus smaller than k: fit what exists

    for _ in range(iterations):
        assigned = _assign(vectors, centroids, vec_col)
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(F.avg(F.col("v").cast("double")).alias("cv"))
            .collect()
        )  # k x dim rows — the codebook, nothing more
        new = {c: list(cent) for c, cent in enumerate(centroids)}
        for r in rows:
            new[r["cluster"]][r["i"]] = r["cv"]
        centroids = [new[c] for c in range(k)]

    return _assign(vectors, centroids, vec_col).select(id_col, "cluster", "dist2")


def kmeans_cost(assigned: DataFrame) -> float:
    """Within-cluster sum of squared distances (the Lloyd objective)."""
    return assigned.agg(F.sum("dist2")).first()[0]
