"""Iterative clustering over embedding columns — Lloyd's k-means expressed as
a driver-side loop of DataFrame operations (the "iterative algorithms" tier
of the driver contract: genuinely non-SQL-expressible, rows-only checked).

Per iteration: assign each vector to its nearest centroid (map-only — the
codebook rides in the Pandas-UDF closure, exactly a broadcast; one numpy
``(n, k, dim)`` broadcast-subtract per Arrow batch, so plan size and
analysis cost are O(1) in k, not a k x dim literal tree re-analyzed every
iteration), then recompute centroids with posexplode + groupBy(cluster, dim):
partial aggregation makes the shuffle O(k x dim) rows, never O(corpus). Only
the k x dim centroid table (8 x 64 doubles here) ever reaches the driver
between iterations — the same contract as ``spark.ml`` KMeans, and the only
non-distributed data movement in the loop.

Initialization is deterministic (the k lowest ``id_col`` vectors) and
nearest-centroid ties resolve to the lowest cluster id, so runs are
reproducible across restarts and cluster sizes."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(vectors: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """Map-only nearest-centroid assignment; the codebook travels in the UDF
    closure (a broadcast), ``argmin`` ties resolve to the lowest cluster id."""
    codebook = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("struct<cluster:int,dist2:double>")
    def nearest(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:  # empty Arrow batch: tolist() gives a (0,) array that breaks the 3-D indexing
            return pd.DataFrame({"cluster": pd.Series(dtype="int32"), "dist2": pd.Series(dtype="float64")})
        x = np.asarray(v.tolist(), dtype=np.float64)  # (batch, dim)
        d = ((x[:, None, :] - codebook[None, :, :]) ** 2).sum(axis=2)  # (batch, k)
        cl = d.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": cl.astype("int32"), "dist2": d[np.arange(len(cl)), cl]}
        )

    return vectors.withColumn("_nc", nearest(F.col(vec_col))).select(
        *vectors.columns,
        F.col("_nc.cluster").alias("cluster"),
        F.col("_nc.dist2").alias("dist2"),
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

    # The Lloyd loop only reads vec_col and only produces the k x dim
    # codebook, so iterate over a PRUNED, MATERIALIZED copy (guide §4/§5):
    # localCheckpoint stops each iteration re-deriving the input plan
    # (spark.ml caches its input for the same reason), and a tiny corpus
    # coalesces so the per-iteration Arrow boundary is paid by a few real
    # batches, not 32 near-empty tasks (measured 0.73 -> 0.52 s/round at
    # 2k vectors; 24 rounds inside embedding_semdedup_recall). ~50k rows
    # per task keeps the coalesce a no-op at corpus scale.
    loop = vectors.select(vec_col).localCheckpoint()
    parts = max(1, min(loop.rdd.getNumPartitions(), loop.count() // 50_000 + 1))
    if parts < loop.rdd.getNumPartitions():
        loop = loop.coalesce(parts)

    for _ in range(iterations):
        assigned = _assign(loop, centroids, vec_col)
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
