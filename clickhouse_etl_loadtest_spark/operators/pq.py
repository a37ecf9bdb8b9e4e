"""Product quantization (PQ) for embedding columns — Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 (public).

The memory-side half of the standard web-scale ANN design (IVF-PQ: coarse
IVF cells from operators/clustering.py + these per-subspace codebooks):
each d-dim vector compresses to m one-byte codes, and query-time distance
becomes m table lookups (ADC — asymmetric distance computation) instead of
d multiplies, so a 100 TB embedding corpus's quantized form fits the
cluster's page cache.

Spark-first shapes:
- ``pq_train``: ONE joint Lloyd loop over all m subspaces at once — the
  corpus scans once per iteration, not m times. Rows explode to (sub_id,
  subvec) IN-ARRAY; assignment is a vectorized Arrow-batched UDF with the
  (m, ksub, dsub) codebook tensor in its closure (a broadcast, the k-means
  codebook contract); the centroid update is a posexplode + groupBy
  (sub_id, cluster, dim) with map-side combine — the shuffle carries
  m*ksub*dsub aggregate rows per partition, never vectors. Only the
  codebook tensor (m*ksub*dsub floats — KBs) reaches the driver per
  iteration.
- ``pq_encode``: map-only; each vector -> m codes in one UDF pass.
- ``pq_adc_topk``: queries broadcast (they ride the UDF closure as
  precomputed distance TABLES, q x m x ksub floats); scoring each corpus
  row is m table lookups per query — no shuffle of the corpus, one rank
  window partitioned by query for the top-k (same plan family as
  ann_cosine_topk).

Determinism: init = the ksub lowest-id vectors' subvectors (per subspace),
argmin ties to the lowest code, empty codes keep their codeword — the
operators/clustering.py conventions, so training is reproducible and the
numpy differential twin in tests/test_pq.py can replay it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _codebook_tensor(codebooks: list[list[list[float]]]) -> np.ndarray:
    return np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)


def _subvectors(x: np.ndarray, m: int) -> np.ndarray:
    """(batch, d) -> (batch, m, dsub)."""
    b, d = x.shape
    return x.reshape(b, m, d // m)


def _assign_codes(cb: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(batch, d) -> (batch, m) argmin codes; ties to the lowest code id
    (numpy argmin returns the first minimum)."""
    sv = _subvectors(x, cb.shape[0])  # (b, m, dsub)
    # (b, m, ksub) squared distances
    d2 = ((sv[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    return d2.argmin(axis=2)


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Learn per-subspace codebooks; returns ``codebooks[m][ksub][dsub]``.
    One corpus scan per iteration for ALL subspaces (joint loop)."""
    d = vectors.select(F.size(vec_col).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m

    seed_rows = vectors.orderBy(id_col).limit(ksub).collect()
    if len(seed_rows) < ksub:
        raise ValueError(f"corpus smaller than ksub={ksub}")
    seeds = np.asarray(
        [[float(v) for v in r[vec_col]] for r in seed_rows], dtype=np.float64
    )  # (ksub, d)
    codebooks = [
        [[float(x) for x in seeds[c, s * dsub : (s + 1) * dsub]] for c in range(ksub)]
        for s in range(m)
    ]

    for _ in range(iterations):
        cb = _codebook_tensor(codebooks)

        @F.pandas_udf("array<int>")
        def codes_of(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype=object)
            x = np.asarray(v.tolist(), dtype=np.float64)
            return pd.Series(list(_assign_codes(cb, x).astype("int32")))

        assigned = vectors.select(
            F.col(vec_col).alias("_v"), codes_of(F.col(vec_col)).alias("_codes")
        )
        # (sub_id, cluster, dim_in_sub) -> mean: the shuffle carries partial
        # aggregates only (m*ksub*dsub keys)
        triple = F.explode(
            F.transform(
                F.col("_codes"),
                lambda code, s: F.struct(
                    s.alias("sub_id"),
                    code.alias("cluster"),
                    F.slice(F.col("_v"), s * dsub + 1, dsub).alias("sv"),
                ),
            )
        )
        rows = (
            assigned.select(triple.alias("t"))
            .select("t.sub_id", "t.cluster", F.posexplode("t.sv").alias("i", "x"))
            .groupBy("sub_id", "cluster", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("cv"))
            .collect()
        )
        for r in rows:
            codebooks[r["sub_id"]][r["cluster"]][r["i"]] = r["cv"]
    return codebooks


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only: adds a ``codes`` array<int> column (m codes per vector)."""
    cb = _codebook_tensor(codebooks)

    @F.pandas_udf("array<int>")
    def codes_of(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray(v.tolist(), dtype=np.float64)
        return pd.Series(list(_assign_codes(cb, x).astype("int32")))

    return vectors.withColumn("codes", codes_of(F.col(vec_col)))


def pq_reconstruct(codes: list[int], codebooks: list[list[list[float]]]) -> np.ndarray:
    """Driver-side decode of one code word (tests/diagnostics)."""
    return np.concatenate([np.asarray(codebooks[s][c]) for s, c in enumerate(codes)])


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: for every query, the k corpus vectors with the smallest
    table-approximated squared L2 distance. ``queries`` is a small
    [(q_id, vector), ...] list — it travels as precomputed distance tables
    in the UDF closure (the broadcast side). Output (q_id, {id_col},
    adist, rank); ties rank by {id_col}."""
    from pyspark.sql import Window

    cb = _codebook_tensor(codebooks)  # (m, ksub, dsub)
    q_ids = [int(q) for q, _ in queries]
    qx = np.asarray([v for _, v in queries], dtype=np.float64)  # (q, d)
    qsv = _subvectors(qx, cb.shape[0])  # (q, m, dsub)
    # tables[q, m, ksub]: distance from each query subvector to each codeword
    tables = ((qsv[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    n_q = len(q_ids)

    @F.pandas_udf("array<double>")
    def adist(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        c = np.asarray(codes.tolist(), dtype=np.int64)  # (b, m)
        b, m = c.shape
        # gather: for each query, sum tables[q, s, c[:, s]] over s
        out = np.zeros((b, n_q))
        for s in range(m):
            out += tables[:, s, :][:, c[:, s]].T  # (b, q)
        return pd.Series(list(out))

    scored = encoded.select(id_col, F.posexplode(adist(F.col("codes"))).alias("qi", "adist"))
    w = Window.partitionBy("qi").orderBy("adist", id_col)
    qid_map = F.array(*[F.lit(q) for q in q_ids])
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.element_at(qid_map, F.col("qi") + 1).alias("q_id"),
            id_col,
            "adist",
            "rank",
        )
        .orderBy("q_id", "rank")
    )


def adc_distance_col(codebooks: list[list[list[float]]], queries: list[tuple[int, list[float]]]):
    """Column factory for per-pair ADC distance: given a row's ``codes``
    array and its ``q_id``, return the table-approximated squared L2 to that
    query. For candidate-gated search (IVF-PQ) where each row already names
    its query — contrast :func:`pq_adc_topk`, which scores every row against
    ALL queries. Tables ride the closure (broadcast)."""
    cb = _codebook_tensor(codebooks)
    qx = np.asarray([v for _, v in queries], dtype=np.float64)
    qsv = _subvectors(qx, cb.shape[0])
    tables = ((qsv[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)  # (q, m, ksub)
    qidx = {int(q): i for i, (q, _) in enumerate(queries)}

    @F.pandas_udf("double")
    def adist(codes: pd.Series, q_id: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        c = np.asarray(codes.tolist(), dtype=np.int64)  # (b, m)
        qi = np.asarray([qidx[int(q)] for q in q_id], dtype=np.int64)  # (b,)
        out = np.zeros(len(qi))
        for s in range(c.shape[1]):
            out += tables[qi, s, c[:, s]]
        return pd.Series(out)

    return adist
