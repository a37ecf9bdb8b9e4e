"""Blocked exact all-pairs similarity join over dense embedding columns.

The scale problem: an exact cosine-threshold self-join is inherently O(n^2)
FLOPs — when the threshold sits inside the cosine continuum of the corpus
(no similarity gap), NO hashing scheme can prune without losing recall.
Measured on the test fixtures (threshold 0.40, near-orthogonal background):
every sign-LSH band geometry reaching recall 1.0 keeps >= 97.9% of all pairs
as candidates (r=3/b=32: 0.979, r=2/b=16: 0.987), i.e. the "candidate
generation" would be a rename of the cross join. The honest exact-at-scale
design is therefore a *blocked matrix product*:

- hash every vector into one of ``n_blocks`` blocks (map-only),
- enumerate the ``n_blocks*(n_blocks+1)/2`` unordered block pairs (a tiny
  broadcast relation — two equi-joins fan each block out to its pairs),
- cogroup on (block_i, block_j) and compute each block-pair's full cosine
  matrix with one vectorized BLAS matmul inside ``applyInPandas``.

Cost model at scale: shuffle volume is O(n_blocks * corpus) (each vector is
replicated once per partner block), per-task memory is
O((n / n_blocks) * dim * 8 bytes) for two block slabs, and the work spreads
evenly over O(n_blocks^2) tasks of identical size — no skew, no broadcast of
the corpus, no nested-loop join. Choosing
``n_blocks ~ sqrt(cluster_cores)``..``corpus_bytes / executor_mem`` trades
replication against task memory. The approximate paths (LSH buckets, IVF
probes — queries/vector.py) remain the right tool when the threshold is
separated from the background; this operator is the exact tool when it is not.

Reference parity: the reference delegates all similarity compute to its
closed service (it ships no vector operators at all); this operator is part
of the LLM-pipeline extension (SURVEY.md §7.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "vec_a bigint, vec_b bigint, cosine double"


def blocked_cosine_pairs(
    df: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine(vec_a, vec_b) >= ``threshold``.

    Exact set semantics (equivalent to the quadratic self-join), executed as
    a blocked matmul: see module docstring for the plan shape and cost model.
    Output columns: ``vec_a``, ``vec_b``, ``cosine`` (unordered pair emitted
    once, lower id first).
    """
    spark = df.sparkSession
    vecs = df.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).alias("emb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    pair_rows = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pairs = spark.createDataFrame(pair_rows, "bi int, bj int")

    left = (
        vecs.alias("vl")
        .join(F.broadcast(pairs.alias("pl")), F.col("vl.blk") == F.col("pl.bi"))
        .select(F.col("pl.bi").alias("bi"), F.col("pl.bj").alias("bj"),
                F.col("vl.vid").alias("vid"), F.col("vl.emb").alias("emb"))
    )
    right = (
        vecs.alias("vr")
        .join(F.broadcast(pairs.alias("pr")), F.col("vr.blk") == F.col("pr.bj"))
        .select(F.col("pr.bi").alias("bi"), F.col("pr.bj").alias("bj"),
                F.col("vr.vid").alias("vid"), F.col("vr.emb").alias("emb"))
    )

    thr = float(threshold)

    def cross(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                              "vec_b": pd.array([], dtype="int64"),
                              "cosine": pd.array([], dtype="float64")})
        if lpdf.empty or rpdf.empty:
            return empty
        bi, bj = int(key[0]), int(key[1])
        a = np.vstack(lpdf["emb"].to_numpy()).astype(np.float64, copy=False)
        b = np.vstack(rpdf["emb"].to_numpy()).astype(np.float64, copy=False)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        sims = a @ b.T  # one BLAS call per block pair — the whole hot loop
        ia, jb = np.nonzero(sims >= thr)
        if ia.size == 0:
            return empty
        ids_a = lpdf["vid"].to_numpy()[ia]
        ids_b = rpdf["vid"].to_numpy()[jb]
        if bi == bj:
            # diagonal block: every unordered pair appears in both orders
            # (and as the self-pair) — keep the strictly-lower-id orientation
            keep = ids_a < ids_b
        else:
            # off-diagonal: each cross pair appears exactly once; orient it
            keep = ids_a != ids_b
        lo = np.minimum(ids_a[keep], ids_b[keep])
        hi = np.maximum(ids_a[keep], ids_b[keep])
        return pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "cosine": sims[ia, jb][keep]}
        )

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(cross, schema=_OUT_SCHEMA)
    )
