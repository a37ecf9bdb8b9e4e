"""Distributed PCA over an embedding column — the decorrelation/audit step
an embedding pipeline runs before quantization or IVF partitioning (PCA
whitening; classic, public — e.g. Jégou et al.'s product-quantization
literature preprocesses exactly this way).

Spark-first decomposition (the covariance trick every distributed PCA uses,
including spark.ml's): the data-dependent part is ONE pass computing the
d first moments and the d(d+1)/2 upper-triangle second moments; the
eigendecomposition runs on the driver over a d x d matrix (KBs — the
k-means-codebook contract), and projection/residual scoring is map-only
with the components as literals.

Scale (100 TB / 1000 executors):
- The moment pass explodes each vector to its upper-triangle products
  IN-ARRAY (flatten of nested transform — JVM codegen, no Python) and
  aggregates by (i, j): with map-side partial aggregation the shuffle is
  O(d^2) rows PER PARTITION, independent of corpus size. For d where d^2
  explode cost bites (d >~ 1k), switch to Gramian accumulation per
  partition (numpy in mapInPandas) — same contract, documented here, not
  needed at d=64.
- Moments accumulate as DECIMAL(38,18): exact, order-independent sums, so
  the covariance matrix — and therefore the eigenbasis and every
  downstream residual — is bit-stable across partitionings and reruns.
- Only n, d doubles, and d(d+1)/2 doubles reach the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_moments(vectors: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass -> (n, mean[d], cov[d, d]) with population
    normalization. Sums are DECIMAL(38,18) so the result is partitioning-
    independent."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d_row = vectors.select(F.size(v).alias("d")).first()
    if d_row is None:
        raise ValueError("covariance_moments: empty input")
    d = d_row["d"]

    firsts = vectors.select(F.posexplode(v).alias("i", "x"))
    s1 = (
        firsts.groupBy("i")
        .agg(F.sum(F.col("x").cast("decimal(38,18)")).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = int(s1[0]["n"])
    mean = np.zeros(d)
    for r in s1:
        mean[r["i"]] = float(r["s"]) / n

    # upper-triangle products built inside the array, then one (i, j) agg
    pairs = F.flatten(
        F.transform(
            v,
            lambda x, i: F.transform(
                F.slice(v, i + 1, F.lit(d) - i),
                lambda y, k: F.struct(
                    i.alias("i"), (i + k).alias("j"), (x * y).alias("p")
                ),
            ),
        )
    )
    s2 = (
        vectors.select(F.explode(pairs).alias("q"))
        .groupBy(F.col("q.i").alias("i"), F.col("q.j").alias("j"))
        .agg(F.sum(F.col("q.p").cast("decimal(38,18)")).alias("s"))
        .collect()
    )
    cov = np.zeros((d, d))
    for r in s2:
        e = float(r["s"]) / n - mean[r["i"]] * mean[r["j"]]
        cov[r["i"], r["j"]] = e
        cov[r["j"], r["i"]] = e
    return n, mean, cov


def top_components(cov: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(eigenvalues desc[k], components[k, d]) — driver-side ``eigh`` on the
    symmetric covariance (deterministic given identical cov; component SIGN
    is basis-ambiguous, so downstream scores use squared projections only)."""
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return w[order], vecs[:, order].T.copy()


def pca_residuals(
    vectors: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-only residual scoring: per vector, centered total energy, energy
    captured by the top-k components, and the residual — all sign/rotation
    invariant (squared projections), so stable under eigh basis ambiguity."""
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    c = F.col("_centered")
    total = F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    topk = F.lit(0.0)
    for comp in components:
        dot = F.aggregate(
            F.zip_with(c, F.array(*[F.lit(float(e)) for e in comp]), lambda x, e: x * e),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        topk = topk + dot * dot
    return (
        vectors.withColumn("_centered", centered)
        .select(
            id_col,
            total.alias("total_energy"),
            topk.alias("topk_energy"),
            (total - topk).alias("residual_energy"),
        )
        .withColumn(
            "explained",
            F.when(F.col("total_energy") > 0.0, F.col("topk_energy") / F.col("total_energy")).otherwise(
                F.lit(0.0)
            ),
        )
    )


# --- streaming twin: incrementally folded moment state -------------------------------
#
# DECIMAL moment sums are exact and associative, so folding per micro-batch
# is BIT-IDENTICAL to the one-shot pass over the full history — the same
# no-merge-penalty property the HLL cardinality state exploits
# (operators/cardsketch.py), here for dense second moments. State is
# O(d^2) decimals regardless of stream length; snapshots are batch-id-keyed
# parquet overwrites (replay-idempotent, the streamhh/fuzzydedup recipe).


def _batch_moment_rows(batch_df: DataFrame, d: int, vec_col: str) -> DataFrame:
    """(i, j, s) DECIMAL sum rows for one batch: j = -1 marks first moments."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    firsts = (
        batch_df.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.col("x").cast("decimal(38,18)")).alias("s"))
        .select("i", F.lit(-1).alias("j"), "s")
    )
    pairs = F.flatten(
        F.transform(
            v,
            lambda x, i: F.transform(
                F.slice(v, i + 1, F.lit(d) - i),
                lambda y, k: F.struct(i.alias("i"), (i + k).alias("j"), (x * y).alias("p")),
            ),
        )
    )
    seconds = (
        batch_df.select(F.explode(pairs).alias("q"))
        .groupBy(F.col("q.i").alias("i"), F.col("q.j").alias("j"))
        .agg(F.sum(F.col("q.p").cast("decimal(38,18)")).alias("s"))
    )
    return firsts.union(seconds)


def update_moments(
    spark, batch_df: DataFrame, state_path: str, batch_id: int, vec_col: str = "embedding"
) -> dict:
    """Fold one micro-batch's moment sums into the persistent state — a
    ``foreachBatch`` body (``batch_id`` is the foreachBatch argument).
    Returns ``{"n_seen": ..., "d": ...}``. Replays overwrite their own
    batch-keyed snapshot and merge against the pre-batch state only.

    An EMPTY batch before any state exists is a no-op (no snapshot is
    written): streams routinely fire an empty batch 0 before producers
    start, and persisting a d=0 meta would poison every later batch's
    dimension check. A replay of that empty batch writes nothing again —
    still idempotent."""
    from .streamhh import _batch_part, _read_latest

    d_row = batch_df.select(F.size(F.col(vec_col)).alias("d")).first()
    d_batch = int(d_row["d"]) if d_row else None
    prev_m, _ = _read_latest(spark, f"{state_path}/moments", batch_id)
    prev_meta, _ = _read_latest(spark, f"{state_path}/meta", batch_id)
    if prev_meta is None and d_batch is None:
        return {"n_seen": 0, "d": 0}
    n_prev = 0
    d = d_batch
    if prev_meta is not None:
        row = prev_meta.first()
        n_prev = int(row["n_seen"])
        d = int(row["d"])
        if d_batch is not None and d_batch != d:
            raise ValueError(
                f"moment state at {state_path} has d={d}; batch has d={d_batch}"
            )
    n_batch = batch_df.count()
    batch_m = _batch_moment_rows(batch_df, d, vec_col)
    merged = (
        batch_m
        if prev_m is None
        else prev_m.union(batch_m).groupBy("i", "j").agg(F.sum("s").alias("s"))
    )
    part = _batch_part(batch_id)
    merged.coalesce(1).write.mode("overwrite").parquet(f"{state_path}/moments/batch={part}")
    spark.createDataFrame([(n_prev + n_batch, d)], schema="n_seen bigint, d int").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{state_path}/meta/batch={part}")
    return {"n_seen": n_prev + n_batch, "d": d}


def moments_from_state(spark, state_path: str) -> tuple[int, np.ndarray, np.ndarray]:
    """Finalize the persistent state to (n, mean, cov) — identical to
    running :func:`covariance_moments` over the full folded history."""
    from .streamhh import _read_latest

    m, _ = _read_latest(spark, f"{state_path}/moments", None)
    meta, _ = _read_latest(spark, f"{state_path}/meta", None)
    if m is None or meta is None:
        raise FileNotFoundError(f"no moment state at {state_path}")
    row = meta.first()
    n, d = int(row["n_seen"]), int(row["d"])
    if n == 0:
        raise ValueError(f"moment state at {state_path} folded zero vectors")
    mean = np.zeros(d)
    cov = np.zeros((d, d))
    rows = m.collect()
    for r in rows:
        if r["j"] == -1:
            mean[r["i"]] = float(r["s"]) / n
    for r in rows:
        if r["j"] >= 0:
            e = float(r["s"]) / n - mean[r["i"]] * mean[r["j"]]
            cov[r["i"], r["j"]] = e
            cov[r["j"], r["i"]] = e
    return n, mean, cov


def prune_state(spark, state_path: str) -> int:
    """Drop every moment snapshot except the newest (the only one
    :func:`moments_from_state` or a later :func:`update_moments` ever
    reads) — the shared delete-only snapshot maintenance pass; see
    ``streamhh.prune_state`` for why latest-only stores need no commit
    protocol."""
    from .streamhh import prune_state as _prune

    return _prune(spark, state_path, subdirs=("moments", "meta"))


def prune_state(spark, state_path: str) -> int:
    """Drop every moment snapshot except the newest (the only one
    :func:`moments_from_state` or a later :func:`update_moments` ever
    reads) — the shared delete-only snapshot maintenance pass; see
    ``streamhh.prune_state`` for why latest-only stores need no commit
    protocol."""
    from .streamhh import prune_state as _prune

    return _prune(spark, state_path, subdirs=("moments", "meta"))
