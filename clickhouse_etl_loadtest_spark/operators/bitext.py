"""Margin-based mutual-best pair mining (Artetxe & Schwenk 2019) as a
reusable operator: given a scored cross-corpus candidate frame, rank by the
RATIO margin — cosine divided by the mean of both endpoints' k-NN cosines —
and keep mutual best matches above a threshold.

Used by three registered queries: ``embedding_bitext_mining`` (exact
all-pairs baseline, fixed-k means), ``embedding_bitext_lsh`` (banded
candidates, count means — short candidate lists must not deflate the
denominator), and ``doc_crosslingual_mining`` (hashed text embeddings
across language subsets). The DuckDB oracles mirror the same window/
aggregate chain literally per query.

Cross-engine determinism: callers provide bit-identical ``cosine`` values
(shared sequential folds); the k-NN means sum in DECIMAL(38,18)
(order-independent) before one double division, so margins and every
id-tie-broken rank agree across engines.

Scale: all inputs are (x_id, y_id, cosine) rows — fixed-width; the two
rank windows and two mean aggregates shuffle only those keys, bounded by
candidate volume (the caller's contract: pre-bound candidates by LSH bands
or IVF probes before mining at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def margin_mutual_best(
    scored: DataFrame,
    k: int,
    threshold: float,
    mean_by: str = "k",
) -> DataFrame:
    """Mine mutual-best pairs by ratio margin from ``scored``
    (``x_id``, ``y_id``, ``cosine`` columns).

    ``mean_by="k"`` divides each endpoint's top-k cosine sum by the fixed
    ``k`` (the dense-candidate baseline semantics); ``"count"`` divides by
    the actual top-k row count (bounded-candidate semantics — short lists
    keep an honest mean). Returns (x_id, y_id, cosine, margin) ordered by
    x_id."""
    if mean_by not in ("k", "count"):
        raise ValueError(f"mean_by must be 'k' or 'count', got {mean_by!r}")
    # ``scored`` is consumed by THREE branches (the rank frame and the final
    # margin join) and Spark recomputes a subtree per branch — for the
    # all-pairs baseline that re-ran the full cosine cross-join three times
    # (measured: 4.6 s wall of which ~2/3 was recompute). Materialize it once
    # (guide §3.3/§5: truncate the plan when an intermediate is reused); the
    # frame is fixed-width (x_id, y_id, cosine) rows bounded by candidate
    # volume. localCheckpoint trades lineage for speed: blocks live only on
    # executors, so losing one fails the job instead of recomputing —
    # acceptable for short batch queries (the streaming ingest paths use
    # persist() instead — see operators/wetstream.py). Callers must NOT
    # checkpoint ``scored`` themselves: this operator materializes it, and a
    # second checkpoint is a duplicate eager job + duplicate block storage
    # (r13 ADVICE — both crosslingual miners used to).
    scored = scored.localCheckpoint()
    # Candidate frames are small in BYTES but expensive per row (two sorted
    # rank passes + DECIMAL(38) sums), so AQE's size-based coalescing
    # collapses the window exchanges to ONE task (measured 2.8 s serial on
    # the crosslingual-LSH arm — guide §2.5: compute cost is invisible to
    # byte-based coalescing). Each window needs its hash exchange anyway;
    # pinning the SAME exchange via repartition(N, key) fixes the width
    # without adding a shuffle. Window results are partitioning-independent
    # (ranks are per-key, ties broken by id; the k-NN sums are DECIMAL).
    n_parts = scored.sparkSession.sparkContext.defaultParallelism
    wx = Window.partitionBy("x_id").orderBy(F.desc("cosine"), "y_id")
    wy = Window.partitionBy("y_id").orderBy(F.desc("cosine"), "x_id")
    rnk = (
        scored.repartition(n_parts, "x_id")
        .withColumn("rx", F.row_number().over(wx))
        .repartition(n_parts, "y_id")
        .withColumn("ry", F.row_number().over(wy))
        .select("x_id", "y_id", "cosine", "rx", "ry")
    )
    dec = F.col("cosine").cast("decimal(38,18)")
    div = F.lit(k) if mean_by == "k" else F.count(F.lit(1))
    mx = (
        rnk.where(F.col("rx") <= k)
        .groupBy("x_id")
        .agg((F.sum(dec).cast("double") / div).alias("knn_x"))
    )
    my = (
        rnk.where(F.col("ry") <= k)
        .groupBy("y_id")
        .agg((F.sum(dec).cast("double") / div).alias("knn_y"))
    )
    margin = F.col("cosine") / ((F.col("knn_x") + F.col("knn_y")) / 2)
    m = scored.join(mx, "x_id").join(my, "y_id").select(
        "x_id", "y_id", "cosine", margin.alias("margin")
    )
    bx = Window.partitionBy("x_id").orderBy(F.desc("margin"), "y_id")
    by = Window.partitionBy("y_id").orderBy(F.desc("margin"), "x_id")
    return (
        m.repartition(n_parts, "x_id")
        .withColumn("_bx", F.row_number().over(bx))
        .repartition(n_parts, "y_id")
        .withColumn("_by", F.row_number().over(by))
        .where(
            (F.col("_bx") == 1) & (F.col("_by") == 1) & (F.col("margin") >= threshold)
        )
        .select("x_id", "y_id", "cosine", "margin")
        .orderBy("x_id")
    )
