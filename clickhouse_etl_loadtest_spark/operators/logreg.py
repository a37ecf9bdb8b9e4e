"""Distributed logistic regression by batch gradient descent — the quality
classifier a curation pipeline trains to replace (or distill) its hand-tuned
heuristics (fastText-style quality scoring; public recipe, e.g. the CCNet /
LLaMA data pipelines).

Spark-first shape (same family as operators/clustering.py and bpe.py —
iterative algorithms as driver loops over DataFrame aggregates):
- Model state is k+1 doubles on the driver (weights + bias), broadcast into
  each iteration's expressions as literals — the k-means-codebook contract.
- One job per iteration: a single global aggregate computing the full
  gradient with map-side partial aggregation. No shuffle of rows, no
  Python, no MLlib dependency; the reduce moves k+1 numbers per partition.
- Gradient components are summed as DECIMAL(38,18): exact and
  order-independent, so the training trajectory is bit-stable across
  partitionings, executor counts, and reruns (the same discipline as
  ``doc_unigram_logprob``'s log-prob sums). The only cross-runtime
  wobble left is libm's ``exp`` (≤1 ulp), which the differential test
  bounds at 1e-9 over the whole trajectory.
- Feature projections are cached (``persist``) for the duration of the fit
  so they aren't recomputed per iteration, and unpersisted on exit — no
  storage blocks outlive the call.

At 100 TB: the per-iteration cost is one scan of the cached feature table
(k doubles per row) with a k+1-value reduce — embarrassingly parallel, no
skew surface. For many-epoch training you would switch to L-BFGS
(spark.ml's LogisticRegression) or subsample; batch GD here keeps every
step exactly reproducible, which is what the correctness gate needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _logit(feature_cols: list[str], weights: list[float]) -> Column:
    """w0 + sum_j w_{j+1} * x_j, folded left in a fixed order so the float
    evaluation order is reproducible."""
    z = F.lit(float(weights[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(weights[j + 1])) * F.col(c)
    return z


def logistic_fit(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 30,
    lr: float = 0.5,
) -> list[float]:
    """Fit by full-batch gradient descent; returns [bias, w1, ..., wk].

    grad_j = sum_i (sigmoid(z_i) - y_i) * x_ij / n, each sum accumulated in
    DECIMAL(38,18). Deterministic given (data, iterations, lr).
    """
    k = len(feature_cols)
    df = features.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    ).persist()
    try:
        n = df.count()
        if n == 0:
            raise ValueError("logistic_fit: empty input")
        w = [0.0] * (k + 1)
        for _ in range(iterations):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(feature_cols, w)))
            err = p - F.col("_y")
            aggs = [F.sum(err.cast("decimal(38,18)")).alias("g0")] + [
                F.sum((err * F.col(c)).cast("decimal(38,18)")).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ]
            row = df.agg(*aggs).first()
            w = [w[i] - lr * float(row[i]) / n for i in range(k + 1)]
        return w
    finally:
        df.unpersist()


def logistic_fit_multi(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    classes: list[str],
    iterations: int = 30,
    lr: float = 0.5,
) -> dict[str, list[float]]:
    """One-vs-rest fit for ALL classes with ONE job per iteration: the
    single aggregate computes every class's full gradient
    (``len(classes) * (k+1)`` DECIMAL(38,18) sums) in one scan — at scale
    this is ``iterations`` passes over the cached features total, not
    ``iterations * classes`` (the per-class :func:`logistic_fit` loop).
    Same determinism contract: exact, order-independent gradient sums.
    Returns ``{class: [bias, w1..wk]}``.

    The per-iteration expressions are assembled as SQL STRINGS and submitted
    through one ``selectExpr`` + one ``spark.sql`` — identical arithmetic to
    the Column form (left-folded logit, the same casts), but building
    ``classes * (k+1)`` aggregate Columns driver-side costs a py4j round
    trip EACH (measured at k=128, 10 classes: ~20 s of pure driver chatter
    per iteration); one SQL parse is milliseconds. Float literals round-trip
    through ``repr`` + ``CAST(.. AS DOUBLE)``, which is bit-exact."""
    k = len(feature_cols)
    spark = features.sparkSession
    df = features.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("string").alias("_y"),
    ).persist()

    def _flit(x: float) -> str:
        return f"cast('{x!r}' as double)"

    try:
        n = df.count()
        if n == 0:
            raise ValueError("logistic_fit_multi: empty input")
        w = {c: [0.0] * (k + 1) for c in classes}
        for _ in range(iterations):
            # materialize the per-class error as a COLUMN first (lineage cut
            # via cache substitution on the analyzed plan): otherwise each of
            # the classes*(k+1) gradient sums re-embeds the whole k-term logit
            # and the aggregate's expression tree goes quadratic — ~170k
            # nodes, seconds of analysis per iteration. persist (not
            # localCheckpoint) so the iteration's blocks are released after
            # the agg instead of accumulating for the whole fit.
            errs = []
            for cls in classes:
                z = _flit(w[cls][0])
                for j, c in enumerate(feature_cols):
                    z = f"({z} + {_flit(w[cls][j + 1])} * {c})"
                errs.append(
                    f"(1.0D / (1.0D + exp(-({z}))))"
                    f" - (case when _y = '{cls}' then 1.0D else 0.0D end)"
                    f" as _e_{cls}"
                )
            edf = df.selectExpr(*feature_cols, *errs).persist()
            try:
                aggs = []
                for cls in classes:
                    aggs.append(f"sum(cast(_e_{cls} as decimal(38,18)))")
                    aggs.extend(
                        f"sum(cast(_e_{cls} * {c} as decimal(38,18)))"
                        for c in feature_cols
                    )
                edf.createOrReplaceTempView("_logreg_fit_multi_tmp")
                row = spark.sql(
                    f"SELECT {', '.join(aggs)} FROM _logreg_fit_multi_tmp"
                ).first()
            finally:
                edf.unpersist()
            for ci, cls in enumerate(classes):
                base = ci * (k + 1)
                w[cls] = [
                    w[cls][i] - lr * float(row[base + i]) / n for i in range(k + 1)
                ]
        spark.catalog.dropTempView("_logreg_fit_multi_tmp")
        return w
    finally:
        df.unpersist()


def logistic_predict(
    features: DataFrame, feature_cols: list[str], weights: list[float], threshold: float = 0.5
) -> DataFrame:
    """Map-only scoring: adds ``prob`` and ``pred`` columns."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(feature_cols, weights)))
    return features.withColumn("prob", p).withColumn("pred", F.col("prob") >= threshold)
