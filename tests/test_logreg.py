"""Logistic-regression trainer correctness: the distributed gradient-descent
trajectory must match a pure-Python twin computed on the exact same feature
values (the DECIMAL gradient sums make the Spark side order-independent;
the residual tolerance covers libm-vs-JVM ``exp`` ulp differences only)."""

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.logreg import logistic_fit, logistic_predict
from clickhouse_etl_loadtest_spark.queries.curation import (
    _LOGREG_FEATURES,
    _LOGREG_ITERS,
    _LOGREG_LR,
    _quality_features,
)

_Q = Decimal("1e-18")


def _ref_fit(rows, k, iterations, lr):
    """Python twin of logistic_fit: same left-fold logit order, same
    per-term DECIMAL(38,18) quantization (Spark casts double->decimal via
    the shortest decimal string, i.e. repr), same update formula."""
    n = len(rows)
    w = [0.0] * (k + 1)
    for _ in range(iterations):
        g = [Decimal(0)] * (k + 1)
        for x, y in rows:
            z = w[0]
            for j in range(k):
                z = z + w[j + 1] * x[j]
            err = 1.0 / (1.0 + math.exp(-z)) - y
            g[0] += Decimal(repr(err)).quantize(_Q, ROUND_HALF_UP)
            for j in range(k):
                g[j + 1] += Decimal(repr(err * x[j])).quantize(_Q, ROUND_HALF_UP)
        w = [w[i] - lr * float(g[i]) / n for i in range(k + 1)]
    return w


def test_fit_matches_python_twin(spark, sf_dir):
    feats = _quality_features(spark, sf_dir)
    collected = feats.collect()
    rows = [
        (tuple(r[c] for c in _LOGREG_FEATURES), 1.0 if r["label"] else 0.0) for r in collected
    ]
    ref = _ref_fit(rows, len(_LOGREG_FEATURES), _LOGREG_ITERS, _LOGREG_LR)
    got = logistic_fit(feats, _LOGREG_FEATURES, "label", iterations=_LOGREG_ITERS, lr=_LOGREG_LR)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert abs(g - r) <= 1e-9 * max(1.0, abs(r)), (got, ref)


def test_fit_deterministic_across_partitionings(spark, sf_dir):
    """DECIMAL gradient sums must make the trajectory identical whatever the
    partitioning — bit-equal weights on 1 vs 16 partitions."""
    feats = _quality_features(spark, sf_dir)
    w1 = logistic_fit(feats.repartition(1), _LOGREG_FEATURES, "label", iterations=5, lr=0.3)
    w16 = logistic_fit(feats.repartition(16), _LOGREG_FEATURES, "label", iterations=5, lr=0.3)
    assert w1 == w16


def test_classifier_learns_the_heuristic(spark, sf_dir):
    """Distillation sanity: the learned model must agree with its teacher
    labels on a clear majority of documents (the heuristic is a thresholded
    function of these same signals, so it is largely linearly recoverable)."""
    from clickhouse_etl_loadtest_spark.queries import load_all

    out = load_all()["doc_quality_classifier"].fn(spark, sf_dir)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("label") == F.col("pred")).cast("int")).alias("agree"),
        F.min("prob").alias("pmin"),
        F.max("prob").alias("pmax"),
    ).first()
    assert agg["n"] > 0
    assert agg["agree"] / agg["n"] >= 0.8, (agg["agree"], agg["n"])
    assert 0.0 <= agg["pmin"] and agg["pmax"] <= 1.0


def test_predict_is_map_only(spark, sf_dir):
    """Scoring must stay map-side: no keyed or single-partition Exchange
    (the only allowed Exchange is the fixture loader's round-robin
    scan-spread), no join, no Python eval."""
    feats = _quality_features(spark, sf_dir)
    w = [0.1, -0.2, 0.3, 0.05, -0.04]
    plan = (
        logistic_predict(feats, _LOGREG_FEATURES, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_fit_rejects_empty_input(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "a double, b double, y boolean")
    with _pytest.raises(ValueError, match="empty input"):
        logistic_fit(empty, ["a", "b"], "y", iterations=1)
