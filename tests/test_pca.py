"""Distributed PCA correctness: the moment pass must match a numpy twin on
identical (DECIMAL-quantized) arithmetic, the covariance must be bit-stable
across partitionings, and the residual outputs must satisfy the energy
invariants regardless of the eigenbasis sign ambiguity."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.pca import (
    covariance_moments,
    pca_residuals,
    top_components,
)

_Q = Decimal("1e-18")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _qsum(values):
    """Replicate Spark's cast(double as decimal(38,18)) + exact DECIMAL sum:
    shortest-repr decimal conversion, half-up at 1e-18."""
    return sum((Decimal(repr(float(v))).quantize(_Q, ROUND_HALF_UP) for v in values), Decimal(0))


def _ref_moments(x: np.ndarray):
    n, d = x.shape
    mean = np.array([float(_qsum(x[:, i])) / n for i in range(d)])
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            e = float(_qsum(x[:, i] * x[:, j])) / n - mean[i] * mean[j]
            cov[i, j] = cov[j, i] = e
    return mean, cov


def test_moments_match_numpy_twin(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    x = np.array(
        [[float(v) for v in r["embedding"]] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    ref_mean, ref_cov = _ref_moments(x)
    n, mean, cov = covariance_moments(emb)
    assert n == len(x)
    assert np.allclose(mean, ref_mean, atol=1e-15)
    assert np.allclose(cov, ref_cov, atol=1e-12)


def test_moments_bitstable_across_partitionings(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    _, m1, c1 = covariance_moments(emb.repartition(1))
    _, m16, c16 = covariance_moments(emb.repartition(16))
    assert (m1 == m16).all()
    assert (c1 == c16).all()


def test_residuals_match_numpy_and_satisfy_energy_invariants(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    n, mean, cov = covariance_moments(emb)
    _, comps = top_components(cov, 8)
    rows = pca_residuals(emb, mean, comps).orderBy("vec_id").collect()
    x = np.array(
        [[float(v) for v in r["embedding"]] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    centered = x - mean
    total = (centered**2).sum(axis=1)
    proj = centered @ comps.T
    topk = (proj**2).sum(axis=1)
    got_total = np.array([r["total_energy"] for r in rows])
    got_topk = np.array([r["topk_energy"] for r in rows])
    got_res = np.array([r["residual_energy"] for r in rows])
    assert np.allclose(got_total, total, rtol=1e-9)
    assert np.allclose(got_topk, topk, rtol=1e-9)
    assert (got_res >= -1e-9).all()
    assert all(0.0 <= r["explained"] <= 1.0 + 1e-12 for r in rows)


def test_energy_total_query_matches_residuals_split(spark, sf_dir):
    """embedding_pca_energy_total (the driver-checkable PCA surface) must
    equal pca_residuals' captured + residual per vector — tying the external
    hash gate to the rows-only eigen split."""
    from clickhouse_etl_loadtest_spark.queries import load_all

    reg = load_all()
    tot = {
        r["vec_id"]: r["total_energy"]
        for r in reg["embedding_pca_energy_total"].fn(spark, sf_dir).collect()
    }
    res = {
        r["vec_id"]: (r["topk_energy"], r["residual_energy"], r["total_energy"])
        for r in reg["embedding_pca_residuals"].fn(spark, sf_dir).collect()
    }
    assert set(tot) == set(res)
    for vid, te in tot.items():
        topk, resid, rt = res[vid]
        assert te == rt  # same fold, same mean -> bit-identical
        assert abs((topk + resid) - te) < 1e-9 * max(1.0, abs(te))


def test_more_components_capture_more_energy(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    _, mean, cov = covariance_moments(emb)
    _, c2 = top_components(cov, 2)
    _, c8 = top_components(cov, 8)
    e2 = pca_residuals(emb, mean, c2).agg(F.sum("topk_energy")).first()[0]
    e8 = pca_residuals(emb, mean, c8).agg(F.sum("topk_energy")).first()[0]
    assert e8 >= e2 - 1e-9
    # and the top-k eigenvalues explain the captured energy on average:
    # sum of per-vector topk energies / n == sum of top-k eigenvalues
    w8, _ = top_components(cov, 8)
    n = emb.count()
    assert abs(e8 / n - w8.sum()) < 1e-9 * max(1.0, w8.sum())


def test_residual_scoring_is_map_only(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    _, mean, cov = covariance_moments(emb)
    _, comps = top_components(cov, 4)
    plan = pca_residuals(emb, mean, comps)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_streaming_moment_fold_equals_one_shot(spark, sf_dir, tmp_path):
    """Folding per-batch DECIMAL moment sums must be BIT-identical to the
    one-shot pass over the full corpus (exact associative sums — the dense
    analogue of the HLL no-merge-penalty property)."""
    from clickhouse_etl_loadtest_spark.operators.pca import (
        moments_from_state,
        update_moments,
    )

    emb = _emb(spark, sf_dir)
    state = str(tmp_path / "pca-state")
    for b in range(3):
        update_moments(spark, emb.where(F.col("vec_id") % 3 == b), state, batch_id=b)
    n_s, mean_s, cov_s = moments_from_state(spark, state)
    n_f, mean_f, cov_f = covariance_moments(emb)
    assert n_s == n_f
    assert (mean_s == mean_f).all()
    assert (cov_s == cov_f).all()


def test_streaming_moment_replay_is_idempotent(spark, sf_dir, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.pca import (
        moments_from_state,
        update_moments,
    )

    emb = _emb(spark, sf_dir)
    state = str(tmp_path / "pca-state")
    update_moments(spark, emb.where(F.col("vec_id") % 2 == 0), state, batch_id=0)
    update_moments(spark, emb.where(F.col("vec_id") % 2 == 1), state, batch_id=1)
    before = moments_from_state(spark, state)
    # checkpoint-recovery replay of the LAST batch: same id, same data
    update_moments(spark, emb.where(F.col("vec_id") % 2 == 1), state, batch_id=1)
    after = moments_from_state(spark, state)
    assert before[0] == after[0]
    assert (before[1] == after[1]).all()
    assert (before[2] == after[2]).all()


def test_streaming_moments_as_real_foreachbatch_body(spark, sf_dir, tmp_path):
    """Drive the fold through an actual availableNow foreachBatch stream;
    the finalized moments must equal the one-shot batch pass bit-for-bit."""
    from clickhouse_etl_loadtest_spark.operators.pca import (
        moments_from_state,
        update_moments,
    )

    emb = _emb(spark, sf_dir)
    staging = str(tmp_path / "staging")
    emb.repartition(3).write.parquet(staging)
    state = str(tmp_path / "pca-state")

    def _fold(batch_df, batch_id):
        update_moments(batch_df.sparkSession, batch_df, state, batch_id=batch_id)

    stream = (
        spark.readStream.schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(300)
    n_s, mean_s, cov_s = moments_from_state(spark, state)
    n_f, mean_f, cov_f = covariance_moments(spark.read.parquet(staging))
    assert n_s == n_f
    assert (mean_s == mean_f).all()
    assert (cov_s == cov_f).all()


def test_streaming_moments_tolerate_leading_empty_batch(spark, sf_dir, tmp_path):
    """An empty batch 0 (routine before producers start) must be a no-op,
    not a persisted d=0 meta that poisons every later batch."""
    from clickhouse_etl_loadtest_spark.operators.pca import (
        moments_from_state,
        update_moments,
    )

    emb = _emb(spark, sf_dir)
    state = str(tmp_path / "pca-state")
    out0 = update_moments(spark, emb.where(F.lit(False)), state, batch_id=0)
    assert out0 == {"n_seen": 0, "d": 0}
    update_moments(spark, emb, state, batch_id=1)
    # an empty batch AFTER state exists folds as a no-op too
    update_moments(spark, emb.where(F.lit(False)), state, batch_id=2)
    n_s, mean_s, cov_s = moments_from_state(spark, state)
    n_f, mean_f, cov_f = covariance_moments(emb)
    assert n_s == n_f and (mean_s == mean_f).all() and (cov_s == cov_f).all()


def test_prune_keeps_only_latest_moment_snapshot(spark, sf_dir, tmp_path):
    """The shared delete-only maintenance pass: after pruning, exactly one
    snapshot remains per subdir and the finalized moments are unchanged."""
    import os

    from clickhouse_etl_loadtest_spark.operators.pca import (
        moments_from_state,
        prune_state,
        update_moments,
    )

    emb = _emb(spark, sf_dir)
    state = str(tmp_path / "pca-state")
    for b in range(3):
        update_moments(spark, emb.where(F.col("vec_id") % 3 == b), state, batch_id=b)
    before = moments_from_state(spark, state)
    assert prune_state(spark, state) == 4  # 2 old moments + 2 old meta parts
    after = moments_from_state(spark, state)
    assert before[0] == after[0]
    assert (before[1] == after[1]).all() and (before[2] == after[2]).all()
    for sub in ("moments", "meta"):
        parts = [d for d in os.listdir(f"{state}/{sub}") if d.startswith("batch=")]
        assert parts == ["batch=b2"]
