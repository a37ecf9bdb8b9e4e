"""Product quantization (operators/pq.py): the joint training loop, encode,
and ADC table math must match a numpy twin replaying the same deterministic
conventions, and the end-to-end search must clear a recall floor against
the exact L2 baseline."""

import numpy as np
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.pq import (
    _assign_codes,
    _codebook_tensor,
    pq_adc_topk,
    pq_encode,
    pq_reconstruct,
    pq_train,
)

M, KSUB, ITERS, K = 8, 16, 3, 10


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _x(spark, sf_dir) -> np.ndarray:
    rows = _emb(spark, sf_dir).orderBy("vec_id").collect()
    return np.asarray([[float(v) for v in r["embedding"]] for r in rows], dtype=np.float64)


def _ref_train(x: np.ndarray, m: int, ksub: int, iters: int) -> np.ndarray:
    d = x.shape[1]
    dsub = d // m
    cb = x[:ksub].reshape(ksub, m, dsub).transpose(1, 0, 2).copy()  # (m, ksub, dsub)
    for _ in range(iters):
        codes = _assign_codes(cb, x)  # (n, m)
        for s in range(m):
            for c in range(ksub):
                mask = codes[:, s] == c
                if mask.any():
                    cb[s, c] = x[mask, s * dsub : (s + 1) * dsub].mean(axis=0)
    return cb


def test_train_matches_numpy_twin(spark, sf_dir):
    x = _x(spark, sf_dir)
    ref = _ref_train(x, M, KSUB, ITERS)
    got = _codebook_tensor(pq_train(_emb(spark, sf_dir), m=M, ksub=KSUB, iterations=ITERS))
    assert got.shape == ref.shape == (M, KSUB, x.shape[1] // M)
    # float summation order differs (Spark avg vs numpy mean): tight allclose
    assert np.allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_train_deterministic(spark, sf_dir):
    a = _codebook_tensor(pq_train(_emb(spark, sf_dir), m=M, ksub=KSUB, iterations=2))
    b = _codebook_tensor(pq_train(_emb(spark, sf_dir), m=M, ksub=KSUB, iterations=2))
    assert np.allclose(a, b, rtol=0, atol=1e-12)


def test_encode_matches_reference_assignment(spark, sf_dir):
    x = _x(spark, sf_dir)
    cb = pq_train(_emb(spark, sf_dir), m=M, ksub=KSUB, iterations=ITERS)
    rows = pq_encode(_emb(spark, sf_dir), cb).orderBy("vec_id").collect()
    got = np.asarray([list(r["codes"]) for r in rows])
    ref = _assign_codes(_codebook_tensor(cb), x)
    assert (got == ref).all()  # integer argmin: exact


def test_adc_distance_is_distance_to_reconstruction(spark, sf_dir):
    """The table-sum identity ADC(q, codes) == ||q - reconstruct(codes)||^2:
    check the Spark output against direct numpy reconstruction distances."""
    x = _x(spark, sf_dir)
    cb = pq_train(_emb(spark, sf_dir), m=M, ksub=KSUB, iterations=ITERS)
    queries = [(i, list(x[i])) for i in range(4)]
    enc = pq_encode(_emb(spark, sf_dir), cb)
    out = pq_adc_topk(enc, cb, queries, k=K).collect()
    codes_by_id = {
        r["vec_id"]: list(r["codes"]) for r in enc.select("vec_id", "codes").collect()
    }
    for r in out:
        rec = pq_reconstruct(codes_by_id[r["vec_id"]], cb)
        direct = float(((np.asarray(queries[0][1]) * 0 + x[r["q_id"]] - rec) ** 2).sum())
        assert abs(r["adist"] - direct) <= 1e-9 * max(1.0, direct)


def test_adc_recall_beats_floor_and_self_is_top1(spark, sf_dir):
    """End-to-end: each query's own vector must be its ADC top-1 (its
    reconstruction is nearest by construction on this fixture), and recall@10
    vs the exact L2 top-10 must clear a floor (random embeddings are PQ's
    worst case; the floor is measured-with-margin, not aspirational)."""
    x = _x(spark, sf_dir)
    cb = pq_train(_emb(spark, sf_dir), m=M, ksub=KSUB, iterations=ITERS)
    q_ids = list(range(8))
    queries = [(i, list(x[i])) for i in q_ids]
    out = pq_adc_topk(pq_encode(_emb(spark, sf_dir), cb), cb, queries, k=K).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"]))
    hits = total = 0
    for qi in q_ids:
        got = [v for _, v in sorted(by_q[qi])]
        assert got[0] == qi, (qi, got)  # self is top-1
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        exact = list(np.argsort(d2, kind="stable")[:K])
        hits += len(set(got) & set(exact))
        total += K
    # measured 0.35 on this fixture: i.i.d. random embeddings have no
    # low-dimensional structure for PQ to exploit, the documented worst
    # case (real embedding corpora sit far higher); floor = measured - margin
    assert hits / total >= 0.25, hits / total


def test_adc_plan_never_shuffles_the_corpus_before_scoring(spark, sf_dir):
    x = _x(spark, sf_dir)
    cb = pq_train(_emb(spark, sf_dir), m=M, ksub=KSUB, iterations=1)
    enc = pq_encode(_emb(spark, sf_dir), cb)
    plan = (
        pq_adc_topk(enc, cb, [(0, list(x[0]))], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan  # Arrow-batched only
    # the only hash Exchange is the per-query rank window's
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 1 and "qi#" in ex[0]


def test_ivfpq_candidates_gated_by_probe_cells_and_adist_exact(spark, sf_dir):
    """The composed IVF-PQ search: every returned neighbor must live in one
    of its query's probed coarse cells, its adist must equal the numpy table
    computation for that (query, codes) pair, ranks must be adist-monotone,
    and recall vs exact L2 must clear the measured floor."""
    from clickhouse_etl_loadtest_spark.queries import load_all
    from clickhouse_etl_loadtest_spark.queries.vector import (
        _NPROBE,
        _PQ_ITERS,
        _PQ_KSUB,
        _PQ_M,
        _TOPK,
    )

    x = _x(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    rows = emb.orderBy("vec_id").collect()
    labels = np.asarray([int(r["label"]) for r in rows])
    cb = pq_train(emb, m=_PQ_M, ksub=_PQ_KSUB, iterations=_PQ_ITERS)
    cbt = _codebook_tensor(cb)
    codes = _assign_codes(cbt, x)

    # numpy coarse structure: per-label centroids, nearest-cell assignment
    cells = sorted(set(labels))
    cents = np.stack([x[labels == c].mean(axis=0) for c in cells])
    d2cell = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (n, n_cells)
    assigned_cell = np.asarray(cells)[d2cell.argmin(axis=1)]
    probe_sets = {
        qi: set(np.asarray(cells)[np.argsort(d2cell[qi], kind="stable")[:_NPROBE]])
        for qi in range(8)
    }

    out = load_all()["ivfpq_search_topk"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    hits = total = 0
    for qi in range(8):
        rs = sorted(by_q[qi], key=lambda r: r["rank"])
        assert len(rs) == _TOPK
        prev = -1.0
        for r in rs:
            assert assigned_cell[r["vec_id"]] in probe_sets[qi], r
            # numpy ADC for this exact pair
            qsv = x[qi].reshape(_PQ_M, -1)
            ref = sum(
                ((qsv[s] - cbt[s, codes[r["vec_id"], s]]) ** 2).sum() for s in range(_PQ_M)
            )
            assert abs(r["adist"] - ref) <= 1e-9 * max(1.0, ref)
            assert r["adist"] >= prev - 1e-12
            prev = r["adist"]
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[1 : _TOPK + 1])  # excl. self
        hits += len(exact & {r["vec_id"] for r in rs})
        total += _TOPK
    # coarse gating + PQ on i.i.d. random vectors: measured-with-margin floor
    assert hits / total >= 0.1, hits / total


def test_pq_train_rejects_bad_shapes(spark, sf_dir):
    import pytest as _pytest

    emb = _emb(spark, sf_dir)
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)
    with _pytest.raises(ValueError, match="smaller than ksub"):
        pq_train(emb.limit(3), m=8, ksub=16)
