"""Bitext margin mining semantics: the margin denominator must demote hub
vectors that raw-cosine mining false-positives on (the Artetxe & Schwenk
2019 motivation), mutuality must hold, and the banded path must agree with
the exact path on its candidate subset."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()
DIM = 64


def _write_embeddings(tmp_path, vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_margin_demotes_the_hub_raw_cosine_would_mine(spark, tmp_path):
    """Construct two true cross-corpus pairs plus a hub that is the RAW
    NEAREST neighbour of every x. Margin mining must recover the true
    pairs and never emit the hub; a raw-cosine argmax would pick the hub
    for both xs (asserted, so the test really exercises the denominator)."""
    rng = np.random.default_rng(7)
    # hubness needs a correlated query side: every x shares a common
    # direction g, and the hub IS g — so the hub's cosine to every x (~0.8)
    # beats each x's noisier true partner (~0.78), making the hub the raw
    # argmax for ALL xs, while the hub's own k-NN mean (~0.8, it is close
    # to the whole X side) deflates its margin below the true pairs'.
    g = _unit(rng.normal(size=DIM))

    def _orth(v, *against):
        v = np.asarray(v, dtype=np.float64)
        for a in against:
            v = v - np.dot(v, a) * a
        return _unit(v)

    # exact geometry via orthogonalized noise: cos(x_i, g) = 0.8 for every
    # x, cos(x_i, y_i) = 1/sqrt(1.64) ≈ 0.781 — the hub beats every true
    # partner by a fixed 0.019 of cosine
    xs = [0.8 * g + 0.6 * _orth(rng.normal(size=DIM), g) for _ in range(5)]
    hub = g
    ys = [_unit(x + 0.8 * _orth(rng.normal(size=DIM), g, _unit(x))) for x in xs]
    xs = [_unit(x) for x in xs]
    # vec_id parity assigns sides: X at even ids 0,2,..,8 (+ a random
    # filler at 10 to keep ids contiguous), Y at odd ids — hub at 1, true
    # partner of x_i at 2*i+3
    filler_x = _unit(rng.normal(size=DIM))
    vecs = [None] * 12
    for i in range(5):
        vecs[2 * i] = xs[i]
        vecs[2 * i + 3] = ys[i]
    vecs[1] = hub
    vecs[10] = filler_x
    y_ids = {1: hub, **{2 * i + 3: ys[i] for i in range(5)}}
    # precondition: the hub IS the raw-cosine argmax for every x
    for x in xs:
        best = max(y_ids, key=lambda i: float(np.dot(x, y_ids[i])))
        assert best == 1, "fixture failed to make the hub the raw nearest"

    sf = _write_embeddings(tmp_path, vecs)
    mined = {
        (r["x_id"], r["y_id"])
        for r in REG["embedding_bitext_mining"].fn(spark, sf).collect()
    }
    true_pairs = {(2 * i, 2 * i + 3) for i in range(5)}
    assert true_pairs <= mined  # every true pair recovered despite the hub
    assert all(y != 1 for _, y in mined)  # the hub is never mined


def test_mutuality_and_threshold_hold_on_random_sets(spark, tmp_path):
    """On a random set: every mined pair clears the threshold, x ids and
    y ids are unique (mutual best is 1:1 by construction), and sides are
    parity-correct."""
    rng = np.random.default_rng(11)
    vecs = [_unit(rng.normal(size=DIM)) for _ in range(40)]
    sf = _write_embeddings(tmp_path, vecs)
    rows = REG["embedding_bitext_mining"].fn(spark, sf).collect()
    assert rows, "random set mined nothing — threshold miscalibrated"
    xs = [r["x_id"] for r in rows]
    ys = [r["y_id"] for r in rows]
    assert len(xs) == len(set(xs)) and len(ys) == len(set(ys))
    assert all(x % 2 == 0 and y % 2 == 1 for x, y in zip(xs, ys))
    assert all(r["margin"] >= 1.01 for r in rows)


def test_banded_pairs_are_a_subset_semantically_consistent(spark, tmp_path):
    """Banded mining restricts candidates, so its mined pairs need not be a
    subset of the exact miner's — but each banded pair must still be
    mutual within its own run (unique x and y ids) and parity-correct."""
    rng = np.random.default_rng(13)
    vecs = [_unit(rng.normal(size=DIM)) for _ in range(40)]
    sf = _write_embeddings(tmp_path, vecs)
    rows = REG["embedding_bitext_lsh"].fn(spark, sf).collect()
    xs = [r["x_id"] for r in rows]
    ys = [r["y_id"] for r in rows]
    assert len(xs) == len(set(xs)) and len(ys) == len(set(ys))
    assert all(x % 2 == 0 and y % 2 == 1 for x, y in zip(xs, ys))


def _correlated_corpus(n_pairs=50, n_noise=70, noise=0.35, seed=17):
    """TRUE pairs at high cosine over a random noise floor — the regime the
    banding argument assumes (the embeddings-table fixture is the
    near-orthogonal WORST case; this is the realistic complement). Pair i
    is (x=2i, y=2i+1): two unit perturbations of one shared base direction
    (cosine ~0.89 at noise=0.35); the noise vectors are independent."""
    rng = np.random.default_rng(seed)
    vecs = []
    for _ in range(n_pairs):
        b = rng.normal(size=DIM)
        vecs.append(_unit(b + noise * rng.normal(size=DIM)))
        vecs.append(_unit(b + noise * rng.normal(size=DIM)))
    for _ in range(n_noise):
        vecs.append(_unit(rng.normal(size=DIM)))
        vecs.append(_unit(rng.normal(size=DIM)))
    return vecs


def test_correlated_fixture_production_recall(spark, tmp_path):
    """On the correlated fixture the production setting (4 bands x 3 bits)
    must keep >= 0.9 of the TRUE pairs the exact miner finds (measured
    0.98 — one banding miss out of 50). The overall-vs-exact recall is
    lower by design: the exact arm also mines low-cosine noise-floor
    margin-pairs that banding intentionally prunes, which is the
    worst-case number embedding_bitext_lsh_recall reports on the
    near-orthogonal fixture."""
    vecs = _correlated_corpus()
    sf = _write_embeddings(tmp_path, vecs)
    planted = {(2 * i, 2 * i + 1) for i in range(50)}
    exact = {(r.x_id, r.y_id) for r in REG["embedding_bitext_mining"].fn(spark, sf).collect()}
    assert len(exact & planted) >= 0.95 * len(planted)  # the baseline sees them
    lsh = {(r.x_id, r.y_id) for r in REG["embedding_bitext_lsh"].fn(spark, sf).collect()}
    exact_p, lsh_p = exact & planted, lsh & planted
    assert len(lsh_p & exact_p) / len(exact_p) >= 0.9


def test_recall_curve_vs_band_count_on_correlated_fixture(spark, tmp_path):
    """Candidate-level true-pair recall must climb monotonically with the
    band count (shorter bands = more collisions = higher recall), with the
    documented floors: >=0.8 at 3 bands, >=0.9 at the production 4, >=0.95
    at 6 (measured 0.58 / 0.90 / 0.98 / 1.00 for 2/3/4/6 — the curve
    recorded in SCALING.md)."""
    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.queries.vector import _banded_pairs, _lsh_sig

    vecs = _correlated_corpus()
    sf = _write_embeddings(tmp_path, vecs)
    planted = {(2 * i, 2 * i + 1) for i in range(50)}
    sig = spark.read.parquet(f"{sf}/embeddings.parquet")
    sig = _lsh_sig(sig)
    recalls = {}
    for bands, bits in ((2, 6), (3, 4), (4, 3), (6, 2)):
        cand = {
            (r.x_id, r.y_id)
            for r in _banded_pairs(
                sig.where(F.col("vec_id") % 2 == 0).select(
                    F.col("vec_id").alias("x_id"), "bucket"
                ),
                sig.where(F.col("vec_id") % 2 == 1).select(
                    F.col("vec_id").alias("y_id"), "bucket"
                ),
                bands,
                bits,
            ).collect()
        }
        recalls[bands] = len(cand & planted) / len(planted)
    assert recalls[2] <= recalls[3] <= recalls[4] <= recalls[6], recalls
    assert recalls[3] >= 0.8 and recalls[4] >= 0.9 and recalls[6] >= 0.95, recalls
