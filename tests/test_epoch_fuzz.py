"""Property fuzz for the water-filling epoch fixpoint
(operators/epochs.py): on randomized source rollups the closed-form
boundary must reproduce the naive cap->redistribute->re-cap loop exactly —
same capped set, same allocations — and conserve the budget to float
precision. Complements the fixture-level tests in test_packing.py with
adversarial shapes (single source, all-equal sources, power-law spreads,
one giant + many dwarfs)."""

from __future__ import annotations

import math
import random

import pytest

from clickhouse_etl_loadtest_spark.operators.epochs import epoch_fixpoint

from .test_packing import _iterative_epoch_fixpoint


def _check(spark, per_source, budget_x, cap):
    pool = spark.createDataFrame(
        [(s, t) for s, t in per_source], "source string, n_tokens long"
    )
    rows = epoch_fixpoint(pool, budget_x, cap).collect()
    alive = [(s, t) for s, t in per_source if t > 0]
    assert {r["source"] for r in rows} == {s for s, _ in alive}
    capped, lam = _iterative_epoch_fixpoint(alive, budget_x=budget_x, cap=cap)
    got_capped = {r["source"] for r in rows if r["capped"]}
    assert got_capped == capped, (per_source, budget_x, cap)
    budget = sum(t for _, t in alive) * budget_x
    total = 0.0
    for r in rows:
        if r["capped"]:
            assert r["final_epochs"] == cap
            assert r["final_tokens"] == cap * r["n_tokens"]
        else:
            assert r["final_epochs"] <= cap * (1 + 1e-12)
            want = lam * math.sqrt(r["n_tokens"])
            assert abs(r["final_tokens"] - want) <= max(1e-9 * want, 1e-9)
        total += r["final_tokens"]
    assert abs(total - budget) <= 1e-9 * budget


def test_epoch_fixpoint_fuzz_random_pools(spark):
    rng = random.Random(99)
    for trial in range(25):
        n = rng.randint(1, 14)
        shape = rng.choice(["uniform", "powerlaw", "giant", "equal"])
        if shape == "uniform":
            toks = [rng.randint(1, 10_000) for _ in range(n)]
        elif shape == "powerlaw":
            toks = [int(10 ** rng.uniform(0, 6)) + 1 for _ in range(n)]
        elif shape == "giant":
            toks = [rng.randint(1, 50) for _ in range(n - 1)] + [10_000_000]
        else:
            toks = [rng.randint(1, 1000)] * n
        cap = rng.choice([2.0, 4.0, 8.0])
        budget_x = cap * rng.uniform(0.2, 0.95)
        per_source = [(f"s{i:03d}", t) for i, t in enumerate(toks)]
        _check(spark, per_source, budget_x, cap)


def test_epoch_fixpoint_edge_shapes(spark):
    # single source: caps iff budget_x > cap (never here) -> it takes the
    # whole budget at budget_x epochs
    _check(spark, [("only", 12345)], 3.8, 4.0)
    # zero-token sources are dropped, not allocated
    pool = [("a", 0), ("b", 100), ("c", 0), ("d", 900)]
    _check(spark, pool, 3.0, 4.0)
    # budget_x >= cap fails loud
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    df = s.createDataFrame([("a", 10)], "source string, n_tokens long")
    with pytest.raises(ValueError, match="budget_x < cap"):
        epoch_fixpoint(df, 4.0, 4.0)
