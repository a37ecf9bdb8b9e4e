"""Property fuzz for the IPF operator (operators/mixtures.py): randomized
contingency tables (missing cells, single rows/columns, power-law masses)
must match a pure-numpy RAS twin cell-for-cell, hold column availability
exactly after the final sweep, and converge monotonically toward the
uniform row target as sweeps increase."""

from __future__ import annotations

import random

import numpy as np

from clickhouse_etl_loadtest_spark.operators.mixtures import ipf_weights


def _numpy_ipf(cells, iters):
    """RAS with the operator's exact sweep order: scale rows to the uniform
    target, then columns back to availability."""
    rows = sorted({r for r, _, _ in cells})
    cols = sorted({c for _, c, _ in cells})
    ri = {r: i for i, r in enumerate(rows)}
    ci = {c: i for i, c in enumerate(cols)}
    v = np.zeros((len(rows), len(cols)))
    for r, c, t in cells:
        v[ri[r], ci[c]] = t
    m = np.where(v > 0, 1.0, 0.0)
    total = v.sum()
    target = total / len(rows)
    avail = v.sum(axis=0)
    for _ in range(iters):
        cur = (v * m).sum(axis=1, keepdims=True)
        m = m * (target / cur)
        cur = (v * m).sum(axis=0, keepdims=True)
        m = m * (avail / cur)
    return {
        (r, c): m[ri[r], ci[c]] for r, c, t in cells if t > 0
    }


def test_ipf_fuzz_matches_numpy_twin(spark):
    rng = random.Random(41)
    for trial in range(15):
        n_rows = rng.randint(1, 6)
        n_cols = rng.randint(1, 8)
        cells = []
        for r in range(n_rows):
            for c in range(n_cols):
                if rng.random() < 0.75:
                    cells.append((f"r{r}", f"c{c}", int(10 ** rng.uniform(0, 5)) + 1))
        # every row and column must hold at least one cell
        held_r = {r for r, _, _ in cells}
        held_c = {c for _, c, _ in cells}
        for r in range(n_rows):
            if f"r{r}" not in held_r:
                cells.append((f"r{r}", "c0", rng.randint(1, 100)))
        for c in range(n_cols):
            if f"c{c}" not in held_c:
                cells.append(("r0", f"c{c}", rng.randint(1, 100)))
        iters = rng.choice([1, 2, 3])
        df = spark.createDataFrame(
            cells, "lang string, source string, n_tokens long"
        )
        got = {
            (x["lang"], x["source"]): x
            for x in ipf_weights(df, iters).collect()
        }
        want = _numpy_ipf(cells, iters)
        assert set(got) == set(want), trial
        for key, row in got.items():
            w = want[key]
            assert abs(row["weight"] - w) <= max(1e-9 * abs(w), 1e-12), (trial, key)
        # column availability holds exactly after the final (column) sweep
        by_col: dict = {}
        for (r, c), row in got.items():
            a, t = by_col.get(c, (0.0, 0))
            by_col[c] = (a + row["alloc_tokens"], t + row["n_tokens"])
        for c, (alloc, av) in by_col.items():
            assert abs(alloc - av) <= 1e-9 * av, (trial, c)


def test_ipf_residuals_tighten_with_sweeps(spark):
    """More sweeps move every row marginal closer to the uniform target
    (Sinkhorn convergence) on a generic positive table."""
    rng = random.Random(7)
    cells = [
        (f"r{r}", f"c{c}", rng.randint(1, 10_000))
        for r in range(4)
        for c in range(5)
    ]
    df = spark.createDataFrame(cells, "lang string, source string, n_tokens long")

    def worst(iters):
        rows = ipf_weights(df, iters).collect()
        return max(abs(r["row_residual"] - 1.0) for r in rows)

    w1, w3, w6 = worst(1), worst(3), worst(6)
    assert w3 <= w1 + 1e-12 and w6 <= w3 + 1e-12
    assert w6 < 0.05  # practically converged on a dense positive table
