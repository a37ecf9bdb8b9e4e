"""Composed epoch-fixpoint x IPF plan (queries/curation.py::doc_epoch_ipf_plan):
the 2-D water-filling recipe must CONSERVE through both stages — per-source
allocation totals sit exactly at the fixpoint's capped budgets (IPF's final
sweep is the source scaling), and the grand total equals budget_x x corpus
(the fixpoint conserves the budget). Both building blocks are independently
oracle-verified; this pins what composition adds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries import load_all
from clickhouse_etl_loadtest_spark.queries.curation import (
    _EPOCH_BUDGET_X,
    _EPOCH_CAP,
)

REG = load_all()


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    return REG["doc_epoch_ipf_plan"].fn(spark, sf_dir).collect()


def test_budget_conserved_end_to_end(spark, sf_dir, plan):
    """sum(alloc_tokens) == budget_x * corpus tokens, through BOTH stages
    (micro-token rounding bounds the absolute slack at 0.5e-6 per cell)."""
    corpus = sum(r["n_tokens"] for r in plan)
    alloc = sum(r["alloc_tokens"] for r in plan)
    want = _EPOCH_BUDGET_X * corpus
    assert abs(alloc - want) / want < 1e-6


def test_source_totals_sit_at_the_fixpoint_budgets(spark, sf_dir, plan):
    """Per-source alloc sums == the standalone fixpoint's final_tokens —
    the IPF stage redistributes ACROSS languages, never across sources."""
    fx = {
        r["source"]: r["final_tokens"]
        for r in REG["doc_source_epoch_fixpoint"].fn(spark, sf_dir).collect()
    }
    per_source: dict = {}
    for r in plan:
        per_source[r["source"]] = per_source.get(r["source"], 0.0) + r["alloc_tokens"]
    assert set(per_source) == set(fx)
    for s, got in per_source.items():
        assert abs(got - fx[s]) / fx[s] < 1e-6, s


def test_caps_hold_cellwise(plan):
    """Capped sources sit exactly at the cap; no source exceeds it; the
    epoch-expanded mass is cell_tokens x the source multiplier."""
    assert any(r["capped"] for r in plan) and any(not r["capped"] for r in plan)
    for r in plan:
        if r["capped"]:
            assert r["epoch_mult"] == _EPOCH_CAP
        else:
            assert 0 < r["epoch_mult"] < _EPOCH_CAP
        assert r["epoch_tokens"] == pytest.approx(
            r["n_tokens"] * r["epoch_mult"], rel=1e-5
        )
        assert r["weight"] > 0


def test_language_marginal_moves_toward_uniform(spark, sf_dir, plan):
    """The IPF stage's job: post-plan language shares must be strictly more
    uniform than the epoch-expanded (pre-IPF) shares — max/min ratio
    shrinks — and every lang_residual must beat the pre-IPF imbalance."""
    pre: dict = {}
    post: dict = {}
    for r in plan:
        pre[r["lang"]] = pre.get(r["lang"], 0.0) + r["epoch_tokens"]
        post[r["lang"]] = post.get(r["lang"], 0.0) + r["alloc_tokens"]
    spread_pre = max(pre.values()) / min(pre.values())
    spread_post = max(post.values()) / min(post.values())
    assert spread_post < spread_pre
    resid = {r["lang"]: r["lang_residual"] for r in plan}
    target = sum(post.values()) / len(post)
    for lang, share in post.items():
        assert resid[lang] == pytest.approx(share / target, rel=1e-4)
