"""Data-constrained epoch allocation (Muennighoff et al. 2023, public):
the water-filling fixpoint as a reusable operator.

``queries/curation.py::doc_source_epoch_fixpoint`` is the oracle-verified
query form over the documents table; THIS is the function a sampler calls
on any per-source token rollup (domains, datasets, shards — anything with
a (source, n_tokens) shape). Semantics: temperature-flattened weights
(w_s ∝ sqrt(tokens_s)) split a budget of ``budget_x`` x the corpus;
sources allocated past ``cap`` epochs sit exactly at the cap and the
remainder redistributes over the uncapped — iterated to the FIXPOINT,
computed closed-form: a source caps iff sqrt(t_s) < lambda/cap, so the
capped set is a PREFIX of sources sorted ascending by token count and one
window pass over DECIMAL prefix sums finds the unique boundary (the
multiplier is monotone in the prefix, so capped sources stay capped — the
iterative loop provably converges to the same allocation, pinned by
``tests/test_packing.py`` and fuzzed against the naive loop in
``tests/test_epoch_fuzz.py``).

Scale: the input is already a rollup, so everything here is
source-cardinality — the window's SinglePartition sort is the deliberate
class-histogram trade, and the 1-row (totals, lambda) frame broadcasts
back onto the pool. Reference: no counterpart (the reference has no
sampling notion); LLM-pipeline extension, SURVEY.md §7.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epoch_fixpoint(pool: DataFrame, budget_x: float, cap: float) -> DataFrame:
    """Fixpoint epoch allocation over a (``source``, ``n_tokens``, ...)
    rollup: returns the input columns plus ``mix_weight`` (the pre-cap
    sqrt share), ``capped``, ``final_tokens``, ``final_epochs``. Rows with
    ``n_tokens <= 0`` are dropped (they carry no mass and their sqrt
    weight is 0). Requires ``budget_x < cap`` — otherwise every source
    caps and no uncapped remainder exists to absorb the budget."""
    if budget_x >= cap:  # not an assert: must survive python -O
        raise ValueError(
            f"epoch_fixpoint requires budget_x < cap (got {budget_x} >= {cap}): "
            "all-capped would allocate cap*corpus > budget"
        )
    from pyspark.sql import Window

    pool = pool.where(F.col("n_tokens") > 0)
    carry = [c for c in pool.columns]
    tot = pool.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sqrt_total"),
    )
    sq = F.sqrt(F.col("n_tokens").cast("double"))
    w = Window.orderBy("n_tokens", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordered = pool.select(
        "n_tokens",
        "source",
        sq.alias("sq"),
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
        F.sum(sq.cast("decimal(38,18)")).over(w).cast("double").alias("cum_sqrt"),
        F.lead(sq).over(Window.orderBy("n_tokens", "source")).alias("next_sq"),
    )
    budget = F.col("total_tokens") * budget_x
    # try_divide: the all-capped boundary (k = n) has an exactly-zero
    # denominator (DECIMAL prefix sums); NULL fails both predicates below,
    # dropping the infeasible candidate instead of tripping ANSI div-by-zero
    lam_k = F.try_divide(
        budget - cap * F.col("cum_tokens"),
        F.col("sqrt_total") - F.col("cum_sqrt"),
    )
    cand = (
        ordered.crossJoin(F.broadcast(tot))
        .where(lam_k > cap * F.col("sq"))
        .where(F.col("next_sq").isNull() | (lam_k <= cap * F.col("next_sq")))
        .agg(F.max(lam_k).alias("cand_lam"))
    )
    lam = tot.crossJoin(F.broadcast(cand)).select(
        F.coalesce(F.col("cand_lam"), budget / F.col("sqrt_total")).alias("lam"),
        "sqrt_total",
    )
    p_sq = F.sqrt(F.col("n_tokens").cast("double"))
    is_capped = F.col("lam") > cap * p_sq
    return pool.crossJoin(F.broadcast(lam)).select(
        *carry,
        (p_sq / F.col("sqrt_total")).alias("mix_weight"),
        is_capped.alias("capped"),
        F.when(is_capped, F.lit(cap) * F.col("n_tokens"))
        .otherwise(F.col("lam") * p_sq)
        .alias("final_tokens"),
        F.when(is_capped, F.lit(cap))
        .otherwise(F.col("lam") * p_sq / F.col("n_tokens"))
        .alias("final_epochs"),
    )
