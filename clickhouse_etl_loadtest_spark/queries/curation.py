"""Corpus-curation operators: the passes a training-data pipeline runs AFTER
per-document scoring/dedup — incremental ingestion, mixture balancing,
boilerplate span detection (SURVEY.md §7.6 extension; no reference
counterpart — the reference only dedups by an exact key field).

All are pure JVM column expressions + at most one keyed shuffle each, with
exact DuckDB oracles via the shared md5-based ``h60`` hash. Driver
visibility rotates per round (the driver registry caps at 50 entries);
COVERAGE.md's appendix is the canonical, machine-checked slot assignment —
extras keep their value-level DuckDB check in tests/test_query_oracles.py.

Scale notes (100 TB):
- ``doc_incremental_dedup``: hash-key shuffle anti-join — the snapshot side is
  a corpus, not a dimension, so no broadcast; both sides shuffle 60-bit
  content hashes only, never text.
- ``doc_token_budget_sample``: window cumsum PARTITIONED by lang — each
  language sorts independently; no global sort, no single-partition window.
- ``source_mixing_weights``: two-level aggregation; the grand total joins back
  via a 1-row broadcast (same pattern as analytics.py's global-threshold
  queries).
- ``doc_boilerplate_ngrams``: the gram->doc-count shuffle carries 60-bit
  hashes; per-doc coverage joins on (hash) then re-aggregates by doc_id.
- ``doc_export_shards``: map-only hash assignment + an 8-group manifest agg;
  the writer itself (operators/sharding.py) is one range repartition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h32, h32_sql_duckdb, h60, h60_sql_duckdb
from ..operators.bpe import EOW as _BPE_EOW
from . import register
from .text import CTX_LEN, STOPWORDS, TOKEN_RE, _docs, _sql_in, _tokens

# --- incremental dedup vs a prior snapshot ------------------------------------------

# deterministic snapshot split: docs with doc_id % 10 < 3 are "already
# ingested"; the incremental batch is everything else
_SNAPSHOT_MOD, _SNAPSHOT_KEEP = 10, 3

_INCREMENTAL_ORACLE = f"""
WITH snapshot AS (
    SELECT {h60_sql_duckdb("text")} AS content_hash
    FROM documents WHERE doc_id % {_SNAPSHOT_MOD} < {_SNAPSHOT_KEEP}
),
batch AS (
    SELECT doc_id, lang, source, {h60_sql_duckdb("text")} AS content_hash
    FROM documents WHERE doc_id % {_SNAPSHOT_MOD} >= {_SNAPSHOT_KEEP}
)
SELECT doc_id, lang, source FROM batch
WHERE content_hash NOT IN (SELECT content_hash FROM snapshot)
ORDER BY doc_id
"""


@register("doc_incremental_dedup", _INCREMENTAL_ORACLE, extra=True)
def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: drop new documents whose exact content
    already exists in a prior corpus snapshot.

    The anti-join runs on 60-bit content hashes, so the shuffle carries
    (hash, doc_id) pairs — document text never moves. At 100 TB both sides are
    corpus-scale: this stays a shuffle hash anti-join (no broadcast), one
    shuffle total, and the snapshot side can be a pre-bucketed hash table on
    disk for repeated nightly runs.
    """
    d = _docs(spark, sf_dir).withColumn("content_hash", h60(F.col("text")))
    snapshot = d.where(F.col("doc_id") % _SNAPSHOT_MOD < _SNAPSHOT_KEEP).select("content_hash")
    batch = d.where(F.col("doc_id") % _SNAPSHOT_MOD >= _SNAPSHOT_KEEP)
    return (
        batch.join(snapshot, "content_hash", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register("doc_bloom_incremental_dedup", _INCREMENTAL_ORACLE, extra=True)
def doc_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated variant of :func:`doc_incremental_dedup`: identical result
    (same oracle — Bloom filters have no false negatives, and the exact
    anti-join on the bloom-positive slice removes the false positives), but
    only the maybe-duplicate slice of the batch shuffles.

    This is the steady-state-ingest scale path: at 100 TB with a ~5%
    duplicate rate and fpp=1%, ~94% of every batch bypasses the anti-join
    shuffle map-side (operators/bloom.py module docstring has the cost model
    and the filter-size applicability bound).
    """
    from ..operators.bloom import bloom_gated_anti_join, build_bloom

    d = _docs(spark, sf_dir).withColumn("content_hash", h60(F.col("text")))
    snapshot = d.where(F.col("doc_id") % _SNAPSHOT_MOD < _SNAPSHOT_KEEP).select("content_hash")
    batch = d.where(F.col("doc_id") % _SNAPSHOT_MOD >= _SNAPSHOT_KEEP)
    bloom = build_bloom(snapshot, "content_hash", expected_items=max(1, snapshot.count()))
    return (
        bloom_gated_anti_join(batch, snapshot, "content_hash", bloom)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# --- snapshot diff (corpus release comparison) ---------------------------------------

# deterministic overlapping split: "old" release = doc_id % 10 < 5,
# "new" release = doc_id % 10 >= 2 (ids 2-4 exist in both)
_DIFF_OLD_LT, _DIFF_NEW_GE = 5, 2

_SNAPSHOT_DIFF_ORACLE = f"""
WITH old_h AS (
    SELECT DISTINCT {h60_sql_duckdb("text")} AS content_hash
    FROM documents WHERE doc_id % {_SNAPSHOT_MOD} < {_DIFF_OLD_LT}
),
new_h AS (
    SELECT DISTINCT {h60_sql_duckdb("text")} AS content_hash
    FROM documents WHERE doc_id % {_SNAPSHOT_MOD} >= {_DIFF_NEW_GE}
)
SELECT COALESCE(o.content_hash, n.content_hash) AS content_hash,
       CASE WHEN o.content_hash IS NULL THEN 'added'
            WHEN n.content_hash IS NULL THEN 'removed'
            ELSE 'unchanged' END AS status
FROM old_h o FULL OUTER JOIN new_h n ON o.content_hash = n.content_hash
ORDER BY content_hash
"""


@register("doc_snapshot_diff", _SNAPSHOT_DIFF_ORACLE, extra=True)
def doc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-over-release corpus diff: classify every distinct document
    content as added / removed / unchanged between two snapshots — the audit
    a dataset release pipeline publishes alongside the data (and the
    symmetric complement of ``doc_incremental_dedup``, which only keeps the
    'added' side).

    Both sides reduce to DISTINCT 60-bit content hashes before the full
    outer join, so the shuffle carries hashes only — text never moves, and
    at 100 TB the join is hash-partitioned on both corpus-scale sides (no
    broadcast assumption)."""
    d = _docs(spark, sf_dir).withColumn("content_hash", h60(F.col("text")))
    old_h = (
        d.where(F.col("doc_id") % _SNAPSHOT_MOD < _DIFF_OLD_LT)
        .select("content_hash")
        .distinct()
    )
    new_h = (
        d.where(F.col("doc_id") % _SNAPSHOT_MOD >= _DIFF_NEW_GE)
        .select(F.col("content_hash").alias("new_hash"))
        .distinct()
    )
    joined = old_h.join(new_h, old_h.content_hash == new_h.new_hash, "full_outer")
    status = (
        F.when(F.col("content_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce("content_hash", "new_hash").alias("content_hash"),
            status.alias("status"),
        )
        .orderBy("content_hash")
    )


# --- token-budget sampling per language ---------------------------------------------

_TOKEN_BUDGET = 600  # tokens per language; truncates every lang at sf0.01

_BUDGET_ORACLE = f"""
WITH counted AS (
    SELECT doc_id, lang,
           CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS n_tokens
    FROM documents
),
cum AS (
    SELECT doc_id, lang, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM counted
)
SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= {_TOKEN_BUDGET}
ORDER BY lang, doc_id
"""


@register("doc_token_budget_sample", _BUDGET_ORACLE, extra=True)
def doc_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Take documents per language (in deterministic doc_id order) until the
    language's token budget is exhausted — the "fill the training mix to N
    tokens per language" pass.

    The window is PARTITIONED by lang: each language's cumsum sorts only its
    own partition, so the plan scales with the largest language, not the
    corpus. (A global take-until-budget would be a single-partition sort —
    exactly the shape tests/test_plan_quality.py forbids on fact tables.)
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .orderBy("lang", "doc_id")
    )


# --- source mixing weights ----------------------------------------------------------

_MIX_ORACLE = f"""
WITH per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS total_tokens, COUNT(*) AS n_sources FROM per_source)
SELECT source, n_docs, n_tokens,
       n_tokens * 1.0 / total_tokens AS token_share,
       (1.0 / n_sources) / (n_tokens * 1.0 / total_tokens) AS mix_weight
FROM per_source, tot
ORDER BY source
"""


@register("source_mixing_weights", _MIX_ORACLE, extra=True)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights that rebalance the corpus to a uniform
    token mix (weight = target_share / actual_share) — the knob a data-mixture
    recipe multiplies into its sampler.

    Two-level aggregation: the per-source rollup is one shuffle on ``source``;
    the grand total is a 1-row aggregate joined back by broadcast. Source
    cardinality is domains, not documents, so the second level is always tiny.
    """
    d = _docs(spark, sf_dir).select("source", F.size(_tokens()).cast("long").alias("n_toks"))
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("n_tokens")
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"), F.count(F.lit(1)).alias("n_sources")
    )
    share = F.col("n_tokens") * 1.0 / F.col("total_tokens")
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            share.alias("token_share"),
            ((1.0 / F.col("n_sources")) / share).alias("mix_weight"),
        )
        .orderBy("source")
    )


# --- 2-D mixture rebalancing via iterative proportional fitting ----------------------
# source_mixing_weights balances ONE marginal (uniform over sources); a real
# mixture recipe has TWO constraints at once: hit a target LANGUAGE
# distribution while drawing from each SOURCE in proportion to what it
# actually holds. That is the classic contingency-table problem solved by
# iterative proportional fitting (Deming & Stephan 1940; Sinkhorn's
# alternating row/column scaling): scale per-lang to the target marginal,
# rescale per-source back to availability, repeat. Each sweep only touches
# the (lang x source) CELL table — tiny after one corpus rollup — so the
# unrolled iterations cost nothing at any corpus size, and the same unroll
# is expressible in SQL verbatim.

_IPF_ITERS = 3

_IPF_ORACLE_ITER = """
lsum{t} AS (
    SELECT lang, CAST(SUM(CAST(n_tokens * m AS DECIMAL(38,18))) AS DOUBLE) AS cur
    FROM cells{p} GROUP BY lang
),
rowscaled{t} AS (
    SELECT c.lang, c.source, c.n_tokens,
           c.m * ((t.total * 1.0 / t.n_langs) / l.cur) AS m
    FROM cells{p} c JOIN lsum{t} l USING (lang), tot t
),
ssum{t} AS (
    SELECT source, CAST(SUM(CAST(n_tokens * m AS DECIMAL(38,18))) AS DOUBLE) AS cur
    FROM rowscaled{t} GROUP BY source
),
cells{t} AS (
    SELECT r.lang, r.source, r.n_tokens, r.m * (s.src_tokens / ss.cur) AS m
    FROM rowscaled{t} r JOIN src s USING (source) JOIN ssum{t} ss USING (source)
)"""

_IPF_ORACLE = (
    f"""
WITH cells0 AS (
    SELECT lang, source,
           CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT)
               AS n_tokens,
           1.0 AS m
    FROM documents GROUP BY lang, source
    HAVING SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) > 0
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM cells0
),
src AS (
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
    FROM cells0 GROUP BY source
),"""
    + ",".join(
        _IPF_ORACLE_ITER.format(t=t, p=t - 1) for t in range(1, _IPF_ITERS + 1)
    )
    + f""",
lfin AS (
    SELECT lang, CAST(SUM(CAST(n_tokens * m AS DECIMAL(38,18))) AS DOUBLE) AS cur
    FROM cells{_IPF_ITERS} GROUP BY lang
)
SELECT c.lang, c.source, c.n_tokens,
       ROUND(c.m, 6) AS weight,
       ROUND(c.n_tokens * c.m, 6) AS alloc_tokens,
       ROUND(l.cur / (t.total * 1.0 / t.n_langs), 6) AS lang_residual
FROM cells{_IPF_ITERS} c JOIN lfin l USING (lang), tot t
ORDER BY c.lang, c.source
"""
)


@register("doc_mixture_ipf", _IPF_ORACLE)
def doc_mixture_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D data-mixture rebalancing (iterative proportional fitting /
    Sinkhorn scaling): per-(lang, source) sampling weights that steer the
    corpus toward a UNIFORM language marginal while each source keeps
    contributing exactly its available token mass — ``_IPF_ITERS``
    alternating row/column sweeps, ending on the source scaling so source
    totals hold exactly and ``lang_residual`` reports how far each
    language's marginal still sits from target (the convergence audit; 1.0
    = converged). The weight column is the multiplier a 2-D mixture
    sampler applies per cell.

    Scale: ONE corpus shuffle (the lang x source rollup); the sweeps are
    ``operators/mixtures.py::ipf_weights`` — the reusable function a
    mixture recipe calls on ANY contingency rollup (fuzzed against a
    pure-numpy twin) — each aggregating and rescaling the tiny cell table
    (languages x domains) with 1-row totals broadcast back. DECIMAL-folded
    marginal sums keep the scale factors order-independent across engines.
    """
    from ..operators.mixtures import ipf_weights

    d = _docs(spark, sf_dir).select(
        "lang", "source", F.size(_tokens()).cast("long").alias("n_toks")
    )
    cells = d.groupBy("lang", "source").agg(F.sum("n_toks").alias("n_tokens"))
    return (
        ipf_weights(cells, _IPF_ITERS)
        .select(
            "lang",
            "source",
            "n_tokens",
            F.round("weight", 6).alias("weight"),
            F.round("alloc_tokens", 6).alias("alloc_tokens"),
            F.round("row_residual", 6).alias("lang_residual"),
        )
        .orderBy("lang", "source")
    )


# --- data-constrained epoch planning (Muennighoff et al. 2023, public) ---------------
# Given a training budget larger than the corpus, how many EPOCHS of each
# source should the sampler schedule? Temperature-flattened weights
# (alpha = 0.5: w_s ∝ sqrt(tokens_s)) allocate the budget; sources whose
# allocation exceeds the repetition cap (4 epochs — past which repeated
# data stops helping, the paper's headline result) are capped and the
# remainder redistributes over the uncapped sources in one pass. A source
# pushed past the cap BY the redistribution is flagged (`recap_needed`)
# rather than silently re-capped — the iterative fixpoint is the sampler's
# job; this query is the audit-friendly plan.

_EPOCH_BUDGET_X = 3.8  # training budget as a multiple of corpus tokens
_EPOCH_CAP = 4.0  # max useful epochs per source

_EPOCH_ORACLE = f"""
WITH per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE) AS denom
    FROM per_source
),
alloc AS (
    SELECT source, n_docs, n_tokens,
           sqrt(CAST(n_tokens AS DOUBLE)) / denom AS mix_weight,
           (sqrt(CAST(n_tokens AS DOUBLE)) / denom) * (total_tokens * {_EPOCH_BUDGET_X})
               / n_tokens AS epochs_raw
    FROM per_source, tot
),
flagged AS (
    SELECT *, epochs_raw > {_EPOCH_CAP} AS capped FROM alloc
),
rem AS (
    SELECT CAST(COALESCE(SUM(CASE WHEN capped THEN n_tokens END), 0) AS BIGINT) AS capped_tokens,
           CAST(COALESCE(SUM(CASE WHEN NOT capped
                THEN CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,18)) END), 0) AS DOUBLE)
               AS denom2
    FROM flagged
)
SELECT source, n_docs, n_tokens,
       ROUND(mix_weight, 6) AS mix_weight,
       capped,
       ROUND(CASE WHEN capped THEN {_EPOCH_CAP} * n_tokens
             ELSE sqrt(CAST(n_tokens AS DOUBLE)) / denom2
                  * (total_tokens * {_EPOCH_BUDGET_X} - {_EPOCH_CAP} * capped_tokens)
             END, 6) AS final_tokens,
       ROUND(CASE WHEN capped THEN {_EPOCH_CAP}
             ELSE sqrt(CAST(n_tokens AS DOUBLE)) / denom2
                  * (total_tokens * {_EPOCH_BUDGET_X} - {_EPOCH_CAP} * capped_tokens)
                  / n_tokens END, 6) AS final_epochs,
       (NOT capped) AND sqrt(CAST(n_tokens AS DOUBLE)) / denom2
           * (total_tokens * {_EPOCH_BUDGET_X} - {_EPOCH_CAP} * capped_tokens)
           / n_tokens > {_EPOCH_CAP} AS recap_needed
FROM flagged, tot, rem
ORDER BY source
"""


@register("doc_source_epoch_plan", _EPOCH_ORACLE)
def doc_source_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch plan for a data-constrained training run
    (Muennighoff et al. 2023): temperature-flattened weights
    (w_s ∝ sqrt(tokens_s)) split a budget of ``_EPOCH_BUDGET_X`` x the
    corpus; sources allocated past ``_EPOCH_CAP`` epochs cap there and the
    remainder redistributes across uncapped sources in ONE pass
    (``recap_needed`` flags any source the redistribution itself pushes
    past the cap — the fixpoint loop belongs to the sampler, the audit
    belongs here).

    Scale: one shuffle (the source rollup); every later stage is
    source-cardinality (domains, not documents) with 1-row totals joined
    back by broadcast. The sqrt-weight sums fold in DECIMAL(38,18) so both
    engines see order-independent denominators.
    """
    d = _docs(spark, sf_dir).select(
        "source", F.size(_tokens()).cast("long").alias("n_toks")
    )
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("n_tokens")
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(38,18)"))
        .cast("double")
        .alias("denom"),
    )
    sq = F.sqrt(F.col("n_tokens").cast("double"))
    budget = F.col("total_tokens") * _EPOCH_BUDGET_X
    flagged = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "total_tokens",
        (sq / F.col("denom")).alias("mix_weight"),
        ((sq / F.col("denom")) * budget / F.col("n_tokens") > _EPOCH_CAP).alias(
            "capped"
        ),
    )
    rem = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("n_tokens"))), F.lit(0)
        ).alias("capped_tokens"),
        F.coalesce(
            F.sum(F.when(~F.col("capped"), sq.cast("decimal(38,18)"))),
            F.lit(0).cast("decimal(38,18)"),
        )
        .cast("double")
        .alias("denom2"),
    )
    b_rem = (
        F.col("total_tokens") * _EPOCH_BUDGET_X - _EPOCH_CAP * F.col("capped_tokens")
    )
    final_tokens = F.when(
        F.col("capped"), F.lit(_EPOCH_CAP) * F.col("n_tokens")
    ).otherwise(sq / F.col("denom2") * b_rem)
    final_epochs = F.when(F.col("capped"), F.lit(_EPOCH_CAP)).otherwise(
        sq / F.col("denom2") * b_rem / F.col("n_tokens")
    )
    return (
        flagged.crossJoin(F.broadcast(rem))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("mix_weight", 6).alias("mix_weight"),
            "capped",
            F.round(final_tokens, 6).alias("final_tokens"),
            F.round(final_epochs, 6).alias("final_epochs"),
            (
                ~F.col("capped")
                & (sq / F.col("denom2") * b_rem / F.col("n_tokens") > _EPOCH_CAP)
            ).alias("recap_needed"),
        )
        .orderBy("source")
    )


# --- epoch-plan FIXPOINT (the allocation the sampler actually schedules) --------------
# The one-pass query above flags `recap_needed` and leaves the fixpoint to
# the sampler. The iterative fixpoint (cap -> redistribute -> re-cap until no
# flag) is provably <= n_sources rounds, but it does NOT need iteration:
# under sqrt-flattened weights a source s gets epochs lambda/sqrt(t_s), so it
# caps iff sqrt(t_s) < lambda/cap — the capped set is a PREFIX of sources
# sorted by token count ascending (small sources repeat more and cap first),
# and the multiplier lambda is monotone in the capped prefix (capping a
# source frees less budget than its share, so lambda only grows; capped
# sources stay capped). Water-filling: one window pass over the sorted
# source table finds the unique boundary k* where
#   lambda_k = (B - cap*T_k) / (S - S_k)      (T_k, S_k = prefix sums)
# caps exactly the first k sources — no loop, no recursion, identical SQL.
# Feasible while budget_x < cap (all-capped would allocate cap*T > B).

if _EPOCH_BUDGET_X >= _EPOCH_CAP:  # not an assert: must survive python -O
    raise ValueError(
        "epoch fixpoint requires budget_x < cap (otherwise every source caps "
        "and the boundary search has no uncapped remainder)"
    )

_EPOCH_FIXPOINT_ORACLE = f"""
WITH per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
pool AS (SELECT * FROM per_source WHERE n_tokens > 0),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE) AS sqrt_total
    FROM pool
),
ordered AS (
    SELECT n_tokens,
           sqrt(CAST(n_tokens AS DOUBLE)) AS sq,
           CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,18))) OVER w AS DOUBLE)
               AS cum_sqrt,
           LEAD(sqrt(CAST(n_tokens AS DOUBLE))) OVER (ORDER BY n_tokens, source) AS next_sq
    FROM pool
    WINDOW w AS (ORDER BY n_tokens, source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cand AS (
    -- NULLIF: the all-capped boundary (k = n) divides by exactly zero (the
    -- DECIMAL prefix sum is exact); NULL fails both comparisons, so the
    -- infeasible candidate drops without an engine-specific div-by-zero
    SELECT (t.total_tokens * {_EPOCH_BUDGET_X} - {_EPOCH_CAP} * o.cum_tokens)
               / NULLIF(t.sqrt_total - o.cum_sqrt, 0) AS lam
    FROM ordered o, tot t
    WHERE (t.total_tokens * {_EPOCH_BUDGET_X} - {_EPOCH_CAP} * o.cum_tokens)
              / NULLIF(t.sqrt_total - o.cum_sqrt, 0) > {_EPOCH_CAP} * o.sq
      AND (o.next_sq IS NULL
           OR (t.total_tokens * {_EPOCH_BUDGET_X} - {_EPOCH_CAP} * o.cum_tokens)
                  / NULLIF(t.sqrt_total - o.cum_sqrt, 0) <= {_EPOCH_CAP} * o.next_sq)
),
lam AS (
    SELECT COALESCE((SELECT MAX(lam) FROM cand),
                    (SELECT total_tokens * {_EPOCH_BUDGET_X} / sqrt_total FROM tot)) AS lam
)
SELECT p.source, p.n_docs, p.n_tokens,
       ROUND(sqrt(CAST(p.n_tokens AS DOUBLE)) / t.sqrt_total, 6) AS mix_weight,
       l.lam > {_EPOCH_CAP} * sqrt(CAST(p.n_tokens AS DOUBLE)) AS capped,
       ROUND(CASE WHEN l.lam > {_EPOCH_CAP} * sqrt(CAST(p.n_tokens AS DOUBLE))
             THEN {_EPOCH_CAP} * p.n_tokens
             ELSE l.lam * sqrt(CAST(p.n_tokens AS DOUBLE)) END, 6) AS final_tokens,
       ROUND(CASE WHEN l.lam > {_EPOCH_CAP} * sqrt(CAST(p.n_tokens AS DOUBLE))
             THEN {_EPOCH_CAP}
             ELSE l.lam * sqrt(CAST(p.n_tokens AS DOUBLE)) / p.n_tokens END, 6)
           AS final_epochs
FROM pool p, tot t, lam l
ORDER BY p.source
"""


@register("doc_source_epoch_fixpoint", _EPOCH_FIXPOINT_ORACLE)
def doc_source_epoch_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch allocation a sampler actually schedules: the FIXPOINT of
    cap→redistribute→re-cap (``doc_source_epoch_plan`` is the one-pass audit
    view that flags ``recap_needed`` instead). Computed closed-form as
    water-filling — sources sorted ascending by token count, prefix sums
    locate the unique boundary where the redistribution multiplier caps
    exactly the prefix — so no iteration and no recursion anywhere; the
    naive iterative loop provably converges to the same allocation
    (``tests/test_packing.py`` asserts equality), every capped source sits
    exactly at the cap, no uncapped source exceeds it, and the budget is
    conserved to the last token.

    Scale: one shuffle (the source rollup); the fixpoint itself is
    ``operators/epochs.py::epoch_fixpoint`` — the reusable function a
    sampler calls on ANY (source, n_tokens) rollup — whose window pass and
    totals run over the source-cardinality table (domains, not documents —
    the same deliberate single-partition-over-a-histogram trade as
    ``doc_pack_harmonic``), with the 1-row (total, lambda) frame broadcast
    back. Prefix sums of sqrt weights fold in DECIMAL(38,18) so both
    engines see identical boundaries.
    """
    from ..operators.epochs import epoch_fixpoint

    d = _docs(spark, sf_dir).select(
        "source", F.size(_tokens()).cast("long").alias("n_toks")
    )
    pool = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("n_tokens")
    )
    return (
        epoch_fixpoint(pool, _EPOCH_BUDGET_X, _EPOCH_CAP)
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("mix_weight", 6).alias("mix_weight"),
            "capped",
            F.round("final_tokens", 6).alias("final_tokens"),
            F.round("final_epochs", 6).alias("final_epochs"),
        )
        .orderBy("source")
    )


# --- composed plan: epoch fixpoint x IPF (2-D water-filling) --------------------------
# doc_source_epoch_fixpoint caps each SOURCE's budget; doc_mixture_ipf
# rebalances lang x source cells toward a uniform language marginal against
# RAW availability. A pipeline owner runs the two as ONE recipe: epoch-
# expand each cell's mass by its source's fixpoint multiplier (so per-source
# totals are exactly the capped final_tokens), then IPF over the expanded
# contingency table. Conservation composes: IPF's final column sweep holds
# source totals at final_tokens exactly, and the fixpoint conserves the
# budget, so sum(alloc_tokens) == budget_x * corpus — end to end (pinned by
# tests/test_epoch_ipf.py). Masses are scaled to integer MICRO-tokens
# before the sweeps so every marginal sum stays order-independent across
# engines — the proven integer-mass regime of doc_mixture_ipf.

_MICRO = 1_000_000


def _epoch_ipf_oracle() -> str:
    x, cap, micro = _EPOCH_BUDGET_X, _EPOCH_CAP, _MICRO
    sq = "sqrt(CAST(p.n_tokens AS DOUBLE))"
    fixpoint = f"""
rawcells AS (
    SELECT lang, source,
           CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT)
               AS cell_tokens
    FROM documents GROUP BY lang, source
    HAVING SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) > 0
),
pool AS (
    SELECT source, CAST(SUM(cell_tokens) AS BIGINT) AS n_tokens
    FROM rawcells GROUP BY source
),
tot0 AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE) AS sqrt_total
    FROM pool
),
ordered AS (
    SELECT n_tokens,
           sqrt(CAST(n_tokens AS DOUBLE)) AS sq,
           CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,18))) OVER w AS DOUBLE)
               AS cum_sqrt,
           LEAD(sqrt(CAST(n_tokens AS DOUBLE))) OVER (ORDER BY n_tokens, source) AS next_sq
    FROM pool
    WINDOW w AS (ORDER BY n_tokens, source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cand AS (
    SELECT (t.total_tokens * {x} - {cap} * o.cum_tokens)
               / NULLIF(t.sqrt_total - o.cum_sqrt, 0) AS lam
    FROM ordered o, tot0 t
    WHERE (t.total_tokens * {x} - {cap} * o.cum_tokens)
              / NULLIF(t.sqrt_total - o.cum_sqrt, 0) > {cap} * o.sq
      AND (o.next_sq IS NULL
           OR (t.total_tokens * {x} - {cap} * o.cum_tokens)
                  / NULLIF(t.sqrt_total - o.cum_sqrt, 0) <= {cap} * o.next_sq)
),
lamv AS (
    SELECT COALESCE((SELECT MAX(lam) FROM cand),
                    (SELECT total_tokens * {x} / sqrt_total FROM tot0)) AS lam
),
fx AS (
    SELECT p.source,
           l.lam > {cap} * {sq} AS capped,
           CASE WHEN l.lam > {cap} * {sq} THEN {cap}
                ELSE l.lam * {sq} / p.n_tokens END AS final_epochs
    FROM pool p, lamv l
),
cells0 AS (
    SELECT r.lang, r.source,
           CAST(ROUND(r.cell_tokens * f.final_epochs * {micro}) AS BIGINT) AS n_tokens,
           1.0 AS m
    FROM rawcells r JOIN fx f USING (source)
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM cells0
),
src AS (
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
    FROM cells0 GROUP BY source
),"""
    sweeps = ",".join(
        _IPF_ORACLE_ITER.format(t=t, p=t - 1) for t in range(1, _IPF_ITERS + 1)
    )
    return (
        "WITH "
        + fixpoint
        + sweeps
        + f""",
lfin AS (
    SELECT lang, CAST(SUM(CAST(n_tokens * m AS DECIMAL(38,18))) AS DOUBLE) AS cur
    FROM cells{_IPF_ITERS} GROUP BY lang
)
SELECT c.lang, c.source, r.cell_tokens AS n_tokens, f.capped,
       ROUND(f.final_epochs, 6) AS epoch_mult,
       ROUND(c.n_tokens / {micro}.0, 6) AS epoch_tokens,
       ROUND(c.m, 6) AS weight,
       ROUND(c.n_tokens * c.m / {micro}.0, 6) AS alloc_tokens,
       ROUND(l.cur / (t.total * 1.0 / t.n_langs), 6) AS lang_residual
FROM cells{_IPF_ITERS} c
JOIN rawcells r USING (lang, source)
JOIN fx f USING (source)
JOIN lfin l USING (lang), tot t
ORDER BY c.lang, c.source
"""
    )


@register("doc_epoch_ipf_plan", _epoch_ipf_oracle())
def doc_epoch_ipf_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed sampling plan a pipeline owner actually schedules —
    2-D water-filling: the per-source epoch FIXPOINT (Muennighoff-style
    cap-and-redistribute, ``operators/epochs.py``) sets how many tokens
    each source may contribute under the repetition cap; IPF
    (``operators/mixtures.py``) then rebalances the epoch-expanded
    lang x source table toward a uniform language marginal while holding
    every source total exactly at its capped budget (the final sweep is
    the source scaling). ``alloc_tokens`` therefore conserves the training
    budget end to end: per-source sums equal the fixpoint's
    ``final_tokens``, and the grand total equals budget_x x corpus
    (invariants pinned by ``tests/test_epoch_ipf.py``).

    Scale: ONE corpus shuffle (the lang x source rollup); the fixpoint
    window runs over the source-cardinality table and the IPF sweeps touch
    only the tiny cell table with 1-row totals broadcast back — both
    reusable operators unchanged. Cell masses scale to integer
    micro-tokens before the sweeps so every marginal fold is
    order-independent across engines and partitionings.
    """
    from ..operators.epochs import epoch_fixpoint
    from ..operators.mixtures import ipf_weights

    d = _docs(spark, sf_dir).select(
        "lang", "source", F.size(_tokens()).cast("long").alias("n_toks")
    )
    rawcells = (
        d.groupBy("lang", "source")
        .agg(F.sum("n_toks").alias("cell_tokens"))
        .where(F.col("cell_tokens") > 0)
    )
    pool = rawcells.groupBy("source").agg(F.sum("cell_tokens").alias("n_tokens"))
    fx = epoch_fixpoint(pool, _EPOCH_BUDGET_X, _EPOCH_CAP).select(
        "source", "capped", "final_epochs"
    )
    cells = rawcells.join(F.broadcast(fx), "source").select(
        "lang",
        "source",
        "cell_tokens",
        "capped",
        "final_epochs",
        F.round(F.col("cell_tokens") * F.col("final_epochs") * _MICRO)
        .cast("bigint")
        .alias("mass_micro"),
    )
    return (
        ipf_weights(
            cells, _IPF_ITERS, row_key="lang", col_key="source", value_col="mass_micro"
        )
        .select(
            "lang",
            "source",
            F.col("cell_tokens").alias("n_tokens"),
            "capped",
            F.round("final_epochs", 6).alias("epoch_mult"),
            F.round(F.col("mass_micro") / _MICRO, 6).alias("epoch_tokens"),
            F.round("weight", 6).alias("weight"),
            F.round(F.col("alloc_tokens") / _MICRO, 6).alias("alloc_tokens"),
            F.round("row_residual", 6).alias("lang_residual"),
        )
        .orderBy("lang", "source")
    )


# --- cross-document repeated n-gram (boilerplate) coverage ---------------------------

_GRAM_K = 5
_GRAM_MIN_DOCS = 2

_BOILERPLATE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
),
grams AS (
    SELECT doc_id, {h60_sql_duckdb("unnest(list_distinct(list_transform(" +
        f"generate_series(1, len(t) - {_GRAM_K - 1}), i -> array_to_string(t[i:i+{_GRAM_K - 1}], ' '))))")} AS gh
    FROM toks WHERE len(t) >= {_GRAM_K}
),
rep AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= {_GRAM_MIN_DOCS}),
per_doc AS (
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE g.gh IN (SELECT gh FROM rep)) AS BIGINT) AS n_repeated
    FROM grams g GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_repeated, n_repeated * 1.0 / n_grams AS boilerplate_ratio
FROM per_doc
ORDER BY doc_id
"""


def _gram_hashes(toks: Column, k: int) -> Column:
    """Distinct word-k-gram 60-bit hashes via a zip_with chain over shifted
    slices (same construction as text.py::_shingles_df, generalized to any k —
    positional indexing in a lambda defeats codegen, slices don't)."""
    n = F.size(toks) - (k - 1)
    acc = F.slice(toks, 1, n)
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(toks, j + 1, n), lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(F.transform(acc, h60))


@register("doc_boilerplate_ngrams", _BOILERPLATE_ORACLE, extra=True)
def doc_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate coverage: the fraction of a document's
    distinct word-5-grams that also appear in >= 2 distinct documents —
    the span-level signal behind "remove repeated header/footer text" filters.

    The only data that shuffles is (gram-hash, doc_id): once to count
    documents per gram, once to re-aggregate per document. Gram strings are
    hashed BEFORE the explode, so exploded rows are 16 bytes of key, not text.
    """
    d = _docs(spark, sf_dir)
    toks = _tokens()
    grams = d.select("doc_id", _gram_hashes(toks, _GRAM_K).alias("ghs")).where(
        F.size(toks) >= _GRAM_K
    )
    exploded = grams.select("doc_id", F.explode("ghs").alias("gh"))
    # grams are array_distinct per doc, so each doc contributes a gram at
    # most once and plain COUNT == COUNT(DISTINCT doc_id) — skipping
    # count_distinct's two-Exchange expansion (partial on (gh, doc_id),
    # then on gh); the oracle keeps the DISTINCT spelling
    rep = (
        exploded.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= _GRAM_MIN_DOCS)
        .select("gh")
    )
    flagged = exploded.join(rep, "gh", "left_semi")
    per_doc = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    rep_per_doc = flagged.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_repeated"))
    return (
        per_doc.join(rep_per_doc, "doc_id", "left")
        .na.fill({"n_repeated": 0})
        .select(
            "doc_id",
            "n_grams",
            "n_repeated",
            (F.col("n_repeated") * 1.0 / F.col("n_grams")).alias("boilerplate_ratio"),
        )
        .orderBy("doc_id")
    )


# --- per-source document cap ---------------------------------------------------------

_SOURCE_CAP = 10  # max docs kept per source (prefer longest)

_SOURCE_CAP_ORACLE = f"""
WITH ranked AS (
    SELECT doc_id, source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rank_in_source
    FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rank_in_source AS BIGINT) AS rank_in_source
FROM ranked WHERE rank_in_source <= {_SOURCE_CAP}
ORDER BY source, doc_id
"""


@register("doc_source_cap", _SOURCE_CAP_ORACLE, extra=True)
def doc_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source (domain) at N documents, preferring the longest — the
    "no single domain dominates the mix" pass that runs alongside
    ``source_mixing_weights`` (that op reweights, this one hard-limits).

    The window is PARTITIONED by source, so each domain ranks only its own
    rows — the same shape as ``doc_token_budget_sample``, no global sort. At
    100 TB a pathologically hot domain still sorts all its rows to rank them;
    when the cap <<< domain size, swap the exact rank for a per-source
    ``approx_percentile(n_chars, 1 - cap/count)`` length threshold (the
    ``customer_balance_ranks_scaled`` pattern) and keep this form for the
    exact audit.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source", "n_chars")
        .withColumn("rank_in_source", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank_in_source") <= _SOURCE_CAP)
        .orderBy("source", "doc_id")
    )


# --- corpus-unigram cross-entropy (perplexity-proxy) scoring -------------------------

_LM_ORACLE = f"""
WITH th AS (
    SELECT doc_id, {h60_sql_duckdb("unnest(regexp_extract_all(lower(text), '" + TOKEN_RE + "'))")} AS wh
    FROM documents
),
freq AS (SELECT wh, COUNT(*) AS cnt FROM th GROUP BY wh),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
scored AS (
    SELECT t.doc_id,
           CAST(-ln(CAST(f.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE))
                AS DECIMAL(38,18)) AS nl
    FROM th t JOIN freq f USING (wh), tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(nl) AS DOUBLE) / COUNT(*) AS cross_entropy_nats
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


@register("doc_unigram_logprob", _LM_ORACLE, extra=True)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained unigram LM (mean
    ``-ln p(token)`` in nats) — the perplexity-filtering signal quality
    pipelines threshold on (CCNet-style), and the corpus-level complement to
    the in-row ``doc_token_entropy``.

    Tokens are 60-bit-hashed BEFORE the explode, so both shuffles (the
    vocabulary count and the per-doc re-aggregation) carry longs, never token
    text. The vocabulary table is vocab-scale, not corpus-scale — at 100 TB
    it broadcasts (or AQE converts the join); the 1-row token total always
    broadcasts. The per-token log-probs are summed as DECIMAL(38,18), making
    the per-doc sum exact and order-independent — bit-identical across
    partitionings and engines.
    """
    th = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_tokens()).alias("w"))
        .select("doc_id", h60(F.col("w")).alias("wh"))
    )
    freq = th.groupBy("wh").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("total"))
    neg_logp = -F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
    return (
        th.join(freq, "wh")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(neg_logp.cast("decimal(38,18)")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("_s").cast("double") / F.col("n_tokens")).alias("cross_entropy_nats"),
        )
        .orderBy("doc_id")
    )


# --- deterministic training-shard export ---------------------------------------------

_N_SHARDS = 8

_SHARD_ORACLE = f"""
WITH assigned AS (
    SELECT doc_id,
           {h60_sql_duckdb("'shard' || CAST(doc_id AS VARCHAR)")} % {_N_SHARDS} AS shard,
           {h60_sql_duckdb("'order' || CAST(doc_id AS VARCHAR)")} AS order_key,
           len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens
    FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       CAST(arg_min(doc_id, order_key) AS BIGINT) AS first_doc_id,
       CAST(arg_max(doc_id, order_key) AS BIGINT) AS last_doc_id
FROM assigned
GROUP BY shard
ORDER BY shard
"""


@register("doc_export_shards", _SHARD_ORACLE, extra=True)
def doc_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest for the deterministic training export
    (operators/sharding.py): per-shard doc/token totals plus the first and
    last documents of the pseudo-shuffle order. first/last_doc_id pin the
    ORDER of each shard, not just its membership — if either drifts, a rerun
    would feed training a different sequence.

    Assignment is map-only (hash of doc_id); the manifest itself is one
    8-group aggregation with map-side combine."""
    from ..operators.sharding import shard_assignment

    d = _docs(spark, sf_dir)
    assigned = shard_assignment(
        d.select("doc_id", F.size(_tokens()).alias("n_tokens")), _N_SHARDS
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
            F.min_by("doc_id", "order_key").alias("first_doc_id"),
            F.max_by("doc_id", "order_key").alias("last_doc_id"),
        )
        .orderBy("shard")
    )


# --- cross-document exact repeated spans (substring-level dedup) ---------------------

# window width in tokens: a span must repeat VERBATIM for >= _SPAN_W tokens
# across >= 2 distinct documents to be reported (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better", uses 50 BPE
# tokens at corpus scale; 8 word-tokens keeps the synthetic fixture's
# boilerplate sentences detectable)
_SPAN_W = 8

_SPAN_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
),
pos AS (
    SELECT doc_id, i AS pos,
           {h60_sql_duckdb(f"array_to_string(list_slice(t, i, i + {_SPAN_W} - 1), ' ')")} AS gh
    FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_W} + 1)) AS u(i)
    WHERE len(t) >= {_SPAN_W}
),
rep AS (SELECT gh FROM pos GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT p.doc_id, p.pos FROM pos p JOIN rep USING (gh)),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_SPAN_W}
                THEN 1 ELSE 0 END AS brk
    FROM hits
),
isl2 AS (
    SELECT doc_id, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM isl
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SPAN_W} - 1 AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {_SPAN_W} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl2
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


def _positional_gram_hashes(toks: Column, k: int) -> Column:
    """60-bit hash of the word-k-gram STARTING at each token position
    (1-based, ``size - k + 1`` entries) — ``_gram_hashes`` without the
    ``array_distinct``, because span merging needs every position.

    Clamped at 0 so a doc shorter than k yields an empty array instead of a
    negative-length slice error: callers filter ``size >= k``, but Spark may
    evaluate the projection for rows the filter will drop."""
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    acc = F.slice(toks, 1, n)
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(toks, j + 1, n), lambda a, b: F.concat_ws(" ", a, b))
    return F.transform(acc, h60)


@register("doc_repeated_spans", _SPAN_ORACLE, extra=True)
def doc_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document VERBATIM repeated spans: for every document,
    the merged token ranges covered by >= ``_SPAN_W``-token windows that also
    appear verbatim in at least one OTHER document. This is the span-level
    exact-substring dedup of Lee et al. 2022 (their suffix-array pass),
    re-expressed as a rolling-window pipeline Spark can distribute:
    ``doc_boilerplate_ngrams`` counts how much of a doc is repeated; this op
    says exactly WHERE, so a cleaning pass can cut the spans.

    Plan: per-doc window hashes are built by the same zip_with slice chain as
    ``_gram_hashes`` (codegen, no UDF) and hashed BEFORE posexplode, so the
    two shuffles (window-hash -> doc count; doc_id -> island merge) carry
    16-byte keys, never text. Island merging is a lag/cumsum window
    PARTITIONED by doc_id — no global sort. At 100 TB: the gram-hash
    aggregation is the big shuffle and it is map-side-combinable; the
    suffix-array alternative needs a global order and does not distribute.
    The gram pipeline is computed once per BRANCH (hits + rep; visible as
    two scans in the plan): recompute is map-only CPU, which beats
    materializing a corpus-token-scale exploded intermediate — and the CPU
    term itself is dominated by the oracle-parity md5 in ``h60`` (swap
    ``functions.hashing.h60_fast`` [xxhash64] in deployments that don't
    need a DuckDB twin).
    A window at position p covers tokens [p, p+W-1], so two hit positions
    belong to one span iff they differ by <= W.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = _tokens()
    grams = d.select("doc_id", _positional_gram_hashes(toks, _SPAN_W).alias("ghs")).where(
        F.size(toks) >= _SPAN_W
    )
    pos = grams.select(
        "doc_id", F.posexplode("ghs").alias("pos0", "gh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    # "appears in >= 2 distinct docs" == min(doc_id) != max(doc_id):
    # min/max aggregate in ONE shuffle where count_distinct expands to two
    # (partial on (gh, doc_id), then on gh); the oracle keeps the
    # COUNT(DISTINCT) spelling
    rep = (
        pos.groupBy("gh")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
        .select("gh")
    )
    hits = pos.join(rep, "gh", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "brk", F.when(F.col("pos") - F.lag("pos").over(w) > _SPAN_W, 1).otherwise(0)
    ).withColumn("island", F.sum("brk").over(w))
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + _SPAN_W - 1).cast("bigint").alias("span_end"),
            (F.max("pos") - F.min("pos") + _SPAN_W).cast("bigint").alias("span_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("island")
        .orderBy("doc_id", "span_start")
    )


_SPAN_COVERAGE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
),
pos AS (
    SELECT doc_id, i AS pos,
           {h60_sql_duckdb(f"array_to_string(list_slice(t, i, i + {_SPAN_W} - 1), ' ')")} AS gh
    FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_W} + 1)) AS u(i)
    WHERE len(t) >= {_SPAN_W}
),
rep AS (SELECT gh FROM pos GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT p.doc_id, p.pos FROM pos p JOIN rep USING (gh)),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_SPAN_W}
                THEN 1 ELSE 0 END AS brk
    FROM hits
),
isl2 AS (
    SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM isl
),
spans AS (
    SELECT doc_id, MAX(pos) - MIN(pos) + {_SPAN_W} AS span_tokens
    FROM isl2 GROUP BY doc_id, island
),
cov AS (SELECT doc_id, SUM(span_tokens) AS covered FROM spans GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(cov.covered, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(cov.covered, 0) AS DOUBLE) / len(t.t) AS dup_token_ratio
FROM toks t LEFT JOIN cov USING (doc_id)
WHERE len(t.t) >= {_SPAN_W}
ORDER BY t.doc_id
"""


@register("doc_span_dup_coverage", _SPAN_COVERAGE_ORACLE, extra=True)
def doc_span_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication coverage: the fraction of a document's tokens
    that sit inside a cross-document verbatim repeated span (the merged
    islands of :func:`doc_repeated_spans`) — the per-doc statistic the
    substring-dedup literature reports to pick a cut-or-keep threshold, and
    the positional complement of ``doc_boilerplate_ngrams``'s distinct-gram
    ratio (a 100x-repeated footer counts once there; here it covers its full
    token range in every doc that carries it).

    Same two text-free shuffles as ``doc_repeated_spans`` plus one per-doc
    re-aggregation; docs below the window width are excluded (coverage is
    undefined), docs with no repeated span report ratio 0.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = _tokens()
    grams = d.select(
        "doc_id", F.size(toks).alias("n_tokens"),
        _positional_gram_hashes(toks, _SPAN_W).alias("ghs"),
    ).where(F.size(toks) >= _SPAN_W)
    pos = grams.select(
        "doc_id", F.posexplode("ghs").alias("pos0", "gh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    # "appears in >= 2 distinct docs" == min(doc_id) != max(doc_id):
    # min/max aggregate in ONE shuffle where count_distinct expands to two
    # (partial on (gh, doc_id), then on gh); the oracle keeps the
    # COUNT(DISTINCT) spelling
    rep = (
        pos.groupBy("gh")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
        .select("gh")
    )
    hits = pos.join(rep, "gh", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "brk", F.when(F.col("pos") - F.lag("pos").over(w) > _SPAN_W, 1).otherwise(0)
    ).withColumn("island", F.sum("brk").over(w))
    covered = (
        islands.groupBy("doc_id", "island")
        .agg((F.max("pos") - F.min("pos") + _SPAN_W).alias("span_tokens"))
        .groupBy("doc_id")
        .agg(F.sum("span_tokens").alias("dup_tokens"))
    )
    return (
        grams.select("doc_id", "n_tokens")
        .join(covered, "doc_id", "left")
        .na.fill({"dup_tokens": 0})
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("dup_tokens").cast("bigint").alias("dup_tokens"),
            (F.col("dup_tokens") / F.col("n_tokens")).cast("double").alias("dup_token_ratio"),
        )
        .orderBy("doc_id")
    )


_SPAN_SCRUB_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
),
pos AS (
    SELECT doc_id, i AS pos,
           {h60_sql_duckdb(f"array_to_string(list_slice(t, i, i + {_SPAN_W} - 1), ' ')")} AS gh
    FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_W} + 1)) AS u(i)
    WHERE len(t) >= {_SPAN_W}
),
rep AS (SELECT gh FROM pos GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT p.doc_id, p.pos FROM pos p JOIN rep USING (gh)),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_SPAN_W}
                THEN 1 ELSE 0 END AS brk
    FROM hits
),
isl2 AS (
    SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM isl
),
spans AS (
    SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_SPAN_W} - 1 AS span_end
    FROM isl2 GROUP BY doc_id, island
),
covered AS (
    SELECT DISTINCT doc_id, p AS pos
    FROM spans, UNNEST(generate_series(span_start, span_end)) AS u(p)
),
tokpos AS (
    SELECT doc_id, i AS pos, t[i] AS tok
    FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
    WHERE len(t) >= {_SPAN_W}
),
kept AS (
    SELECT tp.doc_id, tp.pos, tp.tok
    FROM tokpos tp ANTI JOIN covered c USING (doc_id, pos)
),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) AS scrubbed
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       COALESCE(a.n_kept, 0) AS n_kept,
       {h60_sql_duckdb("COALESCE(a.scrubbed, '')")} AS scrubbed_hash
FROM toks t LEFT JOIN agg a USING (doc_id)
WHERE len(t.t) >= {_SPAN_W}
ORDER BY t.doc_id
"""


@register("doc_span_scrub", _SPAN_SCRUB_ORACLE, extra=True)
def doc_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning pass over :func:`doc_repeated_spans`: cut every
    cross-document repeated span out of every document and fingerprint what
    remains — (doc_id, n_tokens, n_kept, scrubbed_hash). This is the
    "remove repeated header/footer/license text everywhere" policy (cut ALL
    occurrences; compose with ``doc_cluster_best_keep`` when one canonical
    occurrence should survive), manifested as a hash so the oracle checks
    the reassembled TEXT, not just counts.

    Plan: the span pipeline as in ``doc_repeated_spans``; covered positions
    explode from the merged spans (duplication-scale, non-overlapping by
    construction); kept tokens anti-join on (doc_id, pos) and reassemble
    per doc via ``array_sort(collect_list(struct(pos, tok)))`` — the
    aggregation is shuffle-order-independent, so the hash is deterministic
    on any cluster size. The reassembly window is PARTITIONED by doc_id;
    token text crosses exactly one shuffle (the reassembly one — it must:
    the output is a function of the text), everything else moves hashes.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = _tokens()
    base = d.select("doc_id", toks.alias("toks")).where(F.size("toks") >= _SPAN_W)
    grams = base.select(
        "doc_id", _positional_gram_hashes(F.col("toks"), _SPAN_W).alias("ghs")
    )
    pos = grams.select(
        "doc_id", F.posexplode("ghs").alias("pos0", "gh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    rep = (
        pos.groupBy("gh")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
        .select("gh")
    )
    hits = pos.join(rep, "gh", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        hits.withColumn(
            "brk", F.when(F.col("pos") - F.lag("pos").over(w) > _SPAN_W, 1).otherwise(0)
        )
        .withColumn("island", F.sum("brk").over(w))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + _SPAN_W - 1).alias("e"))
    )
    covered = spans.select(
        "doc_id", F.explode(F.sequence("s", "e")).alias("pos")
    )
    tokpos = base.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tokpos.join(covered, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x["tok"]
            ),
        ).alias("scrubbed"),
    )
    return (
        base.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            h60(F.coalesce(F.col("scrubbed"), F.lit(""))).alias("scrubbed_hash"),
        )
        .orderBy("doc_id")
    )


# --- exact substring dedup at a tunable threshold (find-and-cut, keep-first) --------

# tunable length threshold in word-tokens (Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better" uses 50 BPE tokens; 12 keeps
# the synthetic fixture's duplicated passages detectable while staying above
# the vocabulary's chance-collision length). Deliberately != _SPAN_W so the
# two operators are observably independent knobs.
_CUT_L = 12


def _exact_cut_oracle(L: int) -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
),
pos AS (
    SELECT doc_id, i AS pos,
           {h60_sql_duckdb(f"array_to_string(list_slice(t, i, i + {L} - 1), ' ')")} AS gh
    FROM toks, UNNEST(generate_series(1, len(t) - {L} + 1)) AS u(i)
    WHERE len(t) >= {L}
),
ranked AS (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
    FROM pos
),
cuts AS (SELECT doc_id, pos FROM ranked WHERE rn >= 2),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {L}
                THEN 1 ELSE 0 END AS brk
    FROM cuts
),
isl2 AS (
    SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM isl
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {L} - 1 AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {L} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl2
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


def exact_substring_cut_spans(d: DataFrame, L: int = _CUT_L) -> DataFrame:
    """Exact substring dedup at a tunable length threshold L — the canonical
    find-and-cut method of Lee et al. 2022 (their ExactSubstr suffix-array
    pass), re-expressed so it distributes: every VERBATIM repeat of >= L
    tokens ANYWHERE in the corpus (other documents AND the same document —
    unlike :func:`doc_repeated_spans`, which only reports cross-document
    repeats) is found, the globally-first occurrence (smallest (doc_id, pos))
    is kept, and every later occurrence is reported as a cut span.

    Shape vs a suffix array: a suffix array needs one global order over all
    corpus suffixes — a non-distributing total sort. Anchor windows replace
    it: a repeat of length M >= L is exactly M-L+1 consecutive repeated
    L-token windows, so window-level keep-first + per-doc interval merge
    reconstructs the maximal cut regions with two keyed shuffles:

    1. row_number over (gh) — 60-bit gram hashes only, hashed BEFORE
       posexplode (text never crosses the exchange);
    2. the per-doc lag/cumsum island merge PARTITIONED by doc_id.

    At 100 TB the gh shuffle carries ~n_tokens fixed-width rows — the same
    volume as ``doc_repeated_spans``'s aggregation but in ONE exchange
    (row_number replaces the agg + semi-join pair), and per-key work is the
    sort of a duplicate group, bounded by duplication depth, not corpus size.
    """
    from pyspark.sql import Window

    toks = _tokens()
    grams = d.select("doc_id", _positional_gram_hashes(toks, L).alias("ghs")).where(
        F.size(toks) >= L
    )
    pos = grams.select("doc_id", F.posexplode("ghs").alias("pos0", "gh")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "gh"
    )
    wgh = Window.partitionBy("gh").orderBy("doc_id", "pos")
    cuts = (
        pos.withColumn("rn", F.row_number().over(wgh))
        .where(F.col("rn") >= 2)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        cuts.withColumn(
            "brk", F.when(F.col("pos") - F.lag("pos").over(w) > L, 1).otherwise(0)
        )
        .withColumn("island", F.sum("brk").over(w))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + L - 1).cast("bigint").alias("span_end"),
            (F.max("pos") - F.min("pos") + L).cast("bigint").alias("span_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("island")
        .orderBy("doc_id", "span_start")
    )


@register("doc_exact_substring_cuts", _exact_cut_oracle(_CUT_L), extra=True)
def doc_exact_substring_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`exact_substring_cut_spans` bound at L=``_CUT_L`` over the
    documents table — per document, the token ranges a find-and-cut pass
    removes (keep-first-globally semantics)."""
    return exact_substring_cut_spans(_docs(spark, sf_dir), _CUT_L)


_EXACT_SCRUB_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
),
pos AS (
    SELECT doc_id, i AS pos,
           {h60_sql_duckdb(f"array_to_string(list_slice(t, i, i + {_CUT_L} - 1), ' ')")} AS gh
    FROM toks, UNNEST(generate_series(1, len(t) - {_CUT_L} + 1)) AS u(i)
    WHERE len(t) >= {_CUT_L}
),
ranked AS (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
    FROM pos
),
cuts AS (SELECT doc_id, pos FROM ranked WHERE rn >= 2),
covered AS (
    SELECT DISTINCT doc_id, p AS pos
    FROM cuts, UNNEST(generate_series(pos, pos + {_CUT_L} - 1)) AS u(p)
),
tokpos AS (
    SELECT doc_id, i AS pos, t[i] AS tok
    FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
    WHERE len(t) >= {_CUT_L}
),
kept AS (
    SELECT tp.doc_id, tp.pos, tp.tok
    FROM tokpos tp ANTI JOIN covered c USING (doc_id, pos)
),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) AS scrubbed
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       COALESCE(a.n_kept, 0) AS n_kept,
       {h60_sql_duckdb("COALESCE(a.scrubbed, '')")} AS scrubbed_hash
FROM toks t LEFT JOIN agg a USING (doc_id)
WHERE len(t.t) >= {_CUT_L}
ORDER BY t.doc_id
"""


@register("doc_exact_substring_scrub", _EXACT_SCRUB_ORACLE)
def doc_exact_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT applied: remove every later occurrence of a >= ``_CUT_L``-token
    repeat (keep-first-globally — the complement of ``doc_span_scrub``'s
    cut-ALL-occurrences policy) and fingerprint the surviving text. This is
    the Lee et al. 2022 cleaning pass end-to-end: the corpus that remains
    after find-and-cut, verified at the reassembled-TEXT level via the
    oracle's string hash, not just counts.

    Plan: the cut-window pipeline of :func:`exact_substring_cut_spans`
    (row_number over gram hashes — one fixed-width-key exchange), covered
    positions exploded from cut windows (duplication-scale), kept tokens by
    (doc_id, pos) anti-join, and a shuffle-order-independent reassembly via
    ``array_sort(collect_list(struct(pos, tok)))`` — token text crosses
    exactly one exchange (the reassembly, which any text-output operator
    must pay)."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = _tokens()
    base = d.select("doc_id", toks.alias("toks")).where(F.size(toks) >= _CUT_L)
    grams = base.select(
        "doc_id", _positional_gram_hashes(F.col("toks"), _CUT_L).alias("ghs")
    )
    pos = grams.select("doc_id", F.posexplode("ghs").alias("pos0", "gh")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "gh"
    )
    wgh = Window.partitionBy("gh").orderBy("doc_id", "pos")
    cuts = (
        pos.withColumn("rn", F.row_number().over(wgh))
        .where(F.col("rn") >= 2)
        .select("doc_id", "pos")
    )
    covered = cuts.select(
        "doc_id", F.explode(F.sequence("pos", F.col("pos") + _CUT_L - 1)).alias("pos")
    ).distinct()
    tokpos = base.select("doc_id", F.posexplode("toks").alias("pos0", "tok")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    kept = tokpos.join(covered, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x["tok"]
            ),
        ).alias("scrubbed"),
    )
    return (
        base.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            h60(F.coalesce(F.col("scrubbed"), F.lit(""))).alias("scrubbed_hash"),
        )
        .orderBy("doc_id")
    )


_INCR_CUT_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
),
pos AS (
    SELECT doc_id, i AS pos,
           {h60_sql_duckdb(f"array_to_string(list_slice(t, i, i + {_CUT_L} - 1), ' ')")} AS gh
    FROM toks, UNNEST(generate_series(1, len(t) - {_CUT_L} + 1)) AS u(i)
    WHERE len(t) >= {_CUT_L}
),
snap AS (SELECT DISTINCT gh FROM pos WHERE doc_id % {_SNAPSHOT_MOD} < {_SNAPSHOT_KEEP}),
hits AS (
    SELECT p.doc_id, p.pos FROM pos p
    WHERE p.doc_id % {_SNAPSHOT_MOD} >= {_SNAPSHOT_KEEP}
      AND p.gh IN (SELECT gh FROM snap)
),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_CUT_L}
                THEN 1 ELSE 0 END AS brk
    FROM hits
),
isl2 AS (
    SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM isl
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_CUT_L} - 1 AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {_CUT_L} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl2
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


@register("doc_incremental_substring_cuts", _INCR_CUT_ORACLE)
def doc_incremental_substring_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time substring dedup: spans in the NEW batch that repeat
    verbatim (>= ``_CUT_L`` tokens) against the frozen snapshot corpus —
    the incremental form of :func:`doc_exact_substring_cuts` a continuously
    fed pipeline runs nightly (snapshot/batch split by the same
    ``doc_id % 10 < 3`` convention as ``doc_incremental_dedup``).

    Why it exists: re-running corpus-wide find-and-cut per ingest is
    O(corpus) every night. Against a snapshot the per-ingest cost is
    O(batch tokens) map work + one semi-join probe of the batch's gram
    hashes against the snapshot gram set — both sides fixed-width longs.
    At 100 TB the snapshot gram set is written once as a bucketed index
    (the ``operators/scale.py::snapshot_dedup_index`` pattern, there for
    content hashes) so repeated ingests shuffle ONLY the batch; here the
    join form keeps the exact DuckDB twin. Batch-internal repeats are the
    batch-level operator's job — this pass answers "what does the new data
    repeat from what we already have".
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = _tokens()
    # ">= _CUT_L tokens" as an rlike on the raw text, not size(toks): the
    # size() filter substitutes through the projection and pushes below
    # parallelize_scan's exchange, re-running the full tokenization on the
    # ONE pre-repartition scan partition (the r13 _shingles_df lesson —
    # measured here as two serial 2.8 s scan tasks, one per consumer of
    # `pos`). "K maximal token runs exist" is an early-exit substring probe.
    min_k_runs = TOKEN_RE + ("[^a-z0-9]+" + TOKEN_RE) * (_CUT_L - 1)
    grams = d.where(F.lower(F.col("text")).rlike(min_k_runs)).select(
        "doc_id", _positional_gram_hashes(toks, _CUT_L).alias("ghs")
    )
    # `pos` feeds BOTH the snapshot gram set and the batch probe side; the
    # un-materialized plan re-tokenized + re-hashed the corpus once per
    # side (2 x ~10 s of executor work at sf0.1). Materialize the
    # fixed-width (doc_id, pos, gh) rows once (guide §5 — the at-100TB form
    # writes the snapshot grams as a bucketed at-rest index instead, per
    # the docstring; the checkpoint is the query-form analogue).
    pos = (
        grams.select("doc_id", F.posexplode("ghs").alias("pos0", "gh"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
        .localCheckpoint()
    )
    snap = (
        pos.where(F.col("doc_id") % _SNAPSHOT_MOD < _SNAPSHOT_KEEP)
        .select("gh")
        .distinct()
    )
    hits = (
        pos.where(F.col("doc_id") % _SNAPSHOT_MOD >= _SNAPSHOT_KEEP)
        .join(snap, "gh", "left_semi")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn(
            "brk", F.when(F.col("pos") - F.lag("pos").over(w) > _CUT_L, 1).otherwise(0)
        )
        .withColumn("island", F.sum("brk").over(w))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + _CUT_L - 1).cast("bigint").alias("span_end"),
            (F.max("pos") - F.min("pos") + _CUT_L).cast("bigint").alias("span_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("island")
        .orderBy("doc_id", "span_start")
    )


# --- per-source adaptive quality cut -------------------------------------------------

_ADAPTIVE_Q = 0.25  # drop the bottom quartile of each source

_ADAPTIVE_ORACLE = f"""
WITH stats AS (
    SELECT doc_id, source,
           len(list_filter(regexp_extract_all(lower(text), '{TOKEN_RE}'),
                           w -> w IN {{stopwords}})) * 1.0
             / NULLIF(len(regexp_extract_all(lower(text), '{TOKEN_RE}')), 0)
               AS stopword_ratio
    FROM documents
),
thr AS (
    SELECT source, quantile_cont(stopword_ratio, {_ADAPTIVE_Q}) AS source_q25
    FROM stats GROUP BY source
)
SELECT s.doc_id, s.source, s.stopword_ratio, t.source_q25,
       s.stopword_ratio >= t.source_q25 AS keep
FROM stats s JOIN thr t USING (source)
ORDER BY s.doc_id
"""


def _adaptive_oracle() -> str:
    from .text import STOPWORDS, _sql_in

    return _ADAPTIVE_ORACLE.replace("{stopwords}", _sql_in(STOPWORDS))


@register("doc_adaptive_quality_cut", _adaptive_oracle(), extra=True)
def doc_adaptive_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE quality threshold: drop each source's own bottom
    quartile by stopword ratio instead of applying one global cutoff — the
    curation policy for heterogeneous mixes, where a fixed threshold wipes
    out informal sources and lets a formal source's worst pages through.
    Complements ``doc_quality_filter`` (global heuristic score) and
    ``doc_source_cap`` (count cap): this one moves the BAR per source.

    Scale: the per-source thresholds are one groupBy with an exact
    interpolated ``percentile`` (== DuckDB ``quantile_cont``, the verified
    pairing from ``price_percentiles``) — swap ``approx_percentile`` at
    100 TB where the exact form's per-group sorted buffer hurts; thresholds
    are one row per source and broadcast back, so the corpus never
    shuffles — score, join, verdict are all map-side."""
    from .text import STOPWORDS

    d = _docs(spark, sf_dir)
    toks = _tokens()
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    ratio = n_stop * F.lit(1.0) / F.nullif(F.size(toks).cast("double"), F.lit(0.0))
    stats = d.select("doc_id", "source", ratio.alias("stopword_ratio"))
    thr = stats.groupBy("source").agg(
        F.expr(f"percentile(stopword_ratio, {_ADAPTIVE_Q})").alias("source_q25")
    )
    return (
        stats.join(F.broadcast(thr), "source")
        .select(
            "doc_id",
            "source",
            "stopword_ratio",
            "source_q25",
            (F.col("stopword_ratio") >= F.col("source_q25")).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --- DSIR-style importance resampling (data selection toward a target mix) -----------

# Hashed n-gram importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling", NeurIPS — public). A small
# "target" corpus defines the distribution we WANT; every raw-pool document
# gets an importance weight = log p_target(doc) - log p_raw(doc) under
# bag-of-hashed-unigram bucket LMs, then Gumbel-top-k gives a weighted sample
# WITHOUT replacement in one pass (Vieira 2014's Gumbel-max trick; the noise
# here is hash-derived so both engines draw identical "randomness").
_DSIR_TARGET_MOD = 7  # doc_id % 7 == 0 stands in for the curated target set
_DSIR_BUCKETS = 256  # hashed-feature buckets (DSIR uses 10k; fixture-sized here)
_DSIR_TOP_K = 200

_DSIR_U_DENOM = float((1 << 32) + 1)  # h32 in [0, 2^32) -> u = (h+1)/denom in (0,1)

_DSIR_ORACLE = f"""
WITH tok AS (
    SELECT doc_id,
           {h32_sql_duckdb("unnest(regexp_extract_all(lower(text), '" + TOKEN_RE + "'))")} % {_DSIR_BUCKETS} AS b
    FROM documents
),
tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tok
        WHERE doc_id % {_DSIR_TARGET_MOD} = 0 GROUP BY b),
rawp AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tok
         WHERE doc_id % {_DSIR_TARGET_MOD} <> 0 GROUP BY b),
tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tot_t FROM tgt),
tr AS (SELECT CAST(SUM(cr) AS BIGINT) AS tot_r FROM rawp),
scored AS (
    SELECT t.doc_id,
           CAST(ln((COALESCE(g.ct, 0) + 1.0) / (tt.tot_t + {_DSIR_BUCKETS}))
              - ln((COALESCE(r.cr, 0) + 1.0) / (tr.tot_r + {_DSIR_BUCKETS}))
                AS DECIMAL(38,18)) AS lr
    FROM tok t LEFT JOIN tgt g USING (b) LEFT JOIN rawp r USING (b), tt, tr
    WHERE t.doc_id % {_DSIR_TARGET_MOD} <> 0
),
docscore AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lr) AS DOUBLE) AS log_weight
    FROM scored GROUP BY doc_id
)
SELECT doc_id, n_tokens, log_weight,
       log_weight - ln(-ln(
           ({h32_sql_duckdb("'dsir-' || CAST(doc_id AS VARCHAR)")} + 1.0) / {_DSIR_U_DENOM!r}
       )) AS sample_key
FROM docscore
ORDER BY sample_key DESC, doc_id
LIMIT {_DSIR_TOP_K}
"""


@register("doc_dsir_sample", _DSIR_ORACLE, extra=True)
def doc_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: re-weight the raw pool toward a target
    corpus' hashed-unigram distribution, then draw a top-k weighted sample
    without replacement via deterministic Gumbel keys.

    Both bucket LMs are add-1 smoothed over _DSIR_BUCKETS buckets; a
    document's log-weight is the sum of its tokens' bucket log-ratios,
    accumulated as DECIMAL(38,18) so the sum is exact and
    order-independent (same discipline as ``doc_unigram_logprob``).
    Documents with zero tokens never enter the pool (no features = no
    weight), matching the paper's formulation.

    Scale (100 TB): tokens hash to bucket ids INSIDE the array before the
    explode (longs shuffle, never words); both LM tables are at most
    _DSIR_BUCKETS rows — broadcast joins regardless of corpus size — and
    the totals are 1-row broadcasts. Per-doc scoring is one partial-agg
    shuffle on doc_id, and the final selection is orderBy+limit =
    TakeOrderedAndProject (per-partition top-k, no global sort). The only
    corpus-scale shuffle is the per-doc aggregation; everything else is
    map-side.
    """
    tok = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.transform(_tokens(), lambda w: h32(w) % _DSIR_BUCKETS)).alias("b"),
    )
    is_target = F.col("doc_id") % _DSIR_TARGET_MOD == 0
    tgt = tok.where(is_target).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    rawp = tok.where(~is_target).groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tt = tgt.agg(F.sum("ct").alias("tot_t"))
    tr = rawp.agg(F.sum("cr").alias("tot_r"))
    lr = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("tot_t") + _DSIR_BUCKETS))
        - F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1.0) / (F.col("tot_r") + _DSIR_BUCKETS))
    ).cast("decimal(38,18)")
    docscore = (
        tok.where(~is_target)
        .join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(rawp), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum(lr).alias("_lw"))
        .select("doc_id", "n_tokens", F.col("_lw").cast("double").alias("log_weight"))
    )
    u = (h32(F.concat(F.lit("dsir-"), F.col("doc_id").cast("string"))) + 1.0) / F.lit(
        _DSIR_U_DENOM
    )
    return (
        docscore.withColumn("sample_key", F.col("log_weight") - F.log(-F.log(u)))
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(_DSIR_TOP_K)
    )


# --- BPE tokenizer training (iterative; pytest-verified reference twin) --------------

_BPE_NUM_MERGES = 24

# Training is deterministic per (fixture, merge budget) — ties break
# lexicographically, counts are exact — so the merge table is memoized:
# the trainer's 2-jobs-per-merge driver loop runs once per session however
# many queries consume the tokenizer (doc_bpe_merges, doc_bpe_fertility,
# repeated sweep calls).
_BPE_MERGE_CACHE: dict[tuple, list] = {}


def _trained_merges(spark: SparkSession, sf_dir: str) -> list:
    key = (sf_dir, _BPE_NUM_MERGES)
    if key not in _BPE_MERGE_CACHE:
        from ..operators.bpe import bpe_train

        _BPE_MERGE_CACHE[key] = bpe_train(_docs(spark, sf_dir), num_merges=_BPE_NUM_MERGES)
    return _BPE_MERGE_CACHE[key]


def _bpe_sym_ctes(num_merges: int, min_pair_count: int = 2) -> str:
    """Unroll the BPE trainer loop (operators/bpe.py::bpe_train) as chained
    MATERIALIZED CTEs: s{t} holds the symbolized word-count table after t
    merges, m{t} the t-th winning pair. The fold applying a merge wraps each
    symbol as a 1-element list so DuckDB's list_reduce (whose accumulator
    must match the element type) can rebuild the array exactly like Spark's
    F.aggregate fold — leftmost-first non-overlapping, a just-merged symbol
    eligible as the next LEFT. Early stop parity: m{t} filters
    pair_count >= min_pair_count; once it is empty, the LEFT JOIN passes
    s{t-1} through unchanged, so every later m is empty too (same fixpoint
    the driver loop's break reaches). Exact integer counts + byte-wise
    string ties ⇒ no float risk anywhere in this oracle."""
    apply_fold = (
        "list_reduce(list_transform(s.syms, x -> [x]), "
        "(acc, xs) -> CASE WHEN len(acc) > 0 AND list_extract(acc, len(acc)) = m.l "
        "AND list_extract(xs, 1) = m.r "
        "THEN list_append(list_slice(acc, 1, len(acc) - 1), m.l || m.r) "
        "ELSE list_concat(acc, xs) END)"
    )
    ctes = [
        f"""wc AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word FROM documents
    ) GROUP BY word
), s0 AS MATERIALIZED (SELECT list_append(str_split(word, ''), '{_BPE_EOW}') AS syms, cnt FROM wc)"""
    ]
    for t in range(1, num_merges + 1):
        ctes.append(
            f"pc{t} AS MATERIALIZED (SELECT p.l AS l, p.r AS r, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM ("
            f"SELECT unnest(list_transform(generate_series(1, len(syms) - 1), "
            f"i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS p, cnt FROM s{t - 1} WHERE len(syms) >= 2"
            f") GROUP BY p.l, p.r)"
        )
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT l, r, pair_count FROM pc{t} "
            f"WHERE pair_count >= {min_pair_count} ORDER BY pair_count DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT CASE WHEN m.l IS NULL THEN s.syms ELSE {apply_fold} END AS syms, s.cnt "
            f"FROM s{t - 1} s LEFT JOIN m{t} m ON TRUE)"
        )
    union = " UNION ALL ".join(f"SELECT {t} AS t, * FROM m{t}" for t in range(1, num_merges + 1))
    ctes.append(f"merges AS MATERIALIZED (SELECT * FROM ({union}))")
    return ",\n".join(ctes)


def _bpe_merges_oracle(num_merges: int) -> str:
    return f"""
WITH {_bpe_sym_ctes(num_merges)}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY t) - 1 AS INT) AS merge_rank,
       l AS merge_left, r AS merge_right, pair_count
FROM merges
ORDER BY merge_rank
"""


@register("doc_bpe_merges", _bpe_merges_oracle(_BPE_NUM_MERGES), extra=True)
def doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a BPE merge table from the document corpus (operators/bpe.py)
    and return it as (merge_rank, merge_left, merge_right, pair_count).

    VALUE-checked since round 5: the trainer loop unrolls exactly as
    chained CTEs (``_bpe_sym_ctes``) — pair counting, tie-breaks, the merge
    fold, and the min-count early stop are all integer/byte-wise, so the
    oracle is float-free. Also pinned against a pure-Python reference
    trainer in tests/test_bpe.py. The merge table itself is tokenizer
    state: KBs on the driver regardless of corpus size, like the k-means
    codebook.
    """
    merges = _trained_merges(spark, sf_dir)
    rows = [(i, l, r, c) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_rank int, merge_left string, merge_right string, pair_count bigint"
    )


def _bpe_fertility_oracle(num_merges: int, seg_iters: int = 12) -> str:
    """Extend the unrolled trainer with the encode path
    (operators/bpe.py::bpe_segment_words): per distinct word, repeatedly
    apply the LOWEST-rank merge present anywhere in the piece list (greedy
    leftmost non-overlap, same fold) until none applies. Each application
    shortens the list by >=1, so ``seg_iters`` = 12 covers any word up to
    12 chars + EOW — the fixture vocabulary tops out at 8; a passthrough
    LEFT JOIN makes extra iterations no-ops. Float-free like the trainer
    oracle; the final ratio divides two exact BIGINTs identically in both
    engines."""
    fold = (
        "list_reduce(list_transform(s.pieces, x -> [x]), "
        "(acc, xs) -> CASE WHEN len(acc) > 0 AND list_extract(acc, len(acc)) = b.l "
        "AND list_extract(xs, 1) = b.r "
        "THEN list_append(list_slice(acc, 1, len(acc) - 1), b.l || b.r) "
        "ELSE list_concat(acc, xs) END)"
    )
    ctes = [
        _bpe_sym_ctes(num_merges),
        "mr AS MATERIALIZED (SELECT l, r, ROW_NUMBER() OVER (ORDER BY t) - 1 AS rk FROM merges)",
        f"seg0 AS MATERIALIZED (SELECT word, list_append(str_split(word, ''), '{_BPE_EOW}') AS pieces FROM wc)",
    ]
    for u in range(1, seg_iters + 1):
        ctes.append(
            f"best{u} AS MATERIALIZED (SELECT word, l, r FROM ("
            f"SELECT g.word, m.l, m.r, ROW_NUMBER() OVER (PARTITION BY g.word ORDER BY m.rk) AS rn "
            f"FROM (SELECT word, unnest(list_transform(generate_series(1, len(pieces) - 1), "
            f"i -> {{'l': pieces[i], 'r': pieces[i + 1]}})) AS p FROM seg{u - 1} WHERE len(pieces) >= 2) g "
            f"JOIN mr m ON m.l = g.p.l AND m.r = g.p.r"
            f") WHERE rn = 1)"
        )
        ctes.append(
            f"seg{u} AS MATERIALIZED (SELECT s.word, CASE WHEN b.l IS NULL THEN s.pieces ELSE {fold} END AS pieces "
            f"FROM seg{u - 1} s LEFT JOIN best{u} b ON s.word = b.word)"
        )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
ppw AS (SELECT word, len(pieces) AS n_pieces FROM seg{seg_iters}),
tok AS (
    SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(p.n_pieces) AS BIGINT) AS n_pieces,
       CAST(SUM(p.n_pieces) AS DOUBLE) / COUNT(*) AS pieces_per_word
FROM tok t JOIN ppw p USING (word)
GROUP BY source
ORDER BY source
"""


@register("doc_bpe_fertility", _bpe_fertility_oracle(_BPE_NUM_MERGES), extra=True)
def doc_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: per source, how many BPE pieces the learned
    tokenizer (same merge table as ``doc_bpe_merges``) spends per word — the
    compression/fertility metric tokenizer evaluations report, and the
    feedback signal for sizing the merge budget per corpus mix.

    Scale path (the reason this query exists): the corpus is NEVER segmented
    directly — distinct words segment once (Arrow-batched, O(vocab)) and the
    piece counts broadcast-join back to the corpus word stream, so the
    corpus-side cost is one explode + map-side join + one groupBy(source).
    VALUE-checked since round 5 (``_bpe_fertility_oracle`` = the unrolled
    trainer + encode chain, float-free); also pinned against a pure-Python
    reference in tests/test_bpe.py.
    """
    from ..operators.bpe import bpe_segment_words, words_with_counts

    d = _docs(spark, sf_dir)
    merges = _trained_merges(spark, sf_dir)
    vocab = words_with_counts(d).select("word")
    pieces = bpe_segment_words(vocab, merges).select(
        "word", F.size("pieces").alias("n_pieces")
    )
    tok = d.select("source", F.explode(_tokens()).alias("word"))
    return (
        tok.join(F.broadcast(pieces), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
        )
        .select(
            "source",
            "n_words",
            "n_pieces",
            (F.col("n_pieces") / F.col("n_words")).alias("pieces_per_word"),
        )
        .orderBy("source")
    )


_ENCODE_HASH_BASE = 1000003
_ENCODE_HASH_MOD = 2147483647  # 2^31 - 1: acc*base + pid stays far under 2^63


def _bpe_encode_oracle(num_merges: int, seg_iters: int = 12) -> str:
    """Extend the unrolled trainer + encode chain with corpus-wide token-id
    materialization: piece ids are ROW_NUMBER over the byte-sorted piece
    vocabulary, per-word id lists rebuild in piece order, per-doc sequences
    flatten in token order, and the sequence digest is an integer polynomial
    fold (acc*B + id mod 2^31-1) — exact BIGINT arithmetic end to end, so
    the hash matches Spark's fold bit-for-bit."""
    fold = (
        "list_reduce(list_transform(s.pieces, x -> [x]), "
        "(acc, xs) -> CASE WHEN len(acc) > 0 AND list_extract(acc, len(acc)) = b.l "
        "AND list_extract(xs, 1) = b.r "
        "THEN list_append(list_slice(acc, 1, len(acc) - 1), b.l || b.r) "
        "ELSE list_concat(acc, xs) END)"
    )
    ctes = [
        _bpe_sym_ctes(num_merges),
        "mr AS MATERIALIZED (SELECT l, r, ROW_NUMBER() OVER (ORDER BY t) - 1 AS rk FROM merges)",
        f"seg0 AS MATERIALIZED (SELECT word, list_append(str_split(word, ''), '{_BPE_EOW}') AS pieces FROM wc)",
    ]
    for u in range(1, seg_iters + 1):
        ctes.append(
            f"best{u} AS MATERIALIZED (SELECT word, l, r FROM ("
            f"SELECT g.word, m.l, m.r, ROW_NUMBER() OVER (PARTITION BY g.word ORDER BY m.rk) AS rn "
            f"FROM (SELECT word, unnest(list_transform(generate_series(1, len(pieces) - 1), "
            f"i -> {{'l': pieces[i], 'r': pieces[i + 1]}})) AS p FROM seg{u - 1} WHERE len(pieces) >= 2) g "
            f"JOIN mr m ON m.l = g.p.l AND m.r = g.p.r"
            f") WHERE rn = 1)"
        )
        ctes.append(
            f"seg{u} AS MATERIALIZED (SELECT s.word, CASE WHEN b.l IS NULL THEN s.pieces ELSE {fold} END AS pieces "
            f"FROM seg{u - 1} s LEFT JOIN best{u} b ON s.word = b.word)"
        )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
pv AS MATERIALIZED (
    SELECT piece, CAST(ROW_NUMBER() OVER (ORDER BY piece) - 1 AS BIGINT) AS pid
    FROM (SELECT DISTINCT unnest(pieces) AS piece FROM seg{seg_iters})
),
wp AS MATERIALIZED (
    SELECT word, p.i AS i, p.piece AS piece
    FROM (SELECT word, unnest(list_transform(generate_series(1, len(pieces)),
                i -> {{'i': i, 'piece': pieces[i]}})) AS p FROM seg{seg_iters})
),
wid AS MATERIALIZED (
    SELECT wp.word, list(pv.pid ORDER BY wp.i) AS ids
    FROM wp JOIN pv USING (piece) GROUP BY wp.word
),
dt AS MATERIALIZED (
    SELECT doc_id, t.i AS i, t.word AS word
    FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)),
                i -> {{'i': i, 'word': ws[i]}})) AS t
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws FROM documents))
),
seqs AS (
    SELECT dt.doc_id, flatten(list(w.ids ORDER BY dt.i)) AS ids
    FROM dt JOIN wid w USING (word) GROUP BY dt.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(len(s.ids), 0) AS BIGINT) AS n_pieces,
       CAST(COALESCE(list_reduce(list_prepend(CAST(0 AS BIGINT), s.ids),
            (acc, x) -> (acc * {_ENCODE_HASH_BASE} + x) % {_ENCODE_HASH_MOD}), 0) AS BIGINT) AS seq_hash
FROM documents d LEFT JOIN seqs s USING (doc_id)
ORDER BY doc_id
"""


@register("doc_bpe_encode_corpus", _bpe_encode_oracle(_BPE_NUM_MERGES), extra=True)
def doc_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained tokenizer to the FULL corpus and materialize per-doc
    token-id sequences — the artifact a training-data pipeline actually
    ships. Emits (doc_id, n_pieces, seq_hash): the sequence itself stays
    internal (arrays defeat the driver canonicalizer); ``seq_hash`` is an
    order-sensitive integer polynomial fold over the id sequence, so any
    id, order, or length difference changes the row.

    Piece ids are ranks over the byte-sorted piece vocabulary — a pure
    function of the merge table, identical in both engines.

    Scale path: the corpus is never segmented directly — DISTINCT words
    segment once (Arrow-batched, O(vocab)), word -> id-array maps back by
    broadcast join, and the only corpus-scale shuffle is the groupBy(doc_id)
    that assembles sequences (that shuffle IS the output: ~1 id per corpus
    token, the same volume any tokenize-and-pack job ships to object
    storage). Vocabulary state stays KB-scale on the driver, like the
    k-means codebook. Cross-checked: sum(n_pieces) over docs equals
    ``doc_bpe_fertility``'s per-source totals (tests/test_bpe.py).
    """
    from ..operators.bpe import bpe_segment_words, words_with_counts

    d = _docs(spark, sf_dir)
    merges = _trained_merges(spark, sf_dir)
    vocab = words_with_counts(d).select("word")
    pieces = bpe_segment_words(vocab, merges)
    pv = pieces.select(F.explode("pieces").alias("piece")).distinct()
    from pyspark.sql import Window

    # piece vocabulary is tiny (initial chars + <=num_merges merged symbols):
    # a single-partition rank window over <=KB of rows, never corpus-scale
    pv = pv.select(
        "piece", (F.row_number().over(Window.orderBy("piece")) - 1).cast("long").alias("pid")
    )
    wp = pieces.select("word", F.posexplode("pieces").alias("i", "piece"))
    wid = (
        wp.join(F.broadcast(pv), "piece")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "pid"))), lambda s: s["pid"]
            ).alias("ids")
        )
    )
    dt = d.select("doc_id", F.posexplode(_tokens()).alias("i", "word"))
    seqs = (
        dt.join(F.broadcast(wid), "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(F.array_sort(F.collect_list(F.struct("i", "ids"))), lambda s: s["ids"])
            ).alias("ids")
        )
    )
    ids = F.coalesce(F.col("ids"), F.array().cast("array<long>"))
    seq_hash = F.aggregate(
        ids,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _ENCODE_HASH_BASE + x) % _ENCODE_HASH_MOD,
    )
    return (
        d.select("doc_id")
        .join(seqs, "doc_id", "left")
        .select(
            "doc_id",
            F.size(ids).cast("long").alias("n_pieces"),
            seq_hash.alias("seq_hash"),
        )
        .orderBy("doc_id")
    )


# --- learned quality classifier (distilled from the heuristic filter) ----------------

_LOGREG_FEATURES = ["stopword_ratio", "punct_ratio", "log_tokens", "log_chars"]
_LOGREG_ITERS = 30
_LOGREG_LR = 0.3

# weights are deterministic per fixture (DECIMAL gradient sums) — train once
# per session however many times the query runs (same memo pattern as the
# BPE merge table)
_LOGREG_CACHE: dict[str, list] = {}


def _logreg_oracle(
    iters: int, lr: float, train_where: str = "TRUE", eval_where: str = "TRUE"
) -> str:
    """Unroll the full-batch gradient-descent loop as chained CTEs — the
    ``_kmeans_oracle`` pattern applied to ``operators/logreg.py``: per
    iteration one CTE computes the 5 gradient sums (each row's contribution
    cast to DECIMAL(38,18) BEFORE summing — the same order-independent
    accumulation as the Spark side) and the next CTE applies
    ``w - lr * g / n`` with the identical left-associated float expression.
    Every chained CTE is MATERIALIZED: w(t-1) is referenced twice per step,
    so default inlining would expand 2^iters scans of ``documents`` (observed
    as a file-handle explosion). The only cross-engine wobble is libm
    ``exp``/``ln`` (≤1 ulp/term);
    the emitted ``prob`` is rounded to 9 decimals on BOTH sides so the
    trajectory-accumulated ~1e-12 never reaches the driver's value hash."""
    feats = ["stopword_ratio", "punct_ratio", "log_tokens", "log_chars"]
    ctes = [
        f"""raw AS MATERIALIZED (
    SELECT doc_id, n_chars,
           len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens,
           len(list_filter(regexp_extract_all(lower(text), '{TOKEN_RE}'),
                           w -> w IN {_sql_in(STOPWORDS)})) AS n_stop,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
    FROM documents
), feat AS MATERIALIZED (
    SELECT doc_id,
           COALESCE(n_stop * 1.0 / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 0.0) AS stopword_ratio,
           COALESCE(n_punct * 1.0 / NULLIF(CAST(n_chars AS DOUBLE), 0.0), 0.0) AS punct_ratio,
           ln(1.0 + CAST(n_tokens AS DOUBLE)) AS log_tokens,
           ln(1.0 + CAST(n_chars AS DOUBLE)) AS log_chars,
           ((CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
             + CASE WHEN n_punct * 1.0 / NULLIF(CAST(n_chars AS DOUBLE), 0.0) < 0.1 THEN 1 ELSE 0 END
             + CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END) >= 2) AS label
    FROM raw
), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feat f WHERE {train_where} ),
w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"""
    ]
    # z folded left in the Spark _logit order: ((((b + w1*x1) + w2*x2) + ...)
    z = "w.b + " + " + ".join(f"w.w{j + 1} * f.{c}" for j, c in enumerate(feats))
    err = f"(1.0 / (1.0 + exp(-({z}))) - CASE WHEN f.label THEN 1.0 ELSE 0.0 END)"
    for t in range(1, iters + 1):
        gsums = ", ".join(
            [f"SUM(CAST({err} AS DECIMAL(38,18))) AS g0"]
            + [
                f"SUM(CAST({err} * f.{c} AS DECIMAL(38,18))) AS g{j + 1}"
                for j, c in enumerate(feats)
            ]
        )
        ctes.append(
            f"g{t} AS MATERIALIZED (SELECT {gsums} FROM feat f, w{t - 1} w "
            f"WHERE {train_where})"
        )
        upd = ", ".join(
            [f"w.b - {lr} * CAST(g.g0 AS DOUBLE) / nn.n AS b"]
            + [
                f"w.w{j + 1} - {lr} * CAST(g.g{j + 1} AS DOUBLE) / nn.n AS w{j + 1}"
                for j in range(len(feats))
            ]
        )
        ctes.append(f"w{t} AS MATERIALIZED (SELECT {upd} FROM w{t - 1} w, g{t} g, nn)")
    prob = f"1.0 / (1.0 + exp(-({z})))"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.doc_id, f.label, round({prob}, 9) AS prob, {prob} >= 0.5 AS pred
FROM feat f, w{iters} w
WHERE {eval_where}
ORDER BY f.doc_id"""
    )


def _quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only feature projection over the SHARED quality signals
    (``text.quality_signal_cols`` — same expressions, same thresholds as
    ``doc_quality_filter``), with the filter's keep verdict as the
    training label; tuning the filter retunes the teacher here too."""
    from .text import quality_signal_cols

    sig = quality_signal_cols()
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.coalesce(sig["stopword_ratio"], F.lit(0.0)).alias("stopword_ratio"),
        F.coalesce(sig["punct_ratio"], F.lit(0.0)).alias("punct_ratio"),
        F.log1p(sig["n_tokens"].cast("double")).alias("log_tokens"),
        F.log1p(F.col("n_chars").cast("double")).alias("log_chars"),
        sig["keep"].alias("label"),
    )


@register("doc_quality_classifier", _logreg_oracle(_LOGREG_ITERS, _LOGREG_LR), extra=True)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression quality classifier that distills the
    heuristic filter (``doc_quality_filter``'s verdict as labels, its raw
    signals as features), then score every document — the
    replace-the-hand-rule-with-a-model step of a curation pipeline
    (operators/logreg.py has the scale analysis).

    Iterative driver-loop training (one DECIMAL-summed gradient aggregate
    per step), VALUE-checked since round 5: the ``_logreg_oracle`` unrolls
    the full 30-step GD trajectory as chained materialized CTEs (the
    ``_kmeans_oracle`` pattern), so the driver hashes doc-level
    probabilities, not just row counts. The weight trajectory is also
    differentially tested against a pure-Python twin in tests/test_logreg.py.
    """
    from ..operators.logreg import logistic_fit, logistic_predict

    feats = _quality_features(spark, sf_dir)
    if sf_dir not in _LOGREG_CACHE:
        _LOGREG_CACHE[sf_dir] = logistic_fit(
            feats, _LOGREG_FEATURES, "label", iterations=_LOGREG_ITERS, lr=_LOGREG_LR
        )
    w = _LOGREG_CACHE[sf_dir]
    return (
        logistic_predict(feats, _LOGREG_FEATURES, w)
        # 9-dp rounding on BOTH engines (oracle mirrors it): the weight
        # trajectory agrees to ~1e-12 (libm exp wobble accumulated over 30
        # steps), which 9 dp absorbs; pred compares the UNROUNDED prob
        .select("doc_id", "label", F.round("prob", 9).alias("prob"), "pred")
        .orderBy("doc_id")
    )


# --- classifier calibration: the precision/recall dial ---------------------------------
# A trained quality classifier ships with a THRESHOLD, and the threshold is
# a business decision (keep more data vs keep cleaner data). This query
# makes the dial a table: precision/recall/F1 of the trained model against
# its labels at every candidate threshold — what the pipeline owner reads
# before setting the keep bar, the same measure-the-dial discipline as
# doc_lsh_recall_curve / embedding_semdedup_recall.

_PR_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

_PR_CURVE_ORACLE = f"""
WITH scored AS (
    SELECT label, prob FROM ({_logreg_oracle(_LOGREG_ITERS, _LOGREG_LR)}) base
),
thr AS (SELECT unnest({list(_PR_THRESHOLDS)}) AS threshold),
agg AS (
    SELECT t.threshold,
           CAST(COUNT(*) FILTER (WHERE s.prob >= t.threshold AND s.label) AS BIGINT) AS tp,
           CAST(COUNT(*) FILTER (WHERE s.prob >= t.threshold AND NOT s.label) AS BIGINT) AS fp,
           CAST(COUNT(*) FILTER (WHERE s.prob < t.threshold AND s.label) AS BIGINT) AS fn
    FROM scored s, thr t GROUP BY t.threshold
)
SELECT threshold, tp, fp, fn,
       ROUND(tp * 1.0 / NULLIF(tp + fp, 0), 6) AS precision_,
       ROUND(tp * 1.0 / NULLIF(tp + fn, 0), 6) AS recall_,
       ROUND(2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0), 6) AS f1
FROM agg
ORDER BY threshold
"""


def _pr_over(spark: SparkSession, scored: DataFrame) -> DataFrame:
    """Threshold fan-out shared by the in-sample and held-out curves:
    (label, prob) rows -> one (threshold, tp, fp, fn, precision_, recall_,
    f1) row per candidate threshold."""
    thr = spark.createDataFrame(
        [(t,) for t in _PR_THRESHOLDS], schema="threshold double"
    )
    hit = F.col("prob") >= F.col("threshold")
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.count(F.when(hit & F.col("label"), 1)).alias("tp"),
            F.count(F.when(hit & ~F.col("label"), 1)).alias("fp"),
            F.count(F.when(~hit & F.col("label"), 1)).alias("fn"),
        )
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            F.round(
                F.col("tp") * 1.0 / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6
            ).alias("precision_"),
            F.round(
                F.col("tp") * 1.0 / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 6
            ).alias("recall_"),
            F.round(
                2.0 * F.col("tp")
                / F.nullif(2.0 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)),
                6,
            ).alias("f1"),
        )
        .orderBy("threshold")
    )


@register("doc_quality_pr_curve", _PR_CURVE_ORACLE)
def doc_quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve of the trained quality classifier
    (``doc_quality_classifier``): precision/recall/F1 against the heuristic
    labels at every candidate keep-threshold — one row per threshold. The
    comparison uses the 9-dp-rounded probabilities both engines emit, so
    the threshold compare is bit-identical across engines.

    Scale: reuses the trained weights (session-memoized) and ONE scoring
    pass; the threshold fan-out is a 9-row broadcast crossJoin aggregated
    per threshold — counts only, no per-doc rows survive. This curve is
    IN-SAMPLE (training fit); ``doc_quality_pr_holdout`` is the
    generalization twin.
    """
    return _pr_over(
        spark, doc_quality_classifier(spark, sf_dir).select("label", "prob")
    )


# --- held-out calibration (the generalization twin) ------------------------------------
# The in-sample curve measures FIT; a pipeline owner sets the threshold on
# data the model never saw. Same split discipline as the trained langid's
# held-out eval: train on doc_id % 5 < 4, report the curve on the held-out
# fifth only.

_HOLDOUT_MOD, _HOLDOUT_EVAL = 5, 4

_PR_HOLDOUT_ORACLE = f"""
WITH scored AS (
    SELECT label, prob FROM ({_logreg_oracle(
        _LOGREG_ITERS,
        _LOGREG_LR,
        train_where=f"f.doc_id % {_HOLDOUT_MOD} < {_HOLDOUT_EVAL}",
        eval_where=f"f.doc_id % {_HOLDOUT_MOD} = {_HOLDOUT_EVAL}",
    )}) base
),
thr AS (SELECT unnest({list(_PR_THRESHOLDS)}) AS threshold),
agg AS (
    SELECT t.threshold,
           CAST(COUNT(*) FILTER (WHERE s.prob >= t.threshold AND s.label) AS BIGINT) AS tp,
           CAST(COUNT(*) FILTER (WHERE s.prob >= t.threshold AND NOT s.label) AS BIGINT) AS fp,
           CAST(COUNT(*) FILTER (WHERE s.prob < t.threshold AND s.label) AS BIGINT) AS fn
    FROM scored s, thr t GROUP BY t.threshold
)
SELECT threshold, tp, fp, fn,
       ROUND(tp * 1.0 / NULLIF(tp + fp, 0), 6) AS precision_,
       ROUND(tp * 1.0 / NULLIF(tp + fn, 0), 6) AS recall_,
       ROUND(2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0), 6) AS f1
FROM agg
ORDER BY threshold
"""


@register("doc_quality_pr_holdout", _PR_HOLDOUT_ORACLE)  # promoted r13: the last never-verdicted query
def doc_quality_pr_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT calibration curve: train the quality classifier on 4/5 of
    the corpus (``doc_id % 5 < 4``), report precision/recall/F1 on the
    untouched fifth — the number the in-sample curve overstates. The
    deterministic id split is the ``doc_train_test_split`` discipline; the
    oracle re-runs the full GD trajectory on the training slice only.

    Scale: identical shape to the in-sample curve — the split adds one
    map-side predicate to the gradient scan and the scoring pass.
    """
    from ..operators.logreg import logistic_fit, logistic_predict

    feats = _quality_features(spark, sf_dir)
    train = feats.where(F.col("doc_id") % _HOLDOUT_MOD < _HOLDOUT_EVAL)
    key = f"{sf_dir}#holdout{_HOLDOUT_MOD}-{_HOLDOUT_EVAL}"
    if key not in _LOGREG_CACHE:
        _LOGREG_CACHE[key] = logistic_fit(
            train, _LOGREG_FEATURES, "label", iterations=_LOGREG_ITERS, lr=_LOGREG_LR
        )
    w = _LOGREG_CACHE[key]
    heldout = feats.where(F.col("doc_id") % _HOLDOUT_MOD == _HOLDOUT_EVAL)
    scored = (
        logistic_predict(heldout, _LOGREG_FEATURES, w)
        .select("label", F.round("prob", 9).alias("prob"))
    )
    return _pr_over(spark, scored)


# --- bigram-LM cross-entropy scoring (the shuffle-join sibling of the unigram) -------

_BIGRAM_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents
),
uni AS (SELECT {h60_sql_duckdb("unnest(toks)")} AS wh FROM tok),
v AS (SELECT CAST(COUNT(DISTINCT wh) AS BIGINT) AS vsize FROM uni),
bi AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> {h60_sql_duckdb("toks[i]")})) AS h1,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> {h60_sql_duckdb("toks[i + 1]")})) AS h2
    FROM tok
    WHERE len(toks) >= 2
),
c1 AS (SELECT h1, CAST(COUNT(*) AS BIGINT) AS n_ctx FROM bi GROUP BY h1),
c12 AS (SELECT h1, h2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM bi GROUP BY h1, h2),
scored AS (
    SELECT b.doc_id,
           CAST(-ln((p.n_pair + 1.0) / (c.n_ctx + v.vsize)) AS DECIMAL(38,18)) AS nl
    FROM bi b JOIN c12 p USING (h1, h2) JOIN c1 c USING (h1), v
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nl) AS DOUBLE) / COUNT(*) AS cross_entropy_nats
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


@register("doc_bigram_logprob", _BIGRAM_ORACLE, extra=True)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained BIGRAM LM with add-1
    smoothing (mean ``-ln p(w_i | w_{i-1})`` in nats) — the sharper
    perplexity-filter signal (KenLM-style pipelines train n-gram models;
    this is the n=2 member expressed Spark-first).

    The deliberate contrast with ``doc_unigram_logprob``: a UNIGRAM vocab
    table broadcasts, but the bigram table is quadratically larger and
    corpus-limited — at 100 TB it does NOT fit an executor broadcast, so
    the probability join is a hash-partitioned shuffle join by design.
    The plan pre-joins the two frequency tables (vocab-scale) into one
    probability table, so the corpus-scale bigram stream shuffles exactly
    twice: once into the probability join, once for the per-doc
    re-aggregation. Bigrams are built INSIDE the token array (zip_with on
    hashed tokens) before the explode — every shuffle carries (h1, h2)
    longs, never token text. Log-probs sum as DECIMAL(38,18), exact and
    order-independent. Documents with fewer than 2 tokens have no bigram
    distribution and are excluded (matching the oracle).
    """
    th = F.transform(_tokens(), lambda w: h60(w))
    n = F.size(th)
    pairs = F.zip_with(
        F.slice(th, 1, n - 1),
        F.slice(th, 2, n - 1),
        lambda a, b: F.struct(a.alias("h1"), b.alias("h2")),
    )
    d = _docs(spark, sf_dir).where(F.size(_tokens()) >= 2)
    bi = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.h1").alias("h1"), F.col("p.h2").alias("h2")
    )
    uni = _docs(spark, sf_dir).select(F.explode(th).alias("wh"))
    v = uni.agg(F.countDistinct("wh").alias("vsize"))
    c1 = bi.groupBy("h1").agg(F.count(F.lit(1)).alias("n_ctx"))
    c12 = bi.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("n_pair"))
    probs = c12.join(c1, "h1")
    nl = (-F.log((F.col("n_pair") + 1.0) / (F.col("n_ctx") + F.col("vsize")))).cast(
        "decimal(38,18)"
    )
    return (
        bi.join(probs, ["h1", "h2"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum(nl).alias("_s"))
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("_s").cast("double") / F.col("n_bigrams")).alias("cross_entropy_nats"),
        )
        .orderBy("doc_id")
    )


# --- winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — public) --------

# Local document fingerprinting with a GUARANTEE fixed shingles lack: pick
# the minimum gram hash in every sliding window of _WINNOW_W consecutive
# k-gram positions (ties -> leftmost position), and any verbatim overlap of
# at least _WINNOW_K + _WINNOW_W - 1 tokens between two documents shares at
# least one SELECTED fingerprint — detection is certain, while storage drops
# to an expected 2/(w+1) density of positions. The MOSS algorithm.
_WINNOW_K = 4  # tokens per gram
_WINNOW_W = 4  # window of consecutive gram positions
# pos < 2^31 (a 2-billion-token document does not exist): (hash, pos) packs
# into one key with hash < 2^60 => key < 2^91, well inside DECIMAL(38,0) /
# HUGEINT range in both engines
_POS_RADIX = 1 << 31

# the k-gram concat is BUILT from _WINNOW_K so oracle and Spark can never
# desynchronize on the gram width
_WINNOW_GRAM_SQL = " || ' ' || ".join(
    f"toks[i + {j}]" if j else "toks[i]" for j in range(_WINNOW_K)
)

# combined key = hash * radix + pos: lexicographic (hash, pos) min under
# plain numeric MIN — min hash, ties to the LEFTMOST position; exact in
# DECIMAL(38,0) / HUGEINT in both engines. fp_hash extraction uses
# INTEGER division (`//`) — DuckDB's `/` is DOUBLE division and rounds
# 60-bit hashes.
_WINNOW_SEL_CTES = f"""
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents),
g AS (
    SELECT doc_id,
           unnest(generate_series(1, len(toks) - {_WINNOW_K - 1})) AS pos,
           unnest(list_transform(generate_series(1, len(toks) - {_WINNOW_K - 1}),
                  i -> {h60_sql_duckdb(_WINNOW_GRAM_SQL)})) AS gh
    FROM tok WHERE len(toks) >= {_WINNOW_K}
),
keyed AS (
    SELECT doc_id, pos,
           CAST(gh AS HUGEINT) * {_POS_RADIX} + pos AS key,
           COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
    FROM g
),
wm AS (
    SELECT doc_id, pos, n_grams,
           MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS sel
    FROM keyed
),
selected AS (
    SELECT DISTINCT doc_id, n_grams, sel,
           CAST(sel // {_POS_RADIX} AS BIGINT) AS fp_hash
    FROM wm WHERE pos >= {_WINNOW_W}
)"""

_WINNOW_ORACLE = f"""
WITH {_WINNOW_SEL_CTES}
SELECT doc_id,
       CAST(MAX(n_grams) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_selected,
       COUNT(*) * 1.0 / MAX(n_grams) AS density
FROM selected GROUP BY doc_id
ORDER BY doc_id
"""


def _winnow_selected(
    spark: SparkSession, sf_dir: str, with_counts: bool = True
) -> DataFrame:
    """(doc_id[, n_grams], sel DECIMAL, fp_hash) — the selected
    fingerprints. ``with_counts=False`` skips the per-doc gram-count window
    entirely (the matches query doesn't use it, and its unbounded
    COUNT(*) OVER pass is not free at corpus scale)."""
    from pyspark.sql import Window

    toks = _tokens()
    g = (
        _docs(spark, sf_dir)
        .where(F.size(toks) >= _WINNOW_K)
        .select("doc_id", F.posexplode(_positional_gram_hashes(toks, _WINNOW_K)).alias("i", "gh"))
        .select("doc_id", (F.col("i") + 1).alias("pos"), "gh")
    )
    key = (F.col("gh").cast("decimal(38,0)") * _POS_RADIX + F.col("pos")).alias("key")
    wroll = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(_WINNOW_W - 1), 0)
    extra = []
    if with_counts:
        extra = [F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n_grams")]
    keyed = g.select("doc_id", "pos", key, *extra)
    sel = (
        keyed.withColumn("sel", F.min("key").over(wroll))
        .where(F.col("pos") >= _WINNOW_W)
        .drop("pos", "key")
        .distinct()
    )
    # exact DECIMAL arithmetic: sel is an exact multiple of the radix plus
    # pos, so the subtraction/division below is integral and lossless
    fp = ((F.col("sel") - F.col("sel") % _POS_RADIX) / _POS_RADIX).cast("long")
    return sel.withColumn("fp_hash", fp)


@register("doc_winnow_fingerprints", _WINNOW_ORACLE, extra=True)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection per document: gram count, selected
    count, and density (theory: E[density] = 2/(w+1) ≈ 0.4 at w=4 — the
    storage the guarantee costs).

    Scale: gram hashes are built in-array and the rolling-min window
    partitions by doc_id (no global sort); the packed DECIMAL key makes the
    lexicographic (hash, leftmost-pos) tie rule a plain numeric MIN, exact
    and engine-identical. Everything after the explode shuffles 16-byte
    keys only.
    """
    return (
        _winnow_selected(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count(F.lit(1)).alias("n_selected"),
            (F.count(F.lit(1)) * 1.0 / F.max("n_grams")).alias("density"),
        )
        .orderBy("doc_id")
    )


# >= 1 shared fingerprint keeps the winnowing GUARANTEE intact: a single
# minimal k+w-1-token overlap selects exactly one common fingerprint, and
# filtering it out would contradict the certainty the algorithm buys
_WINNOW_MATCH_MIN = 1

_WINNOW_MATCHES_ORACLE = f"""
WITH {_WINNOW_SEL_CTES},
fp AS (SELECT DISTINCT doc_id, fp_hash FROM selected)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING COUNT(*) >= {_WINNOW_MATCH_MIN}
ORDER BY doc_a, doc_b
"""


@register("doc_winnow_matches", _WINNOW_MATCHES_ORACLE, extra=True)
def doc_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document winnowing matches: every pair sharing a selected
    fingerprint, with the shared count — overlap detection with the
    winnowing GUARANTEE (any verbatim overlap of ≥ k+w-1 tokens shares at
    least one fingerprint, so no qualifying pair is ever missed), at the
    2/(w+1) storage density the selection buys. Rank or threshold on
    ``n_shared`` downstream to trade precision for recall.

    Scale: the pair join runs on the SELECTED fingerprints only (an
    expected 2/(w+1) fraction of gram positions) — same equi-join machinery
    as the shingle family, smaller input by construction.
    """
    fp = _winnow_selected(spark, sf_dir, with_counts=False).select(
        "doc_id", "fp_hash"
    ).distinct()
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, ["fp_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _WINNOW_MATCH_MIN)
        .orderBy("doc_a", "doc_b")
    )


# --- temperature-scaled mixture sampling ----------------------------------------------

# standard multilingual/multi-source rebalancing (Conneau et al. 2020, XLM-R,
# arXiv:1911.02116 §3.1, there written q_i ∝ p_i^α with α<1): sample sources
# with probability proportional to token_share ** (1/T). T=1 keeps the
# natural mix; T>1 flattens toward uniform (up-samples tail sources, the
# usual direction — T=2 ≡ α=0.5); T<1 would sharpen toward the head.
# The exact double literal for 1/T is inlined into BOTH engines' expressions
# so the pow() inputs are bit-identical.
_MIX_TEMPERATURE = 2.0
_MIX_ALPHA = 1.0 / _MIX_TEMPERATURE
_MIX_BUDGET_TOKENS = 1_000_000

_TEMP_MIX_ORACLE = f"""
WITH per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS total_tokens FROM per_source),
powed AS (
    SELECT source, n_docs, n_tokens,
           n_tokens * 1.0 / total_tokens AS token_share,
           pow(n_tokens * 1.0 / total_tokens, {_MIX_ALPHA!r}) AS p_alpha
    FROM per_source, tot
),
z AS (SELECT SUM(p_alpha) AS z FROM powed)
SELECT source, n_docs, n_tokens, token_share,
       p_alpha / z AS sample_prob,
       {_MIX_BUDGET_TOKENS} * (p_alpha / z) / n_tokens AS epochs_at_budget
FROM powed, z
ORDER BY source
"""


@register("doc_temperature_mixture", _TEMP_MIX_ORACLE, extra=True)
def doc_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (q_s ∝ p_s^(1/T), T=2): the
    standard up/down-sampling recipe for multi-source training mixes —
    ``sample_prob`` is the per-source draw probability, ``epochs_at_budget``
    how many times the source repeats when filling a fixed token budget
    (>1 means up-sampled). Complements ``source_mixing_weights``' uniform
    target with the tempered interpolation everyone actually ships.

    Scale: identical shape to ``source_mixing_weights`` — one shuffle on
    ``source`` for the rollup, then TWO 1-row broadcast joins (grand total,
    then the normalizer Z over per-source rows). Source cardinality is
    domains, so everything after the first aggregation is trivially small.
    """
    d = _docs(spark, sf_dir).select("source", F.size(_tokens()).cast("long").alias("n_toks"))
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("n_tokens")
    )
    totals = per_source.agg(F.sum("n_tokens").alias("total_tokens"))
    share = F.col("n_tokens") * 1.0 / F.col("total_tokens")
    powed = per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        F.pow(share, F.lit(_MIX_ALPHA)).alias("p_alpha"),
    )
    z = powed.agg(F.sum("p_alpha").alias("z"))
    prob = F.col("p_alpha") / F.col("z")
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "token_share",
            prob.alias("sample_prob"),
            (F.lit(float(_MIX_BUDGET_TOKENS)) * prob / F.col("n_tokens")).alias("epochs_at_budget"),
        )
        .orderBy("source")
    )


# --- Kneser-Ney bigram cross-entropy (the smoothed upgrade of the add-1 bigram) ------

# fixed absolute discount (Kneser & Ney 1995; Chen & Goodman 1999 use
# count-of-count-estimated d — fixed 0.75 keeps the model closed-form and
# cross-engine exact). Interpolated form:
#   P(w2|w1) = max(c12 - d, 0)/c1 + (d * N1+(w1.)/c1) * (N1+(.w2)/n_types)
# Every factor is a ratio of corpus integers; both engines evaluate the
# IDENTICAL parse tree, so the doubles agree bit-for-bit before the ln.
_KN_D = 0.75

_KN_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents
),
bi AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> {h60_sql_duckdb("toks[i]")})) AS h1,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> {h60_sql_duckdb("toks[i + 1]")})) AS h2
    FROM tok
    WHERE len(toks) >= 2
),
c1 AS (SELECT h1, CAST(COUNT(*) AS BIGINT) AS n_ctx FROM bi GROUP BY h1),
c12 AS (SELECT h1, h2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM bi GROUP BY h1, h2),
n1f AS (SELECT h1, CAST(COUNT(*) AS BIGINT) AS n1p_fwd FROM c12 GROUP BY h1),
n1b AS (SELECT h2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd FROM c12 GROUP BY h2),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c12),
scored AS (
    SELECT b.doc_id,
           CAST(-ln(
               GREATEST(p.n_pair - {_KN_D}, 0.0) / c.n_ctx
               + (({_KN_D} * f.n1p_fwd) / c.n_ctx) * (w.n1p_bwd * 1.0 / t.n_types)
           ) AS DECIMAL(38,18)) AS nl
    FROM bi b
    JOIN c12 p USING (h1, h2) JOIN c1 c USING (h1)
    JOIN n1f f USING (h1) JOIN n1b w USING (h2), t
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nl) AS DOUBLE) / COUNT(*) AS cross_entropy_nats
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


@register("doc_kneser_ney_logprob", _KN_ORACLE, extra=True)
def doc_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an interpolated Kneser-Ney bigram LM
    (fixed discount d=0.75) — the smoothing KenLM-style perplexity filters
    actually use: probability mass discounted from seen bigrams backs off to
    the CONTINUATION unigram (how many contexts a word follows), not the raw
    frequency, which is what separates KN from the add-1 sibling
    ``doc_bigram_logprob``.

    Scale: identical topology to the add-1 bigram — bigrams built inside the
    token array from 60-bit hashes (shuffles carry longs, never text), the
    four count tables (c1, c12, N1+ forward/backward) are vocab-scale and
    pre-join into one probability table, the type total is a 1-row
    broadcast; the corpus-scale stream shuffles exactly twice. Log-probs sum
    as DECIMAL(38,18), exact and order-independent.
    """
    th = F.transform(_tokens(), lambda w: h60(w))
    n = F.size(th)
    pairs = F.zip_with(
        F.slice(th, 1, n - 1),
        F.slice(th, 2, n - 1),
        lambda a, b: F.struct(a.alias("h1"), b.alias("h2")),
    )
    d = _docs(spark, sf_dir).where(F.size(_tokens()) >= 2)
    bi = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.h1").alias("h1"), F.col("p.h2").alias("h2")
    )
    c1 = bi.groupBy("h1").agg(F.count(F.lit(1)).alias("n_ctx"))
    c12 = bi.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("n_pair"))
    n1f = c12.groupBy("h1").agg(F.count(F.lit(1)).alias("n1p_fwd"))
    n1b = c12.groupBy("h2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    t = c12.agg(F.count(F.lit(1)).alias("n_types"))
    probs = c12.join(c1, "h1").join(n1f, "h1").join(n1b, "h2")
    p_kn = (
        F.greatest(F.col("n_pair") - _KN_D, F.lit(0.0)) / F.col("n_ctx")
        + ((_KN_D * F.col("n1p_fwd")) / F.col("n_ctx"))
        * (F.col("n1p_bwd") * 1.0 / F.col("n_types"))
    )
    nl = (-F.log(p_kn)).cast("decimal(38,18)")
    return (
        bi.join(probs, ["h1", "h2"])
        .crossJoin(F.broadcast(t))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum(nl).alias("_s"))
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("_s").cast("double") / F.col("n_bigrams")).alias("cross_entropy_nats"),
        )
        .orderBy("doc_id")
    )


# --- CCNet perplexity buckets (head / middle / tail) ----------------------------------

# CCNet (Wenzek et al. 2020) splits each language's corpus into perplexity
# terciles under a reference LM — "head" (most fluent) feeds pre-training
# first. The reference LM here is the corpus-trained unigram model above;
# the tercile fractions are inlined as identical double literals so both
# engines interpolate the same quantile arithmetic.
_CCNET_Q1 = 1.0 / 3.0
_CCNET_Q2 = 2.0 / 3.0

_CCNET_ORACLE = f"""
WITH lm AS ({{LM}}),
ce AS (
    SELECT l.doc_id, d.lang, l.cross_entropy_nats
    FROM lm l JOIN documents d USING (doc_id)
),
thr AS (
    SELECT lang,
           quantile_cont(cross_entropy_nats, {_CCNET_Q1!r}) AS t1,
           quantile_cont(cross_entropy_nats, {_CCNET_Q2!r}) AS t2
    FROM ce GROUP BY lang
)
SELECT ce.doc_id, ce.lang, ce.cross_entropy_nats,
       CASE WHEN ce.cross_entropy_nats <= thr.t1 THEN 'head'
            WHEN ce.cross_entropy_nats <= thr.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ce JOIN thr USING (lang)
ORDER BY ce.doc_id
"""


def _ccnet_oracle() -> str:
    return _CCNET_ORACLE.format(LM=_LM_ORACLE)


@register("doc_ccnet_buckets", _ccnet_oracle(), extra=True)
def doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per-language
    terciles of the unigram-LM cross-entropy assign each document to
    head / middle / tail — the data-quality split CommonCrawl pipelines
    feed to pre-training in order.

    Scale: the LM scoring is ``doc_unigram_logprob``'s plan unchanged; the
    tercile thresholds are a per-language aggregate (language-cardinality —
    broadcast back), so bucketing adds one tiny join and a map-side CASE to
    the scoring pass. Exact interpolated percentiles keep the thresholds
    engine-identical (the `price_percentiles` precedent).
    """
    lm = doc_unigram_logprob(spark, sf_dir)
    ce = lm.join(_docs(spark, sf_dir).select("doc_id", "lang"), "doc_id")
    thr = ce.groupBy("lang").agg(
        F.percentile("cross_entropy_nats", F.lit(_CCNET_Q1)).alias("t1"),
        F.percentile("cross_entropy_nats", F.lit(_CCNET_Q2)).alias("t2"),
    )
    bucket = (
        F.when(F.col("cross_entropy_nats") <= F.col("t1"), "head")
        .when(F.col("cross_entropy_nats") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    return (
        ce.join(F.broadcast(thr), "lang")
        .select("doc_id", "lang", "cross_entropy_nats", bucket.alias("bucket"))
        .orderBy("doc_id")
    )


# --- training-context packing (GPT-style concatenate-and-cut) --------------------------
# The last step before tokens hit the trainer: concatenate every document's
# tokens (plus one EOS separator each) in a fixed corpus order and cut the
# stream at fixed context-length boundaries (Brown et al. 2020 §2.2 pack
# documents this way; sequences may span document boundaries). The manifest
# below — each document's absolute token offset and the chunk span it lands
# in — is what a training loader needs to map chunks back to provenance,
# and what a curriculum re-order changes.

_CTX_LEN = CTX_LEN  # tokens per training context (canonical constant in queries/text.py)
_PACK_BUCKET = 64  # doc_ids per prefix-sum histogram bucket

_PACKING_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) + 1 AS BIGINT)
               AS len_tokens
    FROM documents
),
c AS (
    SELECT doc_id, len_tokens,
           CAST(COALESCE(SUM(len_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM t
)
SELECT doc_id, len_tokens, start_offset,
       start_offset // {_CTX_LEN} AS chunk_first,
       (start_offset + len_tokens - 1) // {_CTX_LEN} AS chunk_last,
       CAST((start_offset + len_tokens - 1) // {_CTX_LEN}
            - start_offset // {_CTX_LEN} + 1 AS BIGINT) AS n_chunks,
       ((start_offset + len_tokens - 1) // {_CTX_LEN})
           > (start_offset // {_CTX_LEN}) AS crosses_boundary
FROM c
ORDER BY doc_id
"""


@register("doc_context_packing", _PACKING_ORACLE)
def doc_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-context packing manifest: concatenate documents in doc_id
    order (one EOS token appended per document), cut the token stream at
    ``_CTX_LEN`` boundaries, and report each document's absolute
    ``start_offset`` and chunk span (``chunk_first``/``chunk_last``/
    ``n_chunks``/``crosses_boundary``) — the provenance map a training
    loader needs under GPT-style packing, where sequences span document
    boundaries rather than padding.

    The absolute offsets are an exact GLOBAL running sum — the canonical
    scale-killer if written as one ``SUM() OVER (ORDER BY doc_id)`` window
    (the whole corpus through ``Exchange SinglePartition``). Instead
    ``operators/ranking.py::global_prefix_sum`` computes it histogram-first:
    per-bucket token sums (one map-side-combinable shuffle on
    ``doc_id div {_PACK_BUCKET}``), a single-partition prefix pass over the
    HISTOGRAM (bucket-cardinality rows, ≪ corpus), broadcast back, bounded
    within-bucket running-sum windows. The oracle recomputes the naive
    window form, so the two-pass decomposition is value-pinned row-for-row.
    """
    from ..operators.ranking import global_prefix_sum

    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        (F.size(_tokens()) + 1).cast("bigint").alias("len_tokens"),
        (F.col("doc_id") - F.col("doc_id") % _PACK_BUCKET).alias("_pb"),
    )
    c = global_prefix_sum(
        t,
        bucket_order=[F.col("_pb").asc()],
        bucket_cols=["_pb"],
        tiebreaker="doc_id",
        value_col="len_tokens",
        out_col="start_offset",
    )
    end = F.col("start_offset") + F.col("len_tokens") - 1
    chunk_first = F.floor(F.col("start_offset") / _CTX_LEN).cast("bigint")
    chunk_last = F.floor(end / _CTX_LEN).cast("bigint")
    return c.select(
        "doc_id",
        "len_tokens",
        "start_offset",
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        (chunk_last - chunk_first + 1).cast("bigint").alias("n_chunks"),
        (chunk_last > chunk_first).alias("crosses_boundary"),
    ).orderBy("doc_id")


_CHUNKS_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) + 1 AS BIGINT)
               AS len_tokens
    FROM documents
),
c AS (
    SELECT doc_id, len_tokens,
           CAST(COALESCE(SUM(len_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM t
),
spans AS (
    SELECT doc_id, len_tokens, start_offset,
           unnest(generate_series(start_offset // {_CTX_LEN},
                                  (start_offset + len_tokens - 1) // {_CTX_LEN}))
               AS chunk_id
    FROM c
)
SELECT chunk_id, doc_id,
       GREATEST(start_offset, chunk_id * {_CTX_LEN}) - start_offset
           AS doc_token_start,
       LEAST(start_offset + len_tokens, (chunk_id + 1) * {_CTX_LEN})
           - GREATEST(start_offset, chunk_id * {_CTX_LEN}) AS n_tokens_in_chunk,
       GREATEST(start_offset, chunk_id * {_CTX_LEN}) - chunk_id * {_CTX_LEN}
           AS chunk_token_start
FROM spans
ORDER BY chunk_id, doc_id
"""


@register("doc_context_chunks", _CHUNKS_ORACLE, extra=True)
def doc_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse packing manifest — one row per (chunk, document) overlap:
    which token range of which document fills which slice of which training
    context. This is the map a loader actually consumes (given chunk k,
    fetch its constituent document spans) and the provenance index for
    contamination tracing (given a document, which training contexts saw
    it). Columns: ``doc_token_start`` (offset of the overlap within the
    document), ``chunk_token_start`` (offset within the chunk),
    ``n_tokens_in_chunk``.

    Same histogram-first prefix sum as ``doc_context_packing``; the span
    explode is map-side (sequence over the doc's chunk range — bounded by
    doc length / context length), so output volume is the overlap count
    (≈ corpus tokens / {_CTX_LEN} + docs), never quadratic.
    """
    from ..operators.ranking import global_prefix_sum

    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        (F.size(_tokens()) + 1).cast("bigint").alias("len_tokens"),
        (F.col("doc_id") - F.col("doc_id") % _PACK_BUCKET).alias("_pb"),
    )
    c = global_prefix_sum(
        t,
        bucket_order=[F.col("_pb").asc()],
        bucket_cols=["_pb"],
        tiebreaker="doc_id",
        value_col="len_tokens",
        out_col="start_offset",
    )
    end = F.col("start_offset") + F.col("len_tokens") - 1
    spans = c.select(
        "doc_id",
        "len_tokens",
        "start_offset",
        F.explode(
            F.sequence(
                F.floor(F.col("start_offset") / _CTX_LEN).cast("bigint"),
                F.floor(end / _CTX_LEN).cast("bigint"),
            )
        ).alias("chunk_id"),
    )
    ov_start = F.greatest(F.col("start_offset"), F.col("chunk_id") * _CTX_LEN)
    ov_end = F.least(
        F.col("start_offset") + F.col("len_tokens"),
        (F.col("chunk_id") + 1) * _CTX_LEN,
    )
    return spans.select(
        "chunk_id",
        "doc_id",
        (ov_start - F.col("start_offset")).cast("bigint").alias("doc_token_start"),
        (ov_end - ov_start).cast("bigint").alias("n_tokens_in_chunk"),
        (ov_start - F.col("chunk_id") * _CTX_LEN)
        .cast("bigint")
        .alias("chunk_token_start"),
    ).orderBy("chunk_id", "doc_id")


# --- tokenizer-aware packing: the BPE-token stream through the same machinery --------

_BPE_PACKING_ORACLE = f"""
WITH t AS (
    SELECT doc_id, CAST(n_pieces + 1 AS BIGINT) AS len_tokens
    FROM ({_bpe_encode_oracle(_BPE_NUM_MERGES)}) enc
),
c AS (
    SELECT doc_id, len_tokens,
           CAST(COALESCE(SUM(len_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM t
)
SELECT doc_id, len_tokens, start_offset,
       start_offset // {_CTX_LEN} AS chunk_first,
       (start_offset + len_tokens - 1) // {_CTX_LEN} AS chunk_last,
       CAST((start_offset + len_tokens - 1) // {_CTX_LEN}
            - start_offset // {_CTX_LEN} + 1 AS BIGINT) AS n_chunks,
       ((start_offset + len_tokens - 1) // {_CTX_LEN})
           > (start_offset // {_CTX_LEN}) AS crosses_boundary
FROM c
ORDER BY doc_id
"""


@register("doc_bpe_context_packing", _BPE_PACKING_ORACLE)
def doc_bpe_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware training-context packing: the SAME packing manifest
    as ``doc_context_packing`` but over the TRAINED BPE tokenizer's
    token-id stream (``doc_bpe_encode_corpus``'s ``n_pieces`` + one EOS per
    doc) instead of whitespace tokens — what a production pretraining
    pipeline actually cuts at context boundaries. Proves the packing
    machinery is tokenizer-generic: lengths come from ANY measured source,
    the histogram-first prefix sum doesn't care.

    Scale: the tokenizer pass is ``doc_bpe_encode_corpus``'s distinct-word
    decomposition (vocab-bounded segmentation, broadcast word→ids map);
    packing adds the usual one-histogram-SinglePartition prefix sum over
    bucket sums — the corpus never single-partitions.
    """
    from ..operators.ranking import global_prefix_sum

    enc = doc_bpe_encode_corpus(spark, sf_dir)
    t = enc.select(
        "doc_id",
        (F.col("n_pieces") + 1).cast("bigint").alias("len_tokens"),
        (F.col("doc_id") - F.col("doc_id") % _PACK_BUCKET).alias("_pb"),
    )
    c = global_prefix_sum(
        t,
        bucket_order=[F.col("_pb").asc()],
        bucket_cols=["_pb"],
        tiebreaker="doc_id",
        value_col="len_tokens",
        out_col="start_offset",
    )
    end = F.col("start_offset") + F.col("len_tokens") - 1
    chunk_first = F.floor(F.col("start_offset") / _CTX_LEN).cast("bigint")
    chunk_last = F.floor(end / _CTX_LEN).cast("bigint")
    return c.select(
        "doc_id",
        "len_tokens",
        "start_offset",
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        (chunk_last - chunk_first + 1).cast("bigint").alias("n_chunks"),
        (chunk_last > chunk_first).alias("crosses_boundary"),
    ).orderBy("doc_id")


# --- padded bin packing by harmonic size classes (Lee & Lee 1985) ---------------------
# The OTHER packing discipline: instruction-tuning / eval batching pads each
# context and never splits a document, so the job is bin packing whole docs
# into CTX_LEN bins with minimum padding. First-fit-decreasing is inherently
# sequential; the HARMONIC family is not: a doc of (capped) length L packs
# k = floor(CTX/L) per bin, so class membership is a map-side function, the
# within-class rank is the histogram-first global rank, and bin/slot are
# pure arithmetic on that rank — deterministic, shuffle-bounded, and
# identical in SQL (competitive ratio ~1.69 vs optimal, the documented
# trade for distributability).

_HARMONIC_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           GREATEST(LEAST(CAST(len(regexp_extract_all(lower(text), '{{TOKEN_RE}}')) + 1 AS BIGINT),
                 {{CTX}}), 1) AS len_tokens
    FROM documents
),
k AS (
    SELECT doc_id, len_tokens,
           CAST({{CTX}} // len_tokens AS BIGINT) AS size_class
    FROM t
),
r AS (
    SELECT doc_id, len_tokens, size_class,
           ROW_NUMBER() OVER (PARTITION BY size_class ORDER BY doc_id) AS rank_in_class
    FROM k
),
cls AS (
    SELECT size_class,
           CAST(CEIL(COUNT(*) * 1.0 / size_class) AS BIGINT) AS n_bins
    FROM k GROUP BY size_class
),
off AS (
    SELECT size_class,
           CAST(COALESCE(SUM(n_bins) OVER (
               ORDER BY size_class ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS bin_offset
    FROM cls
)
SELECT r.doc_id, r.len_tokens, r.size_class,
       CAST(o.bin_offset + (r.rank_in_class - 1) // r.size_class AS BIGINT) AS bin_id,
       CAST((r.rank_in_class - 1) % r.size_class AS BIGINT) AS slot
FROM r JOIN off o USING (size_class)
ORDER BY r.doc_id
""".format(TOKEN_RE=TOKEN_RE, CTX=_CTX_LEN)


@register("doc_pack_harmonic", _HARMONIC_ORACLE)
def doc_pack_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padded bin-packing manifest (harmonic size classes): every document
    (token count + EOS, capped at the context length) lands in a
    ``size_class`` ``k = floor(CTX/len)``; ``k`` docs of a class share one
    bin, so ``bin_id``/``slot`` follow arithmetically from the doc's rank
    within its class. The manifest a padded-batch loader consumes:
    (doc_id, len_tokens, size_class, bin_id, slot), bins globally numbered
    class-major.

    Scale: class assignment is map-side; the within-class rank is
    ``operators/ranking.py::global_rank`` (histogram-first — no
    corpus-scale ``Exchange SinglePartition``; the only single-partition
    passes run over the class histogram, ≤ CTX_LEN rows); the class→bin
    offset table is class-cardinality and broadcasts back. Compare
    ``doc_context_packing`` for the GPT-style concatenate-and-split
    discipline; ``doc_packing_efficiency`` audits the gap between the two.
    """
    from ..operators.ranking import global_rank

    d = _docs(spark, sf_dir)
    # greatest(..., 1): a NULL text gives size() = -1 → len 0 → NULL
    # size_class (512/0) — clamping keeps the bin-validity invariant even if
    # the fixture's non-null-text guarantee ever changes
    t = d.select(
        "doc_id",
        F.greatest(
            F.least(
                (F.size(_tokens()) + 1).cast("bigint"), F.lit(_CTX_LEN).cast("bigint")
            ),
            F.lit(1).cast("bigint"),
        ).alias("len_tokens"),
    )
    k = t.select(
        "doc_id",
        "len_tokens",
        F.floor(_CTX_LEN / F.col("len_tokens")).cast("bigint").alias("size_class"),
        (F.col("doc_id") - F.col("doc_id") % _PACK_BUCKET).alias("_pb"),
    )
    ranked = global_rank(
        k,
        bucket_order=[F.col("size_class").asc(), F.col("_pb").asc()],
        bucket_cols=["size_class", "_pb"],
        tiebreaker="doc_id",
        rank_col="_grank",
    )
    # class-major global rank minus the exclusive count of earlier classes
    # = the within-class rank; both tables are class-cardinality (tiny)
    cls = k.groupBy("size_class").agg(F.count(F.lit(1)).alias("_n"))
    from pyspark.sql import Window

    w = Window.orderBy("size_class").rowsBetween(Window.unboundedPreceding, -1)
    off = cls.select(
        "size_class",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_class_off"),
        F.coalesce(
            F.sum(F.ceil(F.col("_n") / F.col("size_class")).cast("bigint")).over(w),
            F.lit(0),
        ).alias("_bin_off"),
    )
    r = ranked.join(F.broadcast(off), "size_class").select(
        "doc_id",
        "len_tokens",
        "size_class",
        (F.col("_grank") - F.col("_class_off")).alias("_rank_in_class"),
        "_bin_off",
    )
    in_class = F.col("_rank_in_class") - 1
    return r.select(
        "doc_id",
        "len_tokens",
        "size_class",
        (F.col("_bin_off") + F.floor(in_class / F.col("size_class")))
        .cast("bigint")
        .alias("bin_id"),
        (in_class % F.col("size_class")).cast("bigint").alias("slot"),
    ).orderBy("doc_id")


# --- harmonic-vs-FFD gap, measured -----------------------------------------------------
# The harmonic packer trades FFD's sequentiality for distributability at a
# CITED ~1.69 competitive ratio. This query makes the trade a MEASURED
# number: exact first-fit-decreasing bin count beside the harmonic count and
# the L1 lower bound. FFD is inherently sequential, but it only needs the
# (length -> count) histogram (<= CTX_LEN rows at ANY corpus size — docs cap
# at the context length), so the sequential part runs driver-side over the
# histogram in O(distinct-lengths x bins) while the corpus itself sees one
# shuffle. The DuckDB oracle replays first-fit per document with a recursive
# CTE (one step per doc, residual list as state) — slow but exact, and only
# ever run at the sf0.001/sf0.01 gates.


def _ffd_bin_count(hist: list[tuple[int, int]], ctx: int) -> int:
    """Exact first-fit-decreasing bin count from a (length, count) histogram.

    Equal lengths batch without changing first-fit semantics: while placing
    items of length L in descending-length order, every bin left of the
    scan pointer was already seen to have residual < L and residuals only
    shrink, so the pointer never needs to rewind within a length class; a
    fresh bin deterministically takes floor(ctx/L) items."""
    resid: list[int] = []
    i = 0
    for length, count in sorted(hist, reverse=True):
        i = 0
        c = int(count)
        while c:
            while i < len(resid) and resid[i] < length:
                i += 1
            if i == len(resid):
                k = ctx // length
                full, c = divmod(c, k)
                resid.extend([ctx - k * length] * full)
                if c:
                    resid.append(ctx - c * length)
                    c = 0
                i = len(resid)
            else:
                q = min(c, resid[i] // length)
                resid[i] -= q * length
                c -= q
    return len(resid)


_FFD_GAP_ORACLE = f"""
WITH RECURSIVE t AS (
    SELECT doc_id,
           GREATEST(LEAST(CAST(len(regexp_extract_all(lower(text), '{{TOKEN_RE}}')) + 1 AS BIGINT),
                 {{CTX}}), 1) AS len_tokens
    FROM documents
),
docs AS (
    SELECT len_tokens,
           ROW_NUMBER() OVER (ORDER BY len_tokens DESC, doc_id) AS rn
    FROM t
),
ffd AS (
    SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS resid
    UNION ALL
    SELECT d.rn,
           CASE WHEN len(list_filter(range(1, len(f.resid) + 1),
                                     i -> f.resid[i] >= d.len_tokens)) = 0
                THEN list_append(f.resid, CAST({{CTX}} AS BIGINT) - d.len_tokens)
                ELSE list_transform(range(1, len(f.resid) + 1),
                       i -> CASE WHEN i = list_filter(range(1, len(f.resid) + 1),
                                        j -> f.resid[j] >= d.len_tokens)[1]
                            THEN f.resid[i] - d.len_tokens ELSE f.resid[i] END)
           END AS resid
    FROM ffd f JOIN docs d ON d.rn = f.rn + 1
),
ffd_final AS (
    SELECT CAST(len(resid) AS BIGINT) AS ffd_bins FROM ffd ORDER BY rn DESC LIMIT 1
),
cls AS (
    SELECT CAST({{CTX}} // len_tokens AS BIGINT) AS size_class,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len_tokens) AS BIGINT) AS class_tokens
    FROM t GROUP BY 1
),
agg AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(class_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(CEIL(n_docs * 1.0 / size_class) AS BIGINT)) AS BIGINT) AS harmonic_bins,
           CAST(CEIL(SUM(class_tokens) * 1.0 / {{CTX}}) AS BIGINT) AS lower_bound_bins
    FROM cls
)
SELECT a.n_docs, a.total_tokens, a.lower_bound_bins, a.harmonic_bins, x.ffd_bins,
       ROUND(x.ffd_bins * 1.0 / a.lower_bound_bins, 6) AS ffd_over_lower_bound,
       ROUND(a.harmonic_bins * 1.0 / x.ffd_bins, 6) AS harmonic_over_ffd
FROM agg a, ffd_final x
""".format(TOKEN_RE=TOKEN_RE, CTX=_CTX_LEN)


@register("doc_pack_ffd_gap", _FFD_GAP_ORACLE)
def doc_pack_ffd_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The harmonic packer's competitive ratio, measured (one row): exact
    first-fit-decreasing bin count vs ``doc_pack_harmonic``'s count vs the
    L1 lower bound. ``harmonic_over_ffd`` is the number a pipeline owner
    reads before trading distributability for a sequential packer.

    Scale: ONE corpus shuffle (the length histogram — lengths cap at
    CTX_LEN, so it is ≤ CTX_LEN rows at any corpus size); FFD then runs
    driver-side over the histogram (:func:`_ffd_bin_count` — batched
    first-fit, exact per-item semantics), the same bounded-collect
    discipline as the BPE merge table and the class-histogram passes.
    """
    d = _docs(spark, sf_dir)
    t = d.select(
        F.greatest(
            F.least(
                (F.size(_tokens()) + 1).cast("bigint"), F.lit(_CTX_LEN).cast("bigint")
            ),
            F.lit(1).cast("bigint"),
        ).alias("len_tokens"),
    )
    hist = [
        (int(r["len_tokens"]), int(r["n"]))
        for r in t.groupBy("len_tokens").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    ffd_bins = _ffd_bin_count(hist, _CTX_LEN)
    n_docs = sum(c for _, c in hist)
    total_tokens = sum(length * c for length, c in hist)
    by_class: dict[int, int] = {}
    for length, c in hist:
        k = _CTX_LEN // length
        by_class[k] = by_class.get(k, 0) + c
    harmonic_bins = sum(-(-n // k) for k, n in by_class.items())
    lower_bound = -(-total_tokens // _CTX_LEN)
    return spark.createDataFrame(
        [
            (
                n_docs,
                total_tokens,
                lower_bound,
                harmonic_bins,
                ffd_bins,
                round(ffd_bins / lower_bound, 6),
                round(harmonic_bins / ffd_bins, 6),
            )
        ],
        schema=(
            "n_docs bigint, total_tokens bigint, lower_bound_bins bigint, "
            "harmonic_bins bigint, ffd_bins bigint, ffd_over_lower_bound double, "
            "harmonic_over_ffd double"
        ),
    )


# --- tokenizer-compression quality signal ---------------------------------------------
# Chars-per-BPE-token as a quality dial: pathologically repetitive text
# compresses far ABOVE the corpus band (few long merged pieces), while
# noise/garbage compresses far BELOW it (everything falls back to
# characters). Cheap, language-agnostic, and computed from an artifact the
# pipeline already ships (the encoded corpus) — the compression-based
# filtering idea used by public data-curation recipes.

_COMPRESS_LO = 1.35  # chars per BPE piece: below = noise-like (band is relative to the trained merge budget)
_COMPRESS_HI = 1.70  # above = degenerate/repetitive

_BPE_COMPRESS_ORACLE = f"""
WITH enc AS (
    SELECT doc_id, n_pieces FROM ({{ENC}}) base
)
SELECT d.doc_id,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       e.n_pieces,
       ROUND(d.n_chars * 1.0 / NULLIF(e.n_pieces, 0), 6) AS chars_per_piece,
       COALESCE(d.n_chars * 1.0 / NULLIF(e.n_pieces, 0)
                BETWEEN {{LO}} AND {{HI}}, FALSE) AS keep_compression
FROM documents d JOIN enc e USING (doc_id)
ORDER BY d.doc_id
""".format(ENC=_bpe_encode_oracle(_BPE_NUM_MERGES), LO=_COMPRESS_LO, HI=_COMPRESS_HI)


@register("doc_bpe_compression_quality", _BPE_COMPRESS_ORACLE)
def doc_bpe_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality filter over the TRAINED tokenizer: keep
    documents whose chars-per-BPE-piece sits inside the healthy band
    (1.35–1.70 on the trained 60-merge tokenizer — the band is relative to
    the merge budget); repetitive text compresses above it,
    character-noise below. Zero extra passes over text — composes
    ``doc_bpe_encode_corpus``'s n_pieces with the stored ``n_chars``
    column; empty docs (0 pieces) fail the keep (NULL ratio → FALSE).

    Scale: inherits the encode query's distinct-word decomposition; this
    adds one doc-keyed join of two fixed-width columns.
    """
    enc = doc_bpe_encode_corpus(spark, sf_dir).select("doc_id", "n_pieces")
    d = _docs(spark, sf_dir).select("doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    ratio = F.col("n_chars") * 1.0 / F.nullif(F.col("n_pieces"), F.lit(0))
    return (
        d.join(enc, "doc_id")
        .select(
            "doc_id",
            "n_chars",
            "n_pieces",
            F.round(ratio, 6).alias("chars_per_piece"),
            F.coalesce(
                ratio.between(_COMPRESS_LO, _COMPRESS_HI), F.lit(False)
            ).alias("keep_compression"),
        )
        .orderBy("doc_id")
    )


_HARMONIC_STATS_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           GREATEST(LEAST(CAST(len(regexp_extract_all(lower(text), '{{TOKEN_RE}}')) + 1 AS BIGINT),
                 {{CTX}}), 1) AS len_tokens
    FROM documents
),
k AS (
    SELECT len_tokens, CAST({{CTX}} // len_tokens AS BIGINT) AS size_class FROM t
),
cls AS (
    SELECT size_class,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len_tokens) AS BIGINT) AS class_tokens,
           CAST(CEIL(COUNT(*) * 1.0 / size_class) AS BIGINT) AS n_bins
    FROM k GROUP BY size_class
)
SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(class_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bins) AS BIGINT) AS n_bins,
       CAST(CEIL(SUM(class_tokens) * 1.0 / {{CTX}}) AS BIGINT) AS lower_bound_bins,
       ROUND(SUM(class_tokens) * 1.0 / (SUM(n_bins) * {{CTX}}), 6) AS utilization,
       ROUND(SUM(class_tokens) * 1.0 / (SUM(n_docs) * {{CTX}}), 6)
           AS one_doc_per_bin_utilization,
       ROUND(SUM(n_bins) * 1.0 / CEIL(SUM(class_tokens) * 1.0 / {{CTX}}), 6)
           AS bins_over_lower_bound
FROM cls
""".format(TOKEN_RE=TOKEN_RE, CTX=_CTX_LEN)


@register("doc_pack_harmonic_stats", _HARMONIC_STATS_ORACLE)
def doc_pack_harmonic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding audit of the harmonic packer (one row): bins used vs the L1
    lower bound (ceil(total/CTX) — no packer can beat it), token
    utilization vs the naive one-document-per-bin baseline every padded
    loader starts from. The number a pipeline owner reads before deciding
    whether a smarter (sequential, non-distributable) packer is worth it.

    Scale: everything reduces over the class histogram (≤ CTX_LEN rows) —
    one corpus shuffle for the class rollup, then arithmetic."""
    d = _docs(spark, sf_dir)
    # same greatest(...,1) clamp as doc_pack_harmonic (NULL-text guard)
    t = d.select(
        F.greatest(
            F.least(
                (F.size(_tokens()) + 1).cast("bigint"), F.lit(_CTX_LEN).cast("bigint")
            ),
            F.lit(1).cast("bigint"),
        ).alias("len_tokens"),
    )
    cls = (
        t.select(
            "len_tokens",
            F.floor(_CTX_LEN / F.col("len_tokens")).cast("bigint").alias("size_class"),
        )
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len_tokens").alias("class_tokens"),
        )
        .select(
            "n_docs",
            "class_tokens",
            F.ceil(F.col("n_docs") / F.col("size_class")).cast("bigint").alias("n_bins"),
        )
    )
    total = F.sum("class_tokens")
    bins = F.sum("n_bins")
    docs = F.sum("n_docs")
    lower = F.ceil(total * 1.0 / _CTX_LEN).cast("bigint")
    return cls.agg(
        docs.cast("bigint").alias("n_docs"),
        total.cast("bigint").alias("total_tokens"),
        bins.cast("bigint").alias("n_bins"),
        lower.alias("lower_bound_bins"),
        F.round(total * 1.0 / (bins * _CTX_LEN), 6).alias("utilization"),
        F.round(total * 1.0 / (docs * _CTX_LEN), 6).alias(
            "one_doc_per_bin_utilization"
        ),
        F.round(bins * 1.0 / F.ceil(total * 1.0 / _CTX_LEN), 6).alias(
            "bins_over_lower_bound"
        ),
    )


# --- chunk-level contamination tracing ------------------------------------------------
# The query a pipeline owner runs when benchmark overlap is discovered AFTER
# the corpus was packed: which training contexts must be dropped? Composes
# the packing manifest (doc_context_chunks) with the per-document
# decontamination verdict (doc_contamination_check) — a chunk is dropped if
# ANY of its constituent token spans comes from a contaminated training
# document OR from the eval set itself (eval docs leaking into training
# contexts is the textbook contamination mode, Brown et al. 2020 App. C).

_CONTAM_CHUNKS_ORACLE_TMPL = """
WITH chunks AS ({CHUNKS}),
contam AS ({CONTAM}),
tagged AS (
    SELECT c.chunk_id, c.n_tokens_in_chunk,
           (COALESCE(ct.contaminated, FALSE) OR c.doc_id < {EVAL_MAX}) AS tainted
    FROM chunks c LEFT JOIN contam ct USING (doc_id)
)
SELECT chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN tainted THEN 1 ELSE 0 END) AS BIGINT) AS n_tainted_docs,
       CAST(SUM(CASE WHEN tainted THEN n_tokens_in_chunk ELSE 0 END) AS BIGINT)
           AS tainted_tokens,
       CAST(SUM(n_tokens_in_chunk) AS BIGINT) AS chunk_tokens,
       SUM(CASE WHEN tainted THEN 1 ELSE 0 END) > 0 AS drop_chunk
FROM tagged
GROUP BY chunk_id
ORDER BY chunk_id
"""


def _contam_chunks_oracle() -> str:
    from .text import _CONTAM_ORACLE, _EVAL_SET_MAX_DOC

    return _CONTAM_CHUNKS_ORACLE_TMPL.format(
        CHUNKS=_CHUNKS_ORACLE, CONTAM=_CONTAM_ORACLE, EVAL_MAX=_EVAL_SET_MAX_DOC
    )


@register("doc_contaminated_chunks", _contam_chunks_oracle())
def doc_contaminated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-context contamination verdict: for every packed chunk,
    how many of its constituent documents are tainted (flagged by the
    shingle-overlap decontamination check, or eval-set members themselves),
    how many of its tokens those documents contribute, and whether the chunk
    must be dropped before training. This is decontamination applied AT THE
    ARTIFACT the trainer consumes — under GPT-style packing a clean document
    still burns if it shares a context with a contaminated neighbour, and
    this manifest quantifies exactly that collateral.

    Scale: both inputs are already scale-posed — the chunk manifest carries
    token counts (never text) through the histogram-first prefix sum, and the
    contamination check broadcasts the eval shingle set. The composition adds
    one doc-keyed LEFT join (manifest-scale rows, fixed-width) and one
    map-side-combinable groupBy on chunk_id. Nothing here touches document
    text.
    """
    from .text import _EVAL_SET_MAX_DOC, doc_contamination_check

    chunks = doc_context_chunks(spark, sf_dir)
    contam = doc_contamination_check(spark, sf_dir).select("doc_id", "contaminated")
    tainted = F.coalesce(F.col("contaminated"), F.lit(False)) | (
        F.col("doc_id") < _EVAL_SET_MAX_DOC
    )
    tagged = chunks.join(contam, "doc_id", "left").select(
        "chunk_id", "n_tokens_in_chunk", tainted.alias("tainted")
    )
    t_int = F.col("tainted").cast("int")
    return (
        tagged.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(t_int).alias("n_tainted_docs"),
            F.sum(F.when(F.col("tainted"), F.col("n_tokens_in_chunk")).otherwise(0)).alias(
                "tainted_tokens"
            ),
            F.sum("n_tokens_in_chunk").alias("chunk_tokens"),
            (F.sum(t_int) > 0).alias("drop_chunk"),
        )
        .select(
            "chunk_id",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tainted_docs").cast("bigint").alias("n_tainted_docs"),
            F.col("tainted_tokens").cast("bigint").alias("tainted_tokens"),
            F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
            "drop_chunk",
        )
        .orderBy("chunk_id")
    )


# --- fill-in-the-middle split manifest --------------------------------------------------
# FIM (Bavarian et al. 2022, "Efficient Training of Language Models to Fill
# in the Middle"): a fixed fraction of training documents is rearranged as
# prefix/suffix/middle so the model learns infilling. The transform itself is
# a token-stream permutation applied by the loader; what the PIPELINE owns is
# the deterministic split manifest — which documents flip, where the two cut
# points fall, and in which order (PSM vs SPM) the spans are emitted. Hash-
# based draws make the manifest reproducible across runs, engines, and
# corpus growth (the doc_stratified_sample discipline — never df.sample).

_FIM_RATE_PCT = 50  # fraction of eligible documents transformed, in percent
_FIM_MIN_TOKENS = 4  # below this a 3-way split is degenerate; doc stays AR

_FIM_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{{TOKEN_RE}}')) AS BIGINT)
               AS n_tokens
    FROM documents
),
d AS (
    SELECT doc_id, n_tokens,
           ({{H_FLIP}} % 100) < {_FIM_RATE_PCT} AND n_tokens >= {_FIM_MIN_TOKENS}
               AS fim,
           {{H_CUT_A}} % (n_tokens + 1) AS u,
           {{H_CUT_B}} % (n_tokens + 1) AS v,
           {{H_MODE}} % 2 AS m
    FROM t
)
SELECT doc_id, n_tokens, fim,
       CASE WHEN NOT fim THEN 'none' WHEN m = 0 THEN 'psm' ELSE 'spm' END AS mode,
       CASE WHEN fim THEN LEAST(u, v) ELSE n_tokens END AS prefix_len,
       CASE WHEN fim THEN GREATEST(u, v) - LEAST(u, v) ELSE 0 END AS middle_len,
       CASE WHEN fim THEN n_tokens - GREATEST(u, v) ELSE 0 END AS suffix_len
FROM d
ORDER BY doc_id
"""


def _fim_oracle() -> str:
    return _FIM_ORACLE.format(
        TOKEN_RE=TOKEN_RE,
        H_FLIP=h60_sql_duckdb("'fim-flip-' || CAST(doc_id AS VARCHAR)"),
        H_CUT_A=h60_sql_duckdb("'fim-cut-a-' || CAST(doc_id AS VARCHAR)"),
        H_CUT_B=h60_sql_duckdb("'fim-cut-b-' || CAST(doc_id AS VARCHAR)"),
        H_MODE=h60_sql_duckdb("'fim-mode-' || CAST(doc_id AS VARCHAR)"),
    )


def _fim_h(salt: str) -> Column:
    return h60(F.concat(F.lit(salt), F.col("doc_id").cast("string")))


@register("doc_fim_split", _fim_oracle())
def doc_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle split manifest (Bavarian et al. 2022): flag
    ``_FIM_RATE_PCT``% of sufficiently-long documents for FIM, draw the two
    cut points uniformly over token boundaries, and emit the
    prefix/middle/suffix token lengths plus the emission order (PSM or SPM,
    a fair coin per Bavarian §3). Every draw is an h60 hash of a salted
    doc_id, so the manifest is a pure function of the corpus — rerunning,
    re-sharding, or appending documents never reshuffles existing splits
    (the joint-probability property SPM/PSM mixing relies on).

    Scale: map-only — token counts come from the in-row tokenizer, every
    draw is a hash of the row's own key, no joins, no shuffle of any kind
    (plan-gated: zero Exchanges). 100 TB = one embarrassingly-parallel scan.
    """
    n = F.size(_tokens()).cast("bigint")
    t = _docs(spark, sf_dir).select("doc_id", n.alias("n_tokens"))
    fim = ((_fim_h("fim-flip-") % 100) < _FIM_RATE_PCT) & (
        F.col("n_tokens") >= _FIM_MIN_TOKENS
    )
    u = _fim_h("fim-cut-a-") % (F.col("n_tokens") + 1)
    v = _fim_h("fim-cut-b-") % (F.col("n_tokens") + 1)
    mode = (
        F.when(~F.col("fim"), "none")
        .when(_fim_h("fim-mode-") % 2 == 0, "psm")
        .otherwise("spm")
    )
    return (
        t.select("doc_id", "n_tokens", fim.alias("fim"), u.alias("_u"), v.alias("_v"))
        .select(
            "doc_id",
            "n_tokens",
            "fim",
            mode.alias("mode"),
            F.when(F.col("fim"), F.least("_u", "_v"))
            .otherwise(F.col("n_tokens"))
            .alias("prefix_len"),
            F.when(F.col("fim"), F.greatest("_u", "_v") - F.least("_u", "_v"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("middle_len"),
            F.when(F.col("fim"), F.col("n_tokens") - F.greatest("_u", "_v"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("suffix_len"),
        )
        .orderBy("doc_id")
    )


# --- packing efficiency ----------------------------------------------------------------
# The one-row audit a pipeline owner reads before choosing GPT-style packing
# over pad-per-document batching: how many contexts the packed stream needs,
# how full the stream is, how many documents straddle a boundary (attention
# contamination surface under full attention), and what padding would have
# cost instead (each doc rounded up to whole contexts — the Brown 2020 §2.2
# motivation, quantified on this corpus).

_PACK_EFF_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) + 1 AS BIGINT)
               AS len_tokens
    FROM documents
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM((len_tokens + {_CTX_LEN} - 1) // {_CTX_LEN}) AS BIGINT)
               AS padded_chunks
    FROM t
),
c AS (
    SELECT len_tokens,
           CAST(COALESCE(SUM(len_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM t
),
x AS (
    SELECT CAST(SUM(CASE WHEN (start_offset + len_tokens - 1) // {_CTX_LEN}
                              > start_offset // {_CTX_LEN}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing
    FROM c
)
SELECT tot.n_docs, tot.total_tokens,
       (tot.total_tokens + {_CTX_LEN} - 1) // {_CTX_LEN} AS packed_chunks,
       tot.padded_chunks,
       x.n_crossing,
       ROUND(tot.total_tokens * 1.0
             / (((tot.total_tokens + {_CTX_LEN} - 1) // {_CTX_LEN}) * {_CTX_LEN}),
             6) AS packed_utilization,
       ROUND(tot.total_tokens * 1.0 / (tot.padded_chunks * {_CTX_LEN}), 6)
           AS padded_utilization
FROM tot CROSS JOIN x
"""


@register("doc_packing_efficiency", _PACK_EFF_ORACLE)
def doc_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-vs-padding audit, one row: packed context count and stream
    utilization (GPT-style concatenate-and-cut wastes only the final
    context's tail), the padded alternative's context count and utilization
    (each doc rounded up to whole contexts), and how many documents cross a
    context boundary — the sizes of the compute-vs-provenance tradeoff.

    Scale: token counts are in-row; the padded rollup is one global
    aggregate (map-side combined, 1-row final). The boundary-crossing count
    reuses the histogram-first prefix sum, so nothing here serializes the
    corpus."""
    from ..operators.ranking import global_prefix_sum

    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        (F.size(_tokens()) + 1).cast("bigint").alias("len_tokens"),
        (F.col("doc_id") - F.col("doc_id") % _PACK_BUCKET).alias("_pb"),
    )
    tot = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len_tokens").cast("bigint").alias("total_tokens"),
        F.sum(
            F.floor((F.col("len_tokens") + _CTX_LEN - 1) / _CTX_LEN).cast("bigint")
        )
        .cast("bigint")
        .alias("padded_chunks"),
    )
    c = global_prefix_sum(
        t,
        bucket_order=[F.col("_pb").asc()],
        bucket_cols=["_pb"],
        tiebreaker="doc_id",
        value_col="len_tokens",
        out_col="start_offset",
    )
    end = F.col("start_offset") + F.col("len_tokens") - 1
    crossing = (
        F.floor(end / _CTX_LEN) > F.floor(F.col("start_offset") / _CTX_LEN)
    ).cast("int")
    x = c.agg(F.sum(crossing).cast("bigint").alias("n_crossing"))
    packed_chunks = F.floor((F.col("total_tokens") + _CTX_LEN - 1) / _CTX_LEN).cast(
        "bigint"
    )
    return (
        tot.crossJoin(F.broadcast(x))
        .select(
            "n_docs",
            "total_tokens",
            packed_chunks.alias("packed_chunks"),
            "padded_chunks",
            "n_crossing",
            F.round(
                F.col("total_tokens") * 1.0 / (packed_chunks * _CTX_LEN), 6
            ).alias("packed_utilization"),
            F.round(
                F.col("total_tokens") * 1.0 / (F.col("padded_chunks") * _CTX_LEN), 6
            ).alias("padded_utilization"),
        )
    )
