"""Physical-plan quality gates: the properties that make these plans survive
a 100 TB scale-up, asserted on ``explain`` output so a regression (a lost
pushdown, a broadcast that became a shuffle, a Python UDF sneaking into a hot
path) fails CI — not just slows the bench.
"""

import contextlib
import io

import pytest

from clickhouse_etl_loadtest_spark.queries import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    # shipdate predicate reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: scan reads only the 7 needed columns, not all 11
    read_schema = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema
    # two-phase aggregation (map-side partial combine before the shuffle)
    assert plan.count("HashAggregate") >= 2
    # whole-stage codegen: with AQE the codegen markers only exist in the
    # final (post-execution) plan, so run the query first
    df = REGISTRY["pricing_summary"].fn(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    final_plan = buf.getvalue()
    assert "isFinalPlan=true" in final_plan
    # codegen stages carry a "* " marker in the final plan (e.g. "* HashAggregate")
    assert "* HashAggregate" in final_plan


def test_region_revenue_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "region_revenue")
    # nation/region are forced broadcasts (fixed cardinality at any SF);
    # supplier grows with SF so its strategy is size-based — broadcast at
    # fixture scale, shuffle once it outgrows autoBroadcastJoinThreshold.
    # Either is a valid plan; what matters is >=2 broadcasts and no
    # cartesian fallback.
    assert plan.count("BroadcastHashJoin") >= 2  # nation, region (+ supplier if small)
    # the big fact-side joins shuffle on their keys, not nested-loop
    assert "BroadcastNestedLoopJoin" not in plan


def test_fact_table_is_never_the_broadcast_build_side(spark, sf_dir):
    """r14 regression gate: size-only estimation used to BROADCAST the
    pruned lineitem fact table in the Q3/Q5 shapes (join-output estimates
    inflate past any threshold while the pruned scan slips under it) — a
    serial driver hash build of every fact row, and an OOM at real scale.
    The SHUFFLE_HASH hint on the customer⋈orders side pins the deliberate
    strategy: lineitem STREAMS; only the selective side is ever built."""
    import re

    for name in ("shipping_priority", "region_revenue"):
        plan = plan_of(spark, sf_dir, name)
        assert "ShuffledHashJoin" in plan, name  # the hinted orderkey join
        # no BroadcastExchange may carry lineitem columns (the fact table)
        for m in re.finditer(r"\(\d+\) BroadcastExchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan):
            assert "l_orderkey" not in m.group(1), (name, m.group(1))


def test_dedup_uses_partial_aggregation_not_global_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_first_event_per_user_type")
    # first-wins via one min_by aggregation: partial + final agg, ONE shuffle
    assert plan.count("Aggregate(") >= 2 or plan.count("Aggregate") >= 2
    # no Window operator (a row_number() window would sort entire partitions)
    assert "Window" not in plan
    # no self-join back onto the input (the old agg+rejoin shape)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_doc_stats_prunes_unused_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "doc_token_stats")
    read_schema = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "source" not in read_schema  # never referenced -> never read


def test_ann_topk_broadcasts_query_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ann_cosine_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # corpus side must NOT shuffle for the join itself (rank window comes after)
    scan_to_join = plan.split("Window")[0]
    assert scan_to_join.count("Exchange") <= 2


def test_no_python_udfs_in_jvm_operators(spark, sf_dir):
    """Everything except the multimodal stages must stay JVM-side."""
    for name in (
        "pricing_summary",
        "doc_token_stats",
        "doc_minhash_lsh_pairs",
        "ann_cosine_topk",
        "dedup_pipeline_e2e",
        "events_tumbling_1h",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_multimodal_is_arrow_batched_not_row_python(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "multimodal_decode")
    assert "MapInPandas" in plan  # Arrow-batched, not per-row BatchEvalPython
    assert "BatchEvalPython" not in plan


def exec_plan_of(spark, sf_dir, name: str) -> str:
    """Executed-plan string: exactly one line per physical node (the
    formatted mode lists every node twice — tree + detail block)."""
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_vocab_text_never_crosses_a_shuffle(spark, sf_dir):
    """Everything above the explode must be text-free: the aggregation
    shuffles carry (token, doc_id), never document bodies."""
    plan = exec_plan_of(spark, sf_dir, "vocab_top_terms")
    above_generate = plan.split("Generate")[0]
    assert "text#" not in above_generate
    # top-100 is TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_profile_is_single_pass(spark, sf_dir):
    """One scan, Expand-based multi-distinct — never one job per column."""
    plan = exec_plan_of(spark, sf_dir, "events_profile")
    assert plan.count("FileScan") == 1
    assert "Expand" in plan
    assert "Join" not in plan


def test_promo_broadcasts_part_dimension(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "promo_revenue_by_month")
    assert "BroadcastHashJoin" in plan
    # lineitem reads only the 3 referenced columns
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line and "l_partkey" in line
    )
    assert "l_orderkey" not in read_schema and "l_quantity" not in read_schema


def test_top_orders_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_orders_global")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_scaled_ranks_have_no_single_partition_window(spark, sf_dir):
    """The fact-scale ranking variant must not serialize: rank windows
    partition by nation and the quartile thresholds broadcast, so no
    operator runs on a single partition (the global form
    customer_balance_ranks keeps Exchange SinglePartition by design — it
    ranks a dimension table)."""
    plan = exec_plan_of(spark, sf_dir, "customer_balance_ranks_scaled")
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines
    # every Window node carries a partition spec (3 bracket groups: functions,
    # partition keys, order) — never a global (un-partitioned) sort
    for ln in window_lines:
        assert "], [n_nationkey#" in ln, ln
    # the only SinglePartition exchange is the 1-row threshold aggregate
    # (sketch merge), which must NOT feed the window's sort
    assert "Exchange hashpartitioning(n_nationkey" in plan
    global_plan = exec_plan_of(spark, sf_dir, "customer_balance_ranks")
    gw = [ln for ln in global_plan.splitlines() if "Window [" in ln]
    assert gw and all("], [n_nationkey#" not in ln for ln in gw)  # the contrast this test pins


def test_token_budget_window_is_partitioned_by_lang(spark, sf_dir):
    """The cumsum window must partition by lang — a global take-until-budget
    would be a single-partition sort over the whole corpus."""
    plan = exec_plan_of(spark, sf_dir, "doc_token_budget_sample")
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines
    for ln in window_lines:
        assert "], [lang#" in ln, ln


def test_incremental_dedup_shuffles_hashes_not_text(spark, sf_dir):
    """The anti-join runs on 60-bit content hashes: no operator above the
    first shuffle may reference the text column, and the join must be a
    hash join, never nested-loop."""
    plan = exec_plan_of(spark, sf_dir, "doc_incremental_dedup")
    above_first_exchange = plan.split("Exchange")[0]
    assert "text#" not in above_first_exchange
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_boilerplate_grams_hash_before_explode(spark, sf_dir):
    """Exploded rows carry 16-byte gram hashes, not text: nothing above the
    Generate (explode) may reference the text column."""
    plan = exec_plan_of(spark, sf_dir, "doc_boilerplate_ngrams")
    above_generate = plan.split("Generate")[0]
    assert "text#" not in above_generate
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixing_weights_totals_broadcast(spark, sf_dir):
    """The grand-total join must be the 1-row broadcast pattern — no
    shuffle join for a scalar."""
    plan = exec_plan_of(spark, sf_dir, "source_mixing_weights")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """Eval-set shingle hashes broadcast (eval suites are MBs); the corpus
    side must not shuffle for the overlap join."""
    plan = exec_plan_of(spark, sf_dir, "doc_contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_keep_decision_is_map_only(spark, sf_dir):
    """Per-lang counts broadcast back; the keep decision itself must not
    shuffle document rows — every Exchange in the plan belongs to the tiny
    lang-count aggregate, none to the corpus scan side."""
    plan = exec_plan_of(spark, sf_dir, "doc_stratified_sample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_ivf_assignment_is_map_only(spark, sf_dir):
    """Cell assignment must never shuffle corpus rows: the codebook is a
    1-row broadcast and the argmin is a per-row array_sort — no Window, no
    shuffle join anywhere in the plan."""
    plan = exec_plan_of(spark, sf_dir, "ivf_nearest_centroid")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_ivf_search_shuffles_only_bounded_candidates(spark, sf_dir):
    """Probe search: corpus vectors reach the rerank through broadcast joins
    only; the single Window is the per-query top-k over probed candidates."""
    plan = exec_plan_of(spark, sf_dir, "ivf_search_topk")
    assert plan.count("Window [") == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_priority_join_prunes_both_scans(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "priority_line_counts")
    schemas = [line for line in plan.splitlines() if "ReadSchema" in line]
    joined = "\n".join(schemas)
    assert "l_extendedprice" not in joined and "o_totalprice" not in joined


def test_source_cap_window_is_partitioned_by_source(spark, sf_dir):
    """The per-domain cap ranks inside each source partition — a global
    top-N window would serialize the corpus onto one partition."""
    plan = exec_plan_of(spark, sf_dir, "doc_source_cap")
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines
    for ln in window_lines:
        assert "], [source#" in ln, ln
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[-1]


def test_unigram_logprob_shuffles_carry_hashes_not_tokens(spark, sf_dir):
    """Vocabulary counting and the per-doc re-aggregation shuffle 60-bit
    token hashes: every hashpartitioning Exchange keys on the token hash or
    the doc id (never token/text strings), no text survives past the
    explode, and the corpus never crosses a cross product (the only
    nested-loop join is the 1-row token-total scalar)."""
    plan = exec_plan_of(spark, sf_dir, "doc_unigram_logprob")
    hash_exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert hash_exchanges  # the vocab count + per-doc agg must shuffle something
    for ln in hash_exchanges:
        assert "wh#" in ln or "doc_id#" in ln, ln
    assert "text#" not in plan.split("Generate")[0]  # nothing downstream of explode reads text
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_edit_rerank_broadcasts_only_id_pairs(spark, sf_dir):
    """Levenshtein only ever runs on LSH candidates, and text must NEVER
    enter a broadcast relation: the bare id-pair list builds (BuildLeft)
    both text-lookup joins — the corpus streams through as probe side —
    and the two candidate-sized text frames meet in an ordinary shuffled
    equi-join on the pair ids (broadcasting either one would scale with
    candidate_count x doc length)."""
    plan = exec_plan_of(spark, sf_dir, "doc_edit_distance_rerank")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    bhj = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert len(bhj) == 2, bhj
    for ln in bhj:
        assert "BuildLeft" in ln, ln
    # the pair-id join is shuffled, keyed on both pair ids — never broadcast
    shuffled = [ln for ln in plan.splitlines() if "ShuffledHashJoin" in ln or "SortMergeJoin" in ln]
    assert len(shuffled) == 1, shuffled
    assert "doc_a#" in shuffled[0] and "doc_b#" in shuffled[0]


def test_near_dup_pairs_is_blocked_matmul_not_cartesian(spark, sf_dir):
    """The driver-visible near-dup join must be the blocked exact matmul:
    block fan-out via two broadcast equi-joins, the cosine matrix inside one
    cogrouped Pandas stage — never a nested-loop/cartesian pair join (the
    quadratic expression form stays registered as embedding_near_dup_exact,
    the equality baseline the oracle sweep checks)."""
    plan = exec_plan_of(spark, sf_dir, "embedding_near_dup_pairs")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # block-pair fan-out joins
    assert "FlatMapCoGroupsInPandas" in plan  # the BLAS block-pair stage
    # the same-oracle extra keeps the contrast: it IS the nested-loop form
    exact_plan = exec_plan_of(spark, sf_dir, "embedding_near_dup_exact")
    assert "BroadcastNestedLoopJoin" in exact_plan or "CartesianProduct" in exact_plan


def test_chunk_windows_is_map_only(spark, sf_dir):
    """Chunking is tokenize -> explode -> slice -> hash in one map stage: no
    join, no aggregation, no Window; the only Exchange is the presentation
    sort's range partitioning."""
    plan = exec_plan_of(spark, sf_dir, "doc_chunk_windows")
    assert "Join" not in plan and "Window" not in plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    # allowed: the presentation sort (rangepartitioning) and the fixture
    # scan-spreading repartition (RoundRobin, parallelize_scan) — never a
    # hashpartitioning shuffle, which would mean a hidden join/agg
    assert all(
        "rangepartitioning" in ln or "RoundRobinPartitioning" in ln for ln in exchanges
    ), exchanges


def test_simhash_near_pairs_has_no_join(spark, sf_dir):
    """Banded Hamming pairs: signatures travel inside the bucket-collect
    structs, so the whole plan is agg -> expand -> filter — no join operator
    of any kind, and no Python."""
    plan = exec_plan_of(spark, sf_dir, "doc_simhash_near_pairs")
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- round-4 rotation: plan pins for the newly driver-visible queries ------------


def test_top_spenders_window_is_nation_partitioned(spark, sf_dir):
    """Ranking runs inside a nation-PARTITIONED window (each nation sorts
    only its own customers) — a global-sort window would be the classic
    100 TB scale-killer for per-group top-k."""
    plan = plan_of(spark, sf_dir, "top_spenders_per_nation")
    assert "windowspecdefinition(c_nationkey" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_top_revenue_parts_reuses_the_shared_subplan(spark, sf_dir):
    """HAVING-vs-global-scalar computes the part revenue subplan once: AQE
    must stitch the second consumer onto the first's shuffle output
    (ReusedExchange), not recompute the lineitem aggregation."""
    df = REGISTRY["top_revenue_parts"].fn(spark, sf_dir)
    df.collect()  # AQE stitches the reuse in at runtime — only the final plan shows it
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    final_plan = buf.getvalue()
    assert "isFinalPlan=true" in final_plan
    assert "ReusedExchange" in final_plan


def test_embedding_quantize_is_join_and_window_free(spark, sf_dir):
    """Per-vector int8 quantization is map-only work: no join, no window, no
    Python in the plan — the only Exchange is the presentation sort."""
    plan = plan_of(spark, sf_dir, "embedding_quantize_int8")
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_standardize_moments_broadcast_vectors_never_shuffle(spark, sf_dir):
    """Corpus mean/std reduce to ONE row that broadcasts back over the
    vectors (a single-row BroadcastNestedLoopJoin is that broadcast); the
    embedding column itself must never hash- or sort-shuffle for a join."""
    plan = exec_plan_of(spark, sf_dir, "embedding_standardize_audit")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_cluster_best_keep_has_no_corpus_window(spark, sf_dir):
    """Quality-ranked cluster keep resolves the per-cluster argmax with one
    min(struct(...)) aggregation — no Window operator anywhere (clusters can
    be huge; a rank window would sort every cluster globally), and no
    cartesian fallback."""
    plan = plan_of(spark, sf_dir, "doc_cluster_best_keep")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_scalar_functions_is_single_projection_stage(spark, sf_dir):
    """The scalar-surface query is pure codegen projection: no join, no agg
    shuffle, no Python — exactly one Exchange (the presentation sort)."""
    plan = plan_of(spark, sf_dir, "scalar_functions")
    assert "Join" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # rangepartitioning of the sort (+AQE read)


def test_priority_orders_semi_join_never_nested_loop(spark, sf_dir):
    """EXISTS compiles to a (broadcast) semi join on the join key — never a
    nested-loop/cartesian, which would be quadratic at fact scale."""
    plan = plan_of(spark, sf_dir, "priority_orders_with_big_lines")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered_map_only(spark, sf_dir):
    """Efraimidis-Spirakis sampling must be one map-only pass + TakeOrdered:
    no shuffle of document rows, no global sort, key stays in codegen."""
    plan = exec_plan_of(spark, sf_dir, "doc_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_repeated_spans_windows_partitioned_and_text_free_shuffles(spark, sf_dir):
    """Island merging must stay PARTITIONED by doc_id (a global-order window
    would serialize the corpus), and every Exchange above the gram explode
    must carry hashed keys, never gram/text strings."""
    plan = exec_plan_of(spark, sf_dir, "doc_repeated_spans")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines
    for ln in window_lines:
        assert "windowspecdefinition(doc_id#" in ln, ln
    assert "Exchange SinglePartition" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln


def test_span_scrub_windows_partitioned_and_tokens_shuffle_by_doc(spark, sf_dir):
    """The scrub's island windows stay PARTITIONED by doc_id, nothing runs
    row-wise in Python, and wherever token TEXT crosses an Exchange the key
    is doc_id — grams/positions shuffle as hashed longs only."""
    plan = exec_plan_of(spark, sf_dir, "doc_span_scrub")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines
    for ln in window_lines:
        assert "windowspecdefinition(doc_id#" in ln, ln
    assert "Exchange SinglePartition" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "tok#" in ln:
            assert "doc_id#" in ln, ln


def test_adaptive_quality_cut_broadcasts_thresholds(spark, sf_dir):
    """Per-source thresholds are one tiny aggregate that broadcasts back —
    the corpus side must join via BroadcastHashJoin, never a sort-merge
    shuffle of the scored documents."""
    plan = exec_plan_of(spark, sf_dir, "doc_adaptive_quality_cut")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    # the only hash Exchanges key on `source` (the threshold aggregate) —
    # scored documents reach the join without shuffling
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "source#" in ln, ln


def test_dsir_sample_lm_tables_broadcast_and_topk_never_sorts(spark, sf_dir):
    """DSIR scoring must join the (<=256-row) bucket-LM tables by broadcast —
    never a sort-merge shuffle of the exploded corpus tokens — and the final
    weighted selection must be TakeOrderedAndProject (per-partition top-k),
    not a global range-partitioned sort. Token buckets shuffle as longs
    (hashed inside the array before the explode): any hash Exchange carries
    bucket ids or doc_ids, never text."""
    plan = exec_plan_of(spark, sf_dir, "doc_dsir_sample")
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # tgt + rawp bucket LMs
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln
            assert ("b#" in ln) or ("doc_id#" in ln), ln


def test_fuzzy_contamination_broadcasts_eval_bands(spark, sf_dir):
    """The eval-side band index must broadcast (eval suites are MBs by
    definition) — the corpus bands probe it map-side, so no sort-merge join
    and no Exchange keyed on the band signature for the probe itself; the
    only corpus-scale hash Exchanges are the signature groupBy and the
    per-doc hit count (doc_id keys)."""
    plan = exec_plan_of(spark, sf_dir, "doc_fuzzy_contamination")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln and "shingles#" not in ln, ln


def test_bigram_logprob_shuffles_hashes_only_and_prejoins_probs(spark, sf_dir):
    """The bigram stream must shuffle as (h1, h2) longs — never token text —
    and the probability join must consume ONE pre-joined frequency table
    (the bigram table is corpus-limited, so no broadcast assumption on it;
    the only broadcast is the 1-row vocabulary size)."""
    plan = exec_plan_of(spark, sf_dir, "doc_bigram_logprob")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln
    # vocabulary size rides a broadcast nested-loop of a 1-row aggregate —
    # fine; what must NOT happen is a nested-loop between corpus-scale sides
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_window_funnel_is_single_shuffle_no_joins(spark, sf_dir):
    """The funnel must be ONE groupBy(user_id) with the chain search inside
    per-user arrays — no per-step join cascade, no window sort, no Python."""
    plan = exec_plan_of(spark, sf_dir, "events_window_funnel")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    hash_exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(hash_exchanges) == 1 and "user_id#" in hash_exchanges[0]


def test_trade_flows_broadcasts_both_nation_sides(spark, sf_dir):
    """Q7 shape: BOTH nation copies specifically must broadcast (fixed
    cardinality at any SF — a bare BroadcastHashJoin count would pass via
    size-based supplier/customer broadcasts at fixture scale even with the
    nation hints removed), and the pair-inequality filter must not become
    a nested-loop join."""
    plan = exec_plan_of(spark, sf_dir, "nation_trade_flows")
    bhj = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert any("n1_key#" in ln for ln in bhj), bhj
    assert any("n2_key#" in ln for ln in bhj), bhj
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_product_profit_pushes_the_part_name_filter(spark, sf_dir):
    """Q9 shape: the part name predicate reaches the part scan — the join
    never sees filtered-out parts."""
    plan = plan_of(spark, sf_dir, "product_profit_by_nation_year")
    assert "PushedFilters: [IsNotNull(p_name), StringContains(p_name,g)" in plan
    assert "CartesianProduct" not in plan


def test_inverted_index_text_free_shuffle_no_skew_key(spark, sf_dir):
    """The postings rollup shuffles (token, doc_id, pos) — the document body
    must never cross the exchange, and the groupBy key must be the composite
    (token, doc_id) so a hot token fans out across documents."""
    plan = exec_plan_of(spark, sf_dir, "doc_inverted_index")
    above_generate = plan.split("Generate")[0]
    assert "text#" not in above_generate
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln and "keys=" in ln]
    assert agg_lines and all("token#" in ln and "doc_id#" in ln for ln in agg_lines), agg_lines


def test_bm25_prunes_to_query_terms_and_broadcasts_stats(spark, sf_dir):
    """Query terms are filtered inside the token array BEFORE the explode
    (the corpus-scale shuffle carries |Q| terms' postings only); df and
    N/avgdl come back as broadcasts, and nothing degenerates into a
    cartesian."""
    plan = exec_plan_of(spark, sf_dir, "doc_bm25_scores")
    above_generate = plan.split("Generate")[0]
    assert "text#" not in above_generate
    # the array-level filter runs pre-explode: the Generate's child projects
    # a filtered array, visible as the filter HOF in the plan
    assert "ArrayFilter" in plan or "array_filter" in plan.lower() or "filter(" in plan
    assert plan.count("BroadcastExchange") >= 2  # df + stats (1-row each)
    assert "CartesianProduct" not in plan


def test_phrase_search_single_term_postings_join(spark, sf_dir):
    """Each join side filters to ONE term's postings before the (doc_id, pos)
    equi-join — the plan must show the token equality filters and a real
    equi-join, never a nested loop over the corpus."""
    plan = exec_plan_of(spark, sf_dir, "doc_phrase_search")
    above_generate = plan.split("Generate")[0]
    assert "text#" not in above_generate
    assert "= fast)" in plan and "= table)" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_hybrid_rrf_cuts_with_take_ordered_not_global_sort(spark, sf_dir):
    """Both modality cuts must be TakeOrderedAndProject (per-partition heads
    + driver merge); the only full Sorts allowed are over the <= 2K fused
    rows, and the corpus side of the cosine join stays shuffle-free up to
    the cut."""
    plan = exec_plan_of(spark, sf_dir, "hybrid_search_rrf")
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_q17_rollup_and_probe_copartition_no_cartesian(spark, sf_dir):
    """Q17 shape: the per-part rollup joins back on its own grouping key
    (co-partitioned exchange family), the brand filter pushes to the part
    scan, and nothing degenerates into a nested loop."""
    plan = plan_of(spark, sf_dir, "small_quantity_part_revenue")
    assert "PushedFilters: [IsNotNull(p_brand), StringStartsWith(p_brand,Brand#1)" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q21_rollups_carry_keys_only(spark, sf_dir):
    """Q21 shape: every corpus-side shuffle carries (orderkey, suppkey[,
    shipdate]) — the lineitem scan must read exactly those three columns."""
    plan = plan_of(spark, sf_dir, "sole_late_supplier_waits")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln and "l_orderkey" in ln]
    assert read and all(
        "l_extendedprice" not in ln and "l_quantity" not in ln for ln in read
    ), read
    assert "CartesianProduct" not in plan


def test_q22_threshold_broadcasts_and_anti_join(spark, sf_dir):
    """Q22 shape: the global-threshold rollup comes back as a 1-row
    broadcast, the no-big-order test is a real anti join, and the big-order
    price filter pushes into the orders scan."""
    plan = exec_plan_of(spark, sf_dir, "idle_rich_customers_by_segment")
    assert "LeftAnti" in plan
    assert plan.count("BroadcastExchange") >= 1
    formatted = plan_of(spark, sf_dir, "idle_rich_customers_by_segment")
    assert "GreaterThan(o_totalprice,400000" in formatted


def test_setjoin_prefix_candidates_carry_hashes_no_cartesian(spark, sf_dir):
    """The AllPairs candidate join must run on hashed prefix longs with no
    nested loop anywhere, and shingle text must never cross a shuffle."""
    plan = exec_plan_of(spark, sf_dir, "doc_setjoin_prefix_pairs")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    above_generate = plan.split("Generate")[0]
    assert "text#" not in above_generate


def test_q8_single_pass_share_both_nations_broadcast(spark, sf_dir):
    """Q8 shape: the share must come from ONE aggregation pass (SUM(CASE),
    no second scan/join of the fact chain) with both nation copies
    broadcast."""
    plan = exec_plan_of(spark, sf_dir, "region_market_share_by_year")
    assert plan.count("FileScan parquet") <= 7  # li, o, c, s, nation x2, region — once each
    bhj = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert any("nc_key#" in ln for ln in bhj), bhj
    assert any("ns_key#" in ln for ln in bhj), bhj
    assert "CartesianProduct" not in plan


def test_q10_pushes_returnflag_and_takes_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "returned_item_customers")
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan
    assert "TakeOrderedAndProject" in exec_plan_of(spark, sf_dir, "returned_item_customers")


def test_q13_outer_join_filter_pushed_and_double_agg(spark, sf_dir):
    """Q13 shape: the priority exclusion must reach the orders scan (pushed
    through the outer join's ON clause), and the distribution is two
    partial-aggregated phases — never a window or cartesian."""
    plan = plan_of(spark, sf_dir, "customer_order_count_distribution")
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 4  # two grouping phases, each partial+final
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q15_quarter_pushed_and_scalar_max_broadcast(spark, sf_dir):
    """Q15 shape: the shipdate window must push into the lineitem scan and
    the scalar max side must be a broadcast, not a shuffled join."""
    plan = plan_of(spark, sf_dir, "top_supplier_revenue")
    assert "GreaterThanOrEqual(l_shipdate,1996-01-01" in plan
    assert "LessThan(l_shipdate,1996-04-01" in plan
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_q20_semi_join_and_pushed_prefix(spark, sf_dir):
    """Q20 shape: supplier emission must be a LEFT SEMI join (at most one
    row per supplier however many parts it dominates), with the part-name
    prefix and shipdate range pushed to their scans."""
    plan = plan_of(spark, sf_dir, "dominant_part_suppliers")
    assert "LeftSemi" in plan
    assert "StringStartsWith(p_name,small)" in plan
    assert "GreaterThanOrEqual(l_shipdate,1995-01-01" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q2_single_lineitem_pass_window_min_take_ordered(spark, sf_dir):
    """Q2 shape: ONE lineitem scan (the per-part min is a window over the
    supply rollup's own partitioning, not a self-joined second aggregation),
    dim filters pushed, top-100 as TakeOrdered."""
    plan = plan_of(spark, sf_dir, "min_cost_supplier_per_part")
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert "EqualTo(p_size,15)" in plan and "EqualTo(r_name,EUROPE)" in plan
    assert "TakeOrderedAndProject" in exec_plan_of(spark, sf_dir, "min_cost_supplier_per_part")


def test_q11_fraction_reuses_rollup_and_broadcasts_scalar(spark, sf_dir):
    """Q11 shape: the global total must come from the SAME per-part rollup
    (AQE stitches a ReusedExchange at runtime — lineitem aggregates once)
    and joins back as a 1-row broadcast."""
    plan = plan_of(spark, sf_dir, "important_part_value_fraction")
    assert "EqualTo(n_name,NATION_13)" in plan
    df = REGISTRY["important_part_value_fraction"].fn(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    final_plan = buf.getvalue()
    assert "isFinalPlan=true" in final_plan
    assert "ReusedExchange" in final_plan


def test_q16_anti_join_broadcast_and_pushed_part_filters(spark, sf_dir):
    """Q16 shape: the excluded-supplier set must anti-join as a broadcast
    (never a shuffled NOT IN), with brand/type/size predicates pushed."""
    plan = plan_of(spark, sf_dir, "part_supplier_kinds")
    assert "LeftAnti" in plan
    bcast_anti = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln and "LeftAnti" in ln]
    assert bcast_anti, "anti join must build on the broadcast supplier set"
    assert "Not(EqualTo(p_brand,Brand#45))" in plan
    assert "In(p_size" in plan
    # count-distinct: local dedup before the kind-level aggregation
    assert plan.count("HashAggregate") >= 4


def test_bpe_encode_all_joins_broadcast_corpus_shuffles_ids_only(spark, sf_dir):
    """doc_bpe_encode_corpus: the vocab->corpus maps are broadcast joins
    (no SortMergeJoin anywhere); document text never crosses a shuffle —
    the corpus-scale shuffles carry (doc_id, pos, id-array) only."""
    plan = exec_plan_of(spark, sf_dir, "doc_bpe_encode_corpus")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    above_generate = plan.split("Generate")[0]
    assert "text#" not in above_generate


def test_pca_energy_is_join_free_map_math(spark, sf_dir):
    """embedding_pca_energy_total: the mean folds into the plan as a
    literal array — the query itself is scan + project + sort, no join, no
    window, no corpus shuffle beyond the output sort."""
    plan = exec_plan_of(spark, sf_dir, "embedding_pca_energy_total")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") == 1


def test_q6_all_predicates_pushed_map_only_aggregate(spark, sf_dir):
    """Q6 shape: all three predicates reach the parquet scan, the scan reads
    exactly the filter+measure columns, and the plan is scan -> partial agg
    -> 1-row final: no join, no window, no wide shuffle."""
    plan = plan_of(spark, sf_dir, "discount_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate,1995-01-01" in plan
    assert "LessThan(l_shipdate,1996-01-01" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    assert "Join" not in plan and "Window" not in plan
    read_schema = next(line for line in plan.splitlines() if "ReadSchema" in line)
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema


def test_q18_aggregate_before_join_and_take_ordered(spark, sf_dir):
    """Q18 shape: the lineitem rollup must aggregate BEFORE any join (the
    HAVING tail — not every lineitem row — feeds the orders/customer joins),
    and the top-100 must be TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, sf_dir, "large_volume_customer_orders")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the aggregate sits below the first join: lineitem's scan feeds a
    # HashAggregate before any join node consumes it
    li_scan_pos = plan.find("lineitem.parquet")
    first_join_pos = min(
        (p for p in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"), plan.find("ShuffledHashJoin")) if p >= 0),
        default=-1,
    )
    agg_pos = plan.find("HashAggregate")
    assert 0 <= agg_pos and li_scan_pos >= 0
    assert first_join_pos >= 0
    # Spark prints trees root-first, so "aggregate below the join" appears as
    # join -> aggregate -> lineitem scan in string order.
    assert first_join_pos < agg_pos < li_scan_pos


def test_exact_substring_cuts_hashed_keys_and_partitioned_windows(spark, sf_dir):
    """Find-and-cut substring dedup: the keep-first ranking windows over the
    60-bit gram hash and the island merge windows over doc_id — never a
    global-order window — and no Exchange ever carries document text."""
    plan = exec_plan_of(spark, sf_dir, "doc_exact_substring_cuts")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines
    for ln in window_lines:
        assert "windowspecdefinition(gh#" in ln or "windowspecdefinition(doc_id#" in ln, ln
    assert "Exchange SinglePartition" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln


def test_url_normalize_is_map_only(spark, sf_dir):
    """URL canonicalization is pure column expressions: no keyed shuffle, no
    join, no window, no Python — one scan, one projection (+ output sort)."""
    plan = exec_plan_of(spark, sf_dir, "doc_url_normalize")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    read_schema_plan = plan_of(spark, sf_dir, "doc_url_normalize")
    read_schema = next(ln for ln in read_schema_plan.splitlines() if "ReadSchema" in ln)
    # column pruning: the derivation needs only (doc_id, source)
    assert "text" not in read_schema and "n_chars" not in read_schema


def test_host_cap_single_host_shuffle_with_group_limit(spark, sf_dir):
    """The per-host cap is ONE hashpartitioning exchange on host, and Spark's
    WindowGroupLimit pushdown trims each partition to the top-k BEFORE the
    shuffle — the property that keeps a megahost from flooding an executor."""
    plan = exec_plan_of(spark, sf_dir, "doc_host_cap_sample")
    assert "BatchEvalPython" not in plan and "Join" not in plan
    hash_exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(hash_exchanges) == 1 and "host#" in hash_exchanges[0]
    assert "WindowGroupLimit" in plan
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines and all("windowspecdefinition(host#" in ln for ln in window_lines)


def test_host_mixture_weights_total_broadcasts(spark, sf_dir):
    """The grand-total denominator joins back as a 1-row broadcast — never a
    shuffle join, never a single-partition window over all hosts."""
    plan = exec_plan_of(spark, sf_dir, "doc_host_mixture_weights")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan or "Window" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "host#" in ln, ln


def test_exact_substring_scrub_text_only_shuffles_by_doc(spark, sf_dir):
    """The applied cut: gram windows shuffle as hashed longs; wherever token
    TEXT crosses an Exchange the key is doc_id (the reassembly — the one
    exchange any text-output operator must pay)."""
    plan = exec_plan_of(spark, sf_dir, "doc_exact_substring_scrub")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "tok#" in ln:
            assert "doc_id#" in ln, ln


def test_incremental_substring_cuts_probe_is_hash_semi_join(spark, sf_dir):
    """The snapshot probe must be a hash semi-join on the gram hash — never
    nested-loop — and no Exchange carries document text."""
    plan = exec_plan_of(spark, sf_dir, "doc_incremental_substring_cuts")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln


def test_pii_detect_and_redact_are_map_only(spark, sf_dir):
    """PII detection and redaction are pure regexp column expressions: no
    keyed shuffle, no join, no window, no Python — one scan, one projection
    (+ output sort). At 100 TB both passes are scan-bound."""
    for name in ("doc_pii_detect", "doc_pii_redact"):
        plan = exec_plan_of(spark, sf_dir, name)
        assert "Exchange hashpartitioning" not in plan, name
        assert "Join" not in plan and "Window" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_pii_source_report_single_source_shuffle(spark, sf_dir):
    """The compliance report pays ONE hashpartitioning exchange keyed by
    source, with a map-side partial aggregate below it — and the projected
    PII text never crosses the shuffle (per-doc flags collapse first)."""
    plan = exec_plan_of(spark, sf_dir, "doc_pii_source_report")
    assert "BatchEvalPython" not in plan and "Join" not in plan
    hash_exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(hash_exchanges) == 1 and "source#" in hash_exchanges[0]
    assert "pii_text" not in hash_exchanges[0]
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert len(agg_lines) >= 2  # partial + final


def test_zipf_fit_topk_via_take_ordered(spark, sf_dir):
    """The Zipf fit's top-k comes off the vocab count via
    TakeOrderedAndProject (per-partition heaps) — never a global sort of the
    full vocabulary — and the corpus-scale exchange is the token groupBy."""
    plan = exec_plan_of(spark, sf_dir, "doc_zipf_fit")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "tok#" in ln, ln


def test_tfidf_window_group_limit_and_token_width_exchanges(spark, sf_dir):
    """TF-IDF keyword extraction: the per-doc top-k window gets
    WindowGroupLimit pushdown (k rows per partition cross the doc shuffle),
    and no exchange carries anything wider than a token."""
    plan = exec_plan_of(spark, sf_dir, "doc_tfidf_top_terms")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln


def test_heaps_law_single_partition_traffic_is_bucket_bounded(spark, sf_dir):
    """Heaps'-law growth: the only SinglePartition exchanges feed the
    16-bucket cumsum window and the 1-row fit/width aggregates — the
    vocab-scale work (first-occurrence min) is a hashpartitioned tok
    rollup, and no exchange carries document text."""
    plan = exec_plan_of(spark, sf_dir, "doc_heaps_law")
    assert "BatchEvalPython" not in plan
    hash_exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert hash_exchanges
    for ln in hash_exchanges:
        assert "text#" not in ln, ln
        # the doc-side bucket key prints as a grouping expression
        assert "tok#" in ln or "bucket#" in ln or "_groupingexpression#" in ln, ln


def test_cdc_chunks_is_map_only(spark, sf_dir):
    """Content-defined chunking computes boundaries, spans, and hashes as
    array expressions in the tokenize stage: no keyed shuffle, no join, no
    window, no Python — the manifest leaves the stage as 16-byte hashes."""
    plan = exec_plan_of(spark, sf_dir, "doc_cdc_chunks")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pagerank_iterations_shuffle_long_keys_only(spark, sf_dir):
    """Each PageRank iteration is a src-keyed hash join + a dst-keyed
    aggregate over (long, long) rows — no nested loop, no Python, and the
    expensive LSH edge derivation is checkpointed out of the iterated
    plan (visible as an ExistingRDD scan, not a re-run of the pipeline)."""
    plan = exec_plan_of(spark, sf_dir, "doc_dup_graph_pagerank")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ExistingRDD" in plan  # checkpointed edges: LSH never re-runs per iteration
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "src#" in ln or "dst#" in ln or "node#" in ln, ln


def test_assortativity_is_degree_joins_plus_one_global_aggregate(spark, sf_dir):
    """Endpoint-degree annotation is node-keyed hash joins; the five-moment
    rollup is one global aggregate (partial per partition, 1-row final);
    the only nested-loop is the 1-row broadcast node-count join."""
    plan = exec_plan_of(spark, sf_dir, "doc_dup_graph_assortativity")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ExistingRDD" in plan  # checkpointed verified pairs: LSH runs once
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "src#" in ln or "dst#" in ln, ln


def test_js_divergence_shuffles_source_token_keys_only(spark, sf_dir):
    """The token-keyed self-join and the (source, token) rollups are the
    only corpus-scale exchanges — no nested loop over source pairs, no
    Python, document text never crosses a shuffle (tokens do: they ARE
    the join key of the distributional comparison)."""
    plan = exec_plan_of(spark, sf_dir, "doc_source_js_divergence")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "tok#" in ln or "source#" in ln or "source_a#" in ln, ln
        assert "text#" not in ln or "Exchange" not in ln


def test_triangle_join_is_oriented_hash_joins_on_keys(spark, sf_dir):
    """Triangle enumeration is three hash joins over the checkpointed edge
    list — no nested loop, no Python; every keyed exchange carries edge
    endpoints / wedge keys / node ids, never text."""
    plan = exec_plan_of(spark, sf_dir, "doc_dup_graph_triangles")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ExistingRDD" in plan  # checkpointed verified pairs: LSH runs once
    allowed = ("src#", "dst#", "doc_a#", "doc_b#", "node#", "u#", "v#", "w#", "lo#", "hi#")
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert any(k in ln for k in allowed), ln
        assert "text#" not in ln


def test_curriculum_rank_never_serializes_the_corpus(spark, sf_dir):
    """Exact global rank via the histogram two-pass: the ONLY
    single-partition exchange feeds the bucket-histogram offset window;
    the corpus-side row_number window is hash-partitioned on the bucket
    key, and the offset table comes back as a broadcast."""
    plan = exec_plan_of(spark, sf_dir, "doc_curriculum_order")
    # two single-partition exchanges, both post-aggregate: the histogram
    # offset sort (bucket-cardinality rows) and the 1-row total-count
    # rollup (zero-column metadata scan). A naive global window would put
    # text-carrying corpus rows directly under one.
    segs = plan.split("Exchange SinglePartition")
    assert len(segs) == 3
    for seg in segs[1:]:
        ha, tx = seg.find("HashAggregate"), seg.find("text#")
        assert ha != -1 and (tx == -1 or ha < tx), seg[:200]
    assert "CartesianProduct" not in plan
    assert any(
        "Exchange hashpartitioning" in ln and "quality_score#" in ln and "n_tokens#" in ln
        for ln in plan.splitlines()
    )
    assert "BroadcastExchange" in plan


def test_weighted_pagerank_keeps_the_unweighted_topology(spark, sf_dir):
    """Weighted iterations shuffle (long, long, long) rows with the same
    src/dst/node-keyed exchanges as the unweighted form; the strength-
    annotated edge list is checkpointed so LSH runs once."""
    plan = exec_plan_of(spark, sf_dir, "doc_dup_graph_pagerank_weighted")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ExistingRDD" in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "src#" in ln or "dst#" in ln or "node#" in ln, ln


def test_cdc_incremental_ingest_probe_is_hash_join_on_hashes(spark, sf_dir):
    """The store probe joins 16-byte chunk hashes — no nested loop, no
    Python — and every keyed exchange carries the hash, a doc key, or a
    grouping expression, never token text."""
    plan = exec_plan_of(spark, sf_dir, "doc_cdc_incremental_ingest")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "chunk_hash#" in ln or "doc_id#" in ln, ln


def test_html_extract_and_boilerplate_are_map_only(spark, sf_dir):
    """HTML→text extraction is pure regexp + higher-order array column
    expressions: no keyed shuffle, no join, no window, no Python — one scan,
    one projection (+ output sort). At 100 TB the pass is scan-bound."""
    for name in ("doc_html_extract", "doc_html_boilerplate_stats"):
        plan = exec_plan_of(spark, sf_dir, name)
        assert "Exchange hashpartitioning" not in plan, name
        assert "Join" not in plan and "Window" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_html_link_stats_single_source_shuffle(spark, sf_dir):
    """The link-density survey pays ONE hashpartitioning exchange keyed by
    source, with a map-side partial aggregate below it — the derived HTML
    never crosses the shuffle (per-doc char counts collapse first)."""
    plan = exec_plan_of(spark, sf_dir, "doc_html_link_stats")
    assert "BatchEvalPython" not in plan and "Join" not in plan
    hash_exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(hash_exchanges) == 1 and "source#" in hash_exchanges[0]
    assert "h#" not in hash_exchanges[0]
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert len(agg_lines) >= 2  # partial + final


def test_warc_extract_walk_is_arrow_batched(spark, sf_dir):
    """The WARC container walk is the one Python stage and must be
    Arrow-batched (MapInPandas), never row-at-a-time; no keyed exchange —
    blobs walk where they sit and text processing stays JVM-side."""
    plan = exec_plan_of(spark, sf_dir, "doc_warc_extract")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "Window" not in plan


def test_robots_filter_broadcasts_rules(spark, sf_dir):
    """The robots rule set is robots-file-sized and must BROADCAST; the
    corpus side never hash-shuffles for the match itself — only the
    doc-keyed winner window and join-back. Prefix matching must stay
    StartsWith (sargable codegen), never a regex."""
    plan = exec_plan_of(spark, sf_dir, "doc_robots_filter")
    assert "BroadcastExchange" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "StartsWith" in plan
    # every keyed exchange carries a short key: doc_id (winner window +
    # join-back) or source (the one distinct-sources rollup feeding the
    # broadcast rules side — host-cardinality, not corpus rows)
    for exchange in plan.split("Exchange hashpartitioning")[1:]:
        head = exchange[:120]
        assert "doc_id" in head or "source" in head, head
        assert "path" not in head and "text" not in head, head


def test_langid_clf_short_keys_no_python(spark, sf_dir):
    """The trained language-ID scorer is pure JVM column work: derived text
    never shuffles (exchanges carry (doc_id, lang, bucket) and the per-doc
    rollup), the 5x65 model folds into the plan as literals, and there is
    no Python stage of any kind."""
    plan = exec_plan_of(spark, sf_dir, "doc_language_id_clf")
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 2  # bucket count + doc rollup
    for exchange in plan.split("Exchange hashpartitioning")[1:]:
        head = exchange[:200]
        assert "t#" not in head or "bucket" in head  # derived text not a shuffle key


def test_warc_gz_one_assembly_exchange_arrow_batched(spark, sf_dir):
    """The .warc.gz round-trip has exactly ONE keyed exchange — the
    archive-assembly groupBy on doc_id div 8 (fixed-size, balanced key) —
    and Python only in the single Arrow-batched pack+walk stage; the
    extraction/hash tail stays JVM-side."""
    plan = exec_plan_of(spark, sf_dir, "doc_warc_gz_extract")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


def test_wet_pipeline_checkpoints_once_no_text_over_exchange(spark, sf_dir):
    """The composed WARC→extract→quality→trained-langid→dedup pipeline
    materializes the walk+extract pass ONCE (localCheckpoint — the
    corpus-release precedent), so the final plan has no Python stage at
    all; the metrics branch and the langid rollup both read the
    checkpointed frame; every keyed exchange carries fixed-width rows —
    no text column (html/extracted/norm) ever crosses one; and the dedup
    window still shuffles on the 60-bit fingerprint."""
    plan = exec_plan_of(spark, sf_dir, "doc_wet_pipeline")
    assert "MapInPandas" not in plan  # behind the checkpoint boundary
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan ExistingRDD") >= 2  # metrics + langid branches
    assert "CartesianProduct" not in plan
    hash_exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert any("fingerprint#" in ln for ln in hash_exchanges)
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert (
                "html#" not in ln
                and "extracted#" not in ln
                and "norm_text#" not in ln
            ), ln


def test_gopher_repetition_gram_shuffles_never_text(spark, sf_dir):
    """All four gram sizes explode from ONE combined array; the keyed
    exchanges carry (doc_id, n, gram) short fragments plus the doc rollup —
    document text never crosses a shuffle, no Python anywhere. (The
    zero-shuffle per-row fold variant measured 7x slower at sf1.0 —
    interpreted higher-order folds lose to codegen'd hash aggregation —
    see the query docstring.)"""
    plan = exec_plan_of(spark, sf_dir, "doc_gopher_repetition")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "Join" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln


def test_url_blocklist_broadcasts_list_no_text(spark, sf_dir):
    """The blocklist side must broadcast (UT1-scale lists broadcast; the
    corpus never shuffles for the match) and the per-doc rollup exchanges
    carry (doc_id, suffix) short keys — never document text."""
    plan = exec_plan_of(spark, sf_dir, "doc_url_blocklist_filter")
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln


def test_corpus_release_materializes_once_and_shuffles_fixed_width(spark, sf_dir):
    """doc_corpus_release: the pack+walk+extract pass materializes ONCE
    (localCheckpoint — the WET store's landing step in query form), so the
    final plan has no Python stage at all and every downstream branch reads
    the checkpointed verdict rows; no text column (html/extracted/norm) ever
    crosses an Exchange; robots rules and blocklist entries broadcast."""
    plan = exec_plan_of(spark, sf_dir, "doc_corpus_release")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan  # behind the checkpoint boundary
    assert plan.count("Scan ExistingRDD") >= 3  # rv/blk/lang branches reuse it
    assert plan.count("BroadcastHashJoin") >= 2  # rules + blocklist entries
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert (
                "html#" not in ln and "extracted#" not in ln and "norm#" not in ln
            ), ln


def test_ann_topk_rank_is_partial_group_limited(spark, sf_dir):
    """The per-query row_number rank must compile to WindowGroupLimit with a
    map-side Partial pass: each task keeps at most k rows per query BEFORE
    the exchange, so the shuffle moves O(k * partitions) rows per query —
    never the corpus-scale window fan-out the naive reading suggests."""
    for name in ("ann_cosine_topk", "doc_hashed_ann_topk"):
        plan = exec_plan_of(spark, sf_dir, name)
        partial = [
            ln
            for ln in plan.splitlines()
            if "WindowGroupLimit" in ln and "Partial" in ln
        ]
        assert partial, f"{name}: no partial WindowGroupLimit\n{plan[:2000]}"


def test_context_packing_prefix_sum_is_histogram_first(spark, sf_dir):
    """The global running sum must be the two-pass decomposition: the ONLY
    Exchange SinglePartition in the plan is the prefix pass over the
    bucket-sum HISTOGRAM (bucket-cardinality rows), never the corpus — the
    corpus-scale exchanges hash-partition on the bucket key, and the
    within-bucket running-sum window is bucket-partitioned."""
    plan = exec_plan_of(spark, sf_dir, "doc_context_packing")
    single = [ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln]
    assert len(single) == 1, plan
    assert "Exchange hashpartitioning(_pb" in plan
    # the histogram side is an aggregate (bucket sums) feeding that exchange
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fim_split_is_map_only(spark, sf_dir):
    """Every FIM draw is an md5 of the row's own key and the token count is
    an in-row array size: no join, no window, no keyed shuffle, no Python —
    the manifest is one embarrassingly-parallel scan (the final orderBy's
    range exchange is presentation, not computation)."""
    plan = exec_plan_of(spark, sf_dir, "doc_fim_split")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contaminated_chunks_composes_manifest_scale_joins(spark, sf_dir):
    """The chunk-level contamination rollup must stay manifest-scale: the
    eval shingle set broadcasts (never a shuffled join side), document text
    never crosses an exchange, no Python, and the prefix sum underneath
    keeps its single histogram-only SinglePartition pass."""
    plan = exec_plan_of(spark, sf_dir, "doc_contaminated_chunks")
    assert "BroadcastHashJoin" in plan  # eval shingles + doc-keyed taint join
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    single = [ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln]
    assert len(single) == 1, plan  # the histogram prefix pass, nothing else
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_bitext_mining_broadcasts_x_side_fixed_width_exchanges(spark, sf_dir):
    """The all-pairs margin baseline must broadcast the X side (the only
    nested-loop in the plan) and every exchange after scoring carries
    fixed-width (id, cosine/margin) rows — embedding arrays never shuffle,
    and no Python touches the hot path.

    The miner localCheckpoints the scored frame (r13 optimization), which
    truncates the query's executed plan at a Scan ExistingRDD — so the
    scoring subtree is asserted on the pre-checkpoint frame
    (``_bitext_scored``) and the miner plan on the full query."""
    from clickhouse_etl_loadtest_spark.queries.vector import _bitext_scored

    scoring = (
        _bitext_scored(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in scoring  # broadcast(x).crossJoin(y)
    assert "CartesianProduct" not in scoring
    # scoring is map-only past the broadcast: the only exchanges are the
    # BroadcastExchange itself and parallelize_scan's round-robin spread
    assert "Exchange hashpartitioning" not in scoring
    assert "Exchange rangepartitioning" not in scoring
    plan = exec_plan_of(spark, sf_dir, "embedding_bitext_mining")
    # miner consumes the materialized fixed-width candidates, never raw vectors
    assert "Scan ExistingRDD[x_id" in plan
    assert "CartesianProduct" not in plan
    for p in (plan, scoring):
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "emb#" not in ln and "embedding#" not in ln, ln


def test_bitext_lsh_candidates_are_equi_joined_never_crossed(spark, sf_dir):
    """The banded miner must contain NO all-pairs shape: candidates come
    from a band-keyed equi-join, vectors re-attach by their own vec_id, and
    no Python touches the path. (The broadcast-hash form of the id joins is
    fine; what must never appear is a nested-loop/cartesian pair source.)"""
    plan = exec_plan_of(spark, sf_dir, "embedding_bitext_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "emb" in ln:
            assert "x_id#" in ln or "y_id#" in ln or "vec_id#" in ln, ln


def test_curriculum_packing_prefix_sum_is_histogram_first(spark, sf_dir):
    """Packing under the curriculum order must keep the two-pass shape with
    the NON-TRIVIAL bucket key: the only Exchange SinglePartition is the
    prefix pass over the (quality, length) histogram, corpus exchanges
    hash-partition on that key pair, and no Python appears."""
    plan = exec_plan_of(spark, sf_dir, "doc_curriculum_packing")
    single = [ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln]
    assert len(single) == 1, plan
    assert "Exchange hashpartitioning(quality_score" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_release_packing_keeps_the_release_shape_plus_one_histogram_pass(spark, sf_dir):
    """doc_release_packing: the audited corpus-release shape (one
    materialization, no Python in the final plan, text never crossing an
    exchange) plus EXACTLY ONE Exchange SinglePartition — the prefix pass
    over the released-page bucket histogram, never the corpus."""
    plan = exec_plan_of(spark, sf_dir, "doc_release_packing")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan  # behind the checkpoint boundary
    assert "CartesianProduct" not in plan
    single = [ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln]
    assert len(single) == 1, plan
    assert "Exchange hashpartitioning(_pb" in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert (
                "html#" not in ln and "extracted#" not in ln and "norm#" not in ln
            ), ln


def test_crosslingual_mining_text_free_past_the_bridge(spark, sf_dir):
    """doc_crosslingual_mining: the bridge + fold materialize ONCE behind a
    localCheckpoint (the final plan reads the scored candidates as an
    ExistingRDD — text and embeddings never appear downstream); the miner
    itself is windows/joins over fixed-width (id, cosine/margin) rows with
    no Python and no cartesian fallback."""
    plan = exec_plan_of(spark, sf_dir, "doc_crosslingual_mining")
    assert "Scan ExistingRDD" in plan  # the checkpointed candidate frame
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln and "xe#" not in ln and "ye#" not in ln, ln


def test_semdedup_bounds_pairs_by_cluster(spark, sf_dir):
    """SemDeDup's whole point: the pairwise cosine pass is keyed by k-means
    cluster (one cluster-hash shuffle, per-cluster joins), never a corpus
    cartesian; the clustered frame materializes once (localCheckpoint) and
    all three consumers read it; no corpus-scale single partition, no
    Python in the final plan."""
    plan = exec_plan_of(spark, sf_dir, "embedding_semdedup")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "Exchange hashpartitioning(cluster" in plan
    assert plan.count("Scan ExistingRDD") >= 3  # both pair sides + the output


def test_harmonic_packing_rank_is_histogram_first(spark, sf_dir):
    """The within-class rank must be the histogram-first global rank: the
    only SinglePartition exchanges run over class-cardinality frames (the
    (class, bucket) histogram and the class-offset table, ≤ CTX_LEN rows),
    never the corpus; corpus-scale exchanges hash on the class/bucket key;
    document text never crosses an exchange."""
    plan = exec_plan_of(spark, sf_dir, "doc_pack_harmonic")
    single = [ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln]
    assert len(single) == 2, plan
    assert "Exchange hashpartitioning(size_class" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_bpe_packing_composes_tokenizer_and_prefix_sum(spark, sf_dir):
    """Tokenizer-aware packing: the packing half keeps the histogram-first
    shape (bucket-keyed corpus exchange on _pb) and document text never
    crosses an exchange — the tokenizer half shuffles distinct WORDS, not
    documents (doc_bpe_encode_corpus's contract)."""
    plan = exec_plan_of(spark, sf_dir, "doc_bpe_context_packing")
    assert "Exchange hashpartitioning(_pb" in plan
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_epoch_plan_stays_source_cardinality(spark, sf_dir):
    """After the one source rollup everything is source-cardinality: totals
    are 1-row aggregates joined back by broadcast (never a Window over the
    corpus), and no text crosses an exchange."""
    plan = exec_plan_of(spark, sf_dir, "doc_source_epoch_plan")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_softdedup_weights_join_fixed_width_no_text(spark, sf_dir):
    """The weighting pass adds one doc-keyed left join of fixed-width
    columns on top of the pair-graph components — document text never
    crosses an exchange and no Python appears outside the component
    iteration's own frames."""
    plan = exec_plan_of(spark, sf_dir, "doc_softdedup_weights")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_bpe_compression_joins_counts_only(spark, sf_dir):
    """The band filter composes two fixed-width per-doc columns (n_chars,
    n_pieces) — text reaches only the tokenizer's own distinct-word stage,
    never an exchange here."""
    plan = exec_plan_of(spark, sf_dir, "doc_bpe_compression_quality")
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_epoch_fixpoint_window_is_source_cardinality(spark, sf_dir):
    """The fixpoint's window pass (prefix sums + lead) runs AFTER the source
    rollup, so its SinglePartition sort is source-cardinality (the
    class-histogram trade); text never crosses an exchange and no Python
    appears anywhere."""
    plan = exec_plan_of(spark, sf_dir, "doc_source_epoch_fixpoint")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the boundary/window machinery must sit above the source rollup:
    # every SinglePartition exchange consumes the aggregated (source,
    # n_tokens) shape, never raw documents columns
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_mixture_ipf_sweeps_touch_only_the_cell_table(spark, sf_dir):
    """IPF: one corpus shuffle (the lang x source rollup) feeds every
    sweep; the sweeps re-aggregate the tiny cell table with broadcast
    totals — no Python, no cartesian blowup, and text never crosses an
    exchange however many sweeps run."""
    plan = exec_plan_of(spark, sf_dir, "doc_mixture_ipf")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_quality_pr_curve_aggregates_counts_only(spark, sf_dir):
    """The calibration curve adds a 9-row broadcast fan-out + a count
    aggregation on top of the classifier's scoring pass — no per-doc rows
    survive to the output side and text never crosses an exchange."""
    plan = exec_plan_of(spark, sf_dir, "doc_quality_pr_curve")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_epoch_ipf_plan_composes_without_blowup(spark, sf_dir):
    """The composed 2-D water-filling plan: one corpus shuffle (the
    lang x source rollup) feeds BOTH stages; the fixpoint's window and the
    IPF sweeps run over rollup-cardinality frames with broadcast totals —
    no Python, no cartesian blowup, and text never crosses an exchange
    however the two operators compose."""
    plan = exec_plan_of(spark, sf_dir, "doc_epoch_ipf_plan")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_semdedup_bounded_no_global_window_no_python(spark, sf_dir):
    """The bounded-mode recall query: the wave split is a 1-row max
    broadcast (NEVER a global row_number/ntile window over the corpus),
    every pair join is cluster-keyed (no cartesian), embeddings cross
    exchanges only keyed by cluster, and no Python appears."""
    plan = exec_plan_of(spark, sf_dir, "embedding_semdedup_bounded")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the wave assignment must not sort the corpus into one partition:
    # any SinglePartition exchange may carry only 1-row aggregates
    # (max vec_id / count frames), never embedding columns
    for ln in plan.splitlines():
        if "SinglePartition" in ln:
            assert "embedding#" not in ln, ln
