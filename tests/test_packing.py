"""Training-context packing (queries/curation.py::doc_context_packing +
doc_context_chunks): the two manifests must tile the token stream exactly
and agree with each other."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()


def test_chunks_tile_exactly_and_agree_with_doc_manifest(spark, sf_dir):
    packing = REG["doc_context_packing"].fn(spark, sf_dir).collect()
    chunks = REG["doc_context_chunks"].fn(spark, sf_dir).collect()

    # per-document: the chunk overlaps sum to the document's token length
    # and start at doc_token_start 0 on its first chunk
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for p in packing:
        rows = sorted(by_doc[p["doc_id"]], key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(
            range(p["chunk_first"], p["chunk_last"] + 1)
        )
        assert sum(r["n_tokens_in_chunk"] for r in rows) == p["len_tokens"]
        assert rows[0]["doc_token_start"] == 0
        # overlaps are contiguous within the document
        seen = 0
        for r in rows:
            assert r["doc_token_start"] == seen
            seen += r["n_tokens_in_chunk"]

    # per-chunk: every chunk except the last is EXACTLY full (512 tokens,
    # contiguous from slot 0) — the concatenate-and-cut invariant
    by_chunk: dict[int, list] = {}
    for r in chunks:
        by_chunk.setdefault(r["chunk_id"], []).append(r)
    last = max(by_chunk)
    assert sorted(by_chunk) == list(range(last + 1))  # no empty chunks
    for cid, rows in by_chunk.items():
        rows.sort(key=lambda r: r["chunk_token_start"])
        filled = 0
        for r in rows:
            assert r["chunk_token_start"] == filled
            filled += r["n_tokens_in_chunk"]
        if cid != last:
            assert filled == 512
        else:
            assert 0 < filled <= 512

    # grand total: chunks' tokens == packing's tokens == corpus tokens + EOS
    total = sum(r["n_tokens_in_chunk"] for r in chunks)
    assert total == sum(p["len_tokens"] for p in packing)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    corpus_tokens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.size(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    assert total == corpus_tokens + n_docs  # one EOS per document


def test_release_chunks_tile_release_packing_exactly(spark, sf_dir):
    """The release-side pair of manifests obeys the same tiling algebra:
    per released page the chunk overlaps are contiguous and sum to its
    length, every non-final chunk is exactly full, and the stream totals
    agree — over the CURATED corpus, where the released set is a filtered,
    re-keyed (pkey) subset of the crawl."""
    packing = REG["doc_release_packing"].fn(spark, sf_dir).collect()
    chunks = REG["doc_release_chunks"].fn(spark, sf_dir).collect()

    by_page: dict[int, list] = {}
    for r in chunks:
        by_page.setdefault(r["pkey"], []).append(r)
    assert set(by_page) == {p["pkey"] for p in packing}
    for p in packing:
        rows = sorted(by_page[p["pkey"]], key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(
            range(p["chunk_first"], p["chunk_last"] + 1)
        )
        assert sum(r["n_tokens_in_chunk"] for r in rows) == p["len_tokens"]
        assert rows[0]["doc_token_start"] == 0

    by_chunk: dict[int, list] = {}
    for r in chunks:
        by_chunk.setdefault(r["chunk_id"], []).append(r)
    last = max(by_chunk)
    assert sorted(by_chunk) == list(range(last + 1))
    for cid, rows in by_chunk.items():
        rows.sort(key=lambda r: r["chunk_token_start"])
        filled = 0
        for r in rows:
            assert r["chunk_token_start"] == filled
            filled += r["n_tokens_in_chunk"]
        assert filled == 512 if cid != last else 0 < filled <= 512

    assert sum(r["n_tokens_in_chunk"] for r in chunks) == sum(
        p["len_tokens"] for p in packing
    )


def test_curriculum_packing_is_a_permutation_of_the_same_stream(spark, sf_dir):
    """Curriculum packing re-orders WHICH tokens land where but must
    conserve the stream: same per-doc lengths as doc_id-order packing, same
    grand total, offsets a bijection onto [0, total), and the offset order
    must equal the curriculum rank order."""
    base = {r["doc_id"]: r for r in REG["doc_context_packing"].fn(spark, sf_dir).collect()}
    cur = REG["doc_curriculum_packing"].fn(spark, sf_dir).collect()
    order = {
        r["doc_id"]: r["curriculum_rank"]
        for r in REG["doc_curriculum_order"].fn(spark, sf_dir).collect()
    }
    assert {r["doc_id"] for r in cur} == set(base)
    for r in cur:
        assert r["len_tokens"] == base[r["doc_id"]]["len_tokens"]
    total = sum(r["len_tokens"] for r in cur)
    assert total == sum(b["len_tokens"] for b in base.values())
    # exclusive prefix offsets tile [0, total) without gaps or overlaps
    spans = sorted((r["start_offset"], r["len_tokens"]) for r in cur)
    cursor = 0
    for off, ln in spans:
        assert off == cursor
        cursor += ln
    assert cursor == total
    # and the tiling order IS the curriculum order
    by_offset = [r["doc_id"] for r in sorted(cur, key=lambda r: r["start_offset"])]
    assert by_offset == sorted(order, key=lambda d: order[d])


def test_harmonic_bins_never_overfill_and_cover_every_doc(spark, sf_dir):
    """Bin-packing validity, independent of the oracle equality: every bin's
    token sum fits the context length, every document packs exactly once,
    slots stay inside their class capacity, and the stats row's accounting
    reconciles with the manifest."""
    m = REG["doc_pack_harmonic"].fn(spark, sf_dir)
    ctx = 512
    # validity: per-bin fill <= CTX (k docs of length <= CTX/k)
    overfull = (
        m.groupBy("bin_id")
        .agg(F.sum("len_tokens").alias("fill"))
        .where(F.col("fill") > ctx)
        .count()
    )
    assert overfull == 0
    rows = m.collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)  # exactly once
    assert all(0 <= r["slot"] < r["size_class"] for r in rows)
    # (bin_id, slot) is a real injective placement
    assert len({(r["bin_id"], r["slot"]) for r in rows}) == len(rows)
    stats = REG["doc_pack_harmonic_stats"].fn(spark, sf_dir).first()
    assert stats["n_docs"] == len(rows)
    assert stats["n_bins"] == len({r["bin_id"] for r in rows})
    assert stats["total_tokens"] == sum(r["len_tokens"] for r in rows)
    assert stats["n_bins"] >= stats["lower_bound_bins"]  # no packer beats L1


def test_epoch_plan_conserves_the_budget(spark, sf_dir):
    """Accounting invariants of the one-pass redistribution: capped sources
    sit exactly at the cap, redistribution CONSERVES the budget (capped
    mass + leftover split = budget) whether or not a recap flag fired, and
    the flag is exactly "uncapped but pushed past the cap" — never
    silently re-capped."""
    rows = REG["doc_source_epoch_plan"].fn(spark, sf_dir).collect()
    assert any(r["capped"] for r in rows) and any(not r["capped"] for r in rows)
    total_tokens = sum(r["n_tokens"] for r in rows)
    budget = total_tokens * 3.8
    for r in rows:
        if r["capped"]:
            assert r["final_epochs"] == 4.0
            assert r["final_tokens"] == 4.0 * r["n_tokens"]
            assert not r["recap_needed"]
        else:
            assert r["recap_needed"] == (r["final_epochs"] > 4.0)
    got = sum(r["final_tokens"] for r in rows)
    assert abs(got - budget) < 1e-3 * budget


def _iterative_epoch_fixpoint(per_source, budget_x=3.8, cap=4.0):
    """The naive cap->redistribute->re-cap loop the closed form replaces:
    re-derive capped set and multiplier until no uncapped source exceeds the
    cap (<= n_sources rounds — each round caps at least one new source)."""
    import math

    budget = sum(t for _, t in per_source) * budget_x
    capped: set[str] = set()
    for _ in range(len(per_source) + 1):
        rem_budget = budget - cap * sum(t for s, t in per_source if s in capped)
        denom = sum(math.sqrt(t) for s, t in per_source if s not in capped)
        newly = {
            s
            for s, t in per_source
            if s not in capped and rem_budget * math.sqrt(t) / denom / t > cap
        }
        if not newly:
            lam = rem_budget / denom
            return capped, lam
        capped |= newly
    raise AssertionError("fixpoint did not converge within n_sources rounds")


def test_epoch_fixpoint_equals_the_iterative_loop(spark, sf_dir):
    """The closed-form water-filling boundary IS the fixpoint: same capped
    set and same allocations as the naive iterative loop; every capped
    source sits exactly at the cap, no uncapped source exceeds it, and the
    budget is conserved exactly (the two properties the one-pass audit
    query can only flag)."""
    rows = REG["doc_source_epoch_fixpoint"].fn(spark, sf_dir).collect()
    per_source = [(r["source"], r["n_tokens"]) for r in rows]
    capped, lam = _iterative_epoch_fixpoint(per_source)
    import math

    assert {r["source"] for r in rows if r["capped"]} == capped
    assert any(r["capped"] for r in rows) and any(not r["capped"] for r in rows)
    total_tokens = sum(r["n_tokens"] for r in rows)
    budget = total_tokens * 3.8
    for r in rows:
        if r["capped"]:
            assert r["final_epochs"] == 4.0
            assert r["final_tokens"] == 4.0 * r["n_tokens"]
        else:
            # never past the cap — the property doc_source_epoch_plan lacks
            assert r["final_epochs"] <= 4.0
            want = lam * math.sqrt(r["n_tokens"])
            assert abs(r["final_tokens"] - want) <= max(1e-6 * want, 5e-7)
    got = sum(r["final_tokens"] for r in rows)
    assert abs(got - budget) < 1e-9 * budget  # conserved exactly, not ~1e-3


def test_epoch_fixpoint_caps_a_prefix_by_size(spark, sf_dir):
    """Under sqrt-flattening small sources cap first: the capped set is a
    prefix of sources sorted ascending by token count (the invariant the
    closed-form boundary search rests on)."""
    rows = sorted(
        REG["doc_source_epoch_fixpoint"].fn(spark, sf_dir).collect(),
        key=lambda r: (r["n_tokens"], r["source"]),
    )
    flags = [r["capped"] for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_mixture_ipf_holds_source_totals_and_converges(spark, sf_dir):
    """IPF invariants: the last sweep ends on the source side, so every
    source's allocated mass equals its availability EXACTLY (relative
    1e-9); weights are strictly positive; and the language residuals
    bracket 1 tightly after 3 sweeps (the convergence audit a sampler
    reads)."""
    rows = REG["doc_mixture_ipf"].fn(spark, sf_dir).collect()
    assert len(rows) > 1
    by_source: dict = {}
    for r in rows:
        assert r["weight"] > 0
        a, t = by_source.get(r["source"], (0.0, 0))
        by_source[r["source"]] = (a + r["alloc_tokens"], t + r["n_tokens"])
    for src, (alloc, avail) in by_source.items():
        assert abs(alloc - avail) <= 1e-9 * avail + 1e-6, src
    # residuals: every language within 25% of target after 3 sweeps on the
    # fixture (exactness is the source marginal's job, not the language's)
    residuals = {r["lang"]: r["lang_residual"] for r in rows}
    assert all(0.75 <= v <= 1.25 for v in residuals.values()), residuals


def test_quality_pr_curve_is_a_real_curve(spark, sf_dir):
    """Threshold-sweep invariants: positives (tp+fn) are constant across
    thresholds, recall is monotone non-increasing as the threshold rises,
    and the curve actually moves (not all rows identical)."""
    rows = sorted(
        REG["doc_quality_pr_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    positives = {r["tp"] + r["fn"] for r in rows}
    assert len(positives) == 1
    recalls = [r["recall_"] for r in rows]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    assert len({(r["tp"], r["fp"]) for r in rows}) > 1


def test_ffd_histogram_walk_equals_per_item_first_fit():
    """The batched histogram walk in _ffd_bin_count must be EXACTLY
    first-fit-decreasing, not an approximation of it: differential against
    the textbook per-item scan over randomized histograms (Spark-free)."""
    import random

    from clickhouse_etl_loadtest_spark.queries.curation import _ffd_bin_count

    def brute(hist, ctx):
        items = []
        for length, count in sorted(hist, reverse=True):
            items.extend([length] * count)
        bins: list[int] = []
        for it in items:
            for i, r in enumerate(bins):
                if r >= it:
                    bins[i] = r - it
                    break
            else:
                bins.append(ctx - it)
        return len(bins)

    rng = random.Random(12)
    for trial in range(60):
        ctx = rng.choice([16, 64, 512])
        n_lens = rng.randint(1, 12)
        hist = [
            (rng.randint(1, ctx), rng.randint(1, 40)) for _ in range(n_lens)
        ]
        # merge duplicate lengths (the histogram contract)
        merged: dict[int, int] = {}
        for length, c in hist:
            merged[length] = merged.get(length, 0) + c
        hist = list(merged.items())
        assert _ffd_bin_count(hist, ctx) == brute(hist, ctx), (trial, ctx, hist)
