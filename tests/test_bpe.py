"""BPE trainer correctness: the Spark implementation must exactly reproduce
a pure-Python reference (Sennrich-style get_stats/merge_vocab loop) on the
real fixtures, and the encode path must reproduce the training-time symbol
state (min-rank-first encoding == sequential merge application)."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.bpe import (
    EOW,
    _apply_merge,
    _initial_symbols,
    bpe_segment_words,
    bpe_train,
    words_with_counts,
)


def _ref_merge_word(syms: tuple, left: str, right: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe(word_counts: dict, num_merges: int, min_pair_count: int = 2):
    """Reference trainer: overlapping adjacent-pair counts, max count with
    ties to the lexicographically smallest (left, right), leftmost
    non-overlapping merge application."""
    vocab = defaultdict(int)
    for w, c in word_counts.items():
        vocab[tuple(list(w) + [EOW])] += c
    merges = []
    for _ in range(num_merges):
        stats = defaultdict(int)
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (left, right), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        nxt = defaultdict(int)
        for syms, c in vocab.items():
            nxt[_ref_merge_word(syms, left, right)] += c
        vocab = nxt
    return merges, vocab


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bpe_train_matches_python_reference(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    wc = {r["word"]: r["cnt"] for r in words_with_counts(docs).collect()}
    ref_merges, _ = _ref_bpe(wc, num_merges=20)
    got = bpe_train(docs, num_merges=20)
    assert got == ref_merges
    assert len(got) == 20  # the fixture corpus supports at least 20 real merges
    # counts must be non-increasing is NOT an invariant of BPE (a merge can
    # create a pair more frequent than the runner-up was) — but every count
    # must be >= min_pair_count and positive
    assert all(c >= 2 for _, _, c in got)


def test_apply_merge_is_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "b", "a", "b", "c"],), (["x"],)],
        "syms array<string>",
    )
    out = [r[0] for r in df.select(_apply_merge(F.col("syms"), "a", "a")).collect()]
    assert out[0] == ["aa", "aa"]  # greedy left-to-right, no overlap
    out2 = [r[0] for r in df.select(_apply_merge(F.col("syms"), "a", "b")).collect()]
    assert out2[1] == ["ab", "ab", "c"]
    assert out2[2] == ["x"]  # too short: unchanged


def test_merged_symbol_can_extend_left(spark):
    """After merging (a,b)->ab at position i, the NEW last element must be
    eligible as the LEFT of a later (ab, x) merge pass — but never re-match
    as the left of the SAME (a,b) merge (fold semantics)."""
    df = spark.createDataFrame([(["a", "b", "b"],)], "syms array<string>")
    step1 = df.select(_apply_merge(F.col("syms"), "a", "b").alias("syms"))
    assert step1.collect()[0][0] == ["ab", "b"]
    step2 = step1.select(_apply_merge(F.col("syms"), "ab", "b").alias("syms"))
    assert step2.collect()[0][0] == ["abb"]


def test_segment_reproduces_training_state(spark, sf_dir):
    """Encoding with the learned merge table (min-rank-first) must give the
    same segmentation as the sequential training-time application — the
    standard BPE encode/train equivalence."""
    docs = _docs(spark, sf_dir)
    wc = {r["word"]: r["cnt"] for r in words_with_counts(docs).collect()}
    merges, final_vocab = _ref_bpe(wc, num_merges=20)
    # training-time final state per WORD (recomputed sequentially)
    expected = {}
    for w in wc:
        syms = tuple(list(w) + [EOW])
        for left, right, _ in merges:
            syms = _ref_merge_word(syms, left, right)
        expected[w] = list(syms)
    words_df = spark.createDataFrame([(w,) for w in sorted(wc)], "word string")
    got = {
        r["word"]: list(r["pieces"])
        for r in bpe_segment_words(words_df, merges).collect()
    }
    assert got == expected


def test_bpe_train_deterministic(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    assert bpe_train(docs, num_merges=8) == bpe_train(docs, num_merges=8)


def test_bpe_early_stop_on_rare_pairs(spark):
    docs = spark.createDataFrame([("unique words only once",)], "text string")
    merges = bpe_train(docs, num_merges=50)
    # every pair occurs once (< min_pair_count=2) except those shared across
    # words ('on'/'on' in 'only'/'once', etc.) — must stop well before 50
    assert len(merges) < 50
    assert all(c >= 2 for _, _, c in merges)


def test_fertility_matches_python_reference(spark, sf_dir):
    """doc_bpe_fertility must equal the all-Python pipeline: train, segment
    every word occurrence, aggregate by source."""
    from clickhouse_etl_loadtest_spark.queries import load_all
    import re

    docs = _docs(spark, sf_dir)
    wc = {r["word"]: r["cnt"] for r in words_with_counts(docs).collect()}
    merges, _ = _ref_bpe(wc, num_merges=24)
    seg_cache = {}
    for w in wc:
        syms = tuple(list(w) + [EOW])
        for left, right, _ in merges:
            syms = _ref_merge_word(syms, left, right)
        seg_cache[w] = len(syms)
    expected = {}
    for r in docs.select("source", "text").collect():
        words = re.findall(r"[a-z0-9]+", r["text"].lower())
        n_w, n_p = expected.get(r["source"], (0, 0))
        expected[r["source"]] = (n_w + len(words), n_p + sum(seg_cache[w] for w in words))
    got = load_all()["doc_bpe_fertility"].fn(spark, sf_dir).collect()
    assert {r["source"]: (r["n_words"], r["n_pieces"]) for r in got} == expected
    for r in got:
        assert abs(r["pieces_per_word"] - r["n_pieces"] / r["n_words"]) < 1e-12


def test_encode_corpus_matches_python_reference(spark, sf_dir):
    """doc_bpe_encode_corpus must equal the all-Python pipeline: train,
    segment each distinct word, assign byte-sorted piece ids, flatten per-doc
    id sequences in token order, polynomial-fold the digest. Also pins the
    fertility cross-check: per-doc n_pieces sums to the fertility totals."""
    import re

    from clickhouse_etl_loadtest_spark.queries import load_all

    docs = _docs(spark, sf_dir)
    wc = {r["word"]: r["cnt"] for r in words_with_counts(docs).collect()}
    merges, _ = _ref_bpe(wc, num_merges=24)
    seg = {}
    for w in wc:
        syms = tuple(list(w) + [EOW])
        for left, right, _ in merges:
            syms = _ref_merge_word(syms, left, right)
        seg[w] = list(syms)
    pid = {p: i for i, p in enumerate(sorted({p for syms in seg.values() for p in syms}))}
    expected = {}
    for r in docs.select("doc_id", "text").collect():
        ids = [pid[p] for w in re.findall(r"[a-z0-9]+", r["text"].lower()) for p in seg[w]]
        h = 0
        for x in ids:
            h = (h * 1000003 + x) % 2147483647
        expected[r["doc_id"]] = (len(ids), h)
    got = load_all()["doc_bpe_encode_corpus"].fn(spark, sf_dir).collect()
    assert {r["doc_id"]: (r["n_pieces"], r["seq_hash"]) for r in got} == expected
    fert = load_all()["doc_bpe_fertility"].fn(spark, sf_dir).collect()
    assert sum(r["n_pieces"] for r in got) == sum(r["n_pieces"] for r in fert)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_bpe_train_matches_reference_on_random_corpora(spark, seed):
    """Randomized differential: synthetic corpora with controlled repetition
    (so real merges exist) must train to the exact reference merge sequence —
    catches tie-break and fold bugs the fixture corpus might not exercise."""
    import random

    rng = random.Random(seed)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(40)
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 30))) for _ in range(25)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    wc = {r["word"]: r["cnt"] for r in words_with_counts(docs).collect()}
    ref_merges, _ = _ref_bpe(wc, num_merges=12)
    assert bpe_train(docs, num_merges=12) == ref_merges


def test_fertility_oracle_segmentation_margin(spark, sf_dir):
    """The _bpe_fertility_oracle unrolls segmentation for a FIXED 12
    iterations (each application shortens a word's piece list by >= 1, so
    12 covers any word up to 12 chars + EOW). If a regenerated fixture ever
    grows longer pre-tokens, the oracle would silently under-segment — this
    guard turns that into a loud failure naming the fix (raise seg_iters)."""
    from clickhouse_etl_loadtest_spark.queries.text import TOKEN_RE, _docs

    max_len = (
        _docs(spark, sf_dir)
        .select(F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias("w"))
        .agg(F.max(F.length("w")).alias("m"))
        .first()["m"]
    )
    assert max_len <= 12, (
        f"fixture words reach {max_len} chars > the fertility oracle's 12 "
        f"segmentation iterations — raise seg_iters in _bpe_fertility_oracle"
    )
