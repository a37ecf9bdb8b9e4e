"""Incremental inverted index (operators/searchindex.py): streamed waves
must converge to the batch query's exact output, replays must be no-ops,
and a re-ingested document must atomically replace its postings."""

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.searchindex import (
    index_batch,
    postings_table,
    read_search_index,
)
from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()

DOCS = [
    (1, "alpha beta alpha gamma"),
    (2, "beta beta delta"),
    (3, "gamma alpha"),
    (4, "epsilon"),
    (5, "delta gamma delta"),
    (6, "alpha epsilon beta"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def _canon(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "token", "doc_id", "n_occurrences", "first_pos", "last_pos", "positions_csv"
        ).collect()
    )


def test_streamed_waves_equal_batch_query(spark, tmp_path):
    """Drive index_batch as a REAL foreachBatch body (file stream,
    availableNow, several micro-batches) and require the merged index to
    equal both postings_table on the full corpus and the registry's
    doc_inverted_index on the same documents — pinning the operator and the
    query to one semantics."""
    staging = str(tmp_path / "staging")
    index = str(tmp_path / "index")
    # three files so availableNow + maxFilesPerTrigger yields >1 micro-batch
    for i, lo in enumerate((0, 2, 4)):
        _df(spark, DOCS[lo : lo + 2]).coalesce(1).write.mode("overwrite").parquet(
            f"{staging}/wave{i}"
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staging}/wave*")
    )
    q = (
        stream.writeStream.foreachBatch(lambda bdf, bid: index_batch(bdf, index, batch_id=bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    merged = read_search_index(spark, index)
    full = _df(spark, DOCS)
    assert _canon(merged) == _canon(postings_table(full))

    # and against the registry query over a documents.parquet fixture dir
    sf = str(tmp_path / "fixture")
    full.select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    assert _canon(merged) == _canon(REG["doc_inverted_index"].fn(spark, sf))


def test_replay_is_idempotent(spark, tmp_path):
    index = str(tmp_path / "index")
    index_batch(_df(spark, DOCS[:3]), index, batch_id=0)
    index_batch(_df(spark, DOCS[3:]), index, batch_id=1)
    before = _canon(read_search_index(spark, index))
    # checkpoint-recovery replay of batch 1: same rows, same batch_id
    index_batch(_df(spark, DOCS[3:]), index, batch_id=1)
    assert _canon(read_search_index(spark, index)) == before


def test_reingested_doc_replaces_postings(spark, tmp_path):
    index = str(tmp_path / "index")
    index_batch(_df(spark, [(1, "old words here"), (2, "stable text")]), index, batch_id=0)
    index_batch(_df(spark, [(1, "brand new body")]), index, batch_id=1)
    merged = read_search_index(spark, index)
    doc1 = {r["token"] for r in merged.where(F.col("doc_id") == 1).collect()}
    assert doc1 == {"brand", "new", "body"}  # no stale 'old'/'words'/'here'
    assert {r["token"] for r in merged.where(F.col("doc_id") == 2).collect()} == {
        "stable",
        "text",
    }
    # batch_seq records provenance: doc 1 from batch 1, doc 2 from batch 0
    seqs = {r["doc_id"]: r["batch_seq"] for r in merged.select("doc_id", "batch_seq").distinct().collect()}
    assert seqs == {1: 1, 2: 0}


def test_empty_index_reads_empty(spark, tmp_path):
    out = read_search_index(spark, str(tmp_path / "nope"))
    assert out.count() == 0
    assert "positions_csv" in out.columns


def test_compaction_preserves_the_merged_index(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.searchindex import compact_search_index

    index, base = str(tmp_path / "index"), str(tmp_path / "base")
    index_batch(_df(spark, DOCS[:3]), index, batch_id=0)
    index_batch(_df(spark, DOCS[3:]), index, batch_id=1)
    index_batch(_df(spark, [(2, "rewritten body here")]), index, batch_id=2)  # re-ingest
    before = _canon(read_search_index(spark, index))
    n = compact_search_index(spark, index, base)
    assert n == len(before)
    assert _canon(read_search_index(spark, base)) == before
    # stale postings for doc 2 are physically gone, not just filtered
    raw = spark.read.parquet(base)
    assert raw.where((raw.doc_id == 2) & (raw.batch_seq != 2)).count() == 0


def test_compacted_base_keeps_accepting_batches(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.searchindex import compact_search_index

    index, base = str(tmp_path / "index"), str(tmp_path / "base")
    index_batch(_df(spark, DOCS[:4]), index, batch_id=0)
    compact_search_index(spark, index, base)
    # later waves append to the compacted dir with higher ids, including a
    # re-ingest that must beat the base copy
    index_batch(_df(spark, DOCS[4:]), base, batch_id=7)
    index_batch(_df(spark, [(1, "fresh alpha")]), base, batch_id=8)
    merged = read_search_index(spark, base)
    doc1 = {r["token"] for r in merged.where(F.col("doc_id") == 1).collect()}
    assert doc1 == {"fresh", "alpha"}
    full = _df(spark, [(1, "fresh alpha")] + DOCS[1:])
    assert {r["doc_id"] for r in merged.select("doc_id").distinct().collect()} == {1, 2, 3, 4, 5, 6}
    # and the whole thing equals a batch build over the equivalent corpus
    assert _canon(merged) == _canon(postings_table(full))


def test_compaction_layout_is_term_range_partitioned(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from clickhouse_etl_loadtest_spark.operators.searchindex import compact_search_index

    index, base = str(tmp_path / "index"), str(tmp_path / "base")
    index_batch(_df(spark, DOCS), index, batch_id=0)
    compact_search_index(spark, index, base, n_ranges=3)
    ranges = []
    for f in glob.glob(f"{base}/batch=base/*.parquet"):
        t = pq.read_table(f, columns=["token"]).column("token").to_pylist()
        if not t:
            continue
        assert t == sorted(t), "file not token-sorted"
        ranges.append((t[0], t[-1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, "token ranges overlap across files"


def test_index_backed_bm25_equals_corpus_recompute(spark, tmp_path):
    """Scoring from the compacted index + norms must equal doc_bm25_scores'
    corpus recompute value-for-value, and the term filter must push into
    the index scan."""
    from clickhouse_etl_loadtest_spark.operators.searchindex import (
        bm25_from_index,
        compact_search_index,
        write_doc_norms,
    )
    from clickhouse_etl_loadtest_spark.queries.text import _BM25_QUERY

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    index, base, norms = (str(tmp_path / d) for d in ("index", "base", "norms"))
    index_batch(docs, index, batch_id=0)
    compact_search_index(spark, index, base)
    assert write_doc_norms(spark, base, norms, corpus_ids=docs) == docs.count()

    scored = bm25_from_index(spark, base, norms, list(_BM25_QUERY))
    expected = REG["doc_bm25_scores"].fn(spark, sf)
    got = {r["doc_id"]: r for r in scored.collect()}
    exp = {r["doc_id"]: r for r in expected.collect()}
    assert set(got) == set(exp)
    for d in exp:
        assert got[d]["n_query_terms"] == exp[d]["n_query_terms"]
        assert abs(got[d]["bm25"] - exp[d]["bm25"]) < 1e-9, d

    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(token" in plan  # pruned scan, not a full read


def test_index_backed_phrase_equals_corpus_recompute(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.searchindex import (
        compact_search_index,
        phrase_from_index,
    )
    from clickhouse_etl_loadtest_spark.queries.text import _PHRASE

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    index, base = str(tmp_path / "index"), str(tmp_path / "base")
    index_batch(docs, index, batch_id=0)
    compact_search_index(spark, index, base)
    got = sorted(
        tuple(r) for r in phrase_from_index(spark, base, list(_PHRASE)).collect()
    )
    exp = sorted(tuple(r) for r in REG["doc_phrase_search"].fn(spark, sf).collect())
    assert got == exp and got, "phrase hits must exist and match exactly"


def test_bm25_norms_count_zero_token_documents(spark, tmp_path):
    """A corpus with empty documents: norms built WITH corpus_ids must count
    them in n_docs/avgdl (matching the corpus-side recompute, which counts
    every document), and the BM25 value must equal a hand computation over
    the full corpus statistics — the ADVICE round-5 finding."""
    import math

    from clickhouse_etl_loadtest_spark.operators.searchindex import (
        bm25_from_index,
        write_doc_norms,
    )

    rows = [(1, "fast table"), (2, ""), (3, "fast fast merge"), (4, "   ")]
    docs = _df(spark, rows)
    index, norms = str(tmp_path / "index"), str(tmp_path / "norms")
    index_batch(docs, index, batch_id=0)
    assert write_doc_norms(spark, index, norms, corpus_ids=docs) == 4
    stored = {r["doc_id"]: r["dl"] for r in spark.read.parquet(norms).collect()}
    assert stored == {1: 2, 2: 0, 3: 3, 4: 0}, "zero-token docs must appear with dl=0"

    k1, b = 1.2, 0.75
    n_docs, avgdl = 4, (2 + 0 + 3 + 0) / 4  # empty docs IN the stats
    dls = {1: 2, 3: 3}
    tfs = {1: {"fast": 1}, 3: {"fast": 2, "merge": 1}}
    dfs = {"fast": 2, "merge": 1}
    got = {r["doc_id"]: r["bm25"] for r in bm25_from_index(spark, index, norms, ["fast", "merge"]).collect()}
    for d, terms in tfs.items():
        exp = sum(
            math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
            * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[d] / avgdl))
            for t, tf in terms.items()
        )
        assert abs(got[d] - exp) < 1e-12, d
