"""Incremental positional inverted index: the streaming-maintenance twin of
``queries/text.py::doc_inverted_index``.

A corpus that streams in (landing waves, CDC batches) should not rebuild its
search index from scratch per wave. ``index_batch`` is a ``foreachBatch``
body: it computes the batch's postings and lands them in a per-batch
partition of a persistent parquet index; ``read_search_index`` merges the
partitions with latest-batch-wins semantics per document, so re-ingesting a
revised document atomically replaces its postings.

Reference scope: the reference repo has no search path at all; this extends
the LLM-pipeline search stack (COVERAGE.md search rows).

Scale:
- the batch-side postings computation is the same one-pruned-shuffle plan as
  the batch query (text projected away before ``posexplode``, composite
  (token, doc_id) grouping key — no single-key skew);
- the index grows by appended partitions, never rewritten: each batch writes
  only its own ``batch=b<id>`` subdir (overwrite on replay — idempotent, the
  same recovery contract as ``operators/fuzzydedup.py::admit_batch``);
- latest-wins resolution joins postings against a (doc_id, max batch_seq)
  rollup — doc-cardinality, hash-partitioned, no broadcast assumption;
- a production layout would periodically compact cold batches with
  ``repartitionByRange(token)`` into term-range files (see
  ``doc_inverted_index``'s docstring); the per-batch partitions are the hot
  tail of that lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

# same token grammar as queries/text.py::TOKEN_RE (kept literal here:
# operators must not import from the query registry layer)
DEFAULT_TOKEN_RE = "[a-z0-9]+"


def postings_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_re: str = DEFAULT_TOKEN_RE,
) -> DataFrame:
    """Positional postings for one corpus slice: one row per (token, id) with
    occurrence count, first/last position (1-based) and the sorted position
    list — identical semantics to ``doc_inverted_index`` (equality is pinned
    by ``tests/test_searchindex.py``)."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '{token_re}', 0)")
    pos = df.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos0", "token")).select(
        "doc_id", "token", (F.col("pos0") + 1).alias("pos")
    )
    return pos.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("pos").cast("bigint").alias("first_pos"),
        F.max("pos").cast("bigint").alias("last_pos"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("pos")), lambda x: x.cast("string")),
            ",",
        ).alias("positions_csv"),
    )


def index_batch(
    batch_df: DataFrame,
    index_path: str,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_re: str = DEFAULT_TOKEN_RE,
) -> int:
    """``foreachBatch`` body: land the batch's postings in the persistent
    index. Returns the number of posting rows written.

    Idempotency: with ``batch_id`` (the ``foreachBatch`` argument) the write
    overwrites exactly its own ``batch=b<id>`` partition subdir, so a
    checkpoint-recovery replay replaces its own partial append and nothing
    else. Without ``batch_id`` the append lands in ``batch=adhoc`` and is
    at-least-once. ``batch_seq`` (the numeric batch id, -1 for adhoc) is
    stored IN the rows so ``read_search_index`` can resolve documents
    re-ingested across batches without parsing partition strings.
    """
    postings = postings_table(batch_df, id_col=id_col, text_col=text_col, token_re=token_re)
    seq = batch_id if batch_id is not None else -1
    postings = postings.withColumn("batch_seq", F.lit(seq).cast("int")).localCheckpoint()
    n = postings.count()
    part = f"b{batch_id}" if batch_id is not None else "adhoc"
    mode = "overwrite" if batch_id is not None else "append"
    postings.write.mode(mode).parquet(f"{index_path}/batch={part}")
    return n


def read_search_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The merged index: latest-batch-wins per document. A document
    re-ingested in a later batch contributes ONLY its newest postings —
    stale rows are filtered by a (doc_id, max(batch_seq)) rollup join
    (doc-cardinality, hash-partitioned). Returns the ``doc_inverted_index``
    column contract plus ``batch_seq``."""
    try:
        idx = spark.read.parquet(index_path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return spark.createDataFrame(
                [],
                schema=(
                    "token string, doc_id long, n_occurrences bigint, first_pos bigint,"
                    " last_pos bigint, positions_csv string, batch_seq int"
                ),
            )
        raise
    latest = idx.groupBy("doc_id").agg(F.max("batch_seq").alias("batch_seq"))
    return idx.join(latest, ["doc_id", "batch_seq"]).select(
        "token", "doc_id", "n_occurrences", "first_pos", "last_pos", "positions_csv", "batch_seq"
    )


def compact_search_index(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    n_ranges: int = 8,
) -> int:
    """Compact the per-batch hot tail into a term-range base: resolve
    latest-wins ONCE, then write the surviving postings to
    ``out_path/batch=base`` via ``repartitionByRange(token)`` +
    in-partition sort — each output file is a contiguous, binary-searchable
    term range (the layout ``doc_inverted_index``'s docstring prescribes).
    Returns the number of postings in the base.

    The write goes to a NEW directory — the caller swaps paths atomically
    (or points readers at it) and later batches keep appending there with
    higher batch ids: per-doc ``batch_seq`` is PRESERVED through compaction,
    so latest-wins resolution against post-compaction batches stays correct.
    Compacting in place would race concurrent readers; on a real lakehouse
    this step is the table format's rewrite-commit.
    """
    resolved = read_search_index(spark, index_path).localCheckpoint()
    n = resolved.count()
    (
        resolved.withColumn("batch", F.lit("base"))
        .repartitionByRange(n_ranges, "token")
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(out_path)
    )
    return n


def write_doc_norms(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    corpus_ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> int:
    """Materialize the norms table (doc_id -> document length in tokens) from
    the index — the one full-index pass BM25 needs, paid once per compaction
    instead of once per query. Returns the number of documents.

    Zero-token documents have no postings, so an index-only build undercounts
    them; BM25's corpus statistics (n_docs, avgdl) must still include them to
    match a corpus-side recompute (``doc_bm25_scores`` counts every document).
    Pass ``corpus_ids`` (any DataFrame carrying the full ``id_col`` universe,
    e.g. the documents table itself) to emit dl=0 rows for postings-less
    documents; without it the norms table covers only documents with >=1
    token, and ``bm25_from_index`` equals the corpus recompute ONLY on
    corpora with no empty documents."""
    norms = (
        read_search_index(spark, index_path)
        .groupBy("doc_id")
        .agg(F.sum("n_occurrences").cast("bigint").alias("dl"))
    )
    if corpus_ids is not None:
        universe = corpus_ids.select(F.col(id_col).alias("doc_id")).distinct()
        norms = universe.join(norms, "doc_id", "left").select(
            "doc_id", F.coalesce("dl", F.lit(0)).cast("bigint").alias("dl")
        )
    norms = norms.localCheckpoint()
    n = norms.count()
    norms.write.mode("overwrite").parquet(out_path)
    return n


def bm25_from_index(
    spark: SparkSession,
    index_path: str,
    norms_path: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scoring FROM the persisted index: the scan reads ONLY the query
    terms' postings (`token IN (...)` pushes into the parquet reader — and
    prunes whole term-range files of a compacted base via min/max stats),
    joins the precomputed norms, and emits (doc_id, n_query_terms, bm25)
    with the same Okapi/Lucene-idf formula as the corpus-recomputing
    ``doc_bm25_scores`` (equality pinned in tests).

    Scale: THIS is why the index exists — per query the engine touches
    O(|Q| posting lists + norms), never the corpus text; df is ≤|Q| rows
    and N/avgdl one row, both broadcast.
    """
    postings = read_search_index(spark, index_path).where(F.col("token").isin(list(terms)))
    norms = spark.read.parquet(norms_path)
    stats = norms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_ = postings.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("n_occurrences") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    term_score = idf * F.col("n_occurrences") * (k1 + 1.0) / denom
    return (
        postings.join(F.broadcast(df_), "token")
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_query_terms"),
            F.sum(term_score.cast("decimal(38,18)")).cast("double").alias("bm25"),
        )
    )


def phrase_from_index(
    spark: SparkSession, index_path: str, phrase: list[str]
) -> DataFrame:
    """Exact 2-word phrase query off the persisted index: both terms'
    postings load via a pushed ``token IN`` scan, their stored position
    lists are re-parsed JVM-side and intersected with a +1 shift — all
    integer logic, so results equal the corpus-side ``doc_phrase_search``
    plan exactly (pinned in tests). Longer phrases chain the same
    intersection rarest-term-first."""
    if len(phrase) != 2:
        raise ValueError("phrase_from_index currently supports 2-word phrases")
    w1, w2 = phrase
    postings = read_search_index(spark, index_path).where(F.col("token").isin([w1, w2]))
    pos_arr = F.transform(F.split("positions_csv", ","), lambda x: x.cast("int"))
    p1 = postings.where(F.col("token") == w1).select(
        "doc_id", F.transform(pos_arr, lambda p: p + 1).alias("next_pos")
    )
    p2 = postings.where(F.col("token") == w2).select("doc_id", pos_arr.alias("pos2"))
    hits = F.array_intersect(F.col("next_pos"), F.col("pos2"))
    return (
        p1.join(p2, "doc_id")
        .select("doc_id", hits.alias("hits"))
        .where(F.size("hits") > 0)
        .select(
            "doc_id",
            F.size("hits").cast("bigint").alias("n_hits"),
            (F.array_min("hits") - 1).cast("bigint").alias("first_hit"),
        )
    )
