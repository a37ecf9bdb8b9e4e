"""Incremental WET ingestion: the streaming-maintenance twin of
``queries/html.py::doc_wet_pipeline``.

A crawl corpus arrives in waves of archives; re-running the whole
archive→text→filters→dedup pipeline per wave is a full-corpus rescan.
``wet_batch`` is a ``foreachBatch`` body: it walks the wave's WARC blobs,
extracts and scores the text, applies the URL/host curation stages per wave
(``robots_drop`` — RFC 9309 politeness via ``operators/robots.py``,
``blocklist_drop`` — registrable-domain suffix semantics, and ``host_cap``
— per-host document cap preferring the most content: politeness-rejected,
blocked, or over-cap documents never reach the store, because landing them
only to filter at read time wastes store I/O at crawl scale), and lands the
surviving
per-document VERDICT ROWS (scalars + 60-bit fingerprint — never raw text)
in a per-batch partition of a persistent parquet store; ``read_wet_store``
merges the partitions with latest-batch-wins semantics per document (a
re-crawled page atomically replaces its verdict) and applies the
store-wide keep-first exact dedup.

Reference scope: the reference repo has no web stage; this extends the
round-8 HTML/WARC wave (COVERAGE.md web rows) with the ingestion lifecycle
the reference's streaming dedup models for events.

Scale:
- per-batch work is the batch pipeline's plan on the wave only: Arrow-
  batched container walk, map-side extraction/scoring, no keyed exchange
  until the store-side dedup;
- the store grows by appended ``batch=b<id>`` partitions, each written with
  overwrite (replay-idempotent — the same recovery contract as
  ``operators/fuzzydedup.py::admit_batch`` and ``searchindex.index_batch``);
- merge-time resolution joins verdicts against a (doc_id, max batch_seq)
  rollup — doc-cardinality, hash-partitioned; the keep-first window runs
  on the 60-bit fingerprint, so the merged pass shuffles fixed-width rows
  regardless of document sizes.

Quality constants are kept literal here (operators must not import from
the query registry layer); language-ID is the TRAINED classifier shared as
CODE (``operators/langid.py::predict_lang_spark`` — the same tier
``doc_wet_pipeline`` and ``doc_corpus_release`` compose since round 11, so
the tiers cannot drift). Remaining literal drift against the batch query
is pinned by
``tests/test_wetstream.py::test_streamed_waves_equal_batch_pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.html import extract_text
from .robots import robots_verdict

from ..textconst import TOKEN_RE as _TOKEN_RE
from .langid import predict_lang_spark


def _walk_warc(df: DataFrame, id_col: str = "doc_id", warc_col: str = "warc") -> DataFrame:
    """(doc_id, html) from a frame of PER-DOCUMENT WARC blobs — Arrow-batched,
    the one Python stage; non-response records skipped, HTTP headers stripped.

    Contract: each blob carries exactly ONE response record (the wave format
    ``wet_batch`` ingests is one document per archive row, keyed by
    ``id_col``). A multi-response archive would have no stable ``doc_id``
    identity here, so it fails loudly instead of silently keeping one record;
    multi-document archives go through
    ``operators/warc.py::response_documents``, which yields every response.
    """
    import pandas as pd  # noqa: F401  (executor-side dependency)

    def walk(it):
        import pandas as pd

        from clickhouse_etl_loadtest_spark.operators.warc import (
            http_body,
            iter_warc_records,
        )

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[warc_col]):
                responses = [
                    rec
                    for rec in iter_warc_records(blob.encode("utf-8"))
                    if rec["headers"].get("warc-type") == "response"
                ]
                if len(responses) != 1:
                    raise ValueError(
                        f"wet_batch expects exactly one response record per "
                        f"blob; doc_id={int(doc_id)} has {len(responses)} — use "
                        f"operators.warc.response_documents for multi-document "
                        f"archives"
                    )
                uri = responses[0]["headers"].get("warc-target-uri", "")
                html = http_body(responses[0]["payload"]).decode("utf-8")
                rows.append((int(doc_id), uri, html))
            yield pd.DataFrame(rows, columns=["doc_id", "target_uri", "html"])

    return df.mapInPandas(walk, "doc_id long, target_uri string, html string")


def _wet_extract(walked: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, host, path, extracted) — the expensive Arrow-batched
    extraction pass, UNMATERIALIZED: callers choose the reuse strategy
    (``wet_verdicts`` localCheckpoints for one-shot batch queries; the
    streaming landers persist + unpersist so a long-running stream never
    accumulates pinned non-fault-tolerant RDD blocks across waves)."""
    # Curation host key: case-insensitive scheme, authority lowercased with
    # userinfo and port stripped — 'HTTP://u@A.Example.COM:8080/x' keys as
    # 'a.example.com', so odd-but-legal URIs cannot silently bypass
    # blocklist suffix matching or host_cap grouping.
    authority = F.regexp_extract("target_uri", r"^(?i)[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    host = F.lower(
        F.regexp_replace(F.regexp_replace(authority, r"^[^@]*@", ""), r":[0-9]+$", "")
    )
    # URL path (query/fragment stripped) — what robots rules prefix-match on.
    # Dropped again before landing; only the curation stages see it.
    path = F.regexp_extract(
        "target_uri", r"^(?i)[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    return walked.select(
        "doc_id",
        host.alias("host"),
        path.alias("path"),
        extract_text(F.col(html_col)).alias("extracted"),
    )


def wet_verdicts(walked: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-document verdict rows from (doc_id, target_uri, html): extraction,
    quality score (length/punct/token signals), TRAINED language-ID
    (``predict_lang_spark`` — the tier every composed pipeline shares), the
    whitespace-normalized 60-bit fingerprint, and the host (for curation).
    The extracted frame materializes once (localCheckpoint) so the metrics
    branch and the langid rollup never re-run the extraction; raw text is
    dropped from the output and never crosses an Exchange, so everything
    downstream shuffles fixed-width rows."""
    return _score_extracted(_wet_extract(walked, html_col).localCheckpoint())


def _score_extracted(ex: DataFrame) -> DataFrame:
    """Verdict rows from an already-materialized extraction frame."""
    toks = F.regexp_extract_all(F.lower(F.col("extracted")), F.lit(_TOKEN_RE), F.lit(0))
    n_chars = F.length("extracted")
    n_punct = n_chars - F.length(F.regexp_replace("extracted", "[^a-zA-Z0-9 ]", ""))
    quality = (
        F.when(n_chars.between(100, 20000), 1).otherwise(0)
        + F.when(
            n_punct * F.lit(1.0) / F.nullif(n_chars.cast("double"), F.lit(0.0)) < 0.1, 1
        ).otherwise(0)
        + F.when(F.size(toks) >= 20, 1).otherwise(0)
    )

    norm = F.regexp_replace(F.trim(F.lower(F.col("extracted"))), r"\s+", " ")
    lang = predict_lang_spark(
        ex.select("doc_id", norm.alias("norm_text")), "doc_id", "norm_text"
    )
    return (
        ex.select(
            "doc_id",
            "host",
            "path",
            F.size(toks).cast("bigint").alias("n_tokens"),
            quality.cast("int").alias("quality_score"),
            (quality >= 2).alias("keep_quality"),
            h60(norm).alias("fingerprint"),
            h60(F.col("extracted")).alias("text_hash"),
        )
        .join(lang, "doc_id", "left")
        .withColumn(
            "predicted_lang", F.coalesce(F.col("predicted_lang"), F.lit("und"))
        )
    )


def blocklist_drop(verdicts: DataFrame, blocklist: list[str]) -> DataFrame:
    """Registrable-domain suffix filter (the ``doc_url_blocklist_filter``
    semantics): a listed domain blocks itself and every subdomain. The
    blocklist folds into the plan as an array literal checked against the
    host's dotted suffixes — map-only, no exchange (at UT1 scale, swap the
    literal for a broadcast join; the wave-side shape is identical)."""
    if not blocklist:
        return verdicts
    entries = F.array(*[F.lit(e) for e in sorted(set(blocklist))])
    # Guarded for single-label / empty hosts ('localhost', a missing
    # WARC-Target-URI): two-arg sequence(1, 0) DESCENDS in Spark and the
    # resulting slice(..., 0, ...) raises — same bug class as the gopher
    # short-doc guard (queries/text.py). Such hosts match as themselves only.
    suffixes = F.expr(
        "case when size(split(host, '\\\\.')) >= 2 then"
        " transform(sequence(1, size(split(host, '\\\\.')) - 1),"
        " i -> array_join(slice(split(host, '\\\\.'), i,"
        " size(split(host, '\\\\.')) - i + 1), '.'))"
        " else array(host) end"
    )
    blocked = F.exists(suffixes, lambda s: F.array_contains(entries, s))
    return verdicts.where(~blocked)


def robots_drop(verdicts: DataFrame, rules: DataFrame) -> DataFrame:
    """Per-wave robots.txt politeness filter: apply the RFC 9309 decision
    (``operators/robots.py::robots_verdict`` — longest matching prefix wins,
    Allow beats Disallow on a length tie, no match means allowed) to the
    wave's verdict rows and keep only allowed documents — a
    politeness-rejected page never reaches the store, the same
    ingestion-time discipline as :func:`blocklist_drop` / :func:`host_cap`.

    ``rules`` is ``(host, rule_type ∈ {allow, disallow}, prefix)`` — robots-
    file-sized per host, broadcast inside the decision; the wave side adds
    one doc-keyed semi-join to carry the verdict columns through (fixed-width
    rows — raw text is already gone)."""
    pages = verdicts.select("doc_id", "host", "path")
    allowed = robots_verdict(pages, rules).where("allowed").select("doc_id")
    return verdicts.join(allowed, "doc_id", "left_semi")


def host_cap(verdicts: DataFrame, cap: int) -> DataFrame:
    """Per-wave host cap: keep at most ``cap`` documents per host, preferring
    the most content (n_tokens desc, doc_id tie-break) — the
    ``doc_source_cap`` discipline applied at ingestion so a crawl burst from
    one host cannot flood the store. One host-keyed window over verdict rows
    (fixed width — raw text is already gone)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("host").orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
    return (
        verdicts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )


def wet_batch(
    batch_df: DataFrame,
    store_path: str,
    batch_id: int,
    id_col: str = "doc_id",
    warc_col: str = "warc",
    blocklist: list[str] | None = None,
    cap_per_host: int | None = None,
    robots_rules: DataFrame | None = None,
) -> None:
    """``foreachBatch`` body: walk + score this wave's archives, apply the
    URL/host curation stages PER BATCH (politeness-rejected, blocked-domain,
    and over-cap docs never reach the store — landing them only to filter at
    read time wastes store I/O at crawl scale), and land the surviving
    verdict rows in the batch's own partition. ``mode("overwrite")`` on the
    per-batch subdir makes replays (post-crash re-delivery of the same
    micro-batch) idempotent — curation is deterministic per wave, so a
    replay reproduces the identical partition."""
    _land_extracted(
        _wet_extract(_walk_warc(batch_df, id_col=id_col, warc_col=warc_col)),
        store_path,
        batch_id,
        blocklist,
        cap_per_host,
        robots_rules,
    )


def _land_extracted(
    ex: DataFrame,
    store_path: str,
    batch_id: int,
    blocklist: list[str] | None,
    cap_per_host: int | None,
    robots_rules: DataFrame | None = None,
) -> None:
    """Streaming-side materialize→score→land: persist (NOT localCheckpoint —
    lineage survives an executor loss, and the blocks are explicitly
    released once the write lands, so a long stream's storage footprint
    stays one-wave-bounded) the extraction frame, score+land it, unpersist."""
    ex = ex.persist()
    try:
        _land_verdicts(
            _score_extracted(ex),
            store_path,
            batch_id,
            blocklist,
            cap_per_host,
            robots_rules,
        )
    finally:
        ex.unpersist()


def _compaction_floor(store_path: str) -> int | None:
    """Highest batch id folded into a compacted partition, or None.
    Recovery runs UNCONDITIONALLY (one listdir + marker read per wave —
    safe under the single-writer contract): a compaction that crashed
    after the consolidated-dir rename but BEFORE the marker write leaves
    an uncommitted ``batch=c*`` partition that would double-count every
    row <= upto, and the marker alone can't see it — only the
    above-floor-c-dir sweep inside ``storemaint.recover`` can."""
    from . import storemaint

    storemaint.recover(store_path, [""])
    return storemaint.read_floor(store_path)


def compact_wet_store(spark: SparkSession, store_path: str, upto_batch_id: int) -> dict:
    """Fold every per-batch partition with id <= ``upto_batch_id`` into ONE
    consolidated partition (``batch=c<upto>``), preserving BOTH read
    semantics exactly:

    - per ``doc_id`` the row with the highest ``batch_seq`` survives —
      `read_wet_store`'s latest-wins merge sees the identical verdict;
    - per ``fingerprint`` the earliest sighting survives — the
      keep-first-arrival novelty set ``packstream.curate_and_pack_batch``
      anti-joins against is the same SET (novelty is a distinct check, so
      dropping LATER re-sightings of a fingerprint changes nothing).

    The store then carries a compaction FLOOR: replaying a batch at or
    below it would overwrite history the consolidated partition now owns,
    so :func:`wet_batch` fails loud instead — the standard compaction
    contract (compact only batches whose replay window the streaming
    checkpoint has committed past).

    Why this exists, with a number: the per-wave store read grows with the
    PARTITION COUNT (`BENCH_PROFILE.json::packstream_wave_20m` holds 32
    partitions of fixed-width rows — flat walls there, but a store that
    ingests for months accumulates thousands of partitions whose listing
    and footer costs dominate long before the rows do). Compaction is one
    ordinary Spark job — scan the merged partitions, two keyed rollups
    (doc, fingerprint), one partition write — wrapped in the crash-safe
    commit protocol of ``operators/storemaint.py``: the marker write is
    the commit point, every interrupted step is repaired by the recovery
    pass that runs at the start of each compaction AND each ingest wave.
    """
    import os

    from . import storemaint

    storemaint.recover(store_path, [""])
    floor = storemaint.read_floor(store_path)
    if floor is not None and upto_batch_id <= floor:
        raise ValueError(
            f"store at {store_path} is already compacted through {floor}; "
            f"re-compacting at {upto_batch_id} would step backwards"
        )
    parts = storemaint.list_parts(store_path, upto_batch_id)
    if not parts:
        raise ValueError(f"no partitions at or below {upto_batch_id} to compact")
    merged = spark.read.parquet(*[f"{store_path}/{d}" for d in parts])
    from pyspark.sql.window import Window

    # rank(), not row_number(), on the latest-wins side: a batch can carry
    # two rows for one doc_id (shard ingestion with a duplicated URI), and
    # read_wet_store's (doc_id, max batch_seq) join keeps BOTH — compaction
    # must preserve that exactly. The fingerprint side is a distinct SET
    # (novelty anti-join), so one earliest row per fingerprint suffices.
    latest = Window.partitionBy("doc_id").orderBy(F.col("batch_seq").desc())
    first_fp = Window.partitionBy("fingerprint").orderBy(
        F.col("batch_seq").asc(), F.col("doc_id").asc()
    )
    keep = (
        merged.withColumn("_rl", F.rank().over(latest))
        .withColumn("_rf", F.row_number().over(first_fp))
        .where((F.col("_rl") == 1) | (F.col("_rf") == 1))
        .drop("_rl", "_rf")
    )
    out = f"{store_path}/batch=c{upto_batch_id}"
    tmp = f"{store_path}/_compacting_c{upto_batch_id}"
    keep.write.mode("overwrite").parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    # swap in (recovery removed any stale out dir), then COMMIT via the
    # marker and drop the merged originals
    os.rename(tmp, out)
    storemaint.commit_fold(store_path, upto_batch_id, {"": parts})
    return {"floor": int(upto_batch_id), "merged_partitions": len(parts), "rows": int(rows)}


def _land_verdicts(
    verdicts: DataFrame,
    store_path: str,
    batch_id: int,
    blocklist: list[str] | None,
    cap_per_host: int | None,
    robots_rules: DataFrame | None = None,
) -> None:
    # compaction floor: a (re)delivery at or below it would overwrite
    # history the consolidated partition now owns — fail loud (the same
    # contract as the packstream/semstream out-of-order guards)
    floor = _compaction_floor(store_path)
    if floor is not None and batch_id <= floor:
        raise ValueError(
            f"wet store at {store_path} is compacted through batch {floor}; "
            f"batch {batch_id} cannot (re)land below the compaction floor"
        )
    # politeness first (a disallowed page must not even count against the
    # host cap), then the blocklist, then the per-host burst cap
    if robots_rules is not None:
        verdicts = robots_drop(verdicts, robots_rules)
    if blocklist:
        verdicts = blocklist_drop(verdicts, blocklist)
    if cap_per_host is not None:
        verdicts = host_cap(verdicts, cap_per_host)
    # the path column exists for the curation stages only; the store keeps
    # its fixed-width verdict schema
    verdicts.drop("path").withColumn(
        "batch_seq", F.lit(int(batch_id)).cast("long")
    ).write.mode("overwrite").parquet(f"{store_path}/batch=b{batch_id}")


def wet_shard_batch(
    batch_df: DataFrame,
    store_path: str,
    batch_id: int,
    shard_col: str = "warc",
    blocklist: list[str] | None = None,
    cap_per_host: int | None = None,
    robots_rules: DataFrame | None = None,
) -> None:
    """The multi-document twin of :func:`wet_batch` for REAL crawl framing:
    each input row carries a WHOLE archive shard (string or binary, plain or
    ``.warc.gz``), every ``response`` record becomes a document, and the
    document identity is ``h60(target_uri)`` (stored as ``doc_id``, so
    :func:`read_wet_store`'s latest-batch-wins / keep-first merge applies
    unchanged — a re-crawl of the same URI in a later wave atomically
    replaces its verdict). Same per-wave curation and replay-idempotent
    landing contract as ``wet_batch``; batch twin for equality tests is
    ``sources/warcfiles.py::read_warc_documents`` → :func:`wet_verdicts`."""
    def walk(it):
        import pandas as pd

        from clickhouse_etl_loadtest_spark.operators.warc import response_documents

        for pdf in it:
            rows = []
            for blob in pdf[shard_col]:
                data = (
                    bytes(blob)
                    if isinstance(blob, (bytes, bytearray, memoryview))
                    else str(blob).encode("utf-8")
                )
                for uri, body in response_documents(data):
                    rows.append((uri, body.decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=["target_uri", "html"])

    walked = batch_df.mapInPandas(walk, "target_uri string, html string").select(
        h60(F.col("target_uri")).alias("doc_id"), "target_uri", "html"
    )
    _land_extracted(
        _wet_extract(walked), store_path, batch_id, blocklist, cap_per_host, robots_rules
    )


def read_wet_store(spark: SparkSession, store_path: str) -> DataFrame:
    """The merged corpus verdict: latest batch wins per document (re-crawls
    replace), then keep-first-by-doc_id exact dedup across the WHOLE store —
    identical output columns to ``doc_wet_pipeline`` plus ``batch_seq``."""
    from pyspark.sql.window import Window

    raw = spark.read.parquet(store_path)  # hive-discovers the batch column
    latest = raw.groupBy("doc_id").agg(F.max("batch_seq").alias("batch_seq"))
    cur = raw.join(latest, ["doc_id", "batch_seq"])
    w = Window.partitionBy("fingerprint")
    return (
        cur.withColumn("is_canonical", F.col("doc_id") == F.min("doc_id").over(w))
        .select(
            "doc_id",
            "host",
            "predicted_lang",
            "n_tokens",
            "quality_score",
            "keep_quality",
            "is_canonical",
            (F.col("keep_quality") & F.col("is_canonical")).alias("kept"),
            "text_hash",
            "batch_seq",
        )
    )
