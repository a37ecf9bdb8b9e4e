"""Incremental WET ingestion (operators/wetstream.py): streamed archive
waves must converge to the batch pipeline's exact output, replays must be
no-ops, and a re-crawled document must atomically replace its verdict."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.wetstream import (
    read_wet_store,
    wet_batch,
)
from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()

# doc 7 duplicates doc 2's text exactly (keep-first => 2 canonical, 7 not);
# every text is >=100 chars so the quality length rule has both outcomes.
# Docs 8-11 are marker-drift tripwires: each contains words where the
# operator's literal _LANG_MARKERS historically drifted from text.py's
# LANG_MARKERS ('that' vs 'in' for en, 'nicht' vs 'ein' for de) arranged so
# ANY drift in those four slots flips predicted_lang and breaks the
# streamed==batch equality below.
_BASE = "the fast key order sort table scan merge part window small hash join "
DOCS = [
    (0, _BASE + "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"),
    (1, _BASE + "one two three four five six seven eight nine ten eleven twelve"),
    (2, _BASE + "der die und ist das ein der die und ist das ein der die und x"),
    (3, "tiny doc"),
    (4, _BASE + "el la de que los es el la de que los es el la de que los es q"),
    (5, _BASE + "row scan filter group value batch stream line data slow customer"),
    (6, _BASE + "le la les des est une le la les des est une le la les des est z"),
    (7, _BASE + "der die und ist das ein der die und ist das ein der die und x"),
    # en marker is 'that' (drift: 'in'): correct => en 5 hits; drifted => fr 4
    (8, "that le that le that le that le that brick stone slate gravel sand"),
    # de marker is 'nicht' (drift: 'ein'): correct => de 5; drifted => es 4
    (9, "nicht el nicht la nicht el nicht la nicht brick stone slate gravel"),
    # 'ein' must NOT be a de marker: correct => fr 3 via le; drifted => de 5
    (10, "ein le ein le ein le ein ein brick stone slate gravel sand pebble"),
    # 'in' must NOT be an en marker: correct => es 3 via la; drifted => en 5
    (11, "in la in la in la in in brick stone slate gravel sand pebble rock"),
]


def _write_documents(tmp_path, rows):
    """A minimal documents.parquet the registry query can read."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([f"src{r[0] % 3}" for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _warc_frame(spark, sf_dir, doc_ids):
    """The same WARC blobs the batch query builds, restricted to a wave."""
    from clickhouse_etl_loadtest_spark.queries.html import _warc_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.where(F.col("doc_id").isin(doc_ids)).select(
        "doc_id", _warc_col().alias("warc")
    )


def _canon(df):
    cols = [
        "doc_id",
        "predicted_lang",
        "n_tokens",
        "quality_score",
        "keep_quality",
        "is_canonical",
        "kept",
        "text_hash",
    ]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streamed_waves_equal_batch_pipeline(spark, tmp_path):
    """Drive wet_batch as a REAL foreachBatch body (file stream of archive
    rows, availableNow, several micro-batches) and require the merged store
    to equal the registry's doc_wet_pipeline on the same corpus — pinning
    the operator's literal constants to the query's."""
    sf_dir = _write_documents(tmp_path, DOCS)
    staging = str(tmp_path / "staging")
    store = str(tmp_path / "store")
    for i, ids in enumerate(([0, 1, 2], [3, 4, 5], [6, 7], [8, 9, 10, 11])):
        _warc_frame(spark, sf_dir, ids).coalesce(1).write.mode("overwrite").parquet(
            f"{staging}/wave{i}"
        )
    stream = (
        spark.readStream.schema("doc_id long, warc string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staging}/wave*")
    )
    q = (
        stream.writeStream.foreachBatch(lambda bdf, bid: wet_batch(bdf, store, bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    merged = read_wet_store(spark, store)
    assert merged.select("batch_seq").distinct().count() >= 2  # really incremental
    batch = REG["doc_wet_pipeline"].fn(spark, sf_dir)
    assert _canon(merged) == _canon(batch)
    # the planted exact dup resolves keep-first across waves
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[2]["is_canonical"] and not rows[7]["is_canonical"]
    assert rows[2]["text_hash"] == rows[7]["text_hash"]


def test_replay_is_idempotent(spark, tmp_path):
    """Re-delivering a micro-batch (the post-crash contract) must leave the
    store byte-identical: the batch partition is overwritten in place."""
    sf_dir = _write_documents(tmp_path, DOCS[:4])
    store = str(tmp_path / "store")
    wave = _warc_frame(spark, sf_dir, [0, 1, 2, 3])
    wet_batch(wave, store, 0)
    before = _canon(read_wet_store(spark, store))
    wet_batch(wave, store, 0)  # replay
    assert _canon(read_wet_store(spark, store)) == before


def test_recrawl_latest_batch_wins(spark, tmp_path):
    """A later wave re-delivering doc 0 with NEW text replaces its verdict
    (fingerprint moves), and an unchanged re-crawl of doc 2's text under
    doc 0's id flips canonicity keep-first."""
    sf_dir = _write_documents(tmp_path, DOCS[:3])
    store = str(tmp_path / "store")
    wet_batch(_warc_frame(spark, sf_dir, [0, 1, 2]), store, 0)
    first = {r["doc_id"]: r for r in read_wet_store(spark, store).collect()}
    # re-crawl: doc 0 now carries doc 2's text
    sf2 = _write_documents(tmp_path, [(0, DOCS[2][1]), (1, DOCS[1][1]), (2, DOCS[2][1])])
    wet_batch(_warc_frame(spark, sf2, [0]), store, 1)
    after = {r["doc_id"]: r for r in read_wet_store(spark, store).collect()}
    assert after[0]["batch_seq"] == 1 and after[0]["text_hash"] != first[0]["text_hash"]
    assert after[0]["text_hash"] == after[2]["text_hash"]
    # keep-first by doc_id: 0 < 2, so the re-crawled doc 0 takes canonicity
    assert after[0]["is_canonical"] and not after[2]["is_canonical"]
    assert first[2]["is_canonical"]
