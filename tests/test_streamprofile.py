"""Incremental corpus data-card (operators/streamprofile.py): streamed
waves folded through a real availableNow foreachBatch must reproduce the
batch query's exact integer fields, estimate the duplicate signal within
HLL error, and be replay-idempotent."""

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.streamprofile import (
    profile_batch,
    read_corpus_profile,
)
from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_streamed_waves_match_batch_profile(spark, tmp_path):
    staging, state = str(tmp_path / "staging"), str(tmp_path / "state")
    docs = _docs(spark)
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(
            f"{staging}/wave{i}"
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staging}/wave*")
    )
    q = (
        stream.writeStream.foreachBatch(lambda bdf, bid: profile_batch(bdf, state, batch_id=bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    folded = read_corpus_profile(spark, state).collect()[0]
    batch = REG["doc_corpus_profile"].fn(spark, SF).collect()[0]
    # exact fields must match the one-shot card bit for bit
    for f in ("n_docs", "total_tokens", "tokens_min", "tokens_max", "n_empty",
              "lang_distinct", "source_distinct"):
        assert folded[f] == batch[f], f
    # the duplicate signal: HLL estimate within the 0.8% band (lgK=12),
    # padded for small-cardinality granularity
    exact = batch["distinct_content"]
    assert abs(folded["approx_distinct_content"] - exact) <= max(3, int(0.03 * exact))


def test_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    docs = _docs(spark)
    profile_batch(docs.where(F.col("doc_id") % 2 == 0), state, batch_id=0)
    profile_batch(docs.where(F.col("doc_id") % 2 == 1), state, batch_id=1)
    before = read_corpus_profile(spark, state).collect()[0].asDict()
    profile_batch(docs.where(F.col("doc_id") % 2 == 1), state, batch_id=1)  # replay
    assert read_corpus_profile(spark, state).collect()[0].asDict() == before


def test_empty_state_reads_empty(spark, tmp_path):
    out = read_corpus_profile(spark, str(tmp_path / "nope"))
    assert out.count() == 0 and "approx_distinct_content" in out.columns
