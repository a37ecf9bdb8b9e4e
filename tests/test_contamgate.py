"""Streaming decontamination gate (operators/contamgate.py): per-row parity
with the batch contamination query, and a real append-mode streaming drive
(stateless map => no watermark, no update sink)."""

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.contamgate import (
    contamination_gate,
    eval_hash_set,
)
from clickhouse_etl_loadtest_spark.queries import load_all
from clickhouse_etl_loadtest_spark.queries.text import _CONTAM_MIN_OVERLAP, _EVAL_SET_MAX_DOC


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _batch_truth(spark, sf_dir):
    return {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in load_all()["doc_contamination_check"].fn(spark, sf_dir).collect()
    }


def test_gate_matches_batch_contamination_query(spark, sf_dir):
    d = _docs(spark, sf_dir)
    ev = eval_hash_set(d.where(F.col("doc_id") < _EVAL_SET_MAX_DOC))
    gated = contamination_gate(
        d.where(F.col("doc_id") >= _EVAL_SET_MAX_DOC), ev, _CONTAM_MIN_OVERLAP
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in gated.select("doc_id", "n_overlap", "contaminated").collect()
    }
    truth = _batch_truth(spark, sf_dir)
    assert got == truth
    assert any(c for _, c in truth.values())  # fixture must contain hits


def test_gate_plan_is_map_only(spark, sf_dir):
    d = _docs(spark, sf_dir)
    ev = eval_hash_set(d.where(F.col("doc_id") < _EVAL_SET_MAX_DOC))
    plan = (
        contamination_gate(d, ev, _CONTAM_MIN_OVERLAP)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # stateless per-row decision, no shuffle
    assert "BatchEvalPython" not in plan  # probe is Arrow-batched, not row-wise
    assert "ArrowEvalPython" in plan


def test_gate_runs_as_append_mode_stream(spark, sf_dir, tmp_path):
    """The same gate on a file stream in APPEND mode (possible only because
    the op is stateless) must reproduce the batch decisions."""
    d = _docs(spark, sf_dir)
    ev = eval_hash_set(d.where(F.col("doc_id") < _EVAL_SET_MAX_DOC))
    staging = str(tmp_path / "staging")
    d.where(F.col("doc_id") >= _EVAL_SET_MAX_DOC).repartition(3).write.parquet(staging)

    stream = (
        spark.readStream.schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    sink = str(tmp_path / "sink")
    q = (
        contamination_gate(stream, ev, _CONTAM_MIN_OVERLAP)
        .select("doc_id", "n_overlap", "contaminated")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == _batch_truth(spark, sf_dir)
