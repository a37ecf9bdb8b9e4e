"""Custom stateful operator tests: dedup_with_counts (applyInPandasWithState).

Semantics that neither ``dropDuplicates`` nor ``dropDuplicatesWithinWatermark``
can express — the operator reports HOW MANY re-sends it suppressed per key,
cumulatively, with state carried across micro-batches in the checkpoint."""

import json
import os

from clickhouse_etl_loadtest_spark.streaming.stateful import dedup_with_counts

SCHEMA = "event_id string, payload string, timestamp timestamp"


def _write(dirpath: str, fname: str, records: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


def _rec(key: str, ts: str = "2024-01-01T00:00:00.000Z") -> dict:
    return {"event_id": key, "payload": f"p-{key}", "timestamp": ts}


def _run_wave(spark, src: str, sink_dir: str, ckpt: str):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = dedup_with_counts(stream, "event_id", "1h")

    def collect(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    q = (
        out.writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(sink_dir)


def test_dedup_with_counts_within_and_across_waves(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    # wave 1: a x3, b x1 (all same event time)
    _write(src, "b1.json", [_rec("a"), _rec("a"), _rec("a"), _rec("b")])
    w1 = {r["key"]: r for r in _run_wave(spark, src, str(tmp_path / "w1"), ckpt).collect()}
    assert w1["a"]["n_duplicates"] == 2 and w1["a"]["is_first_emit"] == 1
    assert w1["b"]["n_duplicates"] == 0 and w1["b"]["is_first_emit"] == 1

    # wave 2: a re-sent twice (same event time -> still inside 1h window), c new
    _write(src, "b2.json", [_rec("a"), _rec("a"), _rec("c")])
    w2 = {r["key"]: r for r in _run_wave(spark, src, str(tmp_path / "w2"), ckpt).collect()}
    assert set(w2) == {"a", "c"}  # b untouched this wave -> no update row
    assert w2["a"]["n_duplicates"] == 4 and w2["a"]["is_first_emit"] == 0  # cumulative
    assert w2["c"]["n_duplicates"] == 0 and w2["c"]["is_first_emit"] == 1


def test_state_evicted_after_window(spark, tmp_path):
    """A key re-sent AFTER the watermark passes first_ts + window is treated
    as fresh (the reference's time_window semantics: suppression is bounded)."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    _write(src, "b1.json", [_rec("a", "2024-01-01T00:00:00.000Z")])
    _run_wave(spark, src, str(tmp_path / "e1"), ckpt)

    # advance the watermark far past a's eviction timestamp, touching only
    # another key; a's state times out and is removed
    _write(src, "b2.json", [_rec("z", "2024-01-01T06:00:00.000Z")])
    _run_wave(spark, src, str(tmp_path / "e2"), ckpt)

    # a re-sent at a later event time: state was evicted -> first_emit again
    _write(src, "b3.json", [_rec("a", "2024-01-01T06:30:00.000Z")])
    w3 = {r["key"]: r for r in _run_wave(spark, src, str(tmp_path / "e3"), ckpt).collect()}
    assert w3["a"]["is_first_emit"] == 1
    assert w3["a"]["n_duplicates"] == 0
