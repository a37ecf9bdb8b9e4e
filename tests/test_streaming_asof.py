"""Streaming event-time as-of join (applyInPandasWithState): left rows are
finalized only once the watermark guarantees no earlier right row can still
arrive, and the emitted matches equal the batch ``asof_join`` on the same
data — the streaming/batch parity contract used throughout this repo."""

import json
import os

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.asof import asof_join
from clickhouse_etl_loadtest_spark.streaming.stateful import streaming_asof_join

SCHEMA = "user_id string, kind string, rid string, ts timestamp"


def _write(dirpath: str, fname: str, records: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


def _rec(user: str, kind: str, rid: str, second: float) -> dict:
    ms = int(second * 1000) % 1000
    return {
        "user_id": user,
        "kind": kind,
        "rid": rid,
        "ts": f"2024-01-01T00:{int(second) // 60:02d}:{int(second) % 60:02d}.{ms:03d}Z",
    }


def _run_wave(spark, src: str, sink_dir: str, ckpt: str):
    stream = spark.readStream.schema(SCHEMA).json(src)
    left = stream.where(F.col("kind") == "purchase")
    right = stream.where(F.col("kind") == "click")
    out = streaming_asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        left_payload=["rid"], right_payload=["rid"], watermark="2 seconds",
    )

    def collect(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    q = (
        out.writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(120)
    if not finished:  # timed out: stop so the next wave doesn't race this query
        q.stop()
    assert finished, "streaming wave did not drain in 120s"
    return sink_dir


def _emitted(spark, sink_dir: str) -> dict:
    try:
        rows = spark.read.parquet(sink_dir).collect()
    except Exception:
        return {}
    return {
        json.loads(r["left_payload"])["rid"]: (
            json.loads(r["right_payload"])["rid"] if r["right_payload"] else None
        )
        for r in rows
    }


def test_streaming_asof_matches_flush_on_watermark_and_equal_batch(spark, tmp_path):
    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "sink")

    # wave 1: u1 clicks at 1s/5s, purchases at 3s/7s; u2 purchase with no click
    wave1 = [
        _rec("u1", "click", "c1", 1),
        _rec("u1", "click", "c2", 5),
        _rec("u1", "purchase", "p1", 3),
        _rec("u1", "purchase", "p2", 7),
        _rec("u2", "purchase", "p3", 4),
    ]
    _write(src, "b1.json", wave1)
    _run_wave(spark, src, sink, ckpt)
    # availableNow runs a trailing no-data micro-batch at watermark
    # 7s - 2s = 5s: p1 (3s) and p3 (4s) finalize there; p2 (7s) must wait —
    # a right row <= 7s could still arrive
    assert _emitted(spark, sink) == {"p1": "c1", "p3": None}

    # wave 2: a late-arriving u1 click at 60s — advances the watermark to
    # 58s, finalizing p2 against c2 (5s), NOT c3 (60s > 7s)
    _write(src, "b2.json", [_rec("u1", "click", "c3", 60)])
    _run_wave(spark, src, sink, ckpt)
    assert _emitted(spark, sink) == {"p1": "c1", "p2": "c2", "p3": None}

    # wave 3: unrelated future key -> no further (duplicate) emissions
    _write(src, "b3.json", [_rec("u9", "click", "cz", 600)])
    _run_wave(spark, src, sink, ckpt)
    emitted = _emitted(spark, sink)
    assert emitted == {"p1": "c1", "p2": "c2", "p3": None}

    # batch parity: the batch as-of join over the same static records gives
    # identical matches for every finalized left row
    static = spark.createDataFrame(
        [tuple(r.values()) for r in wave1 + [_rec("u1", "click", "c3", 60)]],
        "user_id string, kind string, rid string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    batch = asof_join(
        static.where(F.col("kind") == "purchase").select("user_id", "rid", "ts"),
        static.where(F.col("kind") == "click").select(
            "user_id", F.col("rid").alias("click_rid"), "ts"
        ),
        on="user_id",
        right_cols=["click_rid"],
    )
    batch_map = {r["rid"]: r["click_rid_asof"] for r in batch.collect()}
    for left_rid, right_rid in emitted.items():
        assert batch_map[left_rid] == right_rid


def test_rights_only_state_evicts_after_retention(spark, tmp_path):
    """A key holding only right-side state sleeps until its retention
    deadline and is then evicted: a left arriving later than
    right_retention after the key's last right row finds no match."""
    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "sink")

    def run(fname, records):
        _write(src, fname, records)
        stream = spark.readStream.schema(SCHEMA).json(src)
        out = streaming_asof_join(
            stream.where(F.col("kind") == "purchase"),
            stream.where(F.col("kind") == "click"),
            on="user_id", left_ts="ts", right_ts="ts",
            left_payload=["rid"], right_payload=["rid"],
            watermark="2 seconds", right_retention="10s",
        )

        def collect(df, batch_id):
            df.write.mode("append").parquet(sink)

        q = (
            out.writeStream.foreachBatch(collect)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run("b1.json", [_rec("u1", "click", "c1", 1)])
    # watermark sails past 1s + 10s retention via another key; u1 evicts
    run("b2.json", [_rec("u9", "click", "cz", 120)])
    # a very late u1 purchase (event time within watermark tolerance of the
    # new data) — its key's right state is gone, so no match
    run("b3.json", [_rec("u1", "purchase", "p1", 125), _rec("u9", "click", "cy", 300)])
    emitted = _emitted(spark, sink)
    assert emitted == {"p1": None}
