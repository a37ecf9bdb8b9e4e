"""Streaming windowed aggregation + late-data semantics (W2/W3):
windows finalize in append mode only after the watermark passes; rows later
than the threshold are dropped, not retro-applied."""

import json
import os

from clickhouse_etl_loadtest_spark.streaming.windows import tumbling_counts

SCHEMA = "event_id string, timestamp timestamp"


def _write(src, fname, records):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, fname), "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


def _rec(i, hhmm):
    return {"event_id": f"e{i}", "timestamp": f"2024-01-01T{hhmm}:00.000Z"}


def _run_wave(spark, src, sink_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = tumbling_counts(stream, "1h")

    def collect(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    q = (
        out.writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windows_finalize_on_watermark_and_drop_late(spark, tmp_path):
    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")

    # The watermark a micro-batch USES is the one committed by the previous
    # batch (Spark's global watermark lags one batch) — hence three waves.

    # wave 1: 3 events in the 10:00 window, 1 in 11:00. Batch runs with
    # watermark=epoch -> emits nothing; commits watermark 11:30-1h = 10:30.
    _write(src, "b1.json", [_rec(1, "10:05"), _rec(2, "10:20"), _rec(3, "10:50"), _rec(4, "11:30")])
    _run_wave(spark, src, sink, ckpt)
    assert not os.path.isdir(sink) or not spark.read.parquet(sink).count()

    # wave 2: advance event time to 13:00; batch still runs with watermark
    # 10:30 (nothing finalizes), commits watermark 12:00.
    _write(src, "b2.json", [_rec(6, "13:00")])
    _run_wave(spark, src, sink, ckpt)

    # wave 3: a VERY late 10:15 event — its window ends 11:00 <= watermark
    # 12:00 -> DROPPED (windowed aggs drop rows whose window the watermark
    # has closed) — plus a 14:00 event. The batch finalizes the 10:00 window
    # (3 events, NOT 4) and the 11:00 window (its original single event).
    _write(src, "b3.json", [_rec(5, "10:15"), _rec(7, "14:00")])
    _run_wave(spark, src, sink, ckpt)
    rows = {(r["window_start"].hour, r["n_events"]) for r in spark.read.parquet(sink).collect()}
    assert (10, 3) in rows and (10, 4) not in rows  # late e5 never retro-counted
    assert (11, 1) in rows  # finalized exactly once, original content


def test_window_bounds_are_aligned(spark, tmp_path):
    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    _write(src, "b1.json", [_rec(1, "10:05"), _rec(2, "12:10")])
    _run_wave(spark, src, sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    for r in rows:
        assert r["window_start"].minute == 0
        assert (r["window_end"] - r["window_start"]).total_seconds() == 3600


def test_session_windows_merge_and_finalize(spark, tmp_path):
    """Streaming session windows (W2 family): events within the gap merge
    into one session per key; sessions finalize once the watermark passes
    their end. Mirrors the batch lag/cumsum sessionization semantics."""
    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.streaming.windows import session_counts

    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    # u1: 10:00 + 10:20 merge (gap 30m), 11:30 starts a new session;
    # u2: one event
    _write(src, "b1.json", [
        {"event_id": "a1", "timestamp": "2024-01-01T10:00:00.000Z", "user": "u1"},
        {"event_id": "a2", "timestamp": "2024-01-01T10:20:00.000Z", "user": "u1"},
        {"event_id": "a3", "timestamp": "2024-01-01T11:30:00.000Z", "user": "u1"},
        {"event_id": "b1", "timestamp": "2024-01-01T10:05:00.000Z", "user": "u2"},
    ])
    # later waves push the watermark far past every session's end
    _write(src, "b2.json", [{"event_id": "z1", "timestamp": "2024-01-01T15:00:00.000Z", "user": "u9"}])
    _write(src, "b3.json", [{"event_id": "z2", "timestamp": "2024-01-01T18:00:00.000Z", "user": "u9"}])

    stream = spark.readStream.schema("event_id string, timestamp timestamp, user string").json(src)
    out = session_counts(
        stream, "30m", keys=["user"],
        aggs=[F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_id")],
    )

    def collect(df, batch_id):
        df.write.mode("append").parquet(sink)

    for _ in range(3):
        q = (
            out.writeStream.foreachBatch(collect)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows = {
        (r["user"], r["session_start"].strftime("%H:%M")): (
            r["n"],
            r["first_id"],
            r["session_end"].strftime("%H:%M"),
        )
        for r in spark.read.parquet(sink).collect()
    }
    # merged session: [10:00, 10:20+gap) = ends 10:50
    assert rows[("u1", "10:00")] == (2, "a1", "10:50")
    # separate later session for the same key
    assert rows[("u1", "11:30")] == (1, "a3", "12:00")
    assert rows[("u2", "10:05")] == (1, "b1", "10:35")


def test_keyed_windows(spark, tmp_path):
    """Per-key tumbling windows (the groupBy(window, key) form)."""
    from pyspark.sql import functions as F

    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink3"), str(tmp_path / "ckpt3")
    _write(src, "b1.json", [
        {"event_id": "a1", "timestamp": "2024-01-01T10:05:00.000Z", "user": "u1"},
        {"event_id": "a2", "timestamp": "2024-01-01T10:40:00.000Z", "user": "u1"},
        {"event_id": "b1", "timestamp": "2024-01-01T10:10:00.000Z", "user": "u2"},
    ])
    _write(src, "b2.json", [{"event_id": "zz", "timestamp": "2024-01-01T13:00:00.000Z", "user": "u9"}])
    _write(src, "b3.json", [{"event_id": "zz2", "timestamp": "2024-01-01T15:00:00.000Z", "user": "u9"}])

    stream = spark.readStream.schema("event_id string, timestamp timestamp, user string").json(src)
    out = tumbling_counts(
        stream, "1h", keys=["user"],
        aggs=[F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_id")],
    )

    def collect(df, batch_id):
        df.write.mode("append").parquet(sink)

    # three sequential AvailableNow runs so the watermark advances past 11:00
    for _ in range(3):
        q = (
            out.writeStream.foreachBatch(collect)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows = {(r["user"], r["window_start"].hour): (r["n"], r["first_id"]) for r in spark.read.parquet(sink).collect()}
    assert rows[("u1", 10)] == (2, "a1")
    assert rows[("u2", 10)] == (1, "b1")
