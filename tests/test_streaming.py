"""Streaming parity tests (SURVEY.md §7.2): the real D1 semantics —
``dropDuplicatesWithinWatermark`` dedup with state carried across
micro-batches AND across query restarts (checkpoint recovery) — plus the
chunked sink flush policy (W5). Driven hermetically through file streams with
AvailableNow waves (no Kafka broker in this environment; Kafka IO is
config-gated in streaming/query.py)."""

import json
import os

import pytest

from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
from clickhouse_etl_loadtest_spark.streaming.query import (
    run_streaming_pipeline,
    run_until_drained,
    stop_pipeline,
)

SPEC = {
    "pipeline_id": "stream-test",
    "source": {
        "type": "files",
        "topics": [
            {
                "name": "topic_a",
                "schema": {
                    "fields": [
                        {"name": "event_id", "type": "string"},
                        {"name": "payload", "type": "string"},
                    ]
                },
                "deduplication": {
                    "enabled": True,
                    "id_field": "event_id",
                    "time_window": "1h",
                },
            }
        ],
    },
    "join": {"enabled": False},
    "sink": {
        "type": "parquet",
        "table": "out",
        "max_batch_size": 10,
        "max_delay_time": "1s",
        "table_mapping": [
            {"source_id": "topic_a", "field_name": "event_id", "column_name": "event_id", "column_type": "string"},
            {"source_id": "topic_a", "field_name": "payload", "column_name": "payload", "column_type": "string"},
        ],
    },
}


def _write_batch(dirpath: str, fname: str, records: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


@pytest.fixture
def stream_env(tmp_path):
    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    (src / "topic_a").mkdir(parents=True)
    yield str(src), str(sink), str(ckpt)
    stop_pipeline("stream-test")


def _rec(i: int, ts: str = "2024-01-01T00:00:00.000Z") -> dict:
    return {"event_id": f"e{i}", "payload": f"p{i}", "timestamp": ts}


def test_streaming_dedup_across_waves(spark, stream_env):
    """Re-sent keys in a LATER wave are still suppressed: dedup state lives in
    the checkpointed state store, exactly the reference's time-window dedup
    behavior (a per-batch dropDuplicates would emit them again)."""
    src, sink, ckpt = stream_env
    pipeline = PipelineConfig.model_validate(SPEC)

    _write_batch(f"{src}/topic_a", "b1.json", [_rec(i) for i in range(20)])
    run_until_drained(spark, pipeline, sink, ckpt, files_path=src)

    # wave 2: 10 duplicates of wave-1 keys + 5 fresh keys at the same event time
    _write_batch(f"{src}/topic_a", "b2.json", [_rec(i) for i in range(10)] + [_rec(100 + i) for i in range(5)])
    run_until_drained(spark, pipeline, sink, ckpt, files_path=src)

    out = spark.read.parquet(sink)
    assert out.count() == 25  # 20 + 5 fresh; all 10 re-sends suppressed
    assert out.select("event_id").distinct().count() == 25
    assert sorted(set(out.columns) - {"batch"}) == ["event_id", "payload"]


def test_streaming_duplicates_within_one_wave(spark, stream_env):
    src, sink, ckpt = stream_env
    pipeline = PipelineConfig.model_validate(SPEC)
    records = [_rec(i) for i in range(10)] + [_rec(i) for i in range(10)] + [_rec(3)]
    _write_batch(f"{src}/topic_a", "b1.json", records)
    run_until_drained(spark, pipeline, sink, ckpt, files_path=src)
    out = spark.read.parquet(sink)
    assert out.count() == 10


def test_streaming_sink_chunking(spark, stream_env):
    """max_batch_size=10 with a 35-row wave -> every sink file (= insert
    batch) carries <= ~max_batch_size rows (W5 row-cap half)."""
    src, sink, ckpt = stream_env
    pipeline = PipelineConfig.model_validate(SPEC)
    _write_batch(f"{src}/topic_a", "b1.json", [_rec(i) for i in range(35)])
    run_until_drained(spark, pipeline, sink, ckpt, files_path=src)

    import pyarrow.parquet as pq

    import glob as _glob

    files = _glob.glob(f"{sink}/**/*.parquet", recursive=True)
    sizes = [pq.read_table(f).num_rows for f in files]
    assert sum(sizes) == 35
    assert max(sizes) <= 13  # ceil-split of 35 into 4 chunks, some slack


def test_sink_wrapper_warns_on_uncappable_writer():
    """A third-party chunk writer with neither set_row_cap nor a self-cap
    marker receives the whole uncapped micro-batch — the wrapper must say so
    (W5 cap cannot silently vanish); marked/cappable writers stay silent."""
    import warnings

    from clickhouse_etl_loadtest_spark.streaming.sink import chunked_foreach_batch_writer

    calls = []

    def bare_writer(df, batch_id):
        calls.append(batch_id)

    with pytest.warns(RuntimeWarning, match="set_row_cap"):
        chunked_foreach_batch_writer(bare_writer, 10)(None, 0)
    assert calls == [0]

    def marked_writer(df, batch_id):
        calls.append(batch_id)

    marked_writer.self_capping = True
    caps = []

    def cappable_writer(df, batch_id):
        calls.append(batch_id)

    cappable_writer.set_row_cap = caps.append
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        chunked_foreach_batch_writer(marked_writer, 10)(None, 1)
        chunked_foreach_batch_writer(cappable_writer, 10)(None, 2)
    assert calls == [0, 1, 2] and caps == [10]


def test_pipeline_registry_guard(spark, stream_env):
    src, sink, ckpt = stream_env
    pipeline = PipelineConfig.model_validate(SPEC)
    _write_batch(f"{src}/topic_a", "b1.json", [_rec(0)])
    run_streaming_pipeline(spark, pipeline, sink, ckpt, files_path=src, await_ready=False)
    with pytest.raises(RuntimeError, match="already running"):
        run_streaming_pipeline(spark, pipeline, sink, ckpt, files_path=src)
    stop_pipeline("stream-test")


def test_source_rate_limit_max_files_per_trigger(spark, stream_env):
    """W6 rate control: maxFilesPerTrigger=1 makes each input file its own
    micro-batch — 3 files -> 3 foreachBatch invocations even under
    AvailableNow (intake capped per trigger, the file-source analogue of
    Kafka's maxOffsetsPerTrigger)."""
    src, sink, ckpt = stream_env
    pipeline = PipelineConfig.model_validate(SPEC)
    for b in range(3):
        _write_batch(f"{src}/topic_a", f"b{b}.json", [_rec(b * 10 + i) for i in range(5)])

    seen_batches = []
    import clickhouse_etl_loadtest_spark.streaming.query as q

    orig = q.idempotent_parquet_chunk_writer

    def counting_writer(path):
        inner = orig(path)

        def _w(df, batch_id):
            seen_batches.append(batch_id)
            inner(df, batch_id)

        return _w

    q.idempotent_parquet_chunk_writer = counting_writer
    try:
        run_until_drained(
            spark, pipeline, sink, ckpt, files_path=src,
            source_options={"maxFilesPerTrigger": "1"},
        )
    finally:
        q.idempotent_parquet_chunk_writer = orig
    assert len(seen_batches) == 3
    assert spark.read.parquet(sink).count() == 15


def test_idempotent_sink_survives_batch_replay(spark, tmp_path):
    """W7: foreachBatch is at-least-once after checkpoint recovery; the
    idempotent writer makes a replayed micro-batch overwrite itself instead
    of appending duplicates."""
    from clickhouse_etl_loadtest_spark.streaming.sink import idempotent_parquet_chunk_writer

    sink = str(tmp_path / "sink")
    w = idempotent_parquet_chunk_writer(sink)
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    w(df, 0)
    w(df, 0)  # replay of batch 0 (recovery path)
    w(spark.range(100, 150).selectExpr("id", "id * 2 AS v"), 1)
    out = spark.read.parquet(f"{sink}/batch=*")
    assert out.count() == 150
    assert out.select("id").distinct().count() == 150


def test_rate_source_pipeline(spark, tmp_path):
    """Unbounded `rate` source driven through the pipeline via the sources=
    hook — the generator-as-stream shape (D2 streaming analogue): synthesize
    user_events from rate ticks, dedup, map, sink one micro-batch."""
    from pyspark.sql import functions as F

    pipeline = PipelineConfig.model_validate(SPEC)
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select(
            # every 5th tick repeats the previous key -> guaranteed duplicates
            F.concat(F.lit("e"), (F.col("value") - (F.col("value") % 5 == 4).cast("long")).cast("string")).alias("event_id"),
            F.concat(F.lit("p"), F.col("value").cast("string")).alias("payload"),
            F.col("timestamp"),
        )
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = run_streaming_pipeline(
        spark, pipeline, sink, ckpt,
        sources={"topic_a": rate}, await_ready=False,
    )
    try:
        # wait for a COMMITTED non-empty micro-batch (progress is posted only
        # after foreachBatch returns, so its sink files are durable; polling
        # the filesystem instead races against in-flight writes)
        import time as _t

        deadline = _t.time() + 60
        while _t.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] > 0:
                break
            _t.sleep(0.5)
    finally:
        stop_pipeline(pipeline.pipeline_id)
    import glob as _glob

    files = [
        f for f in _glob.glob(f"{sink}/**/*.parquet", recursive=True)
        if "_temporary" not in f
    ]
    out = spark.read.parquet(*files)
    n, uniq = out.count(), out.select("event_id").distinct().count()
    assert n > 0
    assert n == uniq  # duplicates suppressed within the stream


def test_decode_tolerates_malformed_json(spark, stream_env):
    """Malformed payloads decode to NULL fields (from_json PERMISSIVE
    default) — one bad producer record must not kill a 100 TB pipeline."""
    from clickhouse_etl_loadtest_spark.plans.compiler import decode_topic

    pipeline = PipelineConfig.model_validate(SPEC)
    topic = pipeline.source.topics[0]
    raw = spark.createDataFrame(
        [('{"event_id": "a", "payload": "ok"}', 1), ("NOT JSON {{{", 2), ("", 3)],
        "value string, seq long",
    )
    out = decode_topic(raw, topic).collect()
    by_seq = {r["seq"]: r for r in out}
    assert by_seq[1]["event_id"] == "a"
    assert by_seq[2]["event_id"] is None  # malformed -> nulls, row survives
    assert by_seq[3]["event_id"] is None


def test_compact_sink_coalesces_and_clusters(spark, stream_env):
    """After a chunked streaming run, compaction must preserve every row,
    cut the file count, and leave files range-clustered on the key (disjoint
    per-file min/max -> parquet page skipping works again)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
    from clickhouse_etl_loadtest_spark.streaming.sink import compact_sink

    src, sink, ckpt = stream_env
    pipeline = PipelineConfig.model_validate(SPEC)  # max_batch_size=10
    _write_batch(f"{src}/topic_a", "b1.json", [_rec(i) for i in range(40)])
    run_until_drained(spark, pipeline, sink, ckpt, files_path=src)

    before = _glob.glob(f"{sink}/**/*.parquet", recursive=True)
    assert len(before) >= 4  # 40 rows / 10-row chunks

    out = compact_sink(spark, sink, key="event_id", target_rows_per_file=20)
    after = sorted(_glob.glob(f"{out}/*.parquet"))
    assert 0 < len(after) < len(before)

    compacted = spark.read.parquet(out)
    assert compacted.count() == 40
    assert "batch" not in compacted.columns
    assert {r.event_id for r in compacted.collect()} == {f"e{i}" for i in range(40)}

    # range clustering: per-file [min, max] intervals on the key are disjoint
    spans = []
    for f in after:
        t = pq.read_table(f, columns=["event_id"])
        vals = t.column("event_id").to_pylist()
        if vals:
            spans.append((min(vals), max(vals)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_compact_sink_zorder_layout(spark, tmp_path):
    """compact_sink(zorder_cols=...) must preserve rows and produce the
    Morton layout: per-file stats selective on BOTH listed columns (each
    file's [min,max] span on each column is a strict minority of the global
    range — a single-key sort can only deliver that for its own key)."""
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.streaming.sink import compact_sink

    raw = str(tmp_path / "raw")
    n = 8000
    spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % 1000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("b"),
    ).repartition(6).write.parquet(raw)

    out = compact_sink(spark, raw, key="a", target_rows_per_file=n // 8, zorder_cols=["a", "b"])
    files = sorted(_glob.glob(f"{out}/*.parquet"))
    assert len(files) >= 4
    back = spark.read.parquet(out)
    assert back.count() == n and set(back.columns) == {"id", "a", "b"}

    for col in ("a", "b"):
        widths = []
        for f in files:
            t = pq.read_table(f, columns=[col]).column(col).to_pylist()
            if t:
                widths.append((max(t) - min(t)) / 1998.0)  # global span ~[-999, 999]
        # Measured Morton geometry on this data: typical per-file span
        # 0.49-0.63 per column with ONE legitimate straggler (~1.0) from
        # repartitionByRange's sampled boundaries. The discriminating
        # bounds: all-but-one file below 0.8 AND the median below 0.7 —
        # a single-key sort fails both on its non-key column (every file
        # spans ~the full range), and a partial/broken layout leaves many
        # ~1.0 files, failing the second-widest check.
        srt = sorted(widths)
        assert srt[-2] < 0.8, (col, widths)
        assert srt[len(srt) // 2] < 0.7, (col, widths)


def test_streaming_dedup_against_snapshot(spark, tmp_path):
    """Two-layer ingest dedup: the stream-static anti-join drops hashes the
    corpus snapshot already holds (via the bucketed index), and watermark
    state suppresses in-stream re-sends — the streaming twin of
    doc_incremental_dedup."""
    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.operators.dedup import streaming_dedup_against_snapshot
    from clickhouse_etl_loadtest_spark.operators.scale import snapshot_dedup_index

    # snapshot holds the even hashes 0..18
    snap = spark.range(10).select((F.col("id") * 2).alias("content_hash"))
    src, sink, ckpt = tmp_path / "src", str(tmp_path / "sink"), str(tmp_path / "ckpt")
    try:
        snapshot_dedup_index(snap, "snap_stream_idx", num_buckets=4)
        # docs 0..9 with content_hash == doc_id (evens collide with the
        # snapshot), plus an in-stream re-send of doc 1
        recs = [
            {"doc_id": i, "content_hash": i, "timestamp": "2024-01-01T00:00:00.000Z"}
            for i in range(10)
        ] + [{"doc_id": 1, "content_hash": 1, "timestamp": "2024-01-01T00:10:00.000Z"}]
        _write_batch(str(src), "b1.json", recs)
        stream = spark.readStream.schema("doc_id long, content_hash long, timestamp timestamp").json(
            str(src)
        )
        out = streaming_dedup_against_snapshot(
            stream, spark.table("snap_stream_idx"), "content_hash", "doc_id", "1h"
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120), "availableNow drain did not finish in 120s"
        finally:
            q.stop()
        result = spark.read.parquet(sink)
        assert sorted(r.doc_id for r in result.select("doc_id").collect()) == [1, 3, 5, 7, 9]
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_stream_idx")
