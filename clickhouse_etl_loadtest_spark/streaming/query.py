"""Structured Streaming pipeline runner — the streaming form of the compiler.

Mirrors the reference lifecycle (W8, SURVEY.md §2.8): create -> wait ready ->
run -> stop, one registry entry per ``pipeline_id``
(/root/reference/src/utils/pipeline.py:27-33,73-123). The reference sleeps a
fixed 10 s after creation; here readiness is the first streaming progress
event (SURVEY.md §7.3).

Source resolution:
- ``kafka``  -> ``spark.readStream.format("kafka")`` with SASL options built
  from connection_params (S3/S5) — requires a reachable broker.
- ``files``  -> ``spark.readStream.format("json")`` over a directory (used by
  hermetic tests; schema = declared topic schema + ``timestamp``).
- a caller-provided streaming DataFrame (e.g. rate source) via ``sources=``.

The transformation chain is shared with the batch compiler
(:func:`..plans.compiler.topic_transform` with ``streaming=True``):
watermarked ``dropDuplicatesWithinWatermark`` dedup (D1) and table_mapping
projection (P1) behave identically in micro-batch execution.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config.durations import parse_duration
from ..config.schemas import PipelineConfig, TopicConfig
from ..operators.mapping import apply_table_mapping
from ..plans.compiler import apply_temporal_join, topic_transform
from .sink import chunked_foreach_batch_writer, idempotent_parquet_chunk_writer

_RUNNING: dict[str, StreamingQuery] = {}


def kafka_source_options(pipeline: PipelineConfig, topic: TopicConfig) -> dict[str, str]:
    """Kafka reader options from the pipeline's connection_params (S3:
    /root/reference/src/utils/kafka.py:13-36 builds the same auth surface).
    Auth assembly is shared with the producer sink
    (sources/kafka.py::spark_kafka_auth_options)."""
    from ..sources.kafka import spark_kafka_auth_options

    cp = pipeline.source.connection_params
    return {
        "subscribe": topic.name,
        "startingOffsets": topic.consumer_group_initial_offset,
        **spark_kafka_auth_options(cp),
    }


def _open_stream(
    spark: SparkSession,
    pipeline: PipelineConfig,
    topic: TopicConfig,
    files_path: str | None,
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """``source_options`` is the backpressure/rate-control surface (W6,
    SURVEY.md §2.8): ``maxOffsetsPerTrigger`` for Kafka,
    ``maxFilesPerTrigger`` for file streams — caps per-micro-batch intake the
    way the reference throttles its generator (rps=20000/process,
    /root/reference/src/utils/publish.py:13)."""
    if pipeline.source.type == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in {**kafka_source_options(pipeline, topic), **(source_options or {})}.items():
            reader = reader.option(k, v)
        return reader.load()  # value/timestamp columns: decoded by topic_transform
    if files_path is None:
        raise ValueError(f"source type {pipeline.source.type!r} needs files_path or explicit sources")
    schema = topic.schema_.to_struct().add("timestamp", "timestamp")
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    return reader.json(f"{files_path}/{topic.name}")


def run_streaming_pipeline(
    spark: SparkSession,
    pipeline: PipelineConfig,
    sink_path: str,
    checkpoint_dir: str,
    sources: dict[str, DataFrame] | None = None,
    files_path: str | None = None,
    await_ready: bool = True,
    trigger: str = "processing_time",
    source_options: dict[str, str] | None = None,
    chunk_writer=None,
) -> StreamingQuery:
    """Compile and start the pipeline as a Structured Streaming query.

    ``sink_path`` receives parquet micro-batches through the chunked
    foreachBatch writer; pass ``chunk_writer`` (a (df, batch_id) callable,
    e.g. sources/clickhouse.py::clickhouse_chunk_writer or
    clickhouse_http_chunk_writer) to sink into ClickHouse instead —
    sink_path is then unused.
    """
    existing = _RUNNING.get(pipeline.pipeline_id)
    if existing is not None:
        if existing.isActive:
            raise RuntimeError(f"pipeline {pipeline.pipeline_id!r} already running")
        _RUNNING.pop(pipeline.pipeline_id)  # crashed/terminated: allow restart

    frames: dict[str, DataFrame] = {}
    for topic in pipeline.source.topics:
        raw = (sources or {}).get(topic.name)
        if raw is None:
            raw = _open_stream(spark, pipeline, topic, files_path, source_options)
        frames[topic.name] = topic_transform(raw, topic, streaming=True, ts_col="timestamp")

    topics = pipeline.source.topics
    df = frames[topics[0].name]
    if pipeline.join.enabled and len(topics) > 1:
        df = apply_temporal_join(df, frames[topics[1].name], pipeline, streaming=True)
    out = apply_table_mapping(df, pipeline.sink.table_mapping)

    # replay-safe by default: foreachBatch is at-least-once after checkpoint
    # recovery, so each micro-batch overwrites its own batch_id-keyed subdir
    # (W7) — a re-delivered batch lands on its partial output instead of
    # appending duplicates. Readers see `batch` as a partition column.
    writer = chunked_foreach_batch_writer(
        chunk_writer if chunk_writer is not None else idempotent_parquet_chunk_writer(sink_path),
        pipeline.sink.max_batch_size,
    )
    stream_writer = (
        out.writeStream.foreachBatch(writer)
        .queryName(pipeline.pipeline_id)
        .option("checkpointLocation", f"{checkpoint_dir}/{pipeline.pipeline_id}")
    )
    if trigger == "available_now":
        # drain-everything-then-stop mode: deterministic for tests/backfills;
        # dedup state persists in the checkpoint across runs
        stream_writer = stream_writer.trigger(availableNow=True)
    else:
        # continuous mode: trigger interval = the sink's max_delay_time (W5)
        delay_secs = parse_duration(pipeline.sink.max_delay_time)
        stream_writer = stream_writer.trigger(processingTime=f"{delay_secs} seconds")
    query = stream_writer.start()
    _RUNNING[pipeline.pipeline_id] = query
    if await_ready and trigger != "available_now":
        _wait_first_progress(query)
    return query


def run_until_drained(
    spark: SparkSession,
    pipeline: PipelineConfig,
    sink_path: str,
    checkpoint_dir: str,
    timeout_s: float = 120.0,
    **kwargs,
) -> None:
    """One AvailableNow wave: start, drain all currently-available input,
    terminate. Re-invoking continues from the checkpoint with prior dedup
    state intact."""
    query = run_streaming_pipeline(
        spark, pipeline, sink_path, checkpoint_dir, trigger="available_now", **kwargs
    )
    try:
        if not query.awaitTermination(timeout_s):
            raise TimeoutError(
                f"pipeline {pipeline.pipeline_id!r} did not drain within {timeout_s}s"
                " — sink contents are partial"
            )
    finally:
        stop_pipeline(pipeline.pipeline_id)


def _wait_first_progress(query: StreamingQuery, timeout_s: float = 60.0) -> None:
    """Readiness = first progress event, replacing the reference's fixed 10 s
    sleep (/root/reference/src/utils/pipeline.py:86-90)."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if query.lastProgress is not None:
            return
        if not query.isActive:
            query.awaitTermination(1)  # surfaces the failure
            return
        time.sleep(0.2)
    raise TimeoutError(f"streaming query {query.name} produced no progress in {timeout_s}s")


def stop_pipeline(pipeline_id: str) -> None:
    """Delete-pipeline analogue (/root/reference/src/utils/pipeline.py:115-123)."""
    query = _RUNNING.pop(pipeline_id, None)
    if query is not None and query.isActive:
        query.stop()


