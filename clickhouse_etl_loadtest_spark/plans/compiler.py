"""Pipeline-spec -> DataFrame DAG compiler.

The reference has no parser/planner/optimizer — its "query language" is the
pipeline JSON (SURVEY.md §3). Here that JSON compiles to a declarative
DataFrame plan and Catalyst does analysis/optimization/codegen; zero custom
optimizer rules are needed (SURVEY.md §4).

Batch and streaming share this compiler: every transformation used (from_json,
dedup, join, select/cast) is supported by Structured Streaming, so the same
``PipelineConfig`` runs as a micro-batch query (see
:mod:`clickhouse_etl_loadtest_spark.streaming.query`) or a bounded backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config.durations import duration_to_interval
from ..config.schemas import PipelineConfig, TopicConfig
from ..operators.dedup import dedup_first_wins, streaming_dedup
from ..operators.mapping import apply_table_mapping


def decode_topic(df: DataFrame, topic: TopicConfig) -> DataFrame:
    """JSON-decode a raw Kafka-shaped frame against the topic's declared
    schema (S6, SURVEY.md §2.1; schema shape deduplication_pipeline.json:19-43).

    Input columns: ``value`` (string/binary JSON payload) plus passthrough
    metadata (``timestamp``, ``seq`` ...). Declared fields replace ``value``.
    ``from_json`` runs JVM-side; with a fixed schema Catalyst prunes unneeded
    struct fields all the way into the scan.
    """
    passthrough = [c for c in df.columns if c != "value"]
    decoded = df.withColumn("_data", F.from_json(F.col("value").cast("string"), topic.schema_.to_struct()))
    return decoded.select(*passthrough, "_data.*")


def topic_transform(
    df: DataFrame,
    topic: TopicConfig,
    streaming: bool = False,
    order_col: str = "seq",
    ts_col: str = "timestamp",
) -> DataFrame:
    """decode (if raw) -> dedup (if enabled) for one topic."""
    if "value" in df.columns and topic.schema_.fields:
        df = decode_topic(df, topic)
    if topic.deduplication.enabled:
        if streaming:
            df = streaming_dedup(df, topic.deduplication.id_field, topic.deduplication.time_window, ts_col)
        else:
            df = dedup_first_wins(df, topic.deduplication.id_field, order_col)
    return df


def apply_temporal_join(
    left: DataFrame,
    right: DataFrame,
    pipeline: PipelineConfig,
    ts_col: str = "timestamp",
    streaming: bool = False,
) -> DataFrame:
    """Temporal join of the two pipeline sources (J1, SURVEY.md §2.4).

    ``join.type`` selects the semantics:

    - ``"temporal"`` (GlassFlow semantics [external], the default):
      left-oriented join of two topics on per-source ``join_key`` within a
      ``time_window`` — every in-window right row matches. Streaming:
      watermarked stream-stream interval join (state bounded by the
      watermark). Batch: equi-join + time-range predicate — Catalyst picks
      sort-merge with the range as a post-join filter; both sides shuffle on
      the join key only.
    - ``"asof"`` (extension): each left row takes only the LATEST right row
      with ``right_ts <= left_ts``, nulled when older than ``time_window`` —
      enrichment without the interval join's fan-out. Batch compiles to
      ``operators/asof.py``; streaming to the stateful
      ``streaming/stateful.py::streaming_asof_join`` (watermark-gated
      finalization), restoring typed columns from the operator's JSON
      payloads via ``from_json`` against the known topic schemas.
    """
    srcs = pipeline.join.sources
    if len(srcs) < 2:
        raise ValueError("temporal join requires two join sources")
    if pipeline.join.type not in ("temporal", "asof"):
        raise ValueError(
            f"unknown join.type {pipeline.join.type!r}: expected 'temporal' or 'asof'"
        )  # a typo must not silently compile the other join's semantics
    if pipeline.join.type == "asof":
        return _apply_asof_join(left, right, pipeline, ts_col=ts_col, streaming=streaming)
    lk, rk = srcs[0].join_key, srcs[1].join_key
    window = duration_to_interval(srcs[0].time_window)

    lts, rts = f"l_{ts_col}", f"r_{ts_col}"
    left = left.withColumnRenamed(ts_col, lts)
    # every right column colliding with a left name gets an r_ prefix (not
    # just key/ts) — shared payload field names would otherwise make the
    # joined frame ambiguous for the table_mapping select
    right_cols = [c for c in right.columns if c != rk and c != ts_col]
    renames = _r_prefix_renames(left.columns, right_cols)
    right = right.select(
        F.col(rk).alias(f"r_{rk}"),
        F.col(ts_col).alias(rts),
        *[F.col(c).alias(renames[c]) for c in right_cols],
    )
    if streaming:
        left = left.withWatermark(lts, window)
        right = right.withWatermark(rts, window)
    cond = (F.col(lk) == F.col(f"r_{rk}")) & (
        F.col(rts).between(F.col(lts) - F.expr(f"INTERVAL {window}"), F.col(lts) + F.expr(f"INTERVAL {window}"))
    )
    # orientation is honored in BOTH modes (Spark supports watermarked
    # left-outer stream-stream joins; unmatched rows emit once the watermark
    # closes their window) so batch and streaming runs of one pipeline agree
    how = {"left": "leftOuter"}.get(srcs[0].orientation, srcs[0].orientation) if streaming else srcs[0].orientation
    joined = left.join(right, cond, how)
    return joined.withColumnRenamed(lts, ts_col).drop(f"r_{rk}", rts)


def _r_prefix_renames(left_cols: list[str], right_payload: list[str]) -> dict[str, str]:
    """Shared collision policy for both join kinds: every right payload
    column whose name a left column already holds gets an ``r_`` prefix."""
    taken = set(left_cols)
    return {c: (f"r_{c}" if c in taken else c) for c in right_payload}


def _apply_asof_join(
    left: DataFrame,
    right: DataFrame,
    pipeline: PipelineConfig,
    ts_col: str = "timestamp",
    streaming: bool = False,
) -> DataFrame:
    """``join.type == "asof"`` body: latest-prior-row enrichment. Output
    shape mirrors the temporal join's (left columns + right payload columns,
    ``r_``-prefixed only on collision; the matched right timestamp is
    dropped) so one ``table_mapping`` serves both join kinds."""
    from ..config.durations import parse_duration
    from ..operators.asof import asof_join

    srcs = pipeline.join.sources
    if srcs[0].orientation != "left":
        raise ValueError(
            "join.type 'asof' is inherently left-oriented (every left row "
            f"survives); orientation {srcs[0].orientation!r} is not supported"
        )  # refusing beats silently changing which rows reach the sink
    lk, rk = srcs[0].join_key, srcs[1].join_key
    tol_s = parse_duration(srcs[0].time_window)

    payload = [c for c in right.columns if c != rk and c != ts_col]
    renames = _r_prefix_renames(left.columns, payload)
    right = right.select(
        F.col(rk).alias(lk),
        F.col(ts_col),
        *[F.col(c).alias(renames[c]) for c in payload],
    )
    out_cols = [renames[c] for c in payload]

    if not streaming:
        joined = asof_join(
            left,
            right,
            on=lk,
            left_ts=ts_col,
            right_ts=ts_col,
            right_cols=out_cols,
            tolerance_seconds=tol_s,
        )
        return joined.select(
            *left.columns, *[F.col(f"{c}_asof").alias(c) for c in out_cols]
        )

    from pyspark.sql.types import StructType

    from ..streaming.stateful import streaming_asof_join

    window = duration_to_interval(srcs[0].time_window)
    jo = streaming_asof_join(
        left,
        right,
        on=lk,
        left_ts=ts_col,
        right_ts=ts_col,
        left_payload=[c for c in left.columns if c not in (lk, ts_col)],
        right_payload=out_cols,
        watermark=window,
        # a right older than time_window before every future left can never
        # match inside the tolerance, so the retention IS the tolerance
        right_retention=srcs[0].time_window,
    )
    l_schema = StructType([f for f in left.schema.fields if f.name not in (lk, ts_col)])
    r_schema = StructType([f for f in right.schema.fields if f.name not in (lk, ts_col)])
    in_tol = F.col("right_ts").isNotNull() & (
        F.unix_micros(F.col("left_ts").cast("timestamp"))
        - F.unix_micros(F.col("right_ts").cast("timestamp"))
        <= int(tol_s * 1_000_000)
    )
    key_type = left.schema[lk].dataType
    return jo.select(
        F.col("key").cast(key_type).alias(lk),
        F.col("left_ts").alias(ts_col),
        F.from_json("left_payload", l_schema).alias("_l"),
        F.when(in_tol, F.from_json("right_payload", r_schema)).alias("_r"),
    ).select(
        lk,
        ts_col,
        *[F.col(f"_l.{f.name}").alias(f.name) for f in l_schema.fields],
        *[F.col(f"_r.{f.name}").alias(f.name) for f in r_schema.fields],
    )


def compile_batch(
    pipeline: PipelineConfig,
    sources: dict[str, DataFrame],
    order_col: str = "seq",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Compile the pipeline over bounded source frames keyed by topic name.

    Mirrors the reference dataflow: Kafka source -> JSON decode -> windowed
    keyed dedup -> (optional temporal join) -> projection/rename/cast
    (SURVEY.md §0 item b). Sink writing is the caller's job (sinks are
    pluggable, SURVEY.md §7.0).
    """
    topics = pipeline.source.topics
    if not topics:
        raise ValueError("pipeline declares no topics")
    frames = {t.name: topic_transform(sources[t.name], t, streaming=False, order_col=order_col) for t in topics}

    primary = topics[0].name
    df = frames[primary]
    if pipeline.join.enabled and len(topics) > 1:
        df = apply_temporal_join(df, frames[topics[1].name], pipeline, ts_col=ts_col, streaming=False)
    return apply_table_mapping(df, pipeline.sink.table_mapping, source_id=None)


def write_sink_batch(out: DataFrame, pipeline: PipelineConfig, sink_path: str) -> None:
    """Write the compiled batch to the parquet sink CLUSTERED by the sink's
    ORDER BY key — the same layout rule as the reference's MergeTree table
    (first mapped column, or the join key when joined;
    /root/reference/src/utils/clickhouse.py:34-46). Sorting within partitions
    (not globally) keeps the write shuffle-free while giving parquet
    row-group min/max statistics that let later scans on the key skip pages —
    the parquet analogue of MergeTree's primary-key index.
    """
    key = pipeline.sink.order_by_key(pipeline.join)
    out.sortWithinPartitions(key).write.mode("overwrite").parquet(sink_path)
