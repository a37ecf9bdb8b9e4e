"""Property-based engine-parity test: the SAME pipeline config must produce
the SAME sink contents whether it runs as a bounded batch (``compile_batch``,
min_by first-wins dedup) or as a Structured Streaming wave
(``dropDuplicatesWithinWatermark`` + chunked foreachBatch sink).

This is the differential check the reference cannot run (its ETL executes
only inside the closed service); here both execution modes are ours, so
hypothesis drives randomized replay patterns — duplicate fan-out, arrival
order, late re-sends inside the window — and any divergence between the two
dedup implementations fails loudly.
"""

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
from clickhouse_etl_loadtest_spark.plans.compiler import compile_batch
from clickhouse_etl_loadtest_spark.streaming.query import run_until_drained, stop_pipeline

SPEC = {
    "pipeline_id": "parity-test",
    "source": {
        "type": "files",
        "topics": [
            {
                "name": "parity_topic",
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
        "max_batch_size": 1000,
        "max_delay_time": "1s",
        "table_mapping": [
            {"source_id": "parity_topic", "field_name": "event_id", "column_name": "event_id", "column_type": "string"},
            {"source_id": "parity_topic", "field_name": "payload", "column_name": "payload", "column_type": "string"},
        ],
    },
}

# replay pattern: (n_unique_keys, duplicate picks, per-event minute offsets)
replays = st.integers(min_value=1, max_value=25).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(st.integers(min_value=0, max_value=n - 1), max_size=60),
        st.lists(st.integers(min_value=0, max_value=45), min_size=n, max_size=n),
    )
)


def _records(n: int, dups: list[int], minutes: list[int]) -> list[dict]:
    """Originals in key order, then replayed duplicates (same event_id AND
    payload — a re-sent event is an exact copy — at a later in-window time)."""
    originals = [
        {
            "event_id": f"e{i}",
            "payload": f"p{i}",
            "timestamp": f"2024-01-01T00:{minutes[i]:02d}:00.000Z",
        }
        for i in range(n)
    ]
    dup_rows = [
        {**originals[i], "timestamp": f"2024-01-01T00:{min(minutes[i] + 10, 59):02d}:00.000Z"}
        for i in dups
    ]
    return originals + dup_rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(replay=replays)
def test_batch_and_streaming_sinks_agree(spark, tmp_path_factory, replay):
    n, dups, minutes = replay
    records = _records(n, dups, minutes)
    pipeline = PipelineConfig.model_validate(SPEC)
    topic = "parity_topic"

    # batch: arrival order via an explicit seq column
    rows = [
        {**r, "seq": i} for i, r in enumerate(records)
    ]
    batch_in = spark.createDataFrame(
        [(r["event_id"], r["payload"], r["timestamp"], r["seq"]) for r in rows],
        "event_id string, payload string, timestamp string, seq long",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    batch_out = compile_batch(pipeline, {topic: batch_in})
    batch_set = {(r.event_id, r.payload) for r in batch_out.collect()}

    # streaming: one AvailableNow wave over a JSON file source
    tmp = tmp_path_factory.mktemp("parity")
    src = tmp / "src" / topic
    os.makedirs(src)
    with open(src / "wave.json", "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    try:
        run_until_drained(
            spark, pipeline, str(tmp / "sink"), str(tmp / "ckpt"), files_path=str(tmp / "src")
        )
        stream_set = {
            (r.event_id, r.payload)
            for r in spark.read.parquet(str(tmp / "sink")).collect()
        }
    finally:
        stop_pipeline(pipeline.pipeline_id)

    expected = {(f"e{i}", f"p{i}") for i in range(n)}
    assert batch_set == expected
    assert stream_set == expected
