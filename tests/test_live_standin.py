"""S7–S14 against the SQL-EXECUTING ClickHouse stand-in (tests/ch_standin.py).

The @live tests in test_connectors.py need a real broker + server (this
sandbox has a docker CLI but no daemon — see LIVE_SMOKE.md). These tests run
the SAME client code over the SAME HTTP wire protocol against a stand-in
that actually executes every statement in DuckDB, so the admin surface and
the streaming HTTP sink are verified end-to-end with real state: CREATE
creates, INSERT inserts, counts count, and the dedup pipeline's sink rows
land in a queryable table.
"""

from __future__ import annotations

import pytest

from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
from clickhouse_etl_loadtest_spark.sources.clickhouse import (
    ClickHouseHttpClient,
    ClickHouseTarget,
    clickhouse_http_chunk_writer,
)

from .ch_standin import ClickHouseStandin
from .test_pipeline_slice import PIPELINE_SPEC


def _client(standin: ClickHouseStandin, table: str = "load_standin_roundtrip"):
    p = PipelineConfig.model_validate(PIPELINE_SPEC)
    p.sink.host, p.sink.port = "127.0.0.1", str(standin.port)
    p.sink.username, p.sink.password = "default", "secret"
    p.sink.table = table
    return p, ClickHouseHttpClient(ClickHouseTarget.from_sink(p.sink))


def test_standin_roundtrip_s7_to_s13():
    """Mirrors test_live_clickhouse_roundtrip_s7_to_s13 step for step:
    CREATE -> EXISTS -> INSERT -> count/count-distinct/last-n -> TRUNCATE ->
    DROP-prefixed — every statement executed, every answer computed."""
    with ClickHouseStandin() as standin:
        p, client = _client(standin)
        client.create_table(p.sink, p.join)  # S8 (ReplacingMergeTree DDL)
        assert client.exists("default", p.sink.table)  # S13
        client.insert_json_rows(
            "default",
            p.sink.table,
            [
                {
                    "event_id": f"00000000-0000-0000-0000-00000000000{i}",
                    "user_id": "00000000-0000-0000-0000-000000000001",
                    "created_at": "2024-01-01 00:00:00",
                    "user_name": "u",
                    "user_email": "u@example.com",
                    "_batch_id": 1,
                }
                for i in range(3)
            ],
        )
        assert client.count("default", p.sink.table) == 3  # S9
        assert client.count("default", p.sink.table, "event_id") == 3  # S9 distinct
        last2 = client.last_rows_json("default", p.sink.table, "event_id", 2)  # S10
        assert [r["event_id"] for r in last2] == [
            "00000000-0000-0000-0000-000000000002",
            "00000000-0000-0000-0000-000000000001",
        ]
        client.truncate("default", p.sink.table)  # S11
        assert client.count("default", p.sink.table) == 0
        dropped = client.drop_prefixed_tables(prefix="load_standin_")  # S12
        assert any(p.sink.table in stmt for stmt in dropped)
        assert not client.exists("default", p.sink.table)


def test_standin_rejects_bad_auth_and_bad_sql():
    with ClickHouseStandin() as standin:
        p, client = _client(standin)
        client.target.password = "wrong"
        with pytest.raises(RuntimeError, match="403"):
            client.count("default", "t")
        client.target.password = "secret"
        with pytest.raises(RuntimeError, match="400"):
            client.execute("SELECT count() FROM default.never_created")


def test_standin_streaming_pipeline_sinks_via_http(spark, tmp_path):
    """The reference's whole flow with the HTTP sink (S14): generate events
    with duplicates -> streaming dedup -> mapping -> HTTP INSERTs into the
    stand-in, then verify the reference's invariant (sink rows == unique
    records) by QUERYING the sink table — not by inspecting request logs."""
    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.sources.generator import generate_user_events, unique_count
    from clickhouse_etl_loadtest_spark.streaming.query import run_until_drained

    total, rate = 1100, 0.1
    with ClickHouseStandin() as standin:
        p, client = _client(standin, table="load_standin_stream")
        client.create_table(p.sink, p.join)
        topic = p.source.topics[0].name
        staging = f"{tmp_path}/staging"
        ev = generate_user_events(spark, total, rate, num_partitions=4)
        ev.withColumn("timestamp", F.lit("2024-01-01 00:00:00").cast("timestamp")).write.parquet(
            staging
        )
        stream = spark.readStream.schema(spark.read.parquet(staging).schema).parquet(staging)
        writer = clickhouse_http_chunk_writer(
            ClickHouseTarget.from_sink(p.sink), p.sink.table, p.sink.max_batch_size
        )
        run_until_drained(
            spark,
            p,
            sink_path="",
            checkpoint_dir=f"{tmp_path}/ckpt",
            sources={topic: stream},
            chunk_writer=writer,
            timeout_s=300,
        )
        # the reference's correctness invariant, computed BY the sink engine
        assert client.count("default", p.sink.table, "event_id") == unique_count(total, rate)
        rows = client.last_rows_json("default", p.sink.table, "event_id", 5)
        assert len(rows) == 5 and all("@" in r["user_email"] for r in rows)
        client.drop_prefixed_tables(prefix="load_standin_")
