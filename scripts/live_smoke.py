"""End-to-end smoke of the live connector surface (S1-S14) against real
services — the paths the sandbox can only config-test. Bring the stack up
first:

    docker compose up -d                # Kafka (SASL/PLAIN) + ClickHouse
    pip install confluent-kafka         # admin client (topic DDL)
    SPARK_GRAFT_LIVE=1 python scripts/live_smoke.py

Spark's Kafka source/sink additionally needs the connector package on the
session classpath, e.g.:

    PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 pyspark-shell"

Environment overrides: SPARK_GRAFT_KAFKA (default localhost:9093),
SPARK_GRAFT_CH_HOST/PORT (localhost:8123), credentials per docker-compose.yaml
(kafka admin/admin-secret, clickhouse default/secret).

Stages exercised, in order: S3 auth assembly, S1 topic create, S4 producer
sink, S5 consumer source, S6 JSON decode, D1 dedup, P1 mapping, S7 client,
S8 CREATE TABLE, S14 batched sink, S9 count (+DISTINCT verify), S10 last-n,
S13 EXISTS, S11 TRUNCATE, S12 DROP prefixed, S2 topic delete.
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

N_RECORDS = 20_000
DUP_RATE = 0.1


def main() -> int:
    if os.environ.get("SPARK_GRAFT_LIVE") != "1":
        print("set SPARK_GRAFT_LIVE=1 (and bring docker compose up) to run", file=sys.stderr)
        return 2

    from clickhouse_etl_loadtest_spark.config.reference_pipeline import reference_pipeline
    from clickhouse_etl_loadtest_spark.session import get_spark
    from clickhouse_etl_loadtest_spark.sources.clickhouse import (
        ClickHouseHttpClient,
        ClickHouseTarget,
        clickhouse_http_chunk_writer,
        create_table_ddl,
    )
    from clickhouse_etl_loadtest_spark.sources.generator import generate_user_events, unique_count
    from clickhouse_etl_loadtest_spark.sources.kafka import KafkaAdmin, write_to_kafka
    from clickhouse_etl_loadtest_spark.streaming.query import run_until_drained, stop_pipeline

    run_id = uuid.uuid4().hex[:8]
    p = reference_pipeline()
    p.source.type = "kafka"  # reference_pipeline defaults to the hermetic "values" source
    p.source.connection_params.brokers = [os.environ.get("SPARK_GRAFT_KAFKA", "localhost:9093")]
    p.source.connection_params.protocol = "SASL_PLAINTEXT"
    p.source.connection_params.mechanism = "PLAIN"
    p.source.connection_params.username = "admin"
    p.source.connection_params.password = "admin-secret"
    topic = p.source.topics[0]
    topic.name = f"load_smoke_{run_id}"
    # records are produced BEFORE the stream starts; "latest" would snapshot
    # end-of-topic and drain nothing
    topic.consumer_group_initial_offset = "earliest"
    p.sink.host = os.environ.get("SPARK_GRAFT_CH_HOST", "localhost")
    p.sink.port = os.environ.get("SPARK_GRAFT_CH_PORT", "8123")
    p.sink.username = "default"
    p.sink.password = "secret"
    p.sink.table = f"load_smoke_{run_id}"

    spark = get_spark(app_name="live-smoke")
    admin = KafkaAdmin(p.source.connection_params)  # S3 auth, S7-analogue client

    print(f"[S1] create topic {topic.name}")
    admin.create_topics_if_not_exists(p.source)

    print(f"[S4] produce {N_RECORDS} records (dup={DUP_RATE}) via Spark Kafka sink")
    events = generate_user_events(spark, N_RECORDS, DUP_RATE)
    write_to_kafka(events, p.source.connection_params, topic.name)

    target = ClickHouseTarget.from_sink(p.sink)
    client = ClickHouseHttpClient(target)  # S7
    print(f"[S8] {create_table_ddl(p.sink, p.join)}")
    client.create_table(p.sink, p.join)

    print("[S5/S6/D1/P1/S14] stream: Kafka -> decode -> dedup -> mapping -> ClickHouse")
    # bare chunk writer: run_streaming_pipeline wraps it in
    # chunked_foreach_batch_writer itself
    writer = clickhouse_http_chunk_writer(target, p.sink.table, p.sink.max_batch_size)
    with tempfile.TemporaryDirectory(prefix="smoke-ckpt-") as ckpt:
        try:
            run_until_drained(
                spark, p, sink_path="", checkpoint_dir=ckpt, chunk_writer=writer, timeout_s=300
            )
        finally:
            stop_pipeline(p.pipeline_id)

    expected = unique_count(N_RECORDS, DUP_RATE)
    got = client.count(target.database, p.sink.table, distinct_key=p.sink.order_by_key(p.join))  # S9
    print(f"[S9] count(DISTINCT key) = {got}, expected {expected}: {'OK' if got == expected else 'MISMATCH'}")
    sample = client.last_rows_json(target.database, p.sink.table, p.sink.order_by_key(p.join), 3)  # S10
    print(f"[S10] last-3 sample: {len(sample)} rows")
    assert client.exists(target.database, p.sink.table)  # S13
    print("[S13] EXISTS ok")
    client.truncate(target.database, p.sink.table)  # S11
    assert client.count(target.database, p.sink.table) == 0
    print("[S11] TRUNCATE ok")
    dropped = client.drop_prefixed_tables(prefix="load_smoke_", database=target.database)  # S12
    print(f"[S12] dropped: {dropped}")
    deleted = admin.delete_prefixed_topics(prefix="load_smoke_")  # S2
    print(f"[S2] deleted topics: {deleted}")

    ok = got == expected
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
