"""Connector-logic tests: DDL/SQL generation and option building for the
ClickHouse and Kafka integrations (the network-free halves of S1-S14).
No broker/server exists in this environment; connectivity paths are gated."""

from clickhouse_etl_loadtest_spark.config.schemas import JoinConfig, PipelineConfig
from clickhouse_etl_loadtest_spark.sources.clickhouse import (
    ClickHouseTarget,
    count_query,
    create_table_ddl,
    drop_prefixed_tables_queries,
    exists_query,
    last_rows_query,
)
from clickhouse_etl_loadtest_spark.sources.kafka import admin_conf
from clickhouse_etl_loadtest_spark.streaming.query import kafka_source_options

from .test_pipeline_slice import PIPELINE_SPEC


def _pipeline() -> PipelineConfig:
    return PipelineConfig.model_validate(PIPELINE_SPEC)


def test_create_table_ddl_mergetree_parity():
    p = _pipeline()
    ddl = create_table_ddl(p.sink, p.join, engine="MergeTree")
    # column order, renames and CH types mirror FIXTURES.md A2
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS default.user_events_deduplicated "
        "(`event_id` UUID, `user_id` UUID, `created_at` DateTime, "
        "`user_name` String, `user_email` String) "
        "ENGINE = MergeTree ORDER BY `event_id`"
    )


def test_create_table_ddl_replacing_default():
    p = _pipeline()
    ddl = create_table_ddl(p.sink, p.join)
    assert "ReplacingMergeTree(_batch_id)" in ddl and "`_batch_id` Int64" in ddl


def test_order_by_uses_join_key_when_joined():
    p = _pipeline()
    join = JoinConfig.model_validate(
        {"enabled": True, "sources": [{"source_id": "a", "join_key": "user_id"}, {"source_id": "b", "join_key": "user_id"}]}
    )
    assert create_table_ddl(p.sink, join, engine="MergeTree").endswith("ORDER BY `user_id`")


def test_admin_queries():
    assert count_query("db", "t") == "SELECT count() FROM db.t"
    assert count_query("db", "t", "event_id") == "SELECT count(DISTINCT `event_id`) FROM db.t"
    # the reference's `SELECT * FROM t DESC LIMIT n` is invalid syntax; ours fixes the intent
    assert last_rows_query("db", "t", "event_id", 5) == "SELECT * FROM db.t ORDER BY `event_id` DESC LIMIT 5"
    assert exists_query("db", "t") == "EXISTS TABLE db.t"
    assert drop_prefixed_tables_queries(["load_a", "keep_b", "load_c"]) == [
        "DROP TABLE IF EXISTS default.load_a",
        "DROP TABLE IF EXISTS default.load_c",
    ]


def test_clickhouse_target_decodes_base64_password():
    p = _pipeline()
    p.sink.password = "c2VjcmV0"  # "secret", as in deduplication_pipeline.json:63
    t = ClickHouseTarget.from_sink(p.sink)
    assert t.password == "secret"
    assert t.jdbc_url.startswith("jdbc:clickhouse://")


def test_kafka_auth_options_parity():
    p = PipelineConfig.model_validate(
        {
            **PIPELINE_SPEC,
            "source": {
                **PIPELINE_SPEC["source"],
                "type": "kafka",
                "connection_params": {
                    "brokers": ["kafka:9094"],
                    "protocol": "SASL_PLAINTEXT",
                    "mechanism": "PLAIN",
                    "username": "admin",
                    "password": "admin-secret",
                },
            },
        }
    )
    topic = p.source.topics[0]
    opts = kafka_source_options(p, topic)
    assert opts["kafka.bootstrap.servers"] == "kafka:9094"
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert 'username="admin"' in opts["kafka.sasl.jaas.config"]
    assert opts["startingOffsets"] == "latest"

    conf = admin_conf(p.source.connection_params)
    assert conf["sasl.username"] == "admin" and conf["security.protocol"] == "SASL_PLAINTEXT"
