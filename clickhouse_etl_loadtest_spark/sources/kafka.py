"""Kafka admin + producer-sink helpers (S1-S4 in SURVEY.md §2.1).

Admin operations (topic create/delete) are driver-side and stay outside Spark
— Spark's Kafka source does no DDL. The reference's surface
(/root/reference/src/utils/kafka.py:38-144): create per-variant topics with
3 partitions / RF 1 / LogAppendTime, and drop all ``load_``-prefixed topics on
cleanup. Auth parity (S3, kafka.py:13-36): SASL_PLAINTEXT/PLAIN with optional
base64 root CA; the same credentials also render as Spark reader options in
streaming/query.kafka_source_options.

The admin client is import-gated: environments without a Kafka client package
or broker can still import this module (only ``KafkaAdmin`` methods require
connectivity).
"""

from __future__ import annotations

import base64
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config.schemas import ConnectionParams, SourceConfig

TOPIC_NUM_PARTITIONS = 3  # /root/reference/src/utils/kafka.py:51
TOPIC_CONFIG = {"message.timestamp.type": "LogAppendTime"}  # kafka.py:46-48


def admin_conf(cp: ConnectionParams) -> dict[str, str]:
    """confluent-kafka style admin config from connection params (S3)."""
    conf: dict[str, str] = {"bootstrap.servers": ",".join(cp.brokers)}
    if cp.protocol and cp.protocol.upper() != "PLAINTEXT":
        conf["security.protocol"] = cp.protocol
        if cp.mechanism:
            conf["sasl.mechanism"] = cp.mechanism
        if cp.username:
            conf["sasl.username"] = cp.username
            conf["sasl.password"] = cp.password or ""
    if cp.root_ca:
        # base64 PEM -> temp file, matching kafka.py:16-24
        f = tempfile.NamedTemporaryFile(suffix=".pem", delete=False)
        f.write(base64.b64decode(cp.root_ca))
        f.close()
        conf["ssl.ca.location"] = f.name
    return conf


class KafkaAdmin:
    """Topic lifecycle (S1/S2). Requires the ``confluent_kafka`` package and a
    reachable broker; constructing without either raises ImportError/broker
    errors at call time, never at module import."""

    def __init__(self, cp: ConnectionParams):
        from confluent_kafka.admin import AdminClient  # import-gated

        self._admin = AdminClient(admin_conf(cp))

    def create_topics_if_not_exists(self, source: SourceConfig) -> None:
        from confluent_kafka.admin import NewTopic

        existing = set(self._admin.list_topics(timeout=10).topics)
        wanted = [t.name for t in source.topics if t.name not in existing]
        if not wanted:
            return
        futures = self._admin.create_topics(
            [
                NewTopic(name, num_partitions=TOPIC_NUM_PARTITIONS, replication_factor=1, config=TOPIC_CONFIG)
                for name in wanted
            ]
        )
        for fut in futures.values():
            fut.result(timeout=30)

    def delete_prefixed_topics(self, prefix: str = "load_") -> list[str]:
        """Cleanup parity (S2/P3, kafka.py:89-144)."""
        topics = [t for t in self._admin.list_topics(timeout=10).topics if t.startswith(prefix)]
        if topics:
            for fut in self._admin.delete_topics(topics).values():
                fut.result(timeout=30)
        return topics


def _jaas_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def spark_kafka_auth_options(cp: ConnectionParams) -> dict[str, str]:
    """Spark ``kafka.*`` auth options from connection params (S3) — the ONE
    place the JAAS config is assembled (login module per SASL mechanism,
    escaped credentials, base64 root CA), shared by the streaming source
    (streaming/query.kafka_source_options) and the producer sink below."""
    opts: dict[str, str] = {"kafka.bootstrap.servers": ",".join(cp.brokers)}
    if cp.protocol and cp.protocol.upper() != "PLAINTEXT":
        opts["kafka.security.protocol"] = cp.protocol
        if cp.mechanism:
            opts["kafka.sasl.mechanism"] = cp.mechanism
        if cp.username:
            mechanism = (cp.mechanism or "PLAIN").upper()
            module = (
                "org.apache.kafka.common.security.scram.ScramLoginModule"
                if mechanism.startswith("SCRAM")
                else "org.apache.kafka.common.security.plain.PlainLoginModule"
            )
            opts["kafka.sasl.jaas.config"] = (
                f"{module} required "
                f'username="{_jaas_escape(cp.username)}" '
                f'password="{_jaas_escape(cp.password or "")}";'
            )
    if cp.root_ca:
        f = tempfile.NamedTemporaryFile(suffix=".pem", delete=False)
        f.write(base64.b64decode(cp.root_ca))
        f.close()
        opts["kafka.ssl.ca.location"] = f.name
    return opts


def write_to_kafka(df: DataFrame, cp: ConnectionParams, topic: str) -> None:
    """Producer sink (S4): all columns packed as the JSON value — the Spark
    replacement for glassgen's Kafka sink (generate_events.py:60-71). The
    frame's partitioning is the producer parallelism (C6)."""
    writer = (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.format("kafka")
        .option("topic", topic)
    )
    for k, v in spark_kafka_auth_options(cp).items():
        writer = writer.option(k, v)
    writer.save()
