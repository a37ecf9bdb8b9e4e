"""ClickHouse sink/DDL helpers (S7-S14 in SURVEY.md §2.1).

The reference drives ClickHouse over the native protocol
(/root/reference/src/utils/clickhouse.py); Spark's path is JDBC — the DDL
strings and semantics are kept identical:

- CREATE TABLE ... ENGINE = MergeTree ORDER BY <key>, where <key> is the
  join key when a join is enabled else the first mapped column
  (clickhouse.py:34-46 + pre_process.py:9-12)
- count/exists/truncate/drop-prefixed-tables admin surface
- batched inserts: foreachBatch + JDBC ``batchsize`` = max_batch_size

Exactly-once note (SURVEY.md §7.5 risk): Spark's foreachBatch is
at-least-once into external sinks. ``create_table_ddl`` therefore defaults to
``ReplacingMergeTree(_batch_id)`` keyed on the sink ORDER BY — replayed
micro-batches collapse on merge, and the count-equality verification uses
``count(DISTINCT key)``. Plain MergeTree parity mode is available via
``engine=``.

Everything network-touching is import/connection-gated so the module loads
and is unit-testable without a server.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config.schemas import JoinConfig, SinkConfig

# declared column type -> ClickHouse DDL type (the reference passes types
# through verbatim, clickhouse.py:37-39; this map normalizes ours)
_CH_TYPES = {
    "uuid": "UUID",
    "string": "String",
    "datetime": "DateTime",
    "int": "Int64",
    "int32": "Int32",
    "int64": "Int64",
    "float": "Float64",
    "double": "Float64",
    "bool": "Bool",
}


@dataclass
class ClickHouseTarget:
    host: str
    port: int = 8123  # JDBC/HTTP port (native 9000 is the non-JDBC path)
    database: str = "default"
    username: str = "default"
    password: str = ""

    @classmethod
    def from_sink(cls, sink: SinkConfig) -> "ClickHouseTarget":
        # passwords arrive base64-encoded, cf. /root/reference/src/utils/clickhouse.py:17
        password = sink.password or ""
        try:
            password = base64.b64decode(password).decode()
        except Exception:
            pass  # already plaintext
        # the reference's configs carry the NATIVE-protocol port (9000/9440,
        # clickhouse-driver); this engine speaks JDBC/HTTP — remap the two
        # well-known native ports to their HTTP(S) equivalents
        port_str = str(sink.port)
        port = int(port_str) if port_str.isdigit() else 8123
        port = {9000: 8123, 9440: 8443}.get(port, port)
        return cls(
            host=sink.host,
            port=port,
            database=sink.database,
            username=sink.username,
            password=password,
        )

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:clickhouse://{self.host}:{self.port}/{self.database}"

    def jdbc_options(self) -> dict[str, str]:
        return {
            "url": self.jdbc_url,
            "user": self.username,
            "password": self.password,
            "driver": "com.clickhouse.jdbc.ClickHouseDriver",
        }


def order_by_key(sink: SinkConfig, join: JoinConfig | None = None) -> str:
    return sink.order_by_key(join)


def create_table_ddl(
    sink: SinkConfig,
    join: JoinConfig | None = None,
    engine: str | None = None,
) -> str:
    """CREATE TABLE IF NOT EXISTS parity with clickhouse.py:22-52, defaulting
    to ReplacingMergeTree for at-least-once idempotence (module docstring)."""
    cols = ", ".join(
        f"`{m.column_name}` {_CH_TYPES.get(m.column_type.lower(), m.column_type)}"
        for m in sink.table_mapping
    )
    key = order_by_key(sink, join)
    if engine is None:
        engine = "ReplacingMergeTree(_batch_id)"
        cols += ", `_batch_id` Int64"
    return (
        f"CREATE TABLE IF NOT EXISTS {sink.database}.{sink.table} ({cols}) "
        f"ENGINE = {engine} ORDER BY `{key}`"
    )


def count_query(database: str, table: str, distinct_key: str | None = None) -> str:
    """S9 scan; distinct form for the ReplacingMergeTree verification mode."""
    if distinct_key:
        return f"SELECT count(DISTINCT `{distinct_key}`) FROM {database}.{table}"
    return f"SELECT count() FROM {database}.{table}"


def last_rows_query(database: str, table: str, key: str, n: int) -> str:
    """S10 with the reference's broken ``DESC LIMIT`` syntax fixed
    (clickhouse.py:62-72 intent: last n rows by key)."""
    return f"SELECT * FROM {database}.{table} ORDER BY `{key}` DESC LIMIT {n}"


def truncate_query(database: str, table: str) -> str:
    return f"TRUNCATE TABLE {database}.{table}"  # S11

def exists_query(database: str, table: str) -> str:
    return f"EXISTS TABLE {database}.{table}"  # S13


def drop_prefixed_tables_queries(tables: list[str], prefix: str = "load_", database: str = "default") -> list[str]:
    """S12 cleanup: drop every table with the variant prefix (P3 predicate)."""
    return [f"DROP TABLE IF EXISTS {database}.{t}" for t in tables if t.startswith(prefix)]


def write_batch_jdbc(df: DataFrame, target: ClickHouseTarget, table: str, max_batch_size: int) -> None:
    """Batched insert (S14): JDBC ``batchsize`` carries the row cap; numPartitions
    stays the frame's own (executor-parallel inserts)."""
    (
        df.write.format("jdbc")
        .options(**target.jdbc_options())
        .option("dbtable", table)
        .option("batchsize", str(max_batch_size))
        .option("isolationLevel", "NONE")  # ClickHouse has no transactions
        .mode("append")
        .save()
    )


def clickhouse_chunk_writer(target: ClickHouseTarget, table: str, max_batch_size: int):
    """foreachBatch chunk writer for streaming/sink.chunked_foreach_batch_writer:
    stamps ``_batch_id`` so replays collapse in ReplacingMergeTree."""
    from pyspark.sql import functions as F

    def _write(df: DataFrame, batch_id: int) -> None:
        write_batch_jdbc(df.withColumn("_batch_id", F.lit(batch_id)), target, table, max_batch_size)

    return _write
