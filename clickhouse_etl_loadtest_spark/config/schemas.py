"""Pipeline-spec models — the engine's public declarative API.

The JSON shape mirrors the reference's pipeline config
(/root/reference/config/glassflow/deduplication_pipeline.json:1-101): a
pipeline is ``{pipeline_id, source, join, sink}`` where the source declares
Kafka topics with fixed JSON schemas and optional per-topic deduplication, and
the sink declares a ClickHouse table plus a ``table_mapping`` that projects,
renames and casts fields (P1 in SURVEY.md §2.2).

These models compile to Spark DataFrame plans in
:mod:`clickhouse_etl_loadtest_spark.plans.compiler` — the models themselves
contain no execution logic.
"""

from __future__ import annotations

from pydantic import BaseModel, Field
from pyspark.sql import types as T

# --- type system -----------------------------------------------------------
# Declared field/column type vocabulary (SURVEY.md §1.2). ``uuid`` has no
# Spark type: it stays a StringType and the sink DDL layer re-declares it.
_SPARK_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "uuid": T.StringType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "int": T.LongType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "array<float>": T.ArrayType(T.FloatType()),
    "binary": T.BinaryType(),
}


def spark_type_for(declared: str) -> T.DataType:
    """Map a declared config type to a Spark type (SURVEY.md §1.2 table)."""
    try:
        return _SPARK_TYPES[declared.lower()]
    except KeyError:
        raise ValueError(f"unsupported declared type: {declared!r}") from None


# --- source ---------------------------------------------------------------


class ConnectionParams(BaseModel):
    """Kafka connection block (deduplication_pipeline.json:6-14). Optional so
    hermetic (parquet/rate-source) pipelines need no brokers."""

    brokers: list[str] = Field(default_factory=list)
    protocol: str = "PLAINTEXT"
    mechanism: str | None = None
    username: str | None = None
    password: str | None = None
    root_ca: str | None = None  # base64 PEM, cf. /root/reference/src/utils/kafka.py:16-24


class FieldSpec(BaseModel):
    """One declared topic field {name, type} (deduplication_pipeline.json:21-43)."""

    name: str
    type: str = "string"

    @property
    def spark_type(self) -> T.DataType:
        return spark_type_for(self.type)


class TopicSchema(BaseModel):
    type: str = "json"
    fields: list[FieldSpec] = Field(default_factory=list)

    def to_struct(self) -> T.StructType:
        return T.StructType([T.StructField(f.name, f.spark_type, True) for f in self.fields])


class DeduplicationConfig(BaseModel):
    """Keyed time-window streaming dedup declaration (D1 in SURVEY.md §2.3;
    deduplication_pipeline.json:44-49). Semantics: keep the FIRST record per
    ``id_field`` seen within ``time_window``."""

    enabled: bool = False
    id_field: str = "event_id"
    id_field_type: str = "string"
    time_window: str = "8h"


class TopicConfig(BaseModel):
    name: str
    consumer_group_initial_offset: str = "latest"
    schema_: TopicSchema = Field(default_factory=TopicSchema, alias="schema")
    deduplication: DeduplicationConfig = Field(default_factory=DeduplicationConfig)

    model_config = {"populate_by_name": True}


class SourceConfig(BaseModel):
    type: str = "kafka"
    provider: str | None = None
    connection_params: ConnectionParams = Field(default_factory=ConnectionParams)
    topics: list[TopicConfig] = Field(default_factory=list)


# --- join -----------------------------------------------------------------


class JoinSourceConfig(BaseModel):
    """One side of the temporal join (J1 in SURVEY.md §2.4). The reference
    reads ``join.sources[0].join_key`` for sink ORDER BY selection
    (/root/reference/src/pre_process.py:9-12)."""

    source_id: str
    join_key: str
    time_window: str = "1h"
    orientation: str = "left"


class JoinConfig(BaseModel):
    enabled: bool = False
    type: str = "temporal"
    sources: list[JoinSourceConfig] = Field(default_factory=list)


# --- sink -----------------------------------------------------------------


class TableMapping(BaseModel):
    """Project + rename + cast of one field (P1; deduplication_pipeline.json:68-99)."""

    source_id: str
    field_name: str
    column_name: str
    column_type: str = "string"


class SinkConfig(BaseModel):
    type: str = "clickhouse"  # or "parquet" / "memory" for hermetic runs
    provider: str | None = None
    host: str = "localhost"
    port: str = "9000"
    database: str = "default"
    username: str = "default"
    password: str | None = None
    secure: bool = False
    max_batch_size: int = 5000  # default per /root/reference/src/models.py:39-50
    max_delay_time: str = "10s"
    table: str = "sink_table"
    path: str | None = None  # parquet-sink output dir (hermetic mode)
    table_mapping: list[TableMapping] = Field(default_factory=list)

    def order_by_key(self, join: JoinConfig | None = None) -> str:
        """ClickHouse ORDER BY column: the join key when a join is enabled,
        else the first mapped column (/root/reference/src/utils/clickhouse.py:34-36,
        /root/reference/src/pre_process.py:9-12)."""
        if join is not None and join.enabled and join.sources:
            return join.sources[0].join_key
        if self.table_mapping:
            return self.table_mapping[0].column_name
        raise ValueError("sink has no table_mapping; cannot derive ORDER BY key")


# --- pipeline -------------------------------------------------------------


class PipelineConfig(BaseModel):
    pipeline_id: str
    source: SourceConfig
    join: JoinConfig = Field(default_factory=JoinConfig)
    sink: SinkConfig

    @classmethod
    def from_json_file(cls, path: str) -> "PipelineConfig":
        import json

        with open(path) as fh:
            return cls.model_validate(json.load(fh))
