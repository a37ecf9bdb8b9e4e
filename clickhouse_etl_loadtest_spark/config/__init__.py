from .durations import parse_duration
from .schemas import (
    DeduplicationConfig,
    FieldSpec,
    JoinConfig,
    JoinSourceConfig,
    PipelineConfig,
    SinkConfig,
    SourceConfig,
    TableMapping,
    TopicConfig,
    TopicSchema,
    spark_type_for,
)

__all__ = [
    "DeduplicationConfig",
    "FieldSpec",
    "JoinConfig",
    "JoinSourceConfig",
    "PipelineConfig",
    "SinkConfig",
    "SourceConfig",
    "TableMapping",
    "TopicConfig",
    "TopicSchema",
    "parse_duration",
    "spark_type_for",
]
