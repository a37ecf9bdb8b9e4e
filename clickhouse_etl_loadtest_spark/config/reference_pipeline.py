"""The reference's pipeline spec re-expressed for the Spark engine.

Shape mirrors /root/reference/config/glassflow/deduplication_pipeline.json:1-101
(topic schema :19-43, dedup :44-49, table_mapping :68-99) with the sink
repointed from ClickHouse to Parquet so the pipeline runs hermetically; the
ClickHouse sink is a config flip (``sink.type: "clickhouse"``).
"""

from __future__ import annotations

from .schemas import PipelineConfig

REFERENCE_PIPELINE_SPEC: dict = {
    "pipeline_id": "user-events-dedup",
    "source": {
        "type": "values",
        "topics": [
            {
                "name": "user_events_with_duplicates",
                "schema": {
                    "type": "json",
                    "fields": [
                        {"name": "event_id", "type": "string"},
                        {"name": "user_id", "type": "string"},
                        {"name": "name", "type": "string"},
                        {"name": "email", "type": "string"},
                        {"name": "created_at", "type": "string"},
                    ],
                },
                "deduplication": {
                    "enabled": True,
                    "id_field": "event_id",
                    "id_field_type": "string",
                    "time_window": "8h",
                },
            }
        ],
    },
    "join": {"enabled": False},
    "sink": {
        "type": "parquet",
        "table": "user_events_deduplicated",
        "max_batch_size": 5000,
        "max_delay_time": "10s",
        "table_mapping": [
            {"source_id": "user_events_with_duplicates", "field_name": "event_id", "column_name": "event_id", "column_type": "uuid"},
            {"source_id": "user_events_with_duplicates", "field_name": "user_id", "column_name": "user_id", "column_type": "uuid"},
            {"source_id": "user_events_with_duplicates", "field_name": "created_at", "column_name": "created_at", "column_type": "datetime"},
            {"source_id": "user_events_with_duplicates", "field_name": "name", "column_name": "user_name", "column_type": "string"},
            {"source_id": "user_events_with_duplicates", "field_name": "email", "column_name": "user_email", "column_type": "string"},
        ],
    },
}


def reference_pipeline() -> PipelineConfig:
    return PipelineConfig.model_validate(REFERENCE_PIPELINE_SPEC)
