"""Table-mapping operator: project + rename + cast (P1, SURVEY.md §2.2).

The reference declares the sink projection as ``table_mapping`` entries
``{source_id, field_name, column_name, column_type}``
(/root/reference/config/glassflow/deduplication_pipeline.json:68-99): pick
fields, rename (``name`` -> ``user_name``), cast (``string`` -> ``uuid`` /
``datetime``), and set output column ORDER.

One ``select`` of cast/alias expressions — Catalyst folds it into the scan
(column pruning reaches the parquet/Kafka reader; nothing else is read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config.schemas import TableMapping, spark_type_for

# created_at strings carry the generator's declared format
# (/root/reference/config/glassgen/user_event.json:6)
DATETIME_FMT = "yyyy-MM-dd HH:mm:ss"


def mapping_expr(m: TableMapping) -> F.Column:
    col = F.col(m.field_name)
    target = spark_type_for(m.column_type)
    if isinstance(target, T.TimestampType):
        # explicit format beats a bare cast: fails loudly on shape drift
        return F.to_timestamp(col, DATETIME_FMT).alias(m.column_name)
    return col.cast(target).alias(m.column_name)


def apply_table_mapping(
    df: DataFrame,
    mapping: list[TableMapping],
    source_id: str | None = None,
) -> DataFrame:
    """Apply the sink projection. ``source_id`` filters mapping rows when a
    joined pipeline maps fields from two topics."""
    entries = [m for m in mapping if source_id is None or m.source_id == source_id]
    if not entries:
        raise ValueError(f"no table_mapping entries for source_id={source_id!r}")
    return df.select(*[mapping_expr(m) for m in entries])
