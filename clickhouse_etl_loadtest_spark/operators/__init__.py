from .asof import asof_join
from .dedup import dedup_first_wins, dedup_within_window, streaming_dedup
from .mapping import apply_table_mapping
from .scale import bucket_table, bucketed_join, salted_join

__all__ = [
    "apply_table_mapping",
    "asof_join",
    "bucket_table",
    "bucketed_join",
    "dedup_first_wins",
    "dedup_within_window",
    "salted_join",
    "streaming_dedup",
]
