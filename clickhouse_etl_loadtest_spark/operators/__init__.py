from .dedup import dedup_first_wins, dedup_within_window, streaming_dedup
from .mapping import apply_table_mapping

__all__ = [
    "apply_table_mapping",
    "dedup_first_wins",
    "dedup_within_window",
    "streaming_dedup",
]
