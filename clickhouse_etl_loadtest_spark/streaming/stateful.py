"""Custom stateful streaming operators via ``applyInPandasWithState``.

``dropDuplicatesWithinWatermark`` implements the reference's dedup (D1,
SURVEY.md §2.3) but is all-or-nothing: it cannot REPORT what it suppressed.
The reference's harness derives duplicate counts externally from the
generator (``result_total_duplicates``, /root/reference/src/utils/publish.py:61-65);
at 100 TB you want the pipeline itself to account for them. This module adds
that: a keyed first-wins dedup that also maintains a per-key suppressed-
duplicate count in the state store, with event-time timeout eviction bounding
state exactly like the reference's ``time_window``.

This is the (b) tier of the custom-operator ladder (task brief): semantics
the built-in operators genuinely can't express, done with Arrow-batched
``applyInPandasWithState`` — grouped state, not a row-at-a-time Python UDF.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config.durations import parse_duration

if TYPE_CHECKING:
    import pandas as pd


def _output_schema() -> StructType:
    return StructType(
        [
            StructField("key", StringType()),
            StructField("first_ts", TimestampType()),
            StructField("n_duplicates", LongType()),
            StructField("is_first_emit", IntegerType()),
        ]
    )


def _state_schema() -> StructType:
    # (first-seen epoch micros, suppressed count)
    return StructType([StructField("first_us", LongType()), StructField("dups", LongType())])


def dedup_with_counts(
    df: DataFrame,
    key: str,
    time_window: str,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming first-wins dedup that EMITS per-key duplicate counts.

    Output (update mode): one row per key per micro-batch that touched it —
    ``is_first_emit=1`` on first sight (the "kept" record signal), and the
    cumulative ``n_duplicates`` suppressed so far. State for a key is evicted
    by event-time timeout once the watermark passes ``first_ts +
    time_window`` — the same bounded-window semantics as the reference's
    NATS-KV dedup store (W4) and our ``dropDuplicatesWithinWatermark`` path.

    Scale: state is 16 bytes/key in RocksDB; rows arrive grouped by key, so
    the only shuffle is the groupBy hash exchange — identical shape to the
    built-in dedup.
    """
    window_us = int(parse_duration(time_window) * 1_000_000)

    def fn(
        key_tuple: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return

        n_rows = 0
        min_ts_us = None
        for pdf in pdfs:
            n_rows += len(pdf)
            batch_min = pdf[ts_col].min()
            ts_us = int(batch_min.value // 1_000)  # pandas Timestamp ns -> us
            min_ts_us = ts_us if min_ts_us is None else min(min_ts_us, ts_us)

        if state.exists:
            first_us, dups = state.get
            dups += n_rows  # every row while state lives is a re-send
            first_emit = 0
        else:
            first_us, dups = min_ts_us, n_rows - 1  # first row kept
            first_emit = 1
        state.update((first_us, dups))
        # event-time timeouts must be strictly later than the current
        # watermark — a re-send arriving after other keys advanced the
        # watermark past first_ts+window would otherwise crash the query
        timeout_ms = max(
            (first_us + window_us) // 1_000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)

        yield pd.DataFrame(
            {
                "key": [key_tuple[0]],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "n_duplicates": [dups],
                "is_first_emit": [first_emit],
            }
        )

    from ..config.durations import duration_to_interval

    watermarked = df.withWatermark(ts_col, duration_to_interval(time_window))
    return watermarked.groupBy(key).applyInPandasWithState(
        fn,
        _output_schema(),
        _state_schema(),
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )

