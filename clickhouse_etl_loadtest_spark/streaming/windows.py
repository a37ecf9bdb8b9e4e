"""Streaming windowed aggregation with watermark-bounded late data (W2/W3,
SURVEY.md §2.8).

The reference's only window is the dedup time_window; a general engine also
needs event-time windowed aggregates where the watermark decides (a) when a
window finalizes and (b) which late rows are dropped. Append output mode
emits each window exactly once — after the watermark passes its end — which
is what an at-rest sink (parquet/ClickHouse) wants: no in-place updates.

State: one row per (window, key) inside the watermark horizon; eviction on
watermark advance bounds it to window_count x |keys| regardless of stream
length (RocksDB-backed at the reference's scales, session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config.durations import duration_to_interval as _interval


def tumbling_counts(
    df: DataFrame,
    window: str,
    late_threshold: str | None = None,
    ts_col: str = "timestamp",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window counts; rows later than ``late_threshold``
    behind the max seen event time are dropped by the watermark.

    ``late_threshold`` defaults to the window length — i.e. a row may arrive
    up to one full window late and still count.
    """
    wm = _interval(late_threshold or window)
    grouped_keys = [F.window(ts_col, _interval(window)).alias("w"), *(keys or [])]
    aggregates = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.withWatermark(ts_col, wm).groupBy(*grouped_keys).agg(*aggregates)
    agg_cols = [c for c in out.columns if c != "w" and c not in (keys or [])]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *agg_cols,
    )


def session_counts(
    df: DataFrame,
    gap: str,
    late_threshold: str | None = None,
    ts_col: str = "timestamp",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Event-time session windows (``F.session_window``): events closer than
    ``gap`` merge into one session; a session finalizes (append mode) once
    the watermark passes its end + gap. The batch twin is the lag/cumsum
    sessionization in queries/analytics.py::events_session_windows — same
    gap semantics, value-checked against DuckDB.

    State: one open session per key inside the watermark horizon — merged
    in-place as events arrive, evicted on watermark advance, so state is
    O(active keys), independent of stream length.
    """
    wm = _interval(late_threshold or gap)
    grouped_keys = [F.session_window(F.col(ts_col), _interval(gap)).alias("w"), *(keys or [])]
    aggregates = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.withWatermark(ts_col, wm).groupBy(*grouped_keys).agg(*aggregates)
    agg_cols = [c for c in out.columns if c != "w" and c not in (keys or [])]
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *(keys or []),
        *agg_cols,
    )
