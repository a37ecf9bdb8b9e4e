"""Streaming sink with the reference's dual flush policy (W5, SURVEY.md §2.8).

The reference sink flushes on ``max_batch_size`` rows OR ``max_delay_time``
elapsed, whichever first (deduplication_pipeline.json:65-66; defaults
/root/reference/src/models.py:39-50). Spark has one knob — the trigger
interval — so the delay half maps to ``trigger(processingTime=...)`` and the
row-cap half is enforced inside ``foreachBatch`` by chunking each micro-batch
into <= max_batch_size inserts (the JDBC ``batchsize`` option for ClickHouse,
plain partition-wise writes for files).
"""

from __future__ import annotations

import warnings
from typing import Callable

from pyspark.sql import DataFrame


def chunked_foreach_batch_writer(
    write_chunk: Callable[[DataFrame, int], None],
    max_batch_size: int = 5000,
) -> Callable[[DataFrame, int], None]:
    """Wrap a chunk writer into a foreachBatch callback — the W5 policy
    point: every sink batch (output file / insert) carries <= max_batch_size
    rows.

    The cap is enforced INSIDE each writer, where it costs nothing extra:
    file writers split output at ``maxRecordsPerFile`` (per-task file roll,
    no shuffle), the JDBC writer caps inserts via its ``batchsize`` option,
    and driver-side writers slice the collected rows. The earlier shape
    enforced it here with persist + count + repartition(ceil(n/cap)) —
    measured on a 20M-row micro-batch that added a 3,637-partition shuffle
    plus one full extra pass, doubling batch latency — so this wrapper now
    only conveys the cap to writers that take it and otherwise passes the
    batch straight through (the micro-batch is computed exactly once, by the
    write itself).

    Contract for third-party writers: expose ``set_row_cap(n)`` (like the
    writers in this module) or declare an internal cap by setting
    ``self_capping = True`` (or ``driver_side = True``, the marker the
    driver-collecting writers use) on the callable. A writer with none of
    these gets the WHOLE uncapped micro-batch — this wrapper warns loudly
    instead of letting the W5 cap silently vanish.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        setter = getattr(write_chunk, "set_row_cap", None)
        if setter is not None:
            setter(max_batch_size)
        elif not (
            getattr(write_chunk, "self_capping", False)
            or getattr(write_chunk, "driver_side", False)
        ):
            warnings.warn(
                f"chunk writer {write_chunk!r} exposes neither set_row_cap() nor "
                "self_capping=True: the W5 max_batch_size row cap is NOT enforced "
                "for it and each call receives the whole micro-batch",
                RuntimeWarning,
                stacklevel=2,
            )
        write_chunk(batch_df, batch_id)

    return _write


def parquet_chunk_writer(path: str, max_records_per_file: int = 5000) -> Callable[[DataFrame, int], None]:
    """Hermetic sink: append each micro-batch to a parquet dir (stands in for
    the ClickHouse table in env without a server, SURVEY.md §7.0). Each
    output file carries <= max_records_per_file rows (W5 row cap) via
    per-task file rolling — no shuffle."""

    def _write(df: DataFrame, batch_id: int) -> None:
        df.write.option("maxRecordsPerFile", str(_write._row_cap)).mode("append").parquet(path)

    _write._row_cap = max_records_per_file
    _write.set_row_cap = lambda n: setattr(_write, "_row_cap", n)
    return _write


def idempotent_parquet_chunk_writer(path: str, max_records_per_file: int = 5000) -> Callable[[DataFrame, int], None]:
    """Exactly-once file sink (W7, SURVEY.md §2.8): each micro-batch writes to
    a ``batch_id``-keyed subdirectory with overwrite semantics, so a replayed
    batch (checkpoint recovery re-delivers the last uncommitted batch —
    foreachBatch is at-least-once) lands on top of its own partial output
    instead of appending duplicates. Read the sink with
    ``spark.read.parquet(f"{path}/batch=*")``.

    This is the file-sink analogue of the ClickHouse mitigation in
    SURVEY.md §7.5 (ReplacingMergeTree + count(DISTINCT key) — see
    sources/clickhouse.py create_table_ddl/count_query): dedup-by-batch at
    the storage layer because delivery is at-least-once.
    """

    def _write(df: DataFrame, batch_id: int) -> None:
        df.write.option("maxRecordsPerFile", str(_write._row_cap)).mode("overwrite").parquet(
            f"{path}/batch={batch_id}"
        )

    _write._row_cap = max_records_per_file
    _write.set_row_cap = lambda n: setattr(_write, "_row_cap", n)
    return _write


def compact_sink(
    spark,
    path: str,
    key: str,
    target_rows_per_file: int = 1_000_000,
    out_path: str | None = None,
    zorder_cols: list[str] | None = None,
) -> str:
    """Coalesce a chunk/batch-partitioned streaming sink into few large,
    key-clustered parquet files — the maintenance pass every continuously-fed
    table needs (each micro-batch leaves ceil(rows/max_batch_size) small
    files; at 100 TB that is millions of files and a metadata-bound scan).

    ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` restores the
    MergeTree-style ORDER BY layout of write_sink_batch — range-partitioned
    files whose row-group min/max on ``key`` enable page skipping. The
    ``batch`` replay-dedup column is dropped: compaction runs on settled data
    (no in-flight replays), producing a plain table for readers.

    Writes OUT-OF-PLACE (default ``<path>_compacted``) and returns the output
    dir: without a transactional table format an in-place rewrite could race
    a concurrent reader, so the atomic swap is the caller's move/rename.

    ``zorder_cols`` (2-4 numeric columns) switches the layout from
    single-key range clustering to the Morton-curve clustering of
    ``operators/layout.py`` — same shuffle count (one range repartition +
    in-partition sort, now on the z-value), but row-group min/max stats
    become selective on EVERY listed column instead of just ``key``. Use it
    when the compacted table is queried by more than one predicate column
    (the multi-dimensional analogue of the MergeTree ORDER BY rule).
    """
    import math as _math

    df = spark.read.parquet(path)
    if "batch" in df.columns:
        df = df.drop("batch")
    n = df.count()
    parts = max(1, _math.ceil(n / target_rows_per_file))
    out = out_path or f"{path.rstrip('/')}_compacted"
    if zorder_cols is not None:
        from ..operators.layout import zorder_write

        zorder_write(df, out, zorder_cols, n_files=parts)
        return out
    (
        df.repartitionByRange(parts, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out
