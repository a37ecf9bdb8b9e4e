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

import math
from typing import Callable

from pyspark.sql import DataFrame


def chunked_foreach_batch_writer(
    write_chunk: Callable[[DataFrame, int], None],
    max_batch_size: int = 5000,
) -> Callable[[DataFrame, int], None]:
    """Wrap a chunk writer into a foreachBatch callback enforcing the row cap.

    Chunking is done by ``randomSplit``-free repartitioning: a micro-batch of
    N rows becomes ceil(N / max_batch_size) partitions, and the inner writer
    receives the whole repartitioned frame — each output task (= insert batch)
    then carries <= ~max_batch_size rows. This keeps the work on executors
    (no driver-side collect) at any scale.

    Writers that chunk on the driver anyway (``driver_side = True`` attribute,
    e.g. clickhouse_http_chunk_writer) skip the repartition — its shuffle
    would be pure waste the moment the writer collects.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # persist: count + write would otherwise EACH recompute the batch
        # from the source (double Kafka/file reads per trigger)
        batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            if getattr(write_chunk, "driver_side", False):
                write_chunk(batch_df, batch_id)
            else:
                chunks = max(1, math.ceil(n / max_batch_size))
                write_chunk(batch_df.repartition(chunks), batch_id)
        finally:
            batch_df.unpersist()

    return _write


def parquet_chunk_writer(path: str) -> Callable[[DataFrame, int], None]:
    """Hermetic sink: append each micro-batch to a parquet dir (stands in for
    the ClickHouse table in env without a server, SURVEY.md §7.0)."""

    def _write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(path)

    return _write


def idempotent_parquet_chunk_writer(path: str) -> Callable[[DataFrame, int], None]:
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
        df.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return _write


def compact_sink(
    spark,
    path: str,
    key: str,
    target_rows_per_file: int = 1_000_000,
    out_path: str | None = None,
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
    """
    import math as _math

    df = spark.read.parquet(path)
    if "batch" in df.columns:
        df = df.drop("batch")
    n = df.count()
    parts = max(1, _math.ceil(n / target_rows_per_file))
    out = out_path or f"{path.rstrip('/')}_compacted"
    (
        df.repartitionByRange(parts, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out
