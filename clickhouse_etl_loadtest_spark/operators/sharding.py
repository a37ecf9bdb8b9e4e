"""Deterministic training-shard export: the last-mile operator of a
training-data pipeline — after dedup/filter/mix, the corpus is written as N
balanced shards in a deterministic pseudo-random order so every rerun (and
every engine) produces byte-identical training input.

No reference counterpart (the reference stops at the ClickHouse sink); this is
the extension-op tier, same as operators/scale.py.

Scale design (100 TB):
- Shard assignment is a map-only hash of the id — no shuffle, no RNG state,
  stable under corpus growth (existing docs never move shards).
- The pseudo-shuffle is ``ORDER BY hash(id)`` WITHIN each shard: a range
  repartition on (shard, order_key) gives each writer task a contiguous,
  sorted slice, so a shard spans ``files_per_shard`` parquet files whose
  concatenation (by order_key) is the deterministic global order. No global
  sort across shards is ever required.
- Readers restore the order with a per-shard sort on ``order_key`` — cheap,
  because files are already range-clustered (row-group min/max prune the
  merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60


def shard_assignment(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Add deterministic ``shard`` and ``order_key`` columns.

    Both are pure functions of the id (md5-derived h60, DuckDB-reproducible):
    ``shard`` buckets uniformly into ``n_shards``; ``order_key`` is the
    position key of the pseudo-shuffle — sorting a shard by it yields an
    order uncorrelated with ingest order, which is what SGD wants."""
    # fail fast on null ids: a null would hash to a null shard and land in
    # shard=__HIVE_DEFAULT_PARTITION__, invisible to read_shard — silent loss
    sid = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"shard_assignment: null {id_col}")),
    ).otherwise(F.col(id_col).cast("string"))
    return df.withColumn(
        "shard", (h60(F.concat(F.lit("shard"), sid)) % n_shards).cast("bigint")
    ).withColumn("order_key", h60(F.concat(F.lit("order"), sid)))


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    files_per_shard: int = 1,
) -> str:
    """Write ``df`` as ``shard=K/`` parquet directories, each internally
    sorted by ``order_key``.

    ``repartitionByRange(shard, order_key)`` gives contiguous sorted slices
    (one shuffle); ``partitionBy("shard")`` routes rows to their shard dir.
    Total output tasks = n_shards * files_per_shard. Range boundaries are
    sample-derived and need not align to shard edges, so a task can straddle
    two shards (a shard then spans files_per_shard + 1 files and a task can
    hold up to ~2x the average slice) — size files_per_shard with that slack;
    the read path is unaffected (read_shard re-sorts on order_key)."""
    assigned = shard_assignment(df, n_shards, id_col)
    (
        assigned.repartitionByRange(n_shards * files_per_shard, "shard", "order_key")
        .sortWithinPartitions("shard", "order_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """Read one shard in its deterministic training order."""
    return spark.read.parquet(f"{path}/shard={shard}").orderBy("order_key")
