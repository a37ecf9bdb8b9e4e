"""Scale-path join strategies: salted skew joins and bucketed co-located
joins.

The reference never joins at all (SURVEY.md §2.4) — these operators exist for
the 100 TB deployment target (BASELINE.json): a handful of hot keys (the
power-law reality of user_id/doc_id distributions) turns a plain shuffle join
into one straggler task; pre-bucketed storage makes repeated fact-fact joins
shuffle-free. AQE's skew-join splitting (enabled in session.py) handles
moderate skew automatically; ``salted_join`` is for the pathological case
where one key exceeds what a single task can hold even after AQE splits, and
it also works in streaming/foreachBatch contexts where AQE does not apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's key skew neutralized by salting.

    Left rows get a random salt in [0, salt_buckets); the right side is
    replicated ``salt_buckets`` times (explode of a literal range — cheap when
    the right side is the smaller input, which is when you'd use this). The
    join key becomes (key, salt), spreading each hot key over
    ``salt_buckets`` shuffle partitions.

    Result equals ``left.join(right, on, how)`` for 'inner' and 'left'
    (row-level multiplicity preserved: each left row joins the one replica
    matching its salt).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = (F.rand(seed=7) * salt_buckets).cast("int")
    lh = left.withColumn("_salt", salt)
    rh = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = lh.join(rh, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def bucket_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) managed table.

    Joins/aggregations between tables bucketed on the same key with the same
    bucket count need NO shuffle — the scan is already hash-distributed. This
    is the at-rest analogue of co-partitioning: bucket once at write time,
    join shuffle-free forever after. At 100 TB, bucketing the fact tables on
    their join key is the difference between re-shuffling petabytes per query
    and none.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans SortMergeJoin with ZERO Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def snapshot_dedup_index(
    df: DataFrame,
    table_name: str,
    hash_col: str = "content_hash",
    num_buckets: int = 32,
) -> None:
    """Persist a corpus snapshot's content hashes as a bucketed dedup index.

    The incremental-dedup anti-join (queries/curation.py::doc_incremental_dedup)
    shuffles BOTH sides when the snapshot is a plain table. The snapshot is
    the side that never changes between ingests — bucketing it by hash at
    write time means every subsequent batch anti-join shuffles only the NEW
    data: at 100 TB that converts a petabyte-scale snapshot re-shuffle per
    ingest into zero. (Runtime bloom filters don't cover this case: Spark
    injects them only when the build side is small, and a corpus snapshot
    isn't.)"""
    bucket_table(df.select(hash_col).distinct(), table_name, hash_col, num_buckets, sort_col=hash_col)


def anti_join_snapshot_index(
    spark: SparkSession,
    batch: DataFrame,
    index_table: str,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Anti-join a new batch against a bucketed snapshot index: the index
    scan arrives pre-hash-distributed, so the only Exchange in the plan is
    the batch side (plan-asserted in tests/test_scale_ops.py)."""
    return batch.join(spark.table(index_table), on=hash_col, how="left_anti")
