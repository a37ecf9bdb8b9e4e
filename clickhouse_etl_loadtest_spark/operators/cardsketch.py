"""Incremental cardinality tracking: persistent HyperLogLog sketches folded
per micro-batch.

The cardinality twin of ``operators/streamhh.py``: where that sketch answers
"which keys are hot", this one answers "how many DISTINCT keys has the
stream ever carried" (per group — e.g. unique users per event type, unique
documents per source) without storing the keys. Exact streaming distinct
counting is what the dedup pipeline's RocksDB state already does at
O(distinct keys) state; this operator is the O(KB-per-group) answer for
when the count alone is wanted — dashboarding ingest coverage, sizing the
dedup state BEFORE running it, detecting a source that suddenly floods new
keys.

Built entirely from Spark's public Apache DataSketches-backed builtins
(``hll_sketch_agg`` / ``hll_union`` / ``hll_sketch_estimate``, SPARK-16484):
sketching and merging are JVM aggregates (distributed, map-side combined —
the shuffle carries one sketch per group per partition, not keys); only the
snapshot bookkeeping lives here, reusing the batch-id-keyed overwrite recipe
of ``streamhh`` / ``fuzzydedup.admit_batch`` so checkpoint-recovery replays
are idempotent. HLL sketches are mergeable with NO union penalty: the union
of per-batch sketches equals the sketch of the union (same lgConfigK), so
the running estimate matches a one-shot batch sketch over the full history
bit-for-bit — which is exactly what the parity test asserts.

Reference: no counterpart (the reference's only cardinality op is the exact
``count(DISTINCT)`` verify scan, `/root/reference/src/utils/clickhouse.py`);
LLM-pipeline extension, SURVEY.md §7.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .streamhh import _batch_part, _read_latest

# Apache DataSketches HLL lgConfigK: 2^12 registers ~= 0.8% relative
# standard error, ~2.5 KB per sketch. Must match across every batch folded
# into one state dir (unions of mixed precision degrade to the coarser one).
DEFAULT_LG_K = 12


def sketch_batch(df: DataFrame, group: str, key: str, lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """One HLL sketch per ``group`` value over ``key`` — columns
    (group, sketch binary). A pure JVM aggregate: partial sketches combine
    map-side, the shuffle carries ~2.5 KB per (group, partition)."""
    return df.groupBy(group).agg(F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"))


def update_sketches(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    group: str,
    key: str,
    batch_id: int,
    lg_k: int = DEFAULT_LG_K,
) -> dict:
    """Fold one micro-batch into the persistent per-group sketch table; a
    ``foreachBatch`` body (``batch_id`` is the foreachBatch argument).

    Reads the latest prior snapshot EXCLUDING its own batch partition and
    overwrites ``sketches/batch=b<id>`` — a replay merges against the
    pre-batch state and lands on its own output (idempotent; module
    docstring). Returns ``{"groups": <snapshot group count>}``.
    """
    prev, _ = _read_latest(spark, f"{state_path}/sketches", batch_id)
    batch_sk = sketch_batch(batch_df, group, key, lg_k)
    if prev is not None:
        merged = (
            prev.unionByName(batch_sk)
            .groupBy(group)
            .agg(F.hll_union_agg("sketch").alias("sketch"))
        )
    else:
        merged = batch_sk
    part = _batch_part(batch_id)
    merged.coalesce(1).write.mode("overwrite").parquet(
        f"{state_path}/sketches/batch={part}"
    )
    return {"groups": spark.read.parquet(f"{state_path}/sketches/batch={part}").count()}


def estimates(spark: SparkSession, state_path: str, group: str) -> DataFrame:
    """Current per-group distinct-count estimates over everything folded in
    so far — columns (group, approx_distinct)."""
    latest, _ = _read_latest(spark, f"{state_path}/sketches", None)
    if latest is None:
        raise FileNotFoundError(f"no sketch state at {state_path}")
    return latest.select(
        group, F.hll_sketch_estimate("sketch").alias("approx_distinct")
    )


def prune_state(spark: SparkSession, state_path: str) -> int:
    """Drop every sketch snapshot except the newest (the only one
    :func:`estimates` or a later :func:`update_sketches` ever reads) — the
    shared delete-only snapshot maintenance pass; see
    ``streamhh.prune_state`` for why latest-only stores need no commit
    protocol."""
    from .streamhh import prune_state as _prune

    return _prune(spark, state_path, subdirs=("sketches",))


def prune_state(spark: SparkSession, state_path: str) -> int:
    """Drop every sketch snapshot except the newest (the only one
    :func:`estimates` or a later :func:`update_sketches` ever reads) — the
    shared delete-only snapshot maintenance pass; see
    ``streamhh.prune_state`` for why latest-only stores need no commit
    protocol."""
    from .streamhh import prune_state as _prune

    return _prune(spark, state_path, subdirs=("sketches",))
