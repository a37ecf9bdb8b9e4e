"""Distributed Bloom-filter membership gating for corpus-scale dedup.

Extension beyond the reference surface (the reference's dedup runs inside its
closed service; SURVEY.md §2.D) — this is the 100 TB scale path that sits in
FRONT of the exact anti-join:

- ``doc_incremental_dedup`` (queries/curation.py) anti-joins every new batch
  row against the snapshot index. Even with the bucketed index of
  ``operators/scale.py`` (snapshot side shuffle-free), the whole BATCH still
  shuffles. But in a steady-state ingest, most batch rows are NEW — they
  match nothing and shuffled for nothing.
- A Bloom filter built over the snapshot hashes classifies each batch row
  map-side: *definitely new* (bloom negative — Bloom filters have no false
  negatives) or *maybe duplicate* (bloom positive). Only the maybe-slice —
  true dups + ~fpp of the new rows — enters the anti-join; the definite-new
  slice bypasses the shuffle entirely. At a 5% duplicate rate and fpp=1%,
  ~94% of the batch never shuffles.

Plan shape: build = one narrow scan of the snapshot (h1,h2 computed JVM-side
by ``xxhash64``) -> per-partition bit arrays in ``mapInPandas`` -> OR-reduce.
Probe = map-only: JVM hashes + one Arrow-batched pandas UDF testing bits of
the task-broadcast bit array. No shuffle anywhere in build or probe.

When it applies at 100 TB: the bit array must ship to executors, so this is
for snapshots up to ~10^10 keys (fpp=1% → ~12 GB of bits at 10^10; ~1.2 GB at
10^9). Beyond that, fall back to the bucketed at-rest index
(``scale.py::snapshot_dedup_index``) alone, or shard the bloom by key range.
Spark's own runtime bloom injection (spark.sql.optimizer.runtime.bloomFilter)
does not cover this: it only triggers when the CREATION side is small and
inside one query — a persistent corpus snapshot is neither.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# second-hash salt: any fixed literal decorrelates xxhash64(x, salt) from
# xxhash64(x) well enough for the Kirsch-Mitzenmacher double-hashing scheme
_H2_SALT = 0x9E3779B9
_MAX_BITS = 1 << 33  # 1 GiB of bits — local-mode guard; raise on a real cluster


@dataclass(frozen=True)
class BloomFilter:
    """An immutable Bloom filter over int64 keys (double-hashing, k probes)."""

    bits: bytes  # little-endian bit array, len = n_bits // 8
    n_bits: int
    n_hashes: int

    def __len__(self) -> int:  # filter size in BYTES
        return len(self.bits)


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for ``expected_items`` keys at ``fpp``.

    Classic formulas: m = -n ln p / (ln 2)^2, k = (m/n) ln 2. n_bits is
    rounded up to a byte multiple; k clamped to [1, 16].
    """
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    n = max(1, expected_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    if m > _MAX_BITS:
        raise ValueError(
            f"bloom of {m} bits exceeds the {_MAX_BITS}-bit guard; "
            "raise _MAX_BITS on a real cluster or shard the filter by key range"
        )
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _hash_cols(key: Column) -> tuple[Column, Column]:
    """JVM-side (h1, h2) for double hashing — stays in whole-stage codegen."""
    return F.xxhash64(key), F.xxhash64(key, F.lit(_H2_SALT))


def _probe_positions(h1: np.ndarray, h2: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(h1), k) matrix of bit positions; uint64 arithmetic wraps mod 2^64
    deterministically, then mod n_bits."""
    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64)
    ks = np.arange(n_hashes, dtype=np.uint64)
    return (h1u[:, None] + ks[None, :] * h2u[:, None]) % np.uint64(n_bits)


def build_bloom(df: DataFrame, key: Column | str, expected_items: int, fpp: float = 0.01) -> BloomFilter:
    """Build a Bloom filter over ``key`` (hashed to int64 JVM-side).

    Each input partition fills a LOCAL bit array inside ``mapInPandas`` and
    emits it as one binary row; the partition arrays OR together in a
    distributed ``treeReduce`` (depth 2), so the driver receives exactly ONE
    array and the whole build is one job. (The r13 form fetched partitions
    one at a time via ``toLocalIterator`` — one sequential ~200 ms driver
    round-trip job PER PARTITION, ~6 s of the doc_bloom_incremental_dedup
    wall on a 32-partition build; guide §5: the driver should do almost no
    data work.) Peak memory anywhere = 2 filter copies per reduce task.
    """
    n_bits, n_hashes = bloom_params(expected_items, fpp)
    kc = F.col(key) if isinstance(key, str) else key
    h1c, h2c = _hash_cols(kc)
    hashed = df.select(h1c.alias("h1"), h2c.alias("h2"))

    def _fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.zeros(n_bits // 8, dtype=np.uint8)
        touched = False
        for b in batches:
            if not len(b):
                continue
            touched = True
            pos = _probe_positions(
                b["h1"].to_numpy(np.int64), b["h2"].to_numpy(np.int64), n_bits, n_hashes
            ).ravel()
            np.bitwise_or.at(arr, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))
        if touched:
            yield pd.DataFrame({"bits": [arr.tobytes()]})

    parts = hashed.mapInPandas(_fill, schema="bits binary")
    arrays = parts.rdd.map(lambda row: row["bits"])
    try:
        merged = arrays.treeReduce(
            lambda a, b: (
                np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
            ).tobytes(),
            depth=2,
        )
    except ValueError:  # empty input: _fill yielded no rows
        merged = np.zeros(n_bits // 8, dtype=np.uint8).tobytes()
    return BloomFilter(bits=bytes(merged), n_bits=n_bits, n_hashes=n_hashes)


def with_bloom_flag(df: DataFrame, key: Column | str, bloom: BloomFilter, flag_col: str = "_bloom_maybe") -> DataFrame:
    """Append boolean ``flag_col``: True iff ``key`` MIGHT be in the filter
    (false positives at ~fpp; false negatives impossible).

    Map-only: JVM hashes feed one Arrow-batched pandas UDF. The bit array
    rides a SparkContext broadcast — shipped once per executor, not per task.
    """
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.bits)
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes

    @F.pandas_udf("boolean")
    def _test(h1: pd.Series, h2: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _probe_positions(h1.to_numpy(np.int64), h2.to_numpy(np.int64), n_bits, n_hashes)
        hit = (arr[(pos >> np.uint64(3)).astype(np.int64)] & (1 << (pos & np.uint64(7))).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    kc = F.col(key) if isinstance(key, str) else key
    h1c, h2c = _hash_cols(kc)
    return df.withColumn(flag_col, _test(h1c, h2c))


def bloom_gated_anti_join(batch: DataFrame, snapshot: DataFrame, on: str, bloom: BloomFilter) -> DataFrame:
    """Exactly ``batch.join(snapshot, on, "left_anti")`` — but only the
    bloom-positive slice of the batch reaches the join.

    bloom-negative rows are DEFINITELY absent from the snapshot (no false
    negatives) and pass through map-only; bloom-positive rows (true dups +
    ~fpp of new rows) do the exact anti-join, which removes the false
    positives. The union is the precise anti-join result. ``bloom`` must have
    been built over ``snapshot[on]`` — a stale/partial filter breaks the
    no-false-negative guarantee and silently passes duplicates.
    """
    flagged = with_bloom_flag(batch, on, bloom)
    definite_new = flagged.where(~F.col("_bloom_maybe")).drop("_bloom_maybe")
    suspects = (
        flagged.where(F.col("_bloom_maybe"))
        .drop("_bloom_maybe")
        .join(snapshot.select(on).distinct(), on, "left_anti")
    )
    return definite_new.unionByName(suspects)
