"""Banded-Hamming near-duplicate pairing — the shared machinery behind every
fixed-width-fingerprint family in this engine (text SimHash, image aHash,
audio energy fingerprints).

Pigeonhole recall guarantee (Manku/Jain/Sarma, WWW 2007): split an n-bit
hash into ``n_bands`` bands of ``band_bits``; any pair within Hamming
distance < n_bands must agree on at least one WHOLE band, so grouping by
(band, band-key) generates every qualifying pair — recall 1.0 by
construction, at any corpus size.

Plan shape (the scale contract, plan-asserted at both call sites): hashes
ride INTO the bucket expansion as (id, hash) structs so verification needs
no join — one shuffle on (band, band-key) longs, bucket-collect pair
expansion bounded by bucket sizes, then a per-pair xor + bit_count.
``shiftrightunsigned`` extracts band keys (arithmetic shiftright would
sign-extend hashes with bit 63 set — identical for non-negative hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_hamming_pairs(
    hashed: DataFrame,
    hash_col: str,
    id_col: str,
    n_bands: int,
    band_bits: int,
    max_hamming: int,
    out_a: str,
    out_b: str,
) -> DataFrame:
    """All pairs with ``Hamming(hash_a, hash_b) <= max_hamming`` as
    (out_a, out_b, hamming:int), sorted. Null hashes are skipped. Raises if
    the band geometry cannot guarantee recall 1.0 at ``max_hamming``."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {n_bands} bands for recall 1.0"
        )
    mask = (1 << band_bits) - 1
    h = hashed.where(F.col(hash_col).isNotNull())
    band_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(hash_col, b * band_bits).bitwiseAND(mask).alias("key"),
                )
                for b in range(n_bands)
            ]
        )
    )
    banded = h.select(
        F.struct(F.col(id_col).alias("i"), F.col(hash_col).alias("h")).alias("ds"),
        band_rows.alias("bk"),
    ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "ds")
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.array_sort(F.collect_set("ds")).alias("members"))
        .where(F.size("members") >= 2)
        # the O(|bucket|^2) pair expansion below runs in THIS frame's tasks,
        # and AQE's size-based coalescing sees only the tiny bucket rows —
        # measured: the whole expansion (17 MB of pairs from 260 KB of
        # buckets) serialized into ONE 8-s task on doc_simhash_near_pairs
        # (guide §2.5: compute skew is invisible to byte-based coalescing).
        # Round-robin the BUCKET rows across the cluster; a single giant
        # bucket still lands in one task (same caveat as AQE skew-split).
        .repartition(hashed.sparkSession.sparkContext.defaultParallelism)
    )
    pairs = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.struct(
                    x["i"].alias(out_a),
                    y["i"].alias(out_b),
                    F.bit_count(x["h"].bitwiseXOR(y["h"])).cast("int").alias("hamming"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.*")
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy(out_a, out_b)
    )
