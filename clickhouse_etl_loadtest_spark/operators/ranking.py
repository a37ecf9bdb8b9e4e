"""Exact global total-order rank WITHOUT a global sort — the distributed
sort-rank (histogram two-pass) shape.

A naive ``row_number() OVER (ORDER BY ...)`` puts the entire corpus through
one ``Exchange SinglePartition`` — the canonical scale-killer. The exact
same ranks come from two passes that never serialize the corpus:

1. histogram: group the corpus by its ordering key prefix (the "bucket" —
   here the full ordering key minus the unique tiebreaker), count each
   bucket. The ONLY single-partition sort in the job runs over this
   histogram (bucket-cardinality rows, e.g. millions at 100 TB — not
   corpus rows) to turn counts into exclusive prefix offsets.
2. rank: broadcast the offset table back onto the corpus (histogram ≪
   corpus by construction; at extreme bucket cardinality drop the
   broadcast hint and let it hash-join — the math is identical), then
   ``row_number()`` WITHIN each bucket partition ordered by the
   tiebreaker. global_rank = bucket_offset + within-bucket row_number.

Every corpus-scale exchange is hash-partitioned on the bucket key; the
result is exactly ``ROW_NUMBER() OVER (ORDER BY bucket_cols..., tiebreaker)``
(asserted value-for-value by the DuckDB oracle of the query that uses
this). Bucket skew = many rows sharing one ordering-key prefix; the
within-bucket window sorts only that bucket's rows per partition, and a
skewed bucket can additionally be salted by extending the bucket key with
more of the ordering key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    bucket_order: list[Column],
    bucket_cols: list[str],
    tiebreaker: str,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Append ``rank_col`` = the exact 1-based global row number of each row
    under (``bucket_order``..., ``tiebreaker`` ASC), computed histogram-first.

    ``bucket_order`` are the ordering expressions (with direction) over
    ``bucket_cols``; ``tiebreaker`` must make the total order unique.
    """
    hist = df.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bucket_n"))
    # the ONLY single-partition sort: over the histogram, not the corpus
    off_w = Window.orderBy(*bucket_order).rowsBetween(Window.unboundedPreceding, -1)
    offsets = hist.select(
        *bucket_cols,
        F.coalesce(F.sum("_bucket_n").over(off_w), F.lit(0)).alias("_offset"),
    )
    in_bucket = Window.partitionBy(*bucket_cols).orderBy(F.col(tiebreaker).asc())
    return (
        df.join(F.broadcast(offsets), bucket_cols)
        .withColumn(rank_col, (F.col("_offset") + F.row_number().over(in_bucket)).cast("bigint"))
        .drop("_offset")
    )


def global_prefix_sum(
    df: DataFrame,
    bucket_order: list[Column],
    bucket_cols: list[str],
    tiebreaker: str,
    value_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Append ``out_col`` = the exact EXCLUSIVE global running sum of
    ``value_col`` under (``bucket_order``..., ``tiebreaker`` ASC) — the
    cumulative-offset twin of :func:`global_rank`, same histogram-first
    shape: per-bucket SUMS (corpus-scale exchange hash-partitioned on the
    bucket key, map-side combinable), one single-partition prefix pass over
    the histogram-sized sums, broadcast back, then a bounded within-bucket
    running-sum window. Equals
    ``SUM(value) OVER (ORDER BY bucket..., tiebreaker ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` value-for-value (asserted by the
    DuckDB oracle of the query that uses this) with no corpus-scale
    ``Exchange SinglePartition``."""
    hist = df.groupBy(*bucket_cols).agg(F.sum(value_col).alias("_bucket_sum"))
    off_w = Window.orderBy(*bucket_order).rowsBetween(Window.unboundedPreceding, -1)
    offsets = hist.select(
        *bucket_cols,
        F.coalesce(F.sum("_bucket_sum").over(off_w), F.lit(0)).alias("_offset"),
    )
    in_bucket = (
        Window.partitionBy(*bucket_cols)
        .orderBy(F.col(tiebreaker).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.join(F.broadcast(offsets), bucket_cols)
        .withColumn(
            out_col,
            (
                F.col("_offset")
                + F.coalesce(F.sum(value_col).over(in_bucket), F.lit(0))
            ).cast("bigint"),
        )
        .drop("_offset")
    )
