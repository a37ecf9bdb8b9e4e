"""Z-order (Morton-curve) data layout for multi-column scan pruning.

Extension beyond the reference surface (its sink layout is single-key: the
MergeTree ORDER BY rule, `plans/compiler.py::write_sink_batch`). Single-key
clustering prunes row groups for predicates on THAT key only; a 100 TB fact
table queried by several columns (user_id AND event time AND value band)
needs multi-dimensional locality. Interleaving the bit patterns of per-column
bucket ranks (the Morton / Z-order curve) gives every indexed column
partially-sorted row groups, so parquet min/max statistics skip data for
predicates on ANY of the indexed columns — the same mechanism behind
Databricks OPTIMIZE ZORDER and ClickHouse's `ORDER BY (a, b)` hierarchies,
built here from public primitives only.

Plan shape: per-column cut points come from one driver-side
``approxQuantile`` (sampled sketch, KB-sized result); the bucket rank is a
JVM-side binary-search expression; bit interleaving is a fixed chain of
shift/or column expressions (whole-stage codegen, no UDF); the final
clustering is ONE ``repartitionByRange`` on the z-value + an in-partition
sort — exactly the shuffle a single-key clustered write would pay anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bits per dimension; 2 cols -> 12-bit z-values, 4 cols -> 24-bit. Plenty:
# the curve only needs more resolution than the row-group count, and 64
# buckets/column keeps the rank expression flat (see _bucket_rank).
_BITS = 6


def _bucket_rank(col: Column, cuts: list[float]) -> Column:
    """0-based quantile-bucket rank of ``col`` against sorted ``cuts``
    (up to 2^_BITS - 1 boundaries), computed as a FLAT sum of boolean
    indicators — rank = sum_i [col > cut_i] — rather than a nested
    when-ladder: a 63-term add chain stays cheap for Catalyst and codegen,
    where 2^8 nested CaseWhens blew past the optimizer's iteration budget
    and shipped MB-scale task binaries. Quantile buckets (not
    width_bucket's uniform split) keep ranks balanced under skew, which is
    what makes the interleave fair across columns."""
    rank: Column = F.lit(0)
    for cut in cuts:
        rank = rank + (col > F.lit(cut)).cast("int")
    return rank


def _interleave(ranks: list[Column]) -> Column:
    """Morton interleave: bit j of rank i lands at position j*len+i."""
    z: Column = F.lit(0).cast("long")
    for bit in range(_BITS):
        for i, r in enumerate(ranks):
            src = F.shiftright(r.cast("long"), bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(src, bit * len(ranks) + i))
    return z


def zorder_value(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append the Morton z-value of ``cols`` as ``_z`` (numeric cols only).

    Cut points are computed once per column with ``approxQuantile``
    (relativeError 0.01 — a sampled sketch job, driver result is
    2^_BITS floats per column). The sketch merges in partition order, so
    cuts can shift slightly across repartitionings of the same data — that
    moves bucket BOUNDARIES (layout quality), never row values: reads are
    correct under any cut placement."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-order needs 2-4 columns")
    n_cuts = (1 << _BITS) - 1
    probs = [(i + 1) / (n_cuts + 1) for i in range(n_cuts)]
    ranks = []
    for c in cols:
        cuts = df.approxQuantile(c, probs, 0.01)
        ranks.append(_bucket_rank(F.col(c).cast("double"), sorted(set(cuts))))
    return df.withColumn("_z", _interleave(ranks))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` as parquet clustered along the z-order curve of ``cols``:
    range-partition by ``_z`` into ``n_files`` tasks, sort each partition by
    ``_z``, drop the helper column. Downstream scans filtering on any of
    ``cols`` skip row groups via min/max stats (measured in
    tests/test_layout.py). ``writer_options`` pass through to the parquet
    writer (e.g. ``parquet.block.size`` to control row-group granularity)."""
    w = (
        zorder_value(df, cols)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        w = w.option(k, v)
    w.parquet(path)
