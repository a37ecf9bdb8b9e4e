"""2-D mixture rebalancing by iterative proportional fitting (Deming &
Stephan 1940 / Sinkhorn's alternating scaling) as a reusable operator.

``queries/curation.py::doc_mixture_ipf`` is the oracle-verified query form
over the documents table; THIS is the function a mixture recipe calls on
any (row_key, col_key, mass) contingency rollup — e.g. language x source
token counts: alternate scale-rows-to-the-uniform-target /
rescale-columns-to-availability sweeps, ending on the column side so
column totals hold exactly. The fuzz in ``tests/test_ipf_fuzz.py`` pins
the Spark sweeps against a pure-numpy twin to 1e-9 on randomized tables.

Scale: the input is already a rollup, so every sweep aggregates and
rescales the tiny cell table with 1-row totals broadcast back; each sweep
MATERIALIZES the cell frame (it is referenced twice per sweep — without
materialization the upstream re-derives 2^sweeps times, measured 4x at
the gate). The default strategy (``materialize="collect"``) rebuilds the
tiny frame from driver-held rows, which truncates lineage (constant plan
size per sweep) AND keeps the operator fault-tolerant when embedded in a
long-running pipeline: the rows live on the driver, so an executor loss
mid-sweep just re-ships them — unlike ``localCheckpoint``, whose blocks
are non-fault-tolerant and fail the job on executor loss (the same
reason wetstream's streaming landers use persist). ``localCheckpoint``
stays available as the opt-in no-driver-roundtrip path for interactive
use. DECIMAL-folded marginal sums keep the scale factors
order-independent across engines and partitionings. Reference: no
counterpart; LLM-pipeline extension, SURVEY.md §7.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame, strategy: str) -> DataFrame:
    """Cut the per-sweep plan growth. ``collect`` = driver-round-trip the
    tiny rollup (fault-tolerant, constant plan); ``localCheckpoint`` = RDD
    blocks on executors (no driver hop, non-fault-tolerant)."""
    if strategy == "localCheckpoint":
        return df.localCheckpoint()
    if strategy == "collect":
        # NOTE (r14): leave the rebuilt frame exactly as createDataFrame
        # returns it. A coalesce(1) looks like it should cut the 32
        # near-empty tasks per sweep job, but it demotes the driver-local
        # rows from a plan-time-foldable LocalRelation to a real
        # distributed RDD scan — measured doc_epoch_ipf_plan 5.4 -> 20.2 s
        # and doc_mixture_ipf 4.5 -> 17.1 s. Reverted; the per-sweep task
        # fan-out is the cheaper half of that trade.
        return df.sparkSession.createDataFrame(df.collect(), df.schema)
    raise ValueError(f"unknown materialize strategy: {strategy!r}")


def ipf_weights(
    cells: DataFrame,
    iters: int,
    row_key: str = "lang",
    col_key: str = "source",
    value_col: str = "n_tokens",
    materialize: str = "collect",
) -> DataFrame:
    """IPF sampling weights over a (``row_key``, ``col_key``,
    ``value_col``) contingency rollup: returns the input columns plus
    ``weight`` (the per-cell multiplier), ``alloc_tokens`` (value x
    weight) and ``row_residual`` (that row's post-sweep marginal over its
    uniform target — 1.0 = converged). Zero/negative-mass cells are
    dropped. The LAST sweep is the column scaling, so column totals equal
    availability exactly."""
    v = F.col(value_col)
    cells = _materialize(cells.where(v > 0).withColumn("m", F.lit(1.0)), materialize)
    tot = cells.agg(
        F.sum(value_col).alias("_total"),
        F.count_distinct(row_key).alias("_n_rows"),
    )
    col_avail = cells.groupBy(col_key).agg(F.sum(value_col).alias("_avail"))
    alloc_dec = F.sum((v * F.col("m")).cast("decimal(38,18)"))
    for _ in range(iters):
        rsum = cells.groupBy(row_key).agg(alloc_dec.cast("double").alias("_cur"))
        cells = (
            cells.join(rsum, row_key)
            .crossJoin(F.broadcast(tot))
            .withColumn(
                "m",
                F.col("m")
                * ((F.col("_total") * 1.0 / F.col("_n_rows")) / F.col("_cur")),
            )
            .drop("_cur", "_total", "_n_rows")
        )
        csum = cells.groupBy(col_key).agg(alloc_dec.cast("double").alias("_cur"))
        cells = _materialize(  # bound the per-sweep plan (tiny frame)
            cells.join(F.broadcast(col_avail), col_key)
            .join(F.broadcast(csum), col_key)
            .withColumn("m", F.col("m") * (F.col("_avail") / F.col("_cur")))
            .drop("_cur", "_avail"),
            materialize,
        )
    rfin = cells.groupBy(row_key).agg(alloc_dec.cast("double").alias("_cur"))
    return (
        cells.join(rfin, row_key)
        .crossJoin(F.broadcast(tot))
        .select(
            *[c for c in cells.columns if c != "m"],
            F.col("m").alias("weight"),
            (v * F.col("m")).alias("alloc_tokens"),
            (
                F.col("_cur") / (F.col("_total") * 1.0 / F.col("_n_rows"))
            ).alias("row_residual"),
        )
    )
