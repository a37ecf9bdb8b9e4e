"""Generic as-of (temporal nearest) join — an operator Spark lacks natively
(the J1 temporal-join family, SURVEY.md §2.4; DuckDB spells it ``ASOF JOIN``).

Each left row is matched to the single right row with the greatest
``right_ts <= left_ts`` (direction="backward") or smallest
``right_ts >= left_ts`` (direction="forward") per key group.

Scale-first implementation: union + running last-non-null window — ONE
shuffle on the key columns and one per-partition sort, zero range explosion.
The naive formulation (inequality join + row_number) makes Catalyst pick a
broadcast-nested-loop or a per-key cross product, both of which die at
100 TB; this shape is how kdb/Flink implement as-of internally.

Semantics notes:
- ``allow_exact_matches=False`` excludes right rows at exactly ``left_ts``.
- ``tolerance`` (seconds) nulls out matches older/newer than the bound —
  pandas ``merge_asof`` semantics (row kept, match nulled).
- ties on ``right_ts`` resolve to the LAST right row in (right_ts,
  tiebreak-column) order, deterministically if ``right_order`` is a unique
  column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join; every left row survives (matches may be NULL).

    ``right_cols`` are the right-side payload columns to carry over, emitted
    as ``<name><suffix>``; the matched right timestamp is always emitted as
    ``<right_ts><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if not suffix:
        raise ValueError("suffix must be non-empty (carried columns would collide)")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    right_cols = [c for c in (right_cols or []) if c != right_ts]
    for c in right_cols:
        if f"{c}{suffix}" in left.columns:
            raise ValueError(
                f"output column {c}{suffix!r} collides with a left column; pick another suffix"
            )

    # right payload rides under internal names so a right_col sharing a name
    # with a left column (e.g. both sides have 'px') cannot collide
    internal = {c: f"_r{i}" for i, c in enumerate(right_cols)}
    lhs = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(internal[c]) for c in right_cols],
    )
    # align schemas for the union
    for c in left.columns:
        if c not in keys and c != left_ts:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.withColumn(left_ts, F.col("_ts"))
    rtypes = dict(right.dtypes)
    for c in right_cols:
        lhs = lhs.withColumn(internal[c], F.lit(None).cast(rtypes[c]))
    unioned = lhs.select(rhs.columns).unionByName(rhs)

    # ordering: right rows must sort before a left row exactly when they are
    # visible to it. backward+exact: right first at equal ts; backward+strict:
    # right last at equal ts. forward mirrors via negated time.
    # covers both TIMESTAMP and TIMESTAMP_NTZ (fixture generations differ);
    # the session tz is pinned to UTC so the NTZ->TIMESTAMP cast is an exact
    # epoch mapping with no DST discontinuity
    is_timestamp = dict(unioned.dtypes)["_ts"].startswith("timestamp")

    def _numeric(col: "Column") -> "Column":
        """Seconds-scale numeric form of a ts value (ordering + tolerance)."""
        return F.unix_micros(col.cast("timestamp")) / 1e6 if is_timestamp else col.cast("double")

    t = _numeric(F.col("_ts"))
    if direction == "forward":
        t = -t
    side_rank = F.col("_side") if allow_exact_matches else (1 - F.col("_side"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(t.asc(), side_rank.asc(), *[F.col(internal[c]).asc_nulls_first() for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_val = lambda c: F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w)  # noqa: E731

    matched_ts = right_val("_ts").alias("_m_ts")
    carried = [right_val(internal[c]).alias(f"{c}{suffix}") for c in right_cols]
    out = unioned.select("*", matched_ts, *carried).where(F.col("_side") == 1)

    if tolerance_seconds is not None:
        if is_timestamp:
            # integer-microsecond boundary, truncated the same way as the
            # streaming compile path (plans/compiler.py) — a left-right gap
            # exactly equal to the tolerance is kept/nulled identically in
            # both execution modes (double-seconds arithmetic rounds ~1e-7 s
            # at 2024 epochs, enough to flip the boundary case)
            age = F.abs(
                F.unix_micros(F.col(left_ts).cast("timestamp"))
                - F.unix_micros(F.col("_m_ts").cast("timestamp"))
            )
            in_tol = F.col("_m_ts").isNotNull() & (age <= int(tolerance_seconds * 1_000_000))
        else:
            age = F.abs(F.col(left_ts).cast("double") - F.col("_m_ts").cast("double"))
            in_tol = F.col("_m_ts").isNotNull() & (age <= tolerance_seconds)
        out = out.select(
            *[c for c in out.columns if c not in ("_m_ts", *[f"{c}{suffix}" for c in right_cols])],
            F.when(in_tol, F.col("_m_ts")).alias("_m_ts"),
            *[F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}") for c in right_cols],
        )

    return out.select(
        *[c for c in left.columns],
        F.col("_m_ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"{c}{suffix}") for c in right_cols],
    )
