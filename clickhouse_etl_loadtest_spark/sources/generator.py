"""Synthetic event generator with controlled duplication — the engine's
replacement for the external ``glassgen`` package the reference drives
(/root/reference/src/generate_events.py:7-72, D2 in SURVEY.md §2.3).

Reference semantics (derived from the published results CSV,
/root/reference/results/19_05_001_results.csv:2 — 5,000,000 published events
contain 4,545,454 uniques at duplication_rate 0.1):

    n_unique = floor(total / (1 + rate));  n_dup = total - n_unique

i.e. the *ratio of duplicates to uniques* is ``rate``, duplicates re-send the
FULL payload of an earlier unique event (same key, same created_at), and every
duplicate is published after its original.

Spark-first design: one ``spark.range`` per leg — embarrassingly parallel,
no shuffle, no driver loop, no Python UDF. The reference fans out across OS
processes (/root/reference/src/utils/publish.py:39-59); here ``num_partitions``
(= Spark tasks) is the parallelism knob (C6 in SURVEY.md §2.10). At 100 TB
this generates on executors at memory-bandwidth speed.

Everything is seeded/deterministic, so :func:`generator_oracle_sql` can emit
ANSI SQL that regenerates byte-identical data in DuckDB for correctness
differencing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.genfuncs import (
    EMAIL_DOMAINS,
    FIRST_NAMES,
    LAST_NAMES,
    gen_datetime_sql,
    gen_email_sql,
    gen_name_sql,
    gen_uuid_sql,
)


def unique_count(total_records: int, duplication_rate: float) -> int:
    """Unique events among ``total_records`` published (see module docstring).

    Computed in exact rational arithmetic: ``int(1100 / 1.1)`` is 999 in
    binary floating point, while floor(1100/(1+1/10)) is 1000.

    Any non-empty stream has at least one unique record — a duplicate can
    only re-send an earlier original — so the floor is clamped to 1 for
    ``total_records >= 1`` (only reachable at degenerate tiny totals; at the
    reference's scales the floor is already millions).
    """
    from fractions import Fraction

    if total_records <= 0:
        return 0
    return max(1, int(Fraction(total_records) / (1 + Fraction(str(duplication_rate)))))


def generate_user_events(
    spark: SparkSession,
    total_records: int,
    duplication_rate: float = 0.1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate the reference's ``user_event`` stream as a DataFrame.

    Columns: ``seq`` (publish order), ``event_id``/``user_id`` (uuid-shaped),
    ``name``, ``email``, ``created_at`` (string ``%Y-%m-%d %H:%M:%S``, cf.
    /root/reference/config/glassgen/user_event.json:6), ``is_duplicate``.

    Duplicates re-send the full payload of unique #(h60('dup'||seq) % n_unique).
    """
    n_unique = unique_count(total_records, duplication_rate)
    n_dup = total_records - n_unique

    # the two range legs SHARE the partition budget (proportional to their
    # row counts) so the union really has num_partitions tasks — the C6
    # "publisher process count = Spark tasks" contract. When the caller does
    # NOT pin a process count, the default is data-adaptive (guide §2):
    # at least ~25k rows per generation task, capped at the core count —
    # a 5,500-row oracle run is 1 task instead of 32 near-empty ones
    # (measured: task-scheduling overhead dominated dedup_pipeline_e2e's
    # 8-core-beats-32-core scaling ratio of 0.60), while any at-scale total
    # still fans out to every core.
    n_parts = num_partitions or max(
        1, min(spark.sparkContext.defaultParallelism, total_records // 25_000)
    )
    uniq_parts = max(1, round(n_parts * n_unique / total_records)) if n_dup > 0 else n_parts
    dup_parts = max(1, n_parts - uniq_parts)

    # whole projection as selectExpr strings: the Column-builder form cost
    # ~1,300 py4j round-trips (0.37 s of driver latency) per construction;
    # the SQL strings parse JVM-side to the identical analyzed plan
    # (optimization r13, guide §5 "the driver should do almost no work")
    uniq = spark.range(0, n_unique, 1, uniq_parts).selectExpr(
        "id AS seq", "id AS _src", "false AS is_duplicate"
    )

    if n_dup > 0:
        dup = spark.range(n_unique, total_records, 1, dup_parts).selectExpr(
            "id AS seq",
            # deterministic "earlier key" choice: h60('dup'||seq) % n_unique
            "cast(conv(substring(md5(concat('dup', cast(id as string))), 1, 15), 16, 10) as bigint)"
            f" % {n_unique} AS _src",
            "true AS is_duplicate",
        )
        base = uniq.unionAll(dup)
    else:
        base = uniq

    return base.selectExpr(
        "seq",
        f"{gen_uuid_sql('_src', 'evt')} AS event_id",
        f"{gen_uuid_sql('_src', 'usr')} AS user_id",
        f"{gen_name_sql('_src')} AS name",
        f"{gen_email_sql('_src')} AS email",
        f"{gen_datetime_sql('_src')} AS created_at",
        "is_duplicate",
    )


def _sql_array(values: list[str]) -> str:
    return "[" + ", ".join(f"'{v}'" for v in values) + "]"


def generator_oracle_sql(total_records: int, duplication_rate: float = 0.1) -> str:
    """DuckDB SQL regenerating :func:`generate_user_events` byte-identically.

    Used by the correctness harness to difference the whole generator+pipeline
    against an independent engine.
    """
    n_unique = unique_count(total_records, duplication_rate)

    def h60(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT)::BIGINT"

    def uuid_fmt(salt: str) -> str:
        hx = f"md5('{salt}' || CAST(_src AS VARCHAR))"
        return (
            f"substr({hx},1,8) || '-' || substr({hx},9,4) || '-' || substr({hx},13,4)"
            f" || '-' || substr({hx},17,4) || '-' || substr({hx},21,12)"
        )

    first = _sql_array(FIRST_NAMES)
    last = _sql_array(LAST_NAMES)
    dom = _sql_array(EMAIL_DOMAINS)
    return f"""
WITH base AS (
    SELECT range AS seq, range AS _src, FALSE AS is_duplicate
    FROM range(0, {n_unique})
    UNION ALL
    SELECT range AS seq,
           {h60("'dup' || CAST(range AS VARCHAR)")} % {n_unique} AS _src,
           TRUE AS is_duplicate
    FROM range({n_unique}, {total_records})
)
SELECT
    seq,
    {uuid_fmt('evt')} AS event_id,
    {uuid_fmt('usr')} AS user_id,
    ({first})[CAST({h60("'first' || CAST(_src AS VARCHAR)")} % {len(FIRST_NAMES)} AS INT) + 1] || ' ' ||
    ({last})[CAST({h60("'last' || CAST(_src AS VARCHAR)")} % {len(LAST_NAMES)} AS INT) + 1] AS name,
    'user' || CAST(_src AS VARCHAR) || '@' ||
    ({dom})[CAST({h60("'dom' || CAST(_src AS VARCHAR)")} % {len(EMAIL_DOMAINS)} AS INT) + 1] AS email,
    strftime(TIMESTAMP '2024-01-01 00:00:00' + _src * INTERVAL 1 SECOND, '%Y-%m-%d %H:%M:%S') AS created_at,
    is_duplicate
FROM base
"""
