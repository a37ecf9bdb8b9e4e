"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the LLM
    extension operators), one callable per query.
``oracle_sql()`` — matching DuckDB SQL for the correctness differencing gate.

Implementations live in :mod:`clickhouse_etl_loadtest_spark.queries`; this
module is a thin adapter over the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_etl_loadtest_spark.queries import driver_registry

_REGISTRY = driver_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's whole dedup pipeline end-to-end
    (generate events with duplicates -> first-wins keyed dedup -> sink
    mapping), on sf0.001-equivalent volume."""
    return _REGISTRY["dedup_pipeline_e2e"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(_REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(_REGISTRY.items()) if q.oracle}
