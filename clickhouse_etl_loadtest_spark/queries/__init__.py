"""Query registry: every implemented operator exposed as a (spark_fn, oracle_sql) pair.

``REGISTRY`` maps query name -> :class:`Q`. The driver contract
(``__spark_entry__.py``) re-exports this; the test suite self-checks each pair
against DuckDB at sf0.001/sf0.01 before the driver does at sf0.01.

Conventions (driver compare is column-name keyed, order-insensitive):
- alias EVERY computed column identically in Spark and SQL
- cast DuckDB ``SUM(BIGINT)`` (HUGEINT) back to BIGINT to match Spark's long
- no nondeterminism: ties broken by explicit keys, no wall-clock, seeds fixed
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = Q(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def load_all() -> dict[str, Q]:
    """Import all query modules (side-effect: fills REGISTRY) and return it."""
    from . import analytics, multimodal, pipeline, text, vector  # noqa: F401

    return REGISTRY
