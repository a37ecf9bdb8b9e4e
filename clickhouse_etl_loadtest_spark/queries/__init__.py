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
    extra: bool = False  # pytest-verified but not exposed through __spark_entry__


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None, headline: bool = False, extra: bool = False):
    def deco(fn):
        if name in REGISTRY:  # not an assert: must survive python -O
            # round-8 lesson: two queries silently shared the name
            # doc_tfidf_top_terms for a full round — the later registration
            # shadowed the earlier one in the dict and the shadowed query was
            # never oracle-swept. Duplicate names fail at import time now.
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = Q(fn=fn, oracle=oracle, headline=headline, extra=extra)
        return fn

    return deco


def load_all() -> dict[str, Q]:
    """Import all query modules (side-effect: fills REGISTRY) and return the
    FULL registry, extras included (the pytest oracle sweep covers everything)."""
    from . import (  # noqa: F401
        analytics,
        curation,
        html,
        multimodal,
        pii,
        pipeline,
        release,
        text,
        vector,
        web,
    )

    return REGISTRY


def driver_registry() -> dict[str, Q]:
    """The registry slice exposed through ``__spark_entry__``: one entry per
    SURVEY.md §2 / LLM-pipeline operator, capped at 50 entries because the
    external driver's correctness check truncates at 50 (alphabetical) — a
    larger registry silently loses verdicts for the tail. Near-duplicate
    coverage queries stay registered as ``extra`` and keep their value-level
    DuckDB check in tests/test_query_oracles.py."""
    reg = {name: q for name, q in load_all().items() if not q.extra}
    if len(reg) > 50:  # not an assert: must survive python -O
        raise RuntimeError(f"driver registry has {len(reg)} entries; driver truncates at 50")
    return reg
