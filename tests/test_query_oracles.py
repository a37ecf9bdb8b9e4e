"""Differential tests: every registered query with an oracle must hash-match
DuckDB on the fixtures — the same gate the driver applies at sf0.01
(SURVEY.md §5 item 2)."""

import os

import pytest

from clickhouse_etl_loadtest_spark.queries import driver_registry, load_all

from .oracle_harness import compare_query

REGISTRY = load_all()
ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    ok, msg = compare_query(spark, sf_dir, q.fn, q.oracle)
    assert ok, f"{name}: {msg}"


def test_registry_nonempty():
    assert len(REGISTRY) >= 10


def test_driver_visible_queries_emit_scalar_columns_only(spark, sf_dir):
    """The external driver's canonicalizer crashes on array/map/struct output
    columns (pandas factorize: unhashable list) — every driver-visible query
    must emit scalars only. Extras may return complex types (their pytest
    oracle handles them). Guards slot rotation against re-introducing the
    round-1 failure mode."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, q in driver_registry().items():
        df = q.fn(spark, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, f"non-scalar driver-visible columns: {offenders}"


def test_all_queries_return_rows(spark, sf_dir):
    """Every query (oracle or not) must run and return a stable schema."""
    for name, q in REGISTRY.items():
        df = q.fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
