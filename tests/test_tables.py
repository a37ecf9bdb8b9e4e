"""Fixture-loader schema normalization: ``events.ts`` must come out as a
timestamp type with DuckDB-identical values regardless of which physical
encoding the fixture generation used (TIMESTAMP(NANOS)-as-long vs
TIMESTAMP(MICROS) — the driver has shipped both across rounds)."""

import duckdb
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.sources.tables import load_table


def test_events_ts_loads_as_timestamp_matching_duckdb(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    lo, hi = duckdb.sql(
        f"SELECT min(ts), max(ts) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    row = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert (row["lo"], row["hi"]) == (lo, hi)
