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
    # compare epoch micros, not collected datetimes: PySpark converts
    # TimestampType rows through the MACHINE timezone on collect (the UTC
    # session tz does not apply driver-side), which would false-fail the
    # nanos-as-long generation on any non-UTC box
    lo, hi = duckdb.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    row = df.agg(F.min(micros).alias("lo"), F.max(micros).alias("hi")).first()
    assert (row["lo"], row["hi"]) == (lo, hi)
